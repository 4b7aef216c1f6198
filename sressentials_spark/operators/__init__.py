"""Engine operators beyond plain projections/aggregations.

* :mod:`sressentials_spark.operators.rownum` — stable global row
  numbering without a global sort (reference M13/S8).
* :mod:`sressentials_spark.operators.dedup` — exact + fuzzy
  deduplication (extension tier).
* :mod:`sressentials_spark.operators.similarity` — embedding
  similarity search (extension tier).
* :mod:`sressentials_spark.operators.textstats` — text analysis
  (extension tier).
* :mod:`sressentials_spark.operators.multimodal` — opaque binary
  column plumbing (extension tier).
"""
