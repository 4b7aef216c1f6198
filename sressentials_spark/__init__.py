"""sressentials_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of
the reference SRE log-analytics toolkit (ManjuReddyT/SREssentials):

* MongoDB structured-log analysis (slow-query metrics, query-pattern
  aggregation, error rollup, passthrough + parse diagnostics) —
  :mod:`sressentials_spark.plans.mongo`.
* MySQL slow-query-log analysis (regex field extraction, query
  normalization, per-pattern aggregation) —
  :mod:`sressentials_spark.plans.mysql`.

Everything is expressed as lazy DataFrame transformations so Catalyst
performs pushdown/pruning/codegen; shuffles happen only at the
aggregations and final sorts. Beyond the reference surface the engine
adds large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) in
:mod:`sressentials_spark.operators`.
"""

from sressentials_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
