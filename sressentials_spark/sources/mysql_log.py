"""MySQL slow-query-log source (reference S1/S8).

The reference reads the whole file and splits on ``'# Time: '``
(``MySql/mysqlLogParser.py:44-53``) — O(file) driver memory. Here the
split happens *in the scan*: ``option("lineSep", "\\n# Time: ")``
makes the text source emit one row per multi-line entry, so a 100 TB
log still arrives as parallel splittable partitions and no single
process ever holds the file.

Divergence (deliberate): the reference's ``str.split`` would also
split on a ``'# Time: '`` occurring mid-line inside a query body; the
record-delimiter scan only splits at line starts — strictly more
correct on real logs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from sressentials_spark.operators.rownum import (
    fan_out_numbered,
    with_row_numbers,
)

_PREFIX = "# Time: "


def read_mysql_log(spark: SparkSession, path: str) -> DataFrame:
    """Scan a MySQL slow log into ``(entry, entry_no)``.

    ``entry`` is the reconstructed full entry text (with the
    ``'# Time: '`` prefix re-attached, as at
    ``MySql/mysqlLogParser.py:53``); ``entry_no`` is the 1-based entry
    index matching the reference's ``enumerate(log_entries[1:])`` —
    any pre-amble before the first delimiter is dropped, exactly like
    ``log_entries[0]``.
    """
    raw = spark.read.option("lineSep", "\n" + _PREFIX).text(path)
    nparts = raw.rdd.getNumPartitions()
    # Fan the numbered records out to the session's parallelism: the
    # downstream regex extraction fuses into this stage and a single
    # medium file otherwise pins it to a handful of scan tasks.
    numbered = fan_out_numbered(with_row_numbers(raw, "rec_no"), nparts)

    # The file-initial record keeps its literal '# Time: ' prefix (the
    # record delimiter includes the preceding newline); a first record
    # WITHOUT the prefix is pre-amble and is skipped, shifting entry
    # numbering by one — mirror of the reference's `[1:]` slice. The
    # one-row "does the file start with the prefix" fact joins in as a
    # broadcast so plan construction stays lazy (no driver-side action).
    first = numbered.filter(F.col("rec_no") == 1).select(
        F.col("value").startswith(_PREFIX).alias("_first_prefixed")
    )
    preamble = F.when(F.col("_first_prefixed"), F.lit(0)).otherwise(F.lit(1))

    starts = F.col("value").startswith(_PREFIX)
    return (
        numbered.crossJoin(F.broadcast(first))
        .filter((F.col("rec_no") > preamble) | starts)
        .select(
            F.when(starts, F.col("value"))
            .otherwise(F.concat(F.lit(_PREFIX), F.col("value")))
            .alias("entry"),
            (F.col("rec_no") - preamble).alias("entry_no"),
        )
    )
