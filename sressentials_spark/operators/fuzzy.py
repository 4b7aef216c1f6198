"""Blocked fuzzy matching (entity resolution) over a string column.

The record-linkage pattern: find value pairs within a small edit
distance WITHOUT the all-pairs cross join. Two standard reductions do
the work before any distance is computed:

1. **Dictionary-level matching** — distances are computed between
   DISTINCT values, not rows. A 100 TB fact table has a bounded
   dictionary for any entity-ish column; every downstream step runs at
   dictionary scale and rows join back by equality at the end.
2. **Blocking** — each distinct value is assigned ONE block key, its
   globally rarest token (ties by token string, so the assignment is
   total-order deterministic). Only same-block pairs are candidates:
   the classic rarest-token blocking tradeoff — O(sum of block^2)
   instead of O(dict^2), at the cost of missing pairs that share no
   rare token (that recall boundary is the documented contract, same
   as every production blocking scheme).

Candidates then pass a length filter (edit distance >= length gap, so
``|len(a) - len(b)| <= max_dist`` is a free necessary condition)
before the only real work: one JVM ``levenshtein`` per surviving
pair. Classic unit-cost edit distance is a unique value, so Spark and
DuckDB agree exactly — on ASCII. Parity boundary (measured):
Spark's ``levenshtein`` edits CODEPOINTS while DuckDB's edits BYTES
(``levenshtein('café','cafe')`` = 1 vs 2), so the oracle contract
holds only for ASCII dictionaries — guaranteed for the sf corpus by
``tests/test_catalog_oracle.py::test_documents_fixture_is_ascii``
and fuzz-pinned on random ASCII dictionaries in
tests/test_fuzzy.py; a non-ASCII deployment would need a byte-wise
oracle (or octet_length-based distance) instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def fuzzy_match_dictionary(
    df: DataFrame,
    col: str,
    *,
    max_dist: int = 2,
    min_dist: int = 1,
) -> DataFrame:
    """Near-duplicate value pairs of ``df[col]``'s dictionary.

    Output: ``name_a``, ``name_b`` (name_a < name_b), ``dist``
    (levenshtein, in [min_dist, max_dist]), ``n_rows_a``, ``n_rows_b``
    (how many input rows carry each value — the expansion factor a
    merge decision would touch).
    """
    names = df.groupBy(F.col(col).alias("name")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    toks = names.select(
        "name", F.explode(F.split(F.trim("name"), r"\s+")).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    # One block key per name: its rarest token, ties by token string.
    w = Window.partitionBy("name").orderBy("tf", "tok")
    keyed = (
        toks.join(F.broadcast(freq), "tok")
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("name", F.col("tok").alias("block"))
        .join(names, "name")
    )
    a = keyed.select(
        F.col("block"),
        F.col("name").alias("name_a"),
        F.col("n_rows").alias("n_rows_a"),
    )
    b = keyed.select(
        F.col("block"),
        F.col("name").alias("name_b"),
        F.col("n_rows").alias("n_rows_b"),
    )
    pairs = (
        a.join(b, "block")
        .filter(F.col("name_a") < F.col("name_b"))
        .filter(
            F.abs(F.length("name_a") - F.length("name_b")) <= F.lit(max_dist)
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(
            (F.col("dist") >= F.lit(min_dist)) & (F.col("dist") <= F.lit(max_dist))
        )
    )
    return pairs.select("name_a", "name_b", "dist", "n_rows_a", "n_rows_b")


def fuzzy_match_dictionary_oracle_sql(
    source_sql: str,
    *,
    max_dist: int = 2,
    min_dist: int = 1,
) -> str:
    """DuckDB restatement of :func:`fuzzy_match_dictionary` over
    ``source_sql``, which must yield one ``name`` column per row."""
    return rf"""
WITH names AS (
  SELECT name, CAST(COUNT(*) AS BIGINT) AS n_rows
  FROM ({source_sql}) GROUP BY name
),
toks AS (
  SELECT name, unnest(regexp_split_to_array(trim(name), '\s+')) AS tok
  FROM names
),
freq AS (
  SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY tok
),
keyed AS (
  SELECT t.name, t.tok AS block,
         ROW_NUMBER() OVER (PARTITION BY t.name ORDER BY f.tf, t.tok) AS rk
  FROM toks t JOIN freq f USING (tok)
),
blocked AS (
  SELECT k.name, k.block, n.n_rows
  FROM keyed k JOIN names n USING (name) WHERE k.rk = 1
)
SELECT a.name AS name_a, b.name AS name_b,
       CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist,
       a.n_rows AS n_rows_a, b.n_rows AS n_rows_b
FROM blocked a JOIN blocked b
  ON a.block = b.block AND a.name < b.name
WHERE abs(length(a.name) - length(b.name)) <= {max_dist}
  AND levenshtein(a.name, b.name) BETWEEN {min_dist} AND {max_dist}
"""
