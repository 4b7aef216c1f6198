"""Seeded-fuzz parity for the N1/N2 normalizers: the reference runs
Python ``re``; the engine runs Java regex via ``regexp_replace``. The
golden tests pin known cases — this fuzz hammers the same pattern
strings with hundreds of adversarial-ish random inputs (quotes,
braces, digits, word boundaries) and requires byte-identical output
from both regex engines, batch-evaluated in one Spark pass.
"""

from __future__ import annotations

import random
import re

from pyspark.sql import functions as F

from sressentials_spark.functions.normalize import (
    MONGO_NORMALIZE_PATTERN,
    MYSQL_NORMALIZE_PATTERN,
    normalize_mongo_command,
    normalize_mysql_query,
)

N_CASES = 400

_MONGO_ALPHABET = list('{}[]:,"\' abcdefXYZ0123456789._$éü')
_MYSQL_ALPHABET = list("abcdefgXYZ0123456789 '=,;().*_-éü")


def _corpus(alphabet: list[str], seed: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(N_CASES):
        k = rng.randint(0, 40)
        out.append("".join(rng.choice(alphabet) for _ in range(k)))
    return out


def _spark_map(spark, values, expr_fn):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(values)], ["i", "q"])
    rows = df.select("i", expr_fn("q").alias("r")).collect()
    return [r["r"] for r in sorted(rows, key=lambda r: r["i"])]


def test_mongo_normalizer_matches_python_re(spark):
    corpus = _corpus(_MONGO_ALPHABET, seed=101)
    expected = [re.sub(MONGO_NORMALIZE_PATTERN, ":<value>", s) for s in corpus]
    got = _spark_map(spark, corpus, normalize_mongo_command)
    assert got == expected


def test_mysql_normalizer_matches_python_re(spark):
    corpus = _corpus(_MYSQL_ALPHABET, seed=202)
    expected = [re.sub(MYSQL_NORMALIZE_PATTERN, "?", s).upper() for s in corpus]
    got = _spark_map(spark, corpus, normalize_mysql_query)
    assert got == expected
