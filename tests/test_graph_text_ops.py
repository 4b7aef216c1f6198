"""Unit tests for the round-4 tier-3 operators: triangle counting
(degree-oriented wedge join) and the tokenizer-induction / rare-bigram
text statistics. The catalog oracle test covers the shipped queries;
these pin the OPERATORS on adversarial inputs the synthetic corpus
doesn't produce (hub graphs, degree ties, 1-token docs, unicode)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from sressentials_spark.operators.pipeline import triangle_counts
from sressentials_spark.operators.text import (
    bpe_merge_pair_counts,
    rare_bigram_stats,
)


def brute_triangles(edges: set[tuple[int, int]]) -> dict[int, int]:
    nodes = sorted({n for e in edges for n in e})
    counts: dict[int, int] = {}
    for x, y, z in itertools.combinations(nodes, 3):
        if (
            (x, y) in edges
            and (x, z) in edges
            and (y, z) in edges
        ):
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def run_triangles(spark, edges: set[tuple[int, int]]) -> dict[int, int]:
    df = spark.createDataFrame(
        [(a, b) for a, b in sorted(edges)], "a long, b long"
    )
    return {
        r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()
    }


def test_triangles_hub_graph(spark):
    """A hub node connected to everything (the shape that blows up
    unoriented wedge joins) plus triangles through the hub: every
    hub-adjacent edge among leaves closes a triangle with the hub."""
    edges = {(0, i) for i in range(1, 9)}  # hub 0 — degree 8
    edges |= {(1, 2), (3, 4), (5, 6)}  # leaf edges → 3 hub triangles
    got = run_triangles(spark, edges)
    assert got == brute_triangles(edges)
    assert got[0] == 3  # hub participates in all three


def test_triangles_degree_ties(spark):
    """Complete graph K5: every node has identical degree, so every
    orientation decision falls through to the id tie-break."""
    edges = {(a, b) for a, b in itertools.combinations(range(5), 2)}
    got = run_triangles(spark, edges)
    # K5 has C(5,3)=10 triangles; each node is in C(4,2)=6.
    assert got == {n: 6 for n in range(5)}


def test_triangles_random_graphs_match_bruteforce(spark):
    rng = random.Random(42)
    for _ in range(3):
        n = 12
        edges = {
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < 0.35
        }
        assert run_triangles(spark, edges) == brute_triangles(edges)


def test_triangles_triangle_free_graph_is_empty(spark):
    edges = {(0, 1), (1, 2), (2, 3), (3, 4)}  # a path — no triangles
    assert run_triangles(spark, edges) == {}


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bpe_merge_pairs_tiny_corpus(spark):
    # "aaab" contributes pairs aa,aa,ab; two copies of the word double
    # the weight through the distinct-word frequency table.
    docs = _docs(spark, ["aaab aaab", "ab x"])
    rows = bpe_merge_pair_counts(docs, k=10).collect()
    got = {r["pair"]: r["n_occurrences"] for r in rows}
    assert got == {"aa": 4, "ab": 3}
    # top-1 cut respects (count desc, pair asc)
    top1 = bpe_merge_pair_counts(docs, k=1).collect()
    assert [(r["pair"], r["n_occurrences"]) for r in top1] == [("aa", 4)]


def test_bpe_merge_pairs_unicode_pairs_are_codepoints(spark):
    docs = _docs(spark, ["héé héé"])
    got = {
        r["pair"]: r["n_occurrences"]
        for r in bpe_merge_pair_counts(docs, k=10).collect()
    }
    assert got == {"hé": 2, "éé": 2}


def test_rare_bigram_single_token_doc_zero_row(spark):
    """Docs with < 2 tokens produce no bigrams but still get a row
    (n_bigrams = 0, permille 0) — the filter must not drop them."""
    docs = _docs(spark, ["solo", "a b a b", "x y"])
    rows = {r["doc_id"]: r for r in rare_bigram_stats(docs, rare_max=1).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["n_bigrams"] == 0 and rows[0]["rare_permille"] == 0
    # doc 1: bigrams "a b","b a","a b" → "a b" count 2 (common),
    # "b a" count 1 (rare) → 1/3 rare = 333‰
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["n_rare_bigrams"] == 1
    assert rows[1]["rare_permille"] == 333
    # doc 2: single hapax bigram → fully rare
    assert rows[2]["rare_permille"] == 1000


def test_empty_inputs_degrade_gracefully(spark):
    """Empty corpora/graphs: empty results (or zeroed profiles), never
    a crash or an ANSI division error."""
    from sressentials_spark.operators.profile import (
        key_skew_profile,
        profile_columns,
    )

    empty_docs = _docs(spark, [])
    assert bpe_merge_pair_counts(empty_docs).collect() == []
    assert rare_bigram_stats(empty_docs).collect() == []
    empty_edges = spark.createDataFrame([], "a long, b long")
    assert triangle_counts(empty_edges).collect() == []
    prof = profile_columns(empty_docs, ["doc_id", "text"]).collect()
    assert [(r["col_name"], r["n_rows"], r["n_nulls"], r["n_distinct"]) for r in prof] == [
        ("doc_id", 0, 0, 0),
        ("text", 0, 0, 0),
    ]
    skew = key_skew_profile(
        spark.createDataFrame([], "user_id long"), ["user_id"]
    ).collect()
    assert len(skew) == 1 and skew[0]["n_keys"] == 0 and skew[0]["n_rows"] == 0
