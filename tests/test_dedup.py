"""Dedup operator semantics beyond the oracle equality checks."""

from __future__ import annotations

import pytest

from sressentials_spark.operators import dedup as D
from sressentials_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_minhash_lsh_recall_equals_exact(spark, docs):
    """At J>=0.8 the banded candidates must cover every true pair (the
    oracle equality in test_catalog_oracle depends on recall == 1)."""
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()
    }
    assert exact, "fixture should contain planted near-duplicates"
    assert lsh == exact


def test_simhash_near_dups_have_small_hamming(spark, docs):
    """Planted Jaccard near-dups should also be SimHash-close; unrelated
    docs should not collide at distance 0."""
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in D.simhash_pairs(docs, max_hamming=12).collect()}
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    covered = sum(1 for p in exact if p in pairs)
    assert covered >= len(exact) * 0.8
    n_docs = docs.count()
    assert len(pairs) < n_docs * n_docs / 4  # not a degenerate everything-matches


def test_jaccard_capped_equals_uncapped(spark, docs):
    """At the near-dup threshold (0.8), dropping high-DF shingles must
    not change the pair set: boilerplate shingles connect everything to
    everything and carry no similarity signal. This pins the recall
    argument for the max_df scale mitigation on real fixture data."""
    uncapped = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8, max_df=5).collect()
    }
    assert uncapped, "fixture should contain planted near-duplicates"
    assert capped == uncapped


def test_embedding_pairs_symmetric_free(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    rows = D.embedding_cosine_pairs(emb, threshold=0.4).collect()
    assert rows
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert -1.0001 <= r["cosine"] <= 1.0001


def test_release_persisted_frees_cached_intermediates(spark, docs):
    """Long-lived-session hygiene: every persist a pair generator takes
    is tracked, and release_persisted() drops them all once the result
    has materialized (ADVICE r3: unbounded cache growth otherwise)."""
    D.release_persisted()  # start from a clean registry
    jsc = spark.sparkContext._jsc.sc()
    baseline = jsc.getPersistentRDDs().size()
    emb = load_table(spark, SF_DIR, "embeddings")
    D.embedding_near_dup_lsh(emb).count()
    D.minhash_lsh_pairs(docs).count()
    assert jsc.getPersistentRDDs().size() > baseline
    released = D.release_persisted()
    assert released >= 3  # exploded bands + norm corpus + shingles/sigs
    assert D.release_persisted() == 0  # registry drained
    # Every tracked block is back out of the store (other modules'
    # caches, e.g. the parsed-sheet cache, may still hold theirs).
    assert jsc.getPersistentRDDs().size() <= baseline


class TestMinhashIncremental:
    def _run(self, spark, rows, split):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = D.minhash_incremental(df, split, threshold=0.8)
        return {r["doc_id"]: r.asDict() for r in out.collect()}

    def test_statuses_and_priority(self, spark):
        base = " ".join(f"w{i}" for i in range(30))
        other = " ".join(f"x{i}" for i in range(30))
        fresh = " ".join(f"y{i}" for i in range(30))
        rows = [
            (0, base),        # history
            (1, other),       # history
            (10, base),       # new: dup of history doc 0
            (11, fresh),      # new: kept (first of its kind)
            (12, fresh),      # new: dup of earlier batch doc 11
            (13, base),       # new: matches history AND doc 10 ->
        ]                     # history wins the status priority
        out = self._run(spark, rows, split=10)
        assert set(out) == {10, 11, 12, 13}, "one row per NEW doc only"
        assert out[10]["status"] == "dup_of_history"
        assert out[11]["status"] == "kept"
        assert out[12]["status"] == "dup_in_batch"
        assert out[12]["n_batch_matches"] == 1
        assert out[13]["status"] == "dup_of_history"
        assert out[13]["n_hist_matches"] == 1
        assert out[13]["n_batch_matches"] == 1

    def test_history_rows_never_surface(self, spark):
        text = " ".join(f"w{i}" for i in range(20))
        rows = [(0, text), (1, text), (5, " ".join(f"z{i}" for i in range(20)))]
        out = self._run(spark, rows, split=5)
        assert set(out) == {5}
        assert out[5]["status"] == "kept"


class TestMinhashArtifactCache:
    def test_hit_miss_and_release(self, spark):
        from sressentials_spark.sources.tables import load_table

        D.release_persisted()
        base = len(D._PERSISTED)
        a = load_table(spark, SF_DIR, "documents")
        D._minhash_artifacts(a, 3, "doc_id")
        assert len(D._PERSISTED) == base + 2
        # Same corpus plan -> cache hit, no new persisted frames.
        b = load_table(spark, SF_DIR, "documents")
        D._minhash_artifacts(b, 3, "doc_id")
        assert len(D._PERSISTED) == base + 2
        # Different shingle width -> distinct artifacts.
        D._minhash_artifacts(a, 2, "doc_id")
        assert len(D._PERSISTED) == base + 4
        # Release drops both the blocks and the cache.
        D.release_persisted()
        assert len(D._PERSISTED) == 0 and len(D._ARTIFACTS) == 0


def test_semantic_dedup_verdicts(spark):
    """SemDeDup verdict semantics on a hand-built corpus: lowest-id
    representative kept, negative-dot and zero-norm never duplicates,
    and comparisons stay INSIDE clusters (an identical vector in a
    different cluster is kept — the candidate generator is the
    clustering, by design)."""
    emb = spark.createDataFrame(
        [
            (1, [0.5, 0.0, 0.0, 0.0]),
            (2, [0.5, 0.001, 0.0, 0.0]),   # ~cos 1 with v1 -> dup_of 1
            (3, [0.0, 0.5, 0.0, 0.0]),     # orthogonal -> kept
            (4, [-0.5, 0.0, 0.0, 0.0]),    # negative dot -> kept
            (5, [0.0, 0.0, 0.0, 0.0]),     # zero norm -> kept (guard)
            (6, [0.5, 0.0, 0.0, 0.0]),     # == v1 but other cluster -> kept
            (7, [0.4, 0.003, 0.0, 0.0]),   # dup of BOTH 1 and 2 -> min id
        ],
        "vec_id long, embedding array<double>",
    )
    asg = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0), (6, 1), (7, 0)],
        "vec_id long, cluster long",
    )
    out = {
        r["vec_id"]: r
        for r in D.semantic_dedup(emb, asg).collect()
    }
    D.release_persisted()
    assert out[1]["status"] == "kept" and out[1]["dup_of"] == -1
    assert out[2]["status"] == "semantic_dup" and out[2]["dup_of"] == 1
    assert out[3]["status"] == "kept"
    assert out[4]["status"] == "kept"
    assert out[5]["status"] == "kept" and out[5]["n_prior_matches"] == 0
    assert out[6]["status"] == "kept" and out[6]["cluster"] == 1
    assert out[7]["status"] == "semantic_dup" and out[7]["dup_of"] == 1
    assert out[7]["n_prior_matches"] == 2
