"""Property-style invariants for the curation packing/chunking
operators on randomized corpora — the structural guarantees a trainer
relies on, beyond the value-exact oracle comparison:

* chunking: full coverage (every token index lands in >= 1 chunk),
  stride geometry, bounded window size, exact reconstruction of each
  window's text;
* packing: per-(partition, shard) offsets form an exact exclusive
  running sum in id order with no gaps, and chunk ids are the floor
  division of offsets by the budget.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sressentials_spark.operators.curation import chunk_documents, pack_token_budget

WORDS = ["alpha", "beta", "gamma", "delta", "x", "longishword", "q7", "née"]


def _random_docs(spark, n_docs, rng, max_tokens=40):
    rows = []
    for i in range(n_docs):
        n = rng.randint(1, max_tokens)
        rows.append((i, " ".join(rng.choice(WORDS) for _ in range(n)),
                     rng.choice(["en", "fr", "de"])))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_chunking_covers_every_token_with_exact_windows(spark):
    rng = random.Random(7)
    docs = _random_docs(spark, 30, rng)
    chunk_tokens, overlap = 8, 3
    step = chunk_tokens - overlap
    out = {
        (r["doc_id"], r["chunk_id"]): r
        for r in chunk_documents(
            docs, chunk_tokens=chunk_tokens, overlap=overlap
        ).collect()
    }
    texts = {r["doc_id"]: r["text"].split() for r in docs.collect()}
    for doc_id, toks in texts.items():
        n = len(toks)
        chunk_ids = sorted(c for d, c in out if d == doc_id)
        # Windows start at 0, step, 2*step, ... — contiguous ids.
        assert chunk_ids == list(range(len(chunk_ids)))
        covered = set()
        for c in chunk_ids:
            r = out[(doc_id, c)]
            assert r["start_tok"] == c * step
            assert 1 <= r["n_chunk_tokens"] <= chunk_tokens
            window = toks[r["start_tok"] : r["start_tok"] + chunk_tokens]
            assert r["chunk_text"] == " ".join(window)
            assert r["n_chunk_tokens"] == len(window)
            covered.update(range(r["start_tok"], r["start_tok"] + len(window)))
        # Full coverage: every token index appears in at least one window.
        assert covered == set(range(n))


def test_packing_offsets_are_exact_running_sums(spark):
    rng = random.Random(11)
    docs = _random_docs(spark, 60, rng)
    budget = 25
    rows = pack_token_budget(docs, budget=budget, n_shards=4).collect()
    by_part: dict[tuple, list] = {}
    for r in rows:
        by_part.setdefault((r["lang"], r["shard"]), []).append(r)
    assert len(rows) == 60  # every document assigned exactly once
    for part_rows in by_part.values():
        part_rows.sort(key=lambda r: r["doc_id"])
        running = 0
        for r in part_rows:
            assert r["start_offset"] == running  # exclusive prefix sum, no gaps
            assert r["chunk_id"] == running // budget
            running += r["n_tokens"]


def test_packing_shards_are_deterministic_across_runs(spark):
    rng = random.Random(13)
    docs = _random_docs(spark, 40, rng)
    a = {r["doc_id"]: (r["shard"], r["chunk_id"]) for r in
         pack_token_budget(docs, budget=30, n_shards=4).collect()}
    b = {r["doc_id"]: (r["shard"], r["chunk_id"]) for r in
         pack_token_budget(docs.repartition(7), budget=30, n_shards=4).collect()}
    assert a == b  # membership survives arbitrary repartitioning


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    docs_paras=st.lists(
        st.lists(
            st.text(
                alphabet=st.characters(
                    blacklist_characters="\n", blacklist_categories=("Cs",)
                ),
                min_size=1,
                max_size=12,
            ),
            min_size=1,
            max_size=4,
        ),
        min_size=1,
        max_size=6,
    ),
    min_docs=st.integers(min_value=2, max_value=4),
)
@settings(max_examples=10, deadline=None)
def test_paragraph_dedup_matches_python_model(spark, docs_paras, min_docs):
    """paragraph_dedup vs a direct Python model on arbitrary unicode
    paragraphs: same doc frequencies, same removals, same ordered
    rebuild (the model splits the JOINED text, as the operator does)."""
    import hashlib
    from collections import Counter

    from sressentials_spark.operators.curation import paragraph_dedup

    rows = [(i, "\n\n".join(paras)) for i, paras in enumerate(docs_paras)]
    out = (
        paragraph_dedup(
            spark.createDataFrame(rows, "doc_id long, text string"),
            min_docs=min_docs,
        )
        .toPandas()
        .set_index("doc_id")
    )
    split_docs = {i: t.split("\n\n") for i, t in rows}
    freq = Counter()
    for ps in split_docs.values():
        for para in set(ps):
            freq[para] += 1
    for i, ps in split_docs.items():
        kept = [para for para in ps if freq[para] < min_docs]
        assert out.loc[i, "n_paras"] == len(ps)
        assert out.loc[i, "n_removed"] == len(ps) - len(kept)
        want = hashlib.md5("\n\n".join(kept).encode()).hexdigest()
        assert out.loc[i, "clean_md5"] == want, (i, ps, kept)
