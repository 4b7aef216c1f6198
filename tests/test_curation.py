from __future__ import annotations

import pytest

from sressentials_spark.operators import curation as C


def _docs(spark, rows, cols=("doc_id", "text", "lang")):
    return spark.createDataFrame(rows, list(cols))


class TestPiiRedact:
    def test_redacts_and_counts(self, spark):
        df = _docs(
            spark,
            [
                (1, "mail a.user@example.com or b@c.io now", "en"),
                (2, "from 10.0.0.1 to 192.168.1.255 done", "en"),
                (3, "ssn 123456789 and card 4111111111111111", "en"),
                (4, "clean text with no pii at all", "en"),
            ],
        )
        out = {r["doc_id"]: r for r in C.pii_redact(df).collect()}
        assert out[1]["n_email"] == 2
        assert out[1]["redacted"] == "mail <EMAIL> or <EMAIL> now"
        assert out[2]["n_ipv4"] == 2
        assert out[2]["redacted"] == "from <IP> to <IP> done"
        assert out[3]["n_idnum"] == 2
        assert out[3]["redacted"] == "ssn <NUM> and card <NUM>"
        assert out[4]["redacted"] == "clean text with no pii at all"
        assert out[4]["n_email"] == out[4]["n_ipv4"] == out[4]["n_idnum"] == 0

    def test_sequential_semantics(self, spark):
        # The ipv4 digits must NOT be re-counted by the idnum pass:
        # after replacement the digits are gone, so n_idnum sees only
        # genuine long runs that survived earlier passes.
        df = _docs(spark, [(1, "ip 10.222.33.44 plus 987654321", "en")])
        row = C.pii_redact(df).collect()[0]
        assert row["n_ipv4"] == 1
        assert row["n_idnum"] == 1
        assert row["redacted"] == "ip <IP> plus <NUM>"

    def test_greedy_run_semantics(self, spark):
        # Boundary-free patterns (see PII_PATTERNS: Java \b is
        # Unicode-aware, RE2's is not — so \b is banned): a 4-digit
        # final octet yields a maximal-prefix IP match with the spare
        # digit left behind, and ids embedded in tokens ARE redacted.
        df = _docs(spark, [(2, "not-ip 10.222.333.4444", "en")])
        row = C.pii_redact(df).collect()[0]
        assert row["n_ipv4"] == 1 and row["redacted"] == "not-ip <IP>4"
        emb = _docs(spark, [(3, "order-no123456789x shipped", "en")])
        row2 = C.pii_redact(emb).collect()[0]
        assert row2["n_idnum"] == 1
        assert row2["redacted"] == "order-no<NUM>x shipped"


class TestQualityFilter:
    def _flags(self, spark, text):
        rows = [(0, text, "en")]
        return C.quality_filter(_docs(spark, rows)).collect()[0].asDict()

    def test_good_document_keeps(self, spark):
        words = [f"word{i}" for i in range(20)] + ["the", "a", "of"]
        row = self._flags(spark, " ".join(words))
        assert row["keep"] == 1
        for f in ("len_ok", "mwl_ok", "sym_ok", "stop_ok", "div_ok"):
            assert row[f] == 1, f

    def test_too_short_drops_with_reason(self, spark):
        row = self._flags(spark, "the a of tiny doc")
        assert row["len_ok"] == 0 and row["keep"] == 0

    def test_symbol_soup_drops(self, spark):
        words = ["the", "a", "of"] + [f"w{i}#!?" for i in range(25)]
        row = self._flags(spark, " ".join(words))
        assert row["sym_ok"] == 0 and row["keep"] == 0

    def test_no_stopwords_drops(self, spark):
        row = self._flags(spark, " ".join(f"tok{i}" for i in range(30)))
        assert row["stop_ok"] == 0 and row["keep"] == 0

    def test_low_diversity_drops(self, spark):
        words = ["the", "a"] + ["spam"] * 30
        row = self._flags(spark, " ".join(words))
        assert row["div_ok"] == 0 and row["keep"] == 0

    def test_one_flag_per_gate_is_independent(self, spark):
        # The reason flags must report every failing gate, not just
        # the first: a short, repetitive, stopword-free doc trips 3.
        row = self._flags(spark, "zz zz zz")
        assert (row["len_ok"], row["stop_ok"], row["div_ok"]) == (0, 0, 0)


class TestRepetitionStats:
    def test_top_unigram_and_bigram(self, spark):
        df = _docs(spark, [(1, "a a a b", "en")])
        row = C.repetition_stats(df).collect()[0]
        assert row["n_tokens"] == 4
        assert row["top_tok"] == "a" and row["top_tok_n"] == 3
        assert row["top_tok_frac"] == pytest.approx(0.75)
        assert row["top_bigram"] == "a a" and row["top_bigram_n"] == 2
        assert row["top_bigram_frac"] == pytest.approx(2 / 3)

    def test_tie_breaks_lexicographic(self, spark):
        df = _docs(spark, [(1, "b a b a", "en")])
        row = C.repetition_stats(df).collect()[0]
        assert row["top_tok"] == "a"  # a and b tie at 2; lexical min wins
        assert row["top_bigram"] == "b a"  # "b a" ×2 beats "a b" ×1
        assert row["top_bigram_n"] == 2

    def test_single_token_doc_drops(self, spark):
        # No bigram exists → inner join drops the doc (both engines).
        df = _docs(spark, [(1, "only", "en"), (2, "two tokens", "en")])
        ids = {r["doc_id"] for r in C.repetition_stats(df).collect()}
        assert ids == {2}


class TestStratifiedSample:
    def test_rate_100_keeps_all_rate_0_drops_all(self, spark):
        rows = [(i, f"text {i}", "en" if i % 2 else "fr") for i in range(40)]
        df = _docs(spark, rows)
        kept = C.stratified_sample(df, "lang", {"en": 0}, default_rate=100).collect()
        langs = {r["lang"] for r in kept}
        assert langs == {"fr"}
        assert len(kept) == 20

    def test_deterministic_across_runs(self, spark):
        rows = [(i, f"text {i}", "en") for i in range(200)]
        df = _docs(spark, rows)
        a = sorted(r["doc_id"] for r in C.stratified_sample(df, "lang", {"en": 30}).collect())
        b = sorted(
            r["doc_id"]
            for r in C.stratified_sample(df.repartition(7), "lang", {"en": 30}).collect()
        )
        assert a == b
        # ~30% ± slack on 200 ids; the point is it's a real downsample.
        assert 30 <= len(a) <= 90


class TestPackTokenBudget:
    def test_chunk_assignment(self, spark):
        # 3-token docs, budget 4: offsets 0,3,6,9 → chunks 0,0,1,2.
        df = _docs(spark, [(i, "x y z", "en") for i in range(1, 5)])
        out = {
            r["doc_id"]: r
            for r in C.pack_token_budget(df, budget=4, part_col="lang").collect()
        }
        assert [out[i]["start_offset"] for i in (1, 2, 3, 4)] == [0, 3, 6, 9]
        assert [out[i]["chunk_id"] for i in (1, 2, 3, 4)] == [0, 0, 1, 2]

    def test_partitions_pack_independently(self, spark):
        df = _docs(
            spark,
            [(1, "a b", "en"), (2, "c d", "fr"), (3, "e f", "en"), (4, "g h", "fr")],
        )
        out = {
            r["doc_id"]: r
            for r in C.pack_token_budget(df, budget=100, part_col="lang").collect()
        }
        # Each language has its own running sum starting at 0.
        assert out[1]["start_offset"] == 0 and out[2]["start_offset"] == 0
        assert out[3]["start_offset"] == 2 and out[4]["start_offset"] == 2

    def test_sharded_key_packs_per_shard(self, spark):
        # With n_shards the running sum restarts per (lang, shard):
        # every shard's minimum offset is 0, shards are deterministic
        # across repartitions, and the composite key bounds the rows
        # any one window task sees.
        docs = [(i, "tok " * 5, "en") for i in range(1, 41)]
        df = _docs(spark, docs)
        rows = C.pack_token_budget(df, budget=10, n_shards=4).collect()
        again = {
            r["doc_id"]: r["shard"]
            for r in C.pack_token_budget(
                df.repartition(7), budget=10, n_shards=4
            ).collect()
        }
        by_shard: dict[int, list] = {}
        for r in rows:
            assert again[r["doc_id"]] == r["shard"]
            by_shard.setdefault(r["shard"], []).append(r)
        assert len(by_shard) > 1  # 40 ids actually spread over shards
        for members in by_shard.values():
            members.sort(key=lambda r: r["doc_id"])
            assert members[0]["start_offset"] == 0
            # Within a shard the offsets are the exclusive running sum.
            run = 0
            for m in members:
                assert m["start_offset"] == run
                assert m["chunk_id"] == run // 10
                run += m["n_tokens"]


class TestDecontaminate:
    def test_overlap_detection(self, spark):
        df = _docs(
            spark,
            [
                (0, "the quick brown fox jumps over the lazy dog", "en"),
                (10, "a quick brown fox jumps into the river", "en"),
                (11, "completely different content here today", "en"),
                (12, "the quick brown fox jumps over everything", "en"),
            ],
        )
        out = {
            (r["doc_id"], r["bench_id"]): r["n_shared"]
            for r in C.decontaminate(df, [0], min_shared=2).collect()
        }
        # doc 10 shares "quick brown fox" / "brown fox jumps" (2 trigrams);
        # doc 12 shares those plus "the quick brown" and "fox jumps over";
        # doc 11 shares nothing.
        assert out[(10, 0)] == 2
        assert out[(12, 0)] == 4
        assert (11, 0) not in out

    def test_benchmark_docs_never_flagged(self, spark):
        df = _docs(
            spark,
            [
                (0, "shared phrase number one here", "en"),
                (1, "shared phrase number one here", "en"),
            ],
        )
        rows = C.decontaminate(df, [0, 1], min_shared=1).collect()
        assert rows == []  # both are benchmark docs; corpus side is empty


class TestChunkDocuments:
    def test_windows_and_overlap(self, spark):
        # 10 tokens, chunk 4, overlap 2 → step 2 → starts 0,2,4,6,8.
        text = " ".join(f"t{i}" for i in range(10))
        df = _docs(spark, [(1, text, "en")])
        rows = {
            r["chunk_id"]: r
            for r in C.chunk_documents(df, chunk_tokens=4, overlap=2).collect()
        }
        assert sorted(rows) == [0, 1, 2, 3, 4]
        assert rows[0]["chunk_text"] == "t0 t1 t2 t3"
        assert rows[1]["chunk_text"] == "t2 t3 t4 t5"  # 2-token overlap
        assert rows[4]["chunk_text"] == "t8 t9"  # trailing partial kept
        assert rows[4]["n_chunk_tokens"] == 2
        assert all(r["start_tok"] == cid * 2 for cid, r in rows.items())

    def test_short_doc_single_chunk(self, spark):
        df = _docs(spark, [(1, "just three tokens", "en")])
        rows = C.chunk_documents(df, chunk_tokens=64, overlap=16).collect()
        assert len(rows) == 1
        assert rows[0]["chunk_text"] == "just three tokens"
        assert rows[0]["n_chunk_tokens"] == 3

    def test_overlap_must_be_smaller(self, spark):
        df = _docs(spark, [(1, "a b", "en")])
        import pytest as _pytest

        with _pytest.raises(ValueError):
            C.chunk_documents(df, chunk_tokens=4, overlap=4)


def test_paragraph_dedup_removes_boilerplate_keeps_body(spark):
    from sressentials_spark.operators.curation import paragraph_dedup

    footer = "all rights reserved"
    rows = []
    for i in range(8):
        body = f"unique body paragraph number {i}"
        rows.append((i, f"{body}\n\n{footer}"))
    # one doc that is ONLY boilerplate
    rows.append((8, footer))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup(docs, min_docs=5).toPandas().set_index("doc_id")
    import hashlib

    for i in range(8):
        assert out.loc[i, "n_paras"] == 2 and out.loc[i, "n_removed"] == 1
        body_md5 = hashlib.md5(
            f"unique body paragraph number {i}".encode()
        ).hexdigest()
        assert out.loc[i, "clean_md5"] == body_md5
    # the all-boilerplate doc rebuilds to the empty string
    assert out.loc[8, "n_removed"] == 1
    assert out.loc[8, "clean_md5"] == hashlib.md5(b"").hexdigest()


def test_paragraph_dedup_below_threshold_untouched(spark):
    from sressentials_spark.operators.curation import paragraph_dedup

    shared = "appears in four docs only"
    rows = [(i, f"{shared}\n\nbody {i}") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = paragraph_dedup(docs, min_docs=5).toPandas()
    assert (out["n_removed"] == 0).all()
