"""Seeded-fuzz parity for the quality filter's regex/tokenize gates:
Spark evaluates Java regex (`regexp_count`, `split`), the oracle runs
DuckDB's RE2 (`regexp_extract_all`, `regexp_split_to_array`). The
filter's claim is that every signal and flag is bit-exact across
engines; this hammers that with adversarial-ish strings (mixed
whitespace runs, symbols, stopwords glued to punctuation, unicode
letters) rather than trusting the corpus fixture's tame vocabulary.
"""

from __future__ import annotations

import random

import duckdb

from sressentials_spark.operators.curation import (
    quality_filter,
    quality_filter_oracle_sql,
)

N_CASES = 300

# Mixes ASCII words, stopwords, symbols, digit runs, whitespace
# variants (space/tab/newline), and a few non-ASCII letters — the
# cases where Java regex and RE2 could plausibly diverge on \w \s \b.
_PIECES = [
    "the", "a", "of", "to", "and", "thee", "theater", "a's", "of.",
    "and,", "to-do", "x", "word", "WORD", "Wörd", "naïve", "état",
    "#", "!!", "...", "---", "@@", "123", "9.81", "x2", "_under_",
    " ", "  ", "\t", "\n", " \t ",
]


def _corpus(seed: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for _ in range(N_CASES):
        k = rng.randint(0, 60)
        out.append("".join(rng.choice(_PIECES) for _ in range(k)))
    return out


def test_flags_and_signals_match_duckdb(spark):
    texts = _corpus(20260814)
    df = spark.createDataFrame(
        [(i, t, "en") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: r.asDict() for r in quality_filter(df).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents (doc_id BIGINT, text VARCHAR, lang VARCHAR)"
    )
    con.executemany(
        "INSERT INTO documents VALUES (?, ?, ?)",
        [(i, t, "en") for i, t in enumerate(texts)],
    )
    want = {
        int(r["doc_id"]): {k: int(v) for k, v in r.items() if k != "doc_id"}
        for r in con.execute(quality_filter_oracle_sql()).df().to_dict(
            "records"
        )
    }
    con.close()

    mismatches = []
    for i in range(len(texts)):
        g = {k: v for k, v in got[i].items() if k != "doc_id"}
        if g != want[i]:
            mismatches.append((i, texts[i][:60], g, want[i]))
    assert not mismatches, mismatches[:3]


_PII_PIECES = [
    "user@example.com", "x.y+z@mail.co", "é@é.com", "no-at-here",
    "1.2.3.4", "10.0.0.255", "x1.2.3.4", "1.2.3.45.6.7.8.9",
    "123456789", "987654321012", "é123456789012", "abcé987654321xyz",
    "12345678", "9.81", "v1.2.3", "the", "word", "Wörd", "état",
    " ", "\t", "\n", "#", "...", ",",
]


def test_pii_redact_matches_duckdb(spark):
    from sressentials_spark.operators.curation import (
        pii_redact,
        pii_redact_oracle_sql,
    )

    rng = random.Random(20260814)
    texts = [
        "".join(rng.choice(_PII_PIECES) for _ in range(rng.randint(0, 30)))
        for _ in range(N_CASES)
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r.asDict() for r in pii_redact(df).collect()}

    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)",
        [(i, t) for i, t in enumerate(texts)],
    )
    want = {
        int(r["doc_id"]): r
        for r in con.execute(
            pii_redact_oracle_sql("SELECT doc_id, text FROM documents")
        ).df().to_dict("records")
    }
    con.close()

    mismatches = []
    for i in range(len(texts)):
        g = {k: v for k, v in got[i].items() if k != "doc_id"}
        w = {
            k: (int(v) if k.startswith("n_") else v)
            for k, v in want[i].items()
            if k != "doc_id"
        }
        if g != w:
            mismatches.append((i, texts[i][:60], g, w))
    assert not mismatches, mismatches[:3]
