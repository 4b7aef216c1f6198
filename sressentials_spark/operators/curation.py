"""Corpus-curation operators: PII redaction, repetition statistics,
stratified sampling, and token-budget sequence packing.

Extension tier beyond the reference surface — the transforms a
large-scale training-data pipeline applies between "parsed corpus" and
"training shards": scrubbing contact strings, measuring Gopher-style
repetition signals, deterministically downsampling head languages, and
packing documents into fixed-token-budget training sequences.

Everything here is deterministic and engine-exact so the DuckDB oracle
can restate it: the regexes stay inside the Java/RE2 common subset
(no lookaround, no backreferences), hashes use the shared 60-bit md5
recipe, ratios are exact integer divisions widened to double, and
every tie breaks on an explicit total order. All transforms are native
column expressions or doc_id-keyed relational shapes — no Python in
the row path, shuffles keyed by document id (uniform), so the same
plans run unchanged on a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from sressentials_spark.operators.dedup import md5_long
from sressentials_spark.operators.text import BPE_TOKEN_PATTERN, tokens

# --------------------------------------------------------------------------
# PII redaction
# --------------------------------------------------------------------------

#: (name, pattern, replacement) applied IN ORDER — order matters because
#: later patterns see earlier replacements. Patterns are valid in both
#: Java regex (Spark) and RE2 (DuckDB): no lookaround, no backrefs,
#: and — deliberately — no ``\b``: Java's ``\b`` is Unicode-aware even
#: while its ``\w`` stays ASCII (RE2's is not), so ``\b``-anchored
#: patterns diverge between engines wherever a digit abuts an accented
#: letter (``é123456789``). The numeric patterns instead use greedy
#: maximal-run semantics (leftmost greedy matching is identical in
#: both engines), which also redacts ids embedded in tokens —
#: the safer default for a PII scrub. Pinned by
#: tests/test_quality_filter_fuzz.py.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "<IP>"),
    ("idnum", r"\d{9,}", "<NUM>"),
]


def pii_redact(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Scrub contact strings from a text column.

    Emits per-document match counts per category plus the redacted
    text's md5 and length — the redacted payload itself stays in the
    pipeline as ``redacted`` for downstream writes. A pure narrow
    projection (regex scans fused into one codegen stage, no shuffle,
    no Python), so cost is one streaming pass over the corpus
    regardless of scale.
    """
    redacted = F.col(text_col)
    counts = []
    for name, pat, rep in PII_PATTERNS:
        # Counts are measured against the text as each pattern SEES it
        # (i.e. after the previous replacements), matching the
        # sequential semantics of the replacement chain.
        counts.append(
            F.regexp_count(redacted, F.lit(pat)).cast("long").alias(f"n_{name}")
        )
        redacted = F.regexp_replace(redacted, pat, rep)
    return docs.select(
        F.col(id_col),
        *counts,
        redacted.alias("redacted"),
        F.md5(redacted.cast("binary")).alias("redacted_md5"),
        F.length(redacted).cast("long").alias("n_chars_redacted"),
    )


def pii_redact_oracle_sql(source_sql: str) -> str:
    """DuckDB restatement of :func:`pii_redact` over ``source_sql``,
    which must yield ``(doc_id, text)``."""
    prev = "text"
    count_cols, redact_steps = [], []
    for name, pat, rep in PII_PATTERNS:
        pat_sql = pat.replace("'", "''")
        count_cols.append(
            f"CAST(len(regexp_extract_all({prev}, '{pat_sql}')) AS BIGINT) AS n_{name}"
        )
        step = f"regexp_replace({prev}, '{pat_sql}', '{rep}', 'g')"
        redact_steps.append(step)
        prev = step
    redacted = redact_steps[-1]
    return f"""
WITH src AS ({source_sql})
SELECT doc_id,
       {', '.join(count_cols)},
       {redacted} AS redacted,
       md5({redacted}) AS redacted_md5,
       CAST(length({redacted}) AS BIGINT) AS n_chars_redacted
FROM src
"""


# --------------------------------------------------------------------------
# Rule-based quality filter (Gopher/MassiveText-style keep/drop gates)
# --------------------------------------------------------------------------

#: Stopword slate for the natural-language gate. Counted by EXACT
#: token equality, not a ``\b``-anchored regex: Java's ``\b`` is
#: Unicode-aware even while its ``\w`` stays ASCII, RE2's is not, so
#: ``\b(the)\b`` diverges between engines on text like ``andétat``
#: (caught by tests/test_quality_filter_fuzz.py).
QF_STOPWORDS = ["the", "a", "of", "to", "and"]

#: Rule thresholds. All comparisons are integer-only (cross-multiplied
#: ratios), so every flag is bit-exact against the oracle.
QF_MIN_WORDS = 20
QF_MAX_WORDS = 80
QF_MIN_MEAN_WLEN = 2  # mean word length bounds (chars/word)
QF_MAX_MEAN_WLEN = 12
QF_MAX_SYMBOL_PER10 = 1  # symbols/word <= 1/10
QF_MIN_STOP_HITS = 2
QF_MIN_DISTINCT_PER2 = 1  # distinct/total >= 1/2


def quality_filter(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style rule gates with an overall ``keep`` decision.

    Per document: word count in range, mean word length in range,
    symbol-to-word ratio cap, minimum stopword hits (natural-language
    signal), minimum lexical diversity. Each gate is surfaced as its
    own 0/1 flag so the drop *reason* is queryable (the usual corpus
    triage: ``GROUP BY`` the flags to see what the filter is killing).

    One narrow projection — counts come from ``regexp_count`` /
    ``size(split(...))`` / an exact-token stopword filter, every ratio
    test is cross-multiplied into integer arithmetic (no float
    thresholds), no shuffle, no Python — so the pass costs one corpus
    scan at any scale.
    """
    toks = tokens(text_col)
    n_words = F.size(toks).cast("long")
    n_nonspace = F.length(
        F.regexp_replace(F.col(text_col), r"\s+", "")
    ).cast("long")
    n_symbols = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("long")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*QF_STOPWORDS))
    ).cast("long")
    n_distinct = F.size(F.array_distinct(toks)).cast("long")

    def flag(cond):
        return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")

    len_ok = flag(
        (n_words >= QF_MIN_WORDS) & (n_words <= QF_MAX_WORDS)
    ).alias("len_ok")
    mwl_ok = flag(
        (n_nonspace >= QF_MIN_MEAN_WLEN * n_words)
        & (n_nonspace <= QF_MAX_MEAN_WLEN * n_words)
    ).alias("mwl_ok")
    sym_ok = flag(n_symbols * 10 <= n_words * QF_MAX_SYMBOL_PER10).alias(
        "sym_ok"
    )
    stop_ok = flag(stop_hits >= QF_MIN_STOP_HITS).alias("stop_ok")
    div_ok = flag(n_distinct * 2 >= n_words * QF_MIN_DISTINCT_PER2).alias(
        "div_ok"
    )
    keep = (
        F.least(
            F.col("len_ok"),
            F.col("mwl_ok"),
            F.col("sym_ok"),
            F.col("stop_ok"),
            F.col("div_ok"),
        )
        .cast("long")
        .alias("keep")
    )
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_nonspace.alias("n_nonspace_chars"),
        n_symbols.alias("n_symbols"),
        stop_hits.alias("stop_hits"),
        n_distinct.alias("n_distinct_words"),
        len_ok,
        mwl_ok,
        sym_ok,
        stop_ok,
        div_ok,
    ).select("*", keep)


def quality_filter_oracle_sql(table: str = "documents") -> str:
    """DuckDB restatement of :func:`quality_filter`."""
    stop_in = ", ".join(f"'{w}'" for w in QF_STOPWORDS)
    toks = r"regexp_split_to_array(trim(text), '\s+')"
    return rf"""
WITH sig AS (
  SELECT doc_id,
         CAST(len({toks}) AS BIGINT) AS n_words,
         CAST(length(regexp_replace(text, '\s+', '', 'g')) AS BIGINT)
           AS n_nonspace_chars,
         CAST(len(regexp_extract_all(text, '[^\w\s]')) AS BIGINT) AS n_symbols,
         CAST(len(list_filter({toks}, x -> x IN ({stop_in}))) AS BIGINT)
           AS stop_hits,
         CAST(len(list_distinct({toks})) AS BIGINT) AS n_distinct_words
  FROM {table}
),
flags AS (
  SELECT *,
         CAST(CASE WHEN n_words >= {QF_MIN_WORDS}
                    AND n_words <= {QF_MAX_WORDS} THEN 1 ELSE 0 END AS BIGINT)
           AS len_ok,
         CAST(CASE WHEN n_nonspace_chars >= {QF_MIN_MEAN_WLEN} * n_words
                    AND n_nonspace_chars <= {QF_MAX_MEAN_WLEN} * n_words
              THEN 1 ELSE 0 END AS BIGINT) AS mwl_ok,
         CAST(CASE WHEN n_symbols * 10 <= n_words * {QF_MAX_SYMBOL_PER10}
              THEN 1 ELSE 0 END AS BIGINT) AS sym_ok,
         CAST(CASE WHEN stop_hits >= {QF_MIN_STOP_HITS} THEN 1 ELSE 0 END
              AS BIGINT) AS stop_ok,
         CAST(CASE WHEN n_distinct_words * 2 >= n_words * {QF_MIN_DISTINCT_PER2}
              THEN 1 ELSE 0 END AS BIGINT) AS div_ok
  FROM sig
)
SELECT *, CAST(least(len_ok, mwl_ok, sym_ok, stop_ok, div_ok) AS BIGINT) AS keep
FROM flags
"""


# --------------------------------------------------------------------------
# Repetition statistics (Gopher-style quality signals)
# --------------------------------------------------------------------------

def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals: the fraction of tokens taken by
    the most common token and by the most common bigram.

    The Gopher/MassiveText repetition rules filter documents whose mass
    concentrates in a few n-grams; this computes the top-1 signal for
    n=1 and n=2 exactly. Ties break to the lexically smallest n-gram so
    the winner is engine-independent.

    Shape: tokens posexplode once; bigrams come from a ``lead`` window
    over the same exploded rows (shuffle keyed by doc_id — uniform);
    each n-gram level is a doc-keyed count + top-1 window; three
    doc_id-keyed joins reassemble. Every shuffle in the plan hashes on
    doc_id or (doc_id, gram), both well distributed, so the plan is
    skew-free at any corpus size.
    """
    t = docs.select(
        F.col(id_col), F.posexplode(tokens(text_col)).alias("pos", "tok")
    )
    worder = Window.partitionBy(id_col).orderBy("pos")

    def top1(grams: DataFrame, col: str) -> DataFrame:
        counts = grams.groupBy(id_col, col).agg(F.count(F.lit(1)).alias("cnt"))
        w = Window.partitionBy(id_col).orderBy(F.desc("cnt"), F.asc(col))
        return (
            counts.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col(id_col),
                F.col(col).alias(f"top_{col}"),
                F.col("cnt").alias(f"top_{col}_n"),
            )
        )

    bigrams = (
        t.withColumn("nxt", F.lead("tok").over(worder))
        .filter(F.col("nxt").isNotNull())
        .select(
            F.col(id_col), F.concat(F.col("tok"), F.lit(" "), F.col("nxt")).alias("bigram")
        )
    )
    totals = docs.select(
        F.col(id_col), F.size(tokens(text_col)).cast("long").alias("n_tokens")
    )
    return (
        totals.join(top1(t, "tok"), id_col)
        .join(top1(bigrams, "bigram"), id_col)
        .select(
            id_col,
            "n_tokens",
            "top_tok",
            F.col("top_tok_n").alias("top_tok_n"),
            (F.col("top_tok_n").cast("double") / F.col("n_tokens")).alias(
                "top_tok_frac"
            ),
            "top_bigram",
            "top_bigram_n",
            (
                F.col("top_bigram_n").cast("double")
                / (F.col("n_tokens") - F.lit(1))
            ).alias("top_bigram_frac"),
        )
    )


def repetition_stats_oracle_sql(table: str = "documents") -> str:
    """DuckDB restatement of :func:`repetition_stats` (same whitespace
    tokenization; parallel ``unnest`` zips token with position)."""
    return rf"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS tok,
         unnest(generate_series(1, len(regexp_split_to_array(trim(text), '\s+')))) AS pos
  FROM {table}
),
totals AS (
  SELECT doc_id, CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
  FROM {table}
),
t1 AS (
  SELECT doc_id, tok AS top_tok, cnt AS top_tok_n FROM (
    SELECT doc_id, tok, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, tok ASC) AS rn
    FROM toks GROUP BY doc_id, tok) WHERE rn = 1
),
big AS (
  SELECT doc_id, tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
  FROM toks
),
t2 AS (
  SELECT doc_id, bigram AS top_bigram, cnt AS top_bigram_n FROM (
    SELECT doc_id, bigram, COUNT(*) AS cnt,
           ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY COUNT(*) DESC, bigram ASC) AS rn
    FROM big WHERE bigram IS NOT NULL GROUP BY doc_id, bigram) WHERE rn = 1
)
SELECT totals.doc_id, n_tokens,
       top_tok, top_tok_n,
       CAST(top_tok_n AS DOUBLE) / n_tokens AS top_tok_frac,
       top_bigram, top_bigram_n,
       CAST(top_bigram_n AS DOUBLE) / (n_tokens - 1) AS top_bigram_frac
FROM totals JOIN t1 USING (doc_id) JOIN t2 USING (doc_id)
"""


# --------------------------------------------------------------------------
# Stratified sampling
# --------------------------------------------------------------------------

def stratified_sample(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 100,
    id_col: str = "doc_id",
    seed: str = "strat-v1",
) -> DataFrame:
    """Deterministic per-stratum downsampling by id hash.

    ``keep iff md5_60bit(seed || ':' || id) % 100 < rate(stratum)`` —
    the language-rebalancing step of corpus preparation (keep 20% of
    the head language, all of the tail) as a pure filter: no sampling
    state, no shuffle, membership reproducible across runs, engines and
    re-partitions. Rates are integer percents for exact arithmetic.
    """
    bucket = F.pmod(
        md5_long(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))),
        F.lit(100),
    )
    rate = F.lit(default_rate)
    for k in sorted(rates):
        rate = F.when(F.col(strata_col) == k, F.lit(rates[k])).otherwise(rate)
    return docs.withColumn("sample_bucket", bucket.cast("long")).filter(
        bucket < rate
    )


def stratified_sample_oracle_sql(
    table: str,
    strata_col: str,
    rates: dict[str, int],
    default_rate: int = 100,
    id_col: str = "doc_id",
    seed: str = "strat-v1",
    select_cols: str = "*",
) -> str:
    """DuckDB restatement of :func:`stratified_sample`."""
    h = (
        f"(('0x' || substring(md5('{seed}:' || CAST({id_col} AS VARCHAR)), 1, 15))"
        "::BIGINT % 100)"
    )
    chain = " ".join(
        f"WHEN {strata_col} = '{k}' THEN {rates[k]}" for k in sorted(rates)
    )
    return f"""
SELECT {select_cols}, CAST({h} AS BIGINT) AS sample_bucket
FROM {table}
WHERE {h} < (CASE {chain} ELSE {default_rate} END)
"""


# --------------------------------------------------------------------------
# Sliding-window document chunking
# --------------------------------------------------------------------------

def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping fixed-token windows — the
    chunking stage of an embedding/RAG pipeline (window ``w`` covers
    tokens ``[w*step, w*step + chunk_tokens)`` with
    ``step = chunk_tokens - overlap``).

    Pure codegen: tokenize once, ``sequence`` the window starts,
    ``explode``, ``slice`` + ``concat_ws`` the window text. No Python,
    no shuffle; fan-out ≈ ``n_tokens/step`` rows per document. The
    trailing partial window is kept (standard practice — its tokens
    otherwise vanish from the index).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    step = chunk_tokens - overlap
    tk = tokens(text_col)
    base = docs.select(
        F.col(id_col), tk.alias("_tk"), F.size(tk).cast("long").alias("_n")
    )
    starts = F.sequence(
        F.lit(0).cast("long"), F.greatest(F.col("_n") - 1, F.lit(0).cast("long")), F.lit(step).cast("long")
    )
    ex = base.select(
        id_col, "_tk", "_n", F.explode(starts).alias("start_tok")
    ).filter(F.col("start_tok") < F.col("_n"))
    return ex.select(
        id_col,
        F.expr(f"start_tok div {step}").alias("chunk_id"),
        "start_tok",
        F.least(F.lit(chunk_tokens).cast("long"), F.col("_n") - F.col("start_tok")).alias(
            "n_chunk_tokens"
        ),
        F.concat_ws(
            " ", F.slice("_tk", F.col("start_tok") + 1, F.lit(chunk_tokens))
        ).alias("chunk_text"),
    )


def chunk_documents_oracle_sql(
    chunk_tokens: int = 64,
    overlap: int = 16,
    table: str = "documents",
) -> str:
    """DuckDB restatement of :func:`chunk_documents`."""
    step = chunk_tokens - overlap
    return rf"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk,
                  CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n
           FROM {table}),
s AS (SELECT doc_id, tk, n,
             unnest(generate_series(0, greatest(n - 1, 0), {step})) AS start_tok
      FROM t)
SELECT doc_id,
       CAST(start_tok // {step} AS BIGINT) AS chunk_id,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(least({chunk_tokens}, n - start_tok) AS BIGINT) AS n_chunk_tokens,
       array_to_string(tk[start_tok + 1 : start_tok + {chunk_tokens}], ' ') AS chunk_text
FROM s WHERE start_tok < n
"""


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

def decontaminate(
    docs: DataFrame,
    bench_ids: list[int],
    n: int = 3,
    min_shared: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag corpus documents that overlap a benchmark set: any document
    sharing ``>= min_shared`` distinct word ``n``-grams with a
    benchmark document, with the overlap size per (doc, benchmark)
    pair — the eval-leakage scrub every training corpus needs.

    Shape: the benchmark side is tiny by construction, so its shingle
    set broadcasts; the corpus pays one shingle pass and a broadcast
    hash join — no corpus self-join anywhere. Per-shingle fan-out is
    bounded by the benchmark size, and the count groupBy keys on the
    uniform (doc, bench) composite. Scales to any corpus size at fixed
    benchmark size.
    """
    from sressentials_spark.operators.dedup import shingle_rows

    ex = shingle_rows(docs, n=n, id_col=id_col, text_col=text_col)
    bench = ex.filter(F.col(id_col).isin(bench_ids)).select(
        F.col(id_col).alias("bench_id"), "g"
    )
    corpus = ex.filter(~F.col(id_col).isin(bench_ids))
    return (
        corpus.join(F.broadcast(bench), "g")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def decontaminate_oracle_sql(
    bench_ids: list[int],
    n: int = 3,
    min_shared: int = 2,
    table: str = "documents",
) -> str:
    """DuckDB restatement of :func:`decontaminate` (same tokenization
    and n-gram assembly as the Jaccard oracles)."""
    ids = ", ".join(map(str, bench_ids))
    return rf"""
WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS tk FROM {table}),
sh AS (SELECT doc_id,
              list_distinct(CASE WHEN len(tk) >= {n}
                THEN [array_to_string(tk[i:i+{n - 1}], ' ')
                      for i in generate_series(1, len(tk)-{n - 1})]
                ELSE []::VARCHAR[] END) AS s
       FROM t),
e AS (SELECT doc_id, unnest(s) AS g FROM sh),
b AS (SELECT doc_id AS bench_id, g FROM e WHERE doc_id IN ({ids})),
c AS (SELECT doc_id, g FROM e WHERE doc_id NOT IN ({ids}))
SELECT c.doc_id, b.bench_id, CAST(COUNT(*) AS BIGINT) AS n_shared
FROM c JOIN b USING (g)
GROUP BY c.doc_id, b.bench_id
HAVING COUNT(*) >= {min_shared}
"""


# --------------------------------------------------------------------------
# Token-budget sequence packing
# --------------------------------------------------------------------------

#: Seed for the deterministic doc-id → shard hash used by
#: :func:`pack_token_budget`'s composite partition key.
PACK_SHARD_SEED = "pack-v1"


def pack_token_budget(
    docs: DataFrame,
    budget: int = 2048,
    part_col: str = "lang",
    n_shards: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    seed: str = PACK_SHARD_SEED,
) -> DataFrame:
    """Assign documents to fixed-token-budget training chunks.

    Concatenate-and-chunk packing: within each partition, documents
    are laid end-to-end in doc-id order and a document belongs to the
    chunk where its first token lands — ``chunk_id =
    floor(start_offset / budget)`` with ``start_offset`` the exclusive
    running sum of BPE-ish token counts. Deterministic (id order,
    integer arithmetic) and restateable as one window SQL.

    Scale: the running sum is a window over the partition key, and the
    window serializes each partition through one task — so the key's
    cardinality IS the parallelism ceiling. ``part_col`` alone (a
    ~5-value language column) caps the job at ~5 tasks; pass
    ``n_shards`` to extend the key to ``(part_col, shard)`` with
    ``shard = md5_60bit(seed || ':' || id) % n_shards`` — a
    deterministic, engine-exact hash shard that bounds per-partition
    row counts while keeping membership reproducible across runs and
    repartitions. Chunks are then identified by ``(part_col, shard,
    chunk_id)``; each shard packs independently, which is the standard
    trade (training shards need locality, not a global order).
    """
    keys: list[str] = [part_col]
    d = docs.select(
        F.col(id_col),
        F.col(part_col),
        F.regexp_count(F.col(text_col), F.lit(BPE_TOKEN_PATTERN))
        .cast("long")
        .alias("n_tokens"),
    )
    if n_shards is not None:
        d = d.withColumn(
            "shard",
            F.pmod(
                md5_long(
                    F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string"))
                ),
                F.lit(n_shards),
            ).cast("long"),
        )
        keys.append("shard")
    w = (
        Window.partitionBy(*keys)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return d.select(
        id_col,
        *keys,
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / F.lit(budget)).alias("chunk_id"),
    )


def pack_token_budget_oracle_sql(
    budget: int = 2048,
    table: str = "documents",
    part_col: str = "lang",
    n_shards: int | None = None,
    seed: str = PACK_SHARD_SEED,
) -> str:
    """DuckDB restatement of :func:`pack_token_budget`."""
    shard_sel = ""
    keys = part_col
    if n_shards is not None:
        h = (
            f"(('0x' || substring(md5('{seed}:' || CAST(doc_id AS VARCHAR)), 1, 15))"
            f"::BIGINT % {n_shards})"
        )
        shard_sel = f", CAST({h} AS BIGINT) AS shard"
        keys = f"{part_col}, shard"
    return rf"""
WITH d AS (
  SELECT doc_id, {part_col}{shard_sel},
         CAST(len(regexp_extract_all(text, '{BPE_TOKEN_PATTERN}')) AS BIGINT) AS n_tokens
  FROM {table}
)
SELECT doc_id, {keys}, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY {keys} ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
         AS start_offset,
       CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (PARTITION BY {keys} ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / {budget}) AS BIGINT)
         AS chunk_id
FROM d
"""


# --------------------------------------------------------------------------
# Per-group fixed-size deterministic sample
# --------------------------------------------------------------------------

def group_sample_topn(
    docs: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
    seed: str = "gsamp-v1",
) -> DataFrame:
    """Exactly-``n``-per-group uniform sample, deterministic.

    The rate-based :func:`stratified_sample` keeps a PROPORTION per
    stratum; this keeps a fixed COUNT — the shape eval-set builders and
    per-language inspection dumps need. Rank within each group by the
    md5 of the seeded id (a reproducible uniform permutation — no
    sampling state, no ``rand()``), keep ranks ``<= n``. The window
    partitions on the group column: fine when group cardinality ≥
    cluster parallelism and per-group rows fit a task (languages here);
    for a heavy-head group key at 100 TB, pre-filter with a rate-based
    pass so the window sees a bounded slice per group.
    """
    hx = F.md5(
        F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")).cast("binary")
    )
    w = Window.partitionBy(group_col).orderBy(hx, F.col(id_col))
    return (
        docs.select(
            F.col(id_col), F.col(group_col), hx.alias("_hx")
        )
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n)
        .select(id_col, group_col, "sample_rank")
    )


def group_sample_topn_oracle_sql(
    group_col: str,
    n: int,
    table: str = "documents",
    id_col: str = "doc_id",
    seed: str = "gsamp-v1",
) -> str:
    """DuckDB restatement of :func:`group_sample_topn`."""
    return f"""
WITH r AS (
  SELECT {id_col}, {group_col},
         CAST(ROW_NUMBER() OVER (
           PARTITION BY {group_col}
           ORDER BY md5('{seed}:' || CAST({id_col} AS VARCHAR)), {id_col}
         ) AS BIGINT) AS sample_rank
  FROM {table})
SELECT {id_col}, {group_col}, sample_rank FROM r WHERE sample_rank <= {n}
"""


# --------------------------------------------------------------------------
# Span-level exact dedup (EXACTSUBSTR-lite)
# --------------------------------------------------------------------------

def span_exact_dedup_stats(
    docs: DataFrame,
    span_tokens: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document duplicated-span statistics: split every document
    into consecutive non-overlapping ``span_tokens``-word spans, keep
    the corpus-wide FIRST occurrence of each distinct span (total
    order ``(doc_id, start_tok)``), and report per document how many
    of its spans were already seen elsewhere.

    This is the span-granular exact dedup of Lee et al. 2021
    ("Deduplicating Training Data Makes Language Models Better",
    EXACTSUBSTR) in its practical bucketed form: document-level dedup
    (exact/MinHash, :mod:`.dedup`) misses boilerplate repeated INSIDE
    otherwise-distinct pages; span fingerprints catch it. Trailing
    partial spans participate like full ones (exact-match semantics
    are length-aware by construction).

    Scale shape: the chunker is pure codegen fan-out (no Python, no
    shuffle); the first-occurrence ranking windows over the span's
    md5 — a uniform 128-bit key, so the single shuffle is balanced at
    any corpus size — and the per-document rollup re-keys by
    ``doc_id``. A removal pass (reassemble text from surviving spans)
    is ``filter + concat_ws(collect_list)`` over the same frame.
    """
    spans = chunk_documents(
        docs, chunk_tokens=span_tokens, overlap=0,
        id_col=id_col, text_col=text_col,
    )
    w = Window.partitionBy(F.md5(F.col("chunk_text"))).orderBy(
        id_col, "start_tok"
    )
    ranked = spans.withColumn("_occ", F.row_number().over(w))
    dup = F.when(F.col("_occ") > 1, 1).otherwise(0)
    return (
        ranked.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(dup).alias("n_dup_spans"),
        )
        .select(
            id_col,
            "n_spans",
            "n_dup_spans",
            # Integer floor division on both engines (Spark `div`,
            # DuckDB `//`) — a double-divide-then-cast would truncate
            # in Spark but round in DuckDB.
            F.expr("(1000 * n_dup_spans) div n_spans").alias("dup_permille"),
        )
    )


def span_exact_dedup_oracle_sql(
    span_tokens: int = 8, table: str = "documents"
) -> str:
    """DuckDB restatement of :func:`span_exact_dedup_stats`."""
    return f"""
WITH ch AS ({chunk_documents_oracle_sql(span_tokens, 0, table)}),
r AS (SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY md5(chunk_text)
                                ORDER BY doc_id, start_tok) AS occ
      FROM ch)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       CAST((1000 * SUM(CASE WHEN occ > 1 THEN 1 ELSE 0 END))
            // COUNT(*) AS BIGINT) AS dup_permille
FROM r GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# DSIR-style hashed n-gram importance weights (Xie et al. 2023,
# "Data Selection for Language Models via Importance Resampling")
# --------------------------------------------------------------------------

#: Fixed-point scale for the per-term log-likelihood-ratio. One ln()
#: per DISTINCT vocabulary term is quantized to integer micronats;
#: everything downstream (per-document weight = sum of count * lr)
#: is then BIGINT-exact, so Spark and the DuckDB oracle agree
#: bit-for-bit despite the transcendental. (ln is evaluated on an
#: exact integer ratio in both engines; a cross-engine ULP difference
#: only matters if it straddles a 0.5-micronat rounding boundary —
#: per-term probability ~1e-10, and the corpus vocabulary is small
#: relative to that.)
DSIR_LR_SCALE = 10**6


def dsir_importance_weights(
    docs: DataFrame,
    target_source: str = "src0",
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-document importance weight for target-domain resampling.

    DSIR scores each raw document by how much more likely its features
    are under a target-domain bag-of-ngrams model than under the raw
    pool's: ``w(doc) = sum_f n(doc,f) * ln(p_target(f) / p_raw(f))``
    with Laplace-smoothed unigram probabilities. Documents with
    ``w > 0`` look more target-like than pool-like; resampling by ``w``
    shifts the pretraining mixture toward the target domain without
    hand-written rules.

    Engine-exact restatement: the per-term log-likelihood-ratio
    ``ln(((c_t+1) * (N_r+V)) / ((c_r+1) * (N_t+V)))`` is quantized
    once per distinct term to integer micronats
    (:data:`DSIR_LR_SCALE`); per-document weights are then pure BIGINT
    sums of ``count * lr_micro``.

    Scale shape: one map-side-combinable groupBy on term (vocabulary-
    sized result), a broadcast of the tiny scalar totals row, a
    broadcast hash join of the vocabulary dim against the (doc, term)
    fact, and one groupBy on doc_id (uniform key). No Python in the
    row path; at 100 TB the only large shuffles are keyed by term and
    doc_id. The smoothed-count products are computed in DOUBLE (IEEE
    multiply/divide are correctly rounded, hence engine-identical) to
    avoid BIGINT overflow at web-corpus counts.
    """
    tk = tokens(text_col)
    terms = docs.select(
        F.col(id_col),
        (F.col(source_col) == target_source).alias("is_target"),
        F.explode(tk).alias("term"),
    )
    corpus = terms.groupBy("term").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).cast("long").alias("c_t"),
        F.sum(F.when(F.col("is_target"), 0).otherwise(1)).cast("long").alias("c_r"),
    )
    totals = corpus.agg(
        F.sum("c_t").cast("long").alias("n_t"),
        F.sum("c_r").cast("long").alias("n_r"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    lr = corpus.crossJoin(F.broadcast(totals)).select(
        "term",
        F.round(
            F.ln(
                ((F.col("c_t") + 1).cast("double") * (F.col("n_r") + F.col("v")).cast("double"))
                / ((F.col("c_r") + 1).cast("double") * (F.col("n_t") + F.col("v")).cast("double"))
            )
            * F.lit(DSIR_LR_SCALE)
        )
        .cast("long")
        .alias("lr_micro"),
    )
    doc_term = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    weights = (
        doc_term.join(F.broadcast(lr), "term")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("n") * F.col("lr_micro")).cast("long").alias("weight_micro"),
            F.sum("n").cast("long").alias("n_tokens"),
        )
    )
    return (
        docs.select(id_col, F.col(source_col).alias("source"))
        .join(weights, id_col, "left")
        .select(
            id_col,
            "source",
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("weight_micro", F.lit(0).cast("long")).alias("weight_micro"),
            (F.coalesce("weight_micro", F.lit(0)) > 0).alias("target_like"),
        )
    )


def dsir_importance_weights_oracle_sql(
    target_source: str = "src0", table: str = "documents"
) -> str:
    """DuckDB restatement of :func:`dsir_importance_weights`."""
    return rf"""
WITH terms AS (
  SELECT doc_id, source = '{target_source}' AS is_target,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM {table}
),
corpus AS (
  SELECT term,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS c_t,
         CAST(SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS BIGINT) AS c_r
  FROM terms GROUP BY term
),
totals AS (
  SELECT CAST(SUM(c_t) AS BIGINT) AS n_t, CAST(SUM(c_r) AS BIGINT) AS n_r,
         CAST(COUNT(*) AS BIGINT) AS v
  FROM corpus
),
lr AS (
  SELECT term,
         CAST(round(ln((CAST(c_t + 1 AS DOUBLE) * CAST(n_r + v AS DOUBLE))
                       / (CAST(c_r + 1 AS DOUBLE) * CAST(n_t + v AS DOUBLE)))
                    * {DSIR_LR_SCALE}) AS BIGINT) AS lr_micro
  FROM corpus CROSS JOIN totals
),
doc_term AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS n
  FROM terms GROUP BY doc_id, term
),
w AS (
  SELECT doc_id,
         CAST(SUM(n * lr_micro) AS BIGINT) AS weight_micro,
         CAST(SUM(n) AS BIGINT) AS n_tokens
  FROM doc_term JOIN lr USING (term) GROUP BY doc_id
)
SELECT d.doc_id, d.source,
       COALESCE(w.n_tokens, 0) AS n_tokens,
       COALESCE(w.weight_micro, 0) AS weight_micro,
       COALESCE(w.weight_micro, 0) > 0 AS target_like
FROM {table} d LEFT JOIN w USING (doc_id)
"""


# --------------------------------------------------------------------------
# Unigram-LM log-loss (perplexity-proxy) quality filter (the CCNet /
# Wenzek et al. 2020 recipe, with a unigram model in place of KenLM)
# --------------------------------------------------------------------------

#: Keep threshold in micronats/token: documents whose average unigram
#: negative-log-likelihood exceeds the UNIFORM model's (ln V) read as
#: worse-than-random under the corpus LM — the classic garbage tail of
#: a perplexity histogram. ln(V) is computed per run from the observed
#: vocabulary size (micro-quantized, so the comparison is BIGINT vs
#: BIGINT).


def unigram_logloss(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document cross-entropy under a corpus-trained unigram LM —
    the perplexity-bucket signal CCNet uses to split a crawl into
    head/middle/tail quality tiers (there with a KenLM 5-gram; the
    unigram variant keeps the same pipeline shape and stays
    oracle-exact).

    Same fixed-point recipe as the DSIR weights: the per-term negative
    log-likelihood ``-ln((c(t)+1) / (N+V))`` is quantized once per
    DISTINCT term to integer micronats (:data:`DSIR_LR_SCALE`);
    per-document totals are then BIGINT dot products and the
    average is an integer floor division — bit-equal in both engines.

    Output: ``nll_micro_total`` (sum over tokens), ``n_tokens``,
    ``avg_nll_micro`` (micronats/token, floor), and ``keep`` (average
    at or below the uniform model's ``ln V`` — documents worse than
    random under the corpus LM are the garbage tail).

    Scale shape: identical to :func:`dsir_importance_weights` —
    vocabulary-sized aggregate + broadcast dim, term- and doc_id-keyed
    shuffles only, no Python in the row path.
    """
    tk = tokens(text_col)
    terms = docs.select(F.col(id_col), F.explode(tk).alias("term"))
    corpus = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = corpus.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    nll = corpus.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            -F.round(
                F.ln(
                    (F.col("c") + 1).cast("double")
                    / (F.col("n") + F.col("v")).cast("double")
                )
                * F.lit(DSIR_LR_SCALE)
            )
        )
        .cast("long")
        .alias("nll_micro"),
        F.round(F.ln(F.col("v").cast("double")) * F.lit(DSIR_LR_SCALE))
        .cast("long")
        .alias("uniform_nll_micro"),
    )
    doc_term = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    per_doc = (
        doc_term.join(F.broadcast(nll), "term")
        .groupBy(id_col)
        .agg(
            F.sum(F.col("cnt") * F.col("nll_micro")).cast("long").alias("nll_micro_total"),
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.max("uniform_nll_micro").alias("uniform_nll_micro"),
        )
    )
    avg = F.expr("nll_micro_total div n_tokens")
    return (
        docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("nll_micro_total", F.lit(0).cast("long")).alias("nll_micro_total"),
            F.coalesce(avg, F.lit(0).cast("long")).alias("avg_nll_micro"),
            (
                F.coalesce(avg, F.lit(0).cast("long"))
                <= F.coalesce("uniform_nll_micro", F.lit(0).cast("long"))
            ).alias("keep"),
        )
    )


def unigram_logloss_oracle_sql(table: str = "documents") -> str:
    """DuckDB restatement of :func:`unigram_logloss`."""
    return rf"""
WITH terms AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM {table}
),
corpus AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM terms GROUP BY term
),
totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM corpus
),
nll AS (
  SELECT term,
         -CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
                     * {DSIR_LR_SCALE}) AS BIGINT) AS nll_micro,
         CAST(round(ln(CAST(v AS DOUBLE)) * {DSIR_LR_SCALE}) AS BIGINT)
           AS uniform_nll_micro
  FROM corpus CROSS JOIN totals
),
doc_term AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM terms GROUP BY doc_id, term
),
per_doc AS (
  SELECT doc_id,
         CAST(SUM(cnt * nll_micro) AS BIGINT) AS nll_micro_total,
         CAST(SUM(cnt) AS BIGINT) AS n_tokens,
         MAX(uniform_nll_micro) AS uniform_nll_micro
  FROM doc_term JOIN nll USING (term) GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.nll_micro_total, 0) AS nll_micro_total,
       CAST(COALESCE(p.nll_micro_total // p.n_tokens, 0) AS BIGINT)
         AS avg_nll_micro,
       CAST(COALESCE(p.nll_micro_total // p.n_tokens, 0) AS BIGINT)
         <= COALESCE(p.uniform_nll_micro, 0) AS keep
FROM {table} d LEFT JOIN per_doc p USING (doc_id)
"""


def unigram_lm(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Train the corpus unigram LM as a TABLE: one row per vocabulary
    term with its micro-quantized NLL, plus the two model scalars
    every row carries (``unseen_nll_micro`` — the Laplace mass
    ``-ln(1/(N+V))`` for out-of-vocabulary terms at scoring time —
    and ``uniform_nll_micro = ln V``, the keep threshold). The
    persistable artifact a frozen-model serving tier broadcasts
    (vocabulary-sized; see streaming/lm_scoring.py)."""
    tk = tokens(text_col)
    terms = docs.select(F.col(id_col), F.explode(tk).alias("term"))
    corpus = terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    totals = corpus.agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("v"),
    )
    return corpus.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            -F.round(
                F.ln(
                    (F.col("c") + 1).cast("double")
                    / (F.col("n") + F.col("v")).cast("double")
                )
                * F.lit(DSIR_LR_SCALE)
            )
        )
        .cast("long")
        .alias("nll_micro"),
        F.round(
            F.ln((F.col("n") + F.col("v")).cast("double")) * F.lit(DSIR_LR_SCALE)
        )
        .cast("long")
        .alias("unseen_nll_micro"),
        F.round(F.ln(F.col("v").cast("double")) * F.lit(DSIR_LR_SCALE))
        .cast("long")
        .alias("uniform_nll_micro"),
    )


def score_unigram_logloss(
    docs: DataFrame,
    model: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score documents against a FROZEN unigram LM (see
    :func:`unigram_lm`): per-term NLL by broadcast dictionary lookup,
    out-of-vocabulary terms charged the model's Laplace unseen mass,
    keep = average at or below the model's uniform ``ln V``. Pure
    BIGINT downstream of the frozen model table, so batch and
    streaming scoring agree bit-for-bit."""
    scalars = model.select("unseen_nll_micro", "uniform_nll_micro").limit(1)
    tk = tokens(text_col)
    terms = docs.select(F.col(id_col), F.explode(tk).alias("term"))
    doc_term = terms.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    scored = (
        doc_term.join(F.broadcast(model.select("term", "nll_micro")), "term", "left")
        .crossJoin(F.broadcast(scalars))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.col("cnt") * F.coalesce("nll_micro", F.col("unseen_nll_micro"))
            )
            .cast("long")
            .alias("nll_micro_total"),
            F.sum("cnt").cast("long").alias("n_tokens"),
            F.max("uniform_nll_micro").alias("uniform_nll_micro"),
        )
    )
    avg = F.expr("nll_micro_total div n_tokens")
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
            F.coalesce("nll_micro_total", F.lit(0).cast("long")).alias(
                "nll_micro_total"
            ),
            F.coalesce(avg, F.lit(0).cast("long")).alias("avg_nll_micro"),
            (
                F.coalesce(avg, F.lit(0).cast("long"))
                <= F.coalesce("uniform_nll_micro", F.lit(0).cast("long"))
            ).alias("keep"),
        )
    )


def score_unigram_logloss_oracle_sql(
    train_where: str, test_where: str, table: str = "documents"
) -> str:
    """DuckDB restatement of frozen-model scoring: model trained on
    ``table WHERE train_where``, applied to ``table WHERE test_where``."""
    return rf"""
WITH train_terms AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM {table} WHERE {train_where}
),
corpus AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS c FROM train_terms GROUP BY term
),
totals AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM corpus
),
model AS (
  SELECT term,
         -CAST(round(ln(CAST(c + 1 AS DOUBLE) / CAST(n + v AS DOUBLE))
                     * {DSIR_LR_SCALE}) AS BIGINT) AS nll_micro,
         CAST(round(ln(CAST(n + v AS DOUBLE)) * {DSIR_LR_SCALE}) AS BIGINT)
           AS unseen_nll_micro,
         CAST(round(ln(CAST(v AS DOUBLE)) * {DSIR_LR_SCALE}) AS BIGINT)
           AS uniform_nll_micro
  FROM corpus CROSS JOIN totals
),
scal AS (SELECT DISTINCT unseen_nll_micro, uniform_nll_micro FROM model),
test_docs AS (SELECT doc_id, text FROM {table} WHERE {test_where}),
doc_term AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
  FROM test_docs
),
doc_term_n AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM doc_term GROUP BY doc_id, term
),
scored AS (
  SELECT d.doc_id,
         CAST(SUM(d.cnt * COALESCE(m.nll_micro, s.unseen_nll_micro)) AS BIGINT)
           AS nll_micro_total,
         CAST(SUM(d.cnt) AS BIGINT) AS n_tokens,
         MAX(s.uniform_nll_micro) AS uniform_nll_micro
  FROM doc_term_n d
  LEFT JOIN model m USING (term)
  CROSS JOIN scal s
  GROUP BY d.doc_id
)
SELECT t.doc_id,
       COALESCE(s.n_tokens, 0) AS n_tokens,
       COALESCE(s.nll_micro_total, 0) AS nll_micro_total,
       CAST(COALESCE(s.nll_micro_total // s.n_tokens, 0) AS BIGINT)
         AS avg_nll_micro,
       CAST(COALESCE(s.nll_micro_total // s.n_tokens, 0) AS BIGINT)
         <= COALESCE(s.uniform_nll_micro, 0) AS keep
FROM test_docs t LEFT JOIN scored s USING (doc_id)
"""


# --------------------------------------------------------------------------
# Paragraph-level boilerplate dedup (RefinedWeb-style)
# --------------------------------------------------------------------------

#: A paragraph repeated across this many distinct documents is
#: boilerplate (headers, footers, subscribe banners) and is dropped
#: from every document that carries it.
PARA_DEDUP_MIN_DOCS = 5


def paragraph_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_docs: int = PARA_DEDUP_MIN_DOCS,
) -> DataFrame:
    """RefinedWeb-style paragraph-level dedup: split each document on
    blank lines, count each distinct paragraph's document frequency,
    drop every paragraph appearing in >= ``min_docs`` distinct
    documents, and rebuild the text in original paragraph order —
    the most common missing stage of a real web-scale text pipeline
    (document-level dedup keeps the page; this removes the subscribe
    banner the page shares with a million others).

    Scale shape: one posexplode scan -> a (paragraph, doc-frequency)
    aggregate keyed by the paragraph value (hash-partitioned — never
    an all-pairs comparison) -> a LEFT ANTI join back on the same key
    -> a per-document ordered rebuild (sort_array over collected
    (idx, para) structs, never a window). Everything shuffles on
    content-hash keys, so the plan survives any corpus size; the
    boilerplate table itself is tiny (paragraphs repeated >= min_docs
    times), which is what makes the anti-join cheap.

    Output per document: ``n_paras``, ``n_removed``, ``clean_md5``
    (md5 of the rebuilt text; empty string when everything was
    boilerplate).
    """
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n\n")).alias(
            "para_idx", "para"
        ),
    )
    boiler = (
        paras.groupBy("para")
        .agg(F.countDistinct(id_col).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .select("para")
    )
    kept = paras.join(boiler, "para", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("para_idx", "para"))
                ),
                lambda x: x["para"],
            ),
            "\n\n",
        ).alias("clean_text"),
    )
    totals = paras.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_paras")
    )
    return (
        totals.join(rebuilt, id_col, "left")
        .select(
            id_col,
            "n_paras",
            (F.col("n_paras") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
            F.md5(
                F.coalesce("clean_text", F.lit("")).cast("binary")
            ).alias("clean_md5"),
        )
    )


def paragraph_dedup_oracle_sql(
    src_sql: str,
    *,
    id_col: str = "doc_id",
    text_expr: str = "text",
    min_docs: int = PARA_DEDUP_MIN_DOCS,
) -> str:
    """DuckDB restatement of :func:`paragraph_dedup` over a source CTE
    body ``src_sql`` exposing ``({id_col}, {text_expr})``."""
    sep = "chr(10) || chr(10)"
    return f"""
WITH src AS ({src_sql}),
split AS (
  SELECT {id_col}, string_split({text_expr}, {sep}) AS parts FROM src
),
paras AS (
  SELECT {id_col}, CAST(j - 1 AS BIGINT) AS para_idx, parts[j] AS para
  FROM split, LATERAL (SELECT unnest(generate_series(1, len(parts))) AS j) g
),
boiler AS (
  SELECT para FROM paras GROUP BY para
  HAVING COUNT(DISTINCT {id_col}) >= {min_docs}
),
kept AS (SELECT p.* FROM paras p ANTI JOIN boiler b ON p.para = b.para),
rebuilt AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(para, {sep} ORDER BY para_idx) AS clean_text
  FROM kept GROUP BY {id_col}
),
totals AS (
  SELECT {id_col}, CAST(COUNT(*) AS BIGINT) AS n_paras
  FROM paras GROUP BY {id_col}
)
SELECT t.{id_col}, t.n_paras,
       CAST(t.n_paras - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed,
       md5(COALESCE(r.clean_text, '')) AS clean_md5
FROM totals t LEFT JOIN rebuilt r USING ({id_col})
"""
