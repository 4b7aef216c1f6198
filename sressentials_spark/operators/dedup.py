"""Near-duplicate detection operators for training-data pipelines.

Four detectors over a ``documents``-shaped table, all pure column
expressions (whole-stage codegen; the only Python is plan assembly):

* **exact** — content-hash groupBy (:mod:`.text`);
* **n-gram Jaccard** — exact pairwise similarity via a shingle
  inverted-index join (optionally document-frequency-capped);
* **SimHash** — 48-bit signatures + banded Hamming-LSH candidate join;
* **MinHash + LSH** — banded minhash signatures for candidate
  generation, exact-Jaccard verification.

Every hash is derived from ``md5`` (``conv(substr(md5(x),1,15),16,10)``
→ the same 60-bit integer DuckDB computes with
``('0x'||substr(md5(x),1,15))::BIGINT``), so each operator's output is
bit-reproducible against a relational oracle — see
``sressentials_spark.catalog``.

Performance note: Spark's higher-order functions (``transform`` /
``aggregate`` / ``zip_with``) evaluate their lambdas per element in the
expression interpreter — they never enter whole-stage codegen. The
round-1 implementation built shingles and minhash signatures that way
and spent minutes in interpreted lambda frames at sf0.1. Everything
here is therefore expressed over *exploded rows* with plain codegen
expressions and map-side-combinable aggregates instead: shingling is
``posexplode`` + array indexing, minhash is 24 ``min()`` aggregate
buffers over one hashed-shingle table, simhash is a single ``sum()``
over an exploded (doc, bit) vote table, and Jaccard verification is a
relational intersection count — no arrays are carried through any
shuffle.

Scale notes (100 TB): the shingle join shuffles on the shingle string —
uniform for rare shingles but quadratic in document frequency for
common ones; production runs cap shingle DF (``max_df`` — drop shingles
appearing in > N docs; they contribute only to already-similar pairs)
and lean on MinHash-LSH, which replaces the all-pairs explosion with
``bands × (docs sharing a band bucket)``. Band buckets are themselves
capped (``max_bucket``) so a degenerate bucket (e.g. the empty-ish
document cluster) cannot go quadratic. All groupBys key on hashes or
(doc, shingle) composites → uniformly distributed shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sressentials_spark.operators.text import tokens

# Persisted-intermediate registry. The pair generators persist shared
# subplans (shingle tables, signatures, norm-annotated corpora) that
# must stay cached until the CALLER materializes the returned lazy
# frame — so the functions cannot unpersist them themselves. Tracking
# them here lets a long-lived session release every block between jobs
# (bench.py and scripts/driver_sim.py call :func:`release_persisted`
# between passes) instead of accumulating cached corpora per
# invocation.
_PERSISTED: list[DataFrame] = []


def _tracked_persist(df: DataFrame) -> DataFrame:
    out = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(out)
    return out


def release_persisted() -> int:
    """Unpersist every intermediate this module has cached; returns the
    number of frames released. Safe to call at any time AFTER the
    consuming queries have materialized (collect/write/count).
    Blocking on purpose: callers (bench pass boundaries, cache-hygiene
    tests) reason about the block store immediately after the call, and
    the default async unpersist leaves blocks visible for an
    arbitrary beat afterwards."""
    _ARTIFACTS.clear()
    n = 0
    while _PERSISTED:
        _PERSISTED.pop().unpersist(blocking=True)
        n += 1
    return n


# Session-level minhash artifact cache: (shingle rows, signatures) per
# corpus plan. The MinHash family (batch pairs + incremental ingest)
# shares these exactly — a real multi-query session computes them once,
# the way the log pipelines share one parsed sheet cache. Keyed by
# applicationId (a second session never sees dead plans) + the
# DataFrame's semantic hash; dropped by :func:`release_persisted`.
_ARTIFACTS: dict[tuple, object] = {}

#: Build/hit event log for the artifact caches, appended as
#: ``("build"|"hit", key_parts)``. bench.py reads it to LABEL
#: amortized queries — a query whose time partly measures "consume a
#: frame another query built this pass" is flagged in the output
#: instead of masquerading as an optimization (r12 VERDICT item 2).
#: Append-only within a process; readers track their own offsets.
ARTIFACT_EVENTS: list[tuple[str, tuple]] = []

#: Capacity covers one bench/oracle pass's live artifacts: minhash /
#: simhash / embedding-LSH intermediates, the three annotated-corpus
#: variants, k-means assignments, co-purchase edges, staged-replay
#: dirs, and the shared query materializations the recall evals reuse
#: (catalog._shared_query) — ~20 keys; 8 made the FIFO evict frames
#: still in use once query-sharing landed.
_ARTIFACTS_MAX = 32


def tracked_persist(df: DataFrame) -> DataFrame:
    """Public handle on the module's persisted-intermediate registry:
    persist ``df`` such that :func:`release_persisted` frees it."""
    return _tracked_persist(df)


def _evict_artifact(val: object) -> None:
    """Free an artifact evicted from the FIFO cache: unpersist every
    DataFrame it holds and drop it from the release registry, so a
    long session cycling more than ``_ARTIFACTS_MAX`` artifacts does
    not accumulate dead cached blocks until :func:`release_persisted`."""
    frames = val if isinstance(val, (tuple, list)) else (val,)
    for f in frames:
        if isinstance(f, DataFrame):
            try:
                f.unpersist(blocking=False)
            except Exception:  # context already gone — nothing to free
                pass
            _PERSISTED[:] = [p for p in _PERSISTED if p is not f]


def get_or_build_artifact(spark, key_parts: tuple, builder):
    """Generic session-level artifact cache (same registry and
    hygiene as the minhash artifacts): build once per
    (applicationId, ``key_parts``), reuse until
    :func:`release_persisted`. The builder should persist its frames
    via :func:`tracked_persist` so release actually frees the blocks.
    Used for shared derivations consumed by several catalog queries —
    e.g. the co-purchase edge list feeding the pairs/PageRank/triangle
    family — mirroring how a real multi-query session materializes a
    shared intermediate once."""
    try:
        key = (spark.sparkContext.applicationId,) + key_parts
    except Exception:  # no live context → build uncached
        return builder()
    if key in _ARTIFACTS:
        ARTIFACT_EVENTS.append(("hit", key_parts))
        return _ARTIFACTS[key]
    ARTIFACT_EVENTS.append(("build", key_parts))
    val = builder()
    while len(_ARTIFACTS) >= _ARTIFACTS_MAX:
        _evict_artifact(_ARTIFACTS.pop(next(iter(_ARTIFACTS))))
    _ARTIFACTS[key] = val
    return val


def _minhash_artifacts(
    docs: DataFrame, n: int, id_col: str
) -> tuple[DataFrame, DataFrame]:
    try:
        key = (
            docs.sparkSession.sparkContext.applicationId,
            docs.semanticHash(),
            n,
            id_col,
        )
    except Exception:  # semanticHash unavailable → build uncached
        key = None
    if key is not None and key in _ARTIFACTS:
        ARTIFACT_EVENTS.append(("hit", ("minhash", n, id_col)))
        return _ARTIFACTS[key]
    if key is not None:
        ARTIFACT_EVENTS.append(("build", ("minhash", n, id_col)))
    ex = _tracked_persist(shingle_rows(docs, n, id_col))
    sig = _tracked_persist(
        signatures_from_shingles(
            ex, id_col, extra_aggs=[F.count(F.lit(1)).alias("n_sh")]
        )
    )
    if key is not None:
        while len(_ARTIFACTS) >= _ARTIFACTS_MAX:
            _evict_artifact(_ARTIFACTS.pop(next(iter(_ARTIFACTS))))
        _ARTIFACTS[key] = (ex, sig)
    return ex, sig

#: 60-bit md5-derived integer hash (DuckDB-reproducible).
def md5_long(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c.cast("binary")), 1, 15), 16, 10).cast("long")


MERSENNE31 = 2147483647  # 2^31 - 1, modulus for minhash permutations

#: SimHash geometry: 48 signature bits, banded 4 × 12 for Hamming LSH.
SIMHASH_BITS = 48
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS

#: MinHash geometry: 24 hashes = 12 bands × 2 rows. With the exact-
#: Jaccard verification threshold at 0.8, the banded candidate recall
#: is ~1 - (1 - 0.8^2)^12 ≈ 1 - 2e-6 under the random-permutation
#: model; on the fixed testdata it is exhaustively verified against the
#: exact-join ground truth by tests/test_dedup.py.
MINHASH_HASHES = 24
MINHASH_BANDS = 12
MINHASH_ROWS = MINHASH_HASHES // MINHASH_BANDS

#: Default cap on LSH band-bucket size: a bucket with B members emits
#: B(B-1)/2 candidate pairs, so one degenerate bucket (boilerplate
#: documents, empty shingle sets hashing alike) can dominate the whole
#: job. Buckets above the cap are dropped from candidate generation;
#: genuine near-duplicate pairs inside an over-full bucket are still
#: found through their other (MINHASH_BANDS - 1) bands with
#: probability ~1-(1-J^rows)^(bands-1).
DEFAULT_MAX_BUCKET = 10_000


def minhash_params(num_hashes: int = MINHASH_HASHES) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for h_i(x) = (a*x + b) mod p."""
    return [
        ((i * 2654435761 + 104729) % MERSENNE31 or 1, (i * 97 + 1_000_003) % MERSENNE31)
        for i in range(1, num_hashes + 1)
    ]


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column.

    Array-valued convenience form (HOF-based, interpreted — fine for
    small/interactive use). The distributed operators below use
    :func:`shingle_rows` instead, which produces the same shingle set
    as codegen-friendly exploded rows.
    """
    t = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    )
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(F.array()))


def shingle_rows(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Distinct (id, shingle) rows — the exploded twin of :func:`shingles`.

    ``posexplode`` + direct array indexing keeps n-gram assembly inside
    whole-stage codegen (no per-element lambda interpretation); the
    ``distinct`` shuffles on the uniform (id, shingle) composite key.
    Documents with fewer than ``n`` tokens contribute no rows, matching
    the empty array from :func:`shingles`.
    """
    t = docs.select(F.col(id_col), tokens(text_col).alias("_tk"))
    pos = t.select(
        F.col(id_col),
        F.col("_tk"),
        F.posexplode("_tk").alias("_pos", "_tok"),
    ).filter(F.col("_pos") <= F.size("_tk") - n)
    gram = F.concat_ws(
        " ",
        F.col("_tok"),
        *[F.col("_tk")[F.col("_pos") + i] for i in range(1, n)],
    )
    return pos.select(F.col(id_col), gram.alias("g")).distinct()


def _pair_jaccard(ex: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """All-pairs exact Jaccard via inverted-index join on (id, g) rows."""
    sizes = ex.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    inter = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.g") == F.col("b.g"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("intersection_size"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "doc_a",
            "doc_b",
            "intersection_size",
            (F.col("n_a") + F.col("n_b") - F.col("intersection_size")).alias(
                "union_size"
            ),
            (
                F.col("intersection_size").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("intersection_size"))
            ).alias("jaccard"),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (``jaccard >= threshold``).

    ``max_df`` caps shingle document frequency: shingles occurring in
    more than ``max_df`` documents are removed from every document's
    shingle set *before* the pair join (both the intersection and the
    set sizes see the capped sets, so the result is exactly the Jaccard
    of the reduced sets). A shingle with document frequency B fans out
    into B(B-1)/2 join rows, so this bounds the otherwise-quadratic
    blowup from boilerplate n-grams; high-DF shingles carry almost no
    similarity signal (they connect everything to everything), so at a
    sane cap the >=threshold pair set is unchanged in practice —
    equivalence at the bench threshold is pinned by
    ``tests/test_dedup.py::test_jaccard_capped_equals_uncapped``.
    """
    ex = shingle_rows(docs, n, id_col)
    if max_df is not None:
        heavy = (
            ex.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .select("g")
        )
        ex = ex.join(F.broadcast(heavy), "g", "left_anti")
    # Three consumers (sizes + both sides of the inverted-index join;
    # four with the DF cap) and per-consumer pruning defeats exchange
    # reuse — persist the shingle table rather than re-tokenizing.
    ex = _tracked_persist(ex)
    return _pair_jaccard(ex, id_col).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """48-bit SimHash per document from token-frequency-weighted md5 bits.

    Each token votes ±1 per bit position; the signature takes the sign.
    Structured as explode-to-(id, bit, vote) with ONE ``sum`` buffer —
    round 1 used 48 separate ``sum()`` columns plus a 48-term signature
    fold, whose generated aggregate blew past JIT method limits and ran
    interpreted (283s at sf0.1). Both aggregates here are map-side
    combinable; the (id, bit) shuffle key is uniform by construction.
    """
    ex = docs.select(
        F.col(id_col), F.explode(tokens("text")).alias("tok")
    ).select(F.col(id_col), md5_long(F.col("tok")).alias("h"))
    bits = ex.select(
        F.col(id_col),
        F.col("h"),
        F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("bit"),
    ).select(
        F.col(id_col),
        F.col("bit"),
        (
            F.expr("shiftright(h, bit)").bitwiseAND(F.lit(1)) * 2 - 1
        ).cast("long").alias("vote"),
    )
    votes = bits.groupBy(id_col, "bit").agg(F.sum("vote").alias("v"))
    sig = votes.groupBy(id_col).agg(
        F.sum(
            F.when(
                F.col("v") > 0, F.expr("shiftleft(CAST(1 AS BIGINT), bit)")
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )
    return sig


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate pairs by banded Hamming LSH over SimHash.

    Candidates share at least one of the 4 12-bit bands (any pair
    within Hamming distance 3 is guaranteed caught; larger distances
    probabilistically); the exact ``bit_count(xor)`` filter then keeps
    pairs with distance <= ``max_hamming``.

    The per-doc signature table (id + one long) is persisted: it feeds
    both sides of the band self-join, and without the persist each side
    recomputes the full tokenize+explode+aggregate pipeline.
    """
    # Session-share the per-doc signature table (id + one long) the
    # same way the minhash shingle/signature artifacts are shared: the
    # recall eval re-derives this pair plan in the same pass, and the
    # signatures are the expensive shareable input — sharing the
    # VERIFIED pair table instead (r12) moved a persist-materialization
    # cost into the producer query (r12 VERDICT item 1).
    try:
        sem = docs.semanticHash()
    except Exception:  # semanticHash unavailable → build uncached
        sig = _tracked_persist(simhash_signatures(docs, id_col))
    else:
        sig = get_or_build_artifact(
            docs.sparkSession,
            ("simhash_sig", sem, id_col),
            lambda: _tracked_persist(simhash_signatures(docs, id_col)),
        )
    mask = (1 << SIMHASH_BAND_BITS) - 1
    bands = sig.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("simhash", i * SIMHASH_BAND_BITS)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for i in range(SIMHASH_BANDS)
                ]
            )
        ).alias("bv"),
    )
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
    return cand.select(
        "doc_a", "doc_b", ham.cast("int").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def signatures_from_shingles(
    ex: DataFrame, id_col: str = "doc_id", extra_aggs: list[Column] | None = None
) -> DataFrame:
    """Minhash signatures ``s1..s{k}`` from a prebuilt (id, g) shingle
    table — the shared core of :func:`minhash_signatures` and
    :func:`minhash_lsh_pairs` (which reuses one persisted shingle table
    across signature building and exact verification).

    One hashed-shingle projection, then a single groupBy with 24
    ``min()`` buffers — each buffer's update is three integer ops, all
    codegen, all map-side combinable. (Round 1 computed 24
    ``array_min(transform(...))`` lambdas per row: interpreted,
    per-element, and re-evaluating the shingle hash 24×.)
    ``extra_aggs`` lets a caller ride additional per-document buffers
    (e.g. the shingle-set size) on the same shuffle instead of paying a
    second aggregation over ``ex``.
    """
    hv = ex.select(
        F.col(id_col),
        F.pmod(md5_long(F.col("g")), F.lit(MERSENNE31)).alias("h"),
    )
    sigs = [
        F.min(
            F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(MERSENNE31))
        ).alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_params(), start=1)
    ]
    return hv.groupBy(id_col).agg(*sigs, *(extra_aggs or []))


def minhash_signatures(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document minhash signature columns ``s1..s{k}`` over shingles."""
    return signatures_from_shingles(shingle_rows(docs, n, id_col), id_col)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """MinHash-LSH candidate pairs verified with exact Jaccard.

    Signatures are banded (``MINHASH_BANDS`` bands × ``MINHASH_ROWS``
    rows); documents sharing any full band bucket become candidates —
    the at-scale replacement for the all-pairs shingle join — and only
    candidates pay the exact verification. Verification is relational:
    candidate pairs are intersected against the (id, shingle) table
    (two joins + one count), so no shingle arrays ever travel through
    a shuffle. Band buckets larger than ``max_bucket`` are dropped from
    candidate generation (see :data:`DEFAULT_MAX_BUCKET` for the recall
    argument).

    Materialization discipline (per-consumer column pruning defeats
    Spark's exchange reuse, so every extra consumer of an unpersisted
    plan is a full recompute):

    * the (id, shingle) table feeds three consumers (signature build
      and both sides of the intersection join) — persisted
      memory-and-disk so the tokenize+explode+distinct pipeline and its
      shuffle run once;
    * the per-document signature table (one row per doc, 24 ints — tiny)
      feeds five (both sides of the band join, the bucket-cap probe,
      and both size lookups) — persisted, and the shingle-set size
      rides the same groupBy as a 25th buffer instead of paying a
      second aggregation over the shingle table.
    """
    ex, sig = _minhash_artifacts(docs, n, id_col)

    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            *[
                F.col(f"s{bi * MINHASH_ROWS + r + 1}").alias(f"r{r}")
                for r in range(MINHASH_ROWS)
            ],
        )
        for bi in range(MINHASH_BANDS)
    ]
    # Candidates travel as bare id pairs — signatures and shingles never
    # ride through the band join/distinct.
    bands = sig.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bv"))
    if max_bucket is not None:
        over = (
            bands.groupBy("bv")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("bv")
        )
        bands = bands.join(F.broadcast(over), "bv", "left_anti")
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )

    # Relational exact-Jaccard verification over the shingle rows; set
    # sizes come from the persisted signature table (free 25th buffer).
    sizes = sig.select(id_col, "n_sh")
    inter = (
        cand.join(
            ex.select(F.col(id_col).alias("doc_a"), "g"), "doc_a"
        )
        .join(ex.select(F.col(id_col).alias("doc_b"), "g"), ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("intersection_size"))
    )
    return (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes.withColumnRenamed(id_col, "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .select(
            "doc_a",
            "doc_b",
            F.col("intersection_size").cast("long").alias("intersection_size"),
            (F.col("n_a") + F.col("n_b") - F.col("intersection_size"))
            .cast("long")
            .alias("union_size"),
            (
                F.col("intersection_size").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("intersection_size"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_incremental(
    docs: DataFrame,
    split_id: int,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Incremental-ingest near-dup triage: route each NEW document
    (``id >= split_id``) against the already-ingested history
    (``id < split_id``) and against earlier rows of its own batch.

    Output, one row per new document: ``n_hist_matches`` /
    ``n_batch_matches`` (verified-Jaccard ≥ ``threshold`` partners in
    history / earlier in the batch) and ``status`` —
    ``'dup_of_history'`` > ``'dup_in_batch'`` > ``'kept'``. "Earlier"
    means smaller id: the deterministic arrival order that makes the
    in-batch decision reproducible regardless of partitioning.

    This is the production ingest shape: candidate generation is the
    banded MinHash join *restricted to pairs whose larger side is a new
    document* — history×history pairs (the quadratic bulk a full-corpus
    dedup would re-pay on every ingest) never leave the band join,
    because the probe side of the join is pre-filtered to the new
    batch. At scale the history band table and shingle table are
    precomputed artifacts (see ``sinks.write_bucketed``) keyed by
    bucket/shingle, so an ingest only pays signatures for the batch
    plus bucket-local joins; here both sides derive from one corpus
    scan to stay self-contained. Verification stays relational (shingle
    intersection counts), and candidates travel as bare id pairs.
    """
    ex, sig = _minhash_artifacts(docs, n, id_col)

    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            *[
                F.col(f"s{bi * MINHASH_ROWS + r + 1}").alias(f"r{r}")
                for r in range(MINHASH_ROWS)
            ],
        )
        for bi in range(MINHASH_BANDS)
    ]
    bands = sig.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bv"))
    if max_bucket is not None:
        over = (
            bands.groupBy("bv")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select("bv")
        )
        bands = bands.join(F.broadcast(over), "bv", "left_anti")
    # Probe side = new batch only; build side = everything older than
    # the probe row. The history×history quadrant never materializes.
    new_bands = bands.filter(F.col(id_col) >= split_id)
    cand = (
        bands.alias("a")
        .join(
            new_bands.alias("b"),
            (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
        )
        .distinct()
    )

    sizes = sig.select(id_col, "n_sh")
    # doc_b is always a NEW document (the probe side was batch-filtered),
    # so the (doc_b, g) join and its size lookup scan only the batch
    # slice — no history shingles ride that shuffle.
    ex_b = ex.filter(F.col(id_col) >= split_id)
    sizes_b = sizes.filter(F.col(id_col) >= split_id)
    inter = (
        cand.join(ex.select(F.col(id_col).alias("doc_a"), "g"), "doc_a")
        .join(ex_b.select(F.col(id_col).alias("doc_b"), "g"), ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    verified = (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes_b.withColumnRenamed(id_col, "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .filter(
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= threshold
        )
        .select("doc_a", "doc_b")
    )

    per_doc = verified.groupBy(F.col("doc_b").alias(id_col)).agg(
        F.sum(F.when(F.col("doc_a") < split_id, 1).otherwise(0))
        .cast("long")
        .alias("n_hist_matches"),
        F.sum(F.when(F.col("doc_a") >= split_id, 1).otherwise(0))
        .cast("long")
        .alias("n_batch_matches"),
    )
    new_docs = docs.filter(F.col(id_col) >= split_id).select(id_col)
    return new_docs.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_hist_matches", F.lit(0)).cast("long").alias("n_hist_matches"),
        F.coalesce("n_batch_matches", F.lit(0)).cast("long").alias("n_batch_matches"),
        F.when(F.coalesce("n_hist_matches", F.lit(0)) > 0, F.lit("dup_of_history"))
        .when(F.coalesce("n_batch_matches", F.lit(0)) > 0, F.lit("dup_in_batch"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


# --------------------------------------------------------------------------
# Embedding cosine near-duplicates
# --------------------------------------------------------------------------

#: Embedding dimensionality of the testdata corpus. The dot-product
#: expressions are unrolled to this length so they stay inside
#: whole-stage codegen (Spark's array HOFs are interpreted per element
#: — round 1's fold cost ~3 ms per 64-dim dot product).
DEFAULT_DIM = 64


def _dot(a: Column, b: Column, dim: int = DEFAULT_DIM) -> Column:
    """Deterministic left-fold dot product, unrolled over ``dim`` elements.

    Left-associated ``0.0 + a[0]*b[0] + a[1]*b[1] + ...`` — the exact
    summation order of a sequential fold (and DuckDB's ``list_sum``),
    so results are bit-identical to the oracle, but the whole chain is
    one codegen'd arithmetic expression instead of an interpreted HOF.

    Both arrays must hold exactly ``dim`` elements: shorter input fails
    under ANSI ``element_at``, and a cheap ``size()`` guard turns the
    other mismatches — longer vectors (which an unguarded chain would
    silently truncate) and NULLs — into a loud ``raise_error`` naming
    the expected and actual lengths. Callers should go through
    :func:`sressentials_spark.operators.linalg.dot`, which dispatches
    dims above ``UNROLL_MAX_DIM`` to the Arrow kernel (identical
    values, constant plan size).
    """
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + (
            F.element_at(a, i + 1).cast("double")
            * F.element_at(b, i + 1).cast("double")
        )
    return F.when((F.size(a) == dim) & (F.size(b) == dim), acc).otherwise(
        F.raise_error(
            F.format_string(
                f"dot: expected {dim}-element vectors, got size(a)=%s size(b)=%s",
                F.size(a),
                F.size(b),
            )
        )
    )


def cosine(a: Column, b: Column, dim: int = DEFAULT_DIM) -> Column:
    from sressentials_spark.operators import linalg

    return linalg.dot(a, b, dim) / (F.sqrt(linalg.dot(a, a, dim)) * F.sqrt(linalg.dot(b, b, dim)))


def with_norm(
    emb: DataFrame, vec_col: str = "embedding", dim: int = DEFAULT_DIM
) -> DataFrame:
    """Attach the L2 norm once per vector (pairs then pay one dot each
    instead of three)."""
    from sressentials_spark.operators import linalg

    if dim > linalg.UNROLL_MAX_DIM:
        return emb.withColumn("norm", linalg.norm_arrow(F.col(vec_col)))
    return emb.withColumn("norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col), dim)))


def embedding_cosine_pairs(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """All-pairs embedding cosine near-duplicates (brute force).

    Quadratic by construction — the correctness baseline. The scale
    path buckets vectors first (see
    :mod:`sressentials_spark.operators.similarity`) so each join
    compares only within-bucket candidates.
    """
    n = with_norm(emb, dim=dim)
    a, b = n.alias("a"), n.alias("b")
    from sressentials_spark.operators import linalg

    cos = linalg.dot(F.col("a.embedding"), F.col("b.embedding"), dim) / (
        F.col("a.norm") * F.col("b.norm")
    )
    return (
        a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


#: Banded hyperplane-LSH layout for embedding near-dup candidates:
#: EMB_LSH_BANDS band tables of EMB_LSH_BAND_BITS sign bits each (128
#: planes total). A pair is a candidate if ALL bits of ANY band agree.
#: Sizing is the whole game: an unrelated pair (cosine ~ 0, per-bit
#: agreement 1/2) collides with a band w.p. 2^-band_bits, so the
#: expected candidate fraction of the n^2/2 pair space is
#: bands/2^band_bits = 16/256 ~ 6% — the knob that keeps the
#: verification join subquadratic (4-bit bands measured 40% of ALL
#: pairs as candidates at sf0.1: quadratic in disguise). For true
#: near-dups at cosine c the per-bit agreement is p = 1 - acos(c)/pi,
#: giving recall 1-(1-p^8)^16 ~ 0.40 at c = 0.45 — approximate by
#: design, like every banded LSH; the oracle restates the identical
#: bands so parity is exact, and emitted pairs are exactly verified.
EMB_LSH_BANDS = 16
EMB_LSH_BAND_BITS = 8


def embedding_near_dup_lsh(
    emb: DataFrame,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    dim: int = DEFAULT_DIM,
    bands: int = EMB_LSH_BANDS,
    band_bits: int = EMB_LSH_BAND_BITS,
) -> DataFrame:
    """Banded-LSH embedding near-dup pairs with exact cosine verify.

    The scale path replacing :func:`embedding_cosine_pairs` — the same
    shape as the MinHash pipeline (candidates from a bucketed
    equi-join, bare-id pairs, relational verification):

    1. one Arrow-kernel pass signs all ``bands*band_bits`` hyperplane
       projections into ``bands`` packed long band values per vector
       (:func:`sressentials_spark.operators.linalg.norm_bands_kernel` —
       signatures wider than 64 bits can't live in one long);
    2. the band array explodes to ``(id, band, val)`` rows;
    3. candidates come from a self-equi-join on ``(band, val)`` —
       shuffle keyed on band values, fan-in corpus/2^band_bits per
       band bucket — deduped as bare-id pairs;
    4. each candidate pair is verified with the exact fold cosine
       against the corpus (two hash joins), keeping only
       ``cosine >= threshold``.

    Candidate recall is < 1 by LSH design (see the band constants);
    every emitted pair is exactly verified, so precision is 1.
    """
    from sressentials_spark.operators import linalg

    # (id, band, val) rows are persisted: they feed both sides of the
    # candidate self-join, and each unpersisted side would re-run the
    # 128-projection Arrow kernel over the whole corpus.
    sig = emb.withColumn(
        "_nb", linalg.norm_bands_kernel(bands, band_bits)(F.col("embedding"))
    ).select(id_col, F.col("_nb.bands").alias("bands"))
    exploded = _tracked_persist(
        sig.select(id_col, F.posexplode("bands").alias("band", "val"))
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("vec_a"),
            F.col(f"b.{id_col}").alias("vec_b"),
        )
        .distinct()
    )
    # Persisted: the norm-annotated corpus feeds BOTH verification
    # joins (x and y sides); unpersisted, each side would re-run the
    # norm pass over the whole corpus (same treatment as the minhash
    # pipeline's shared subplans).
    n = _tracked_persist(
        with_norm(emb, dim=dim).select(
            F.col(id_col), F.col("embedding"), F.col("norm")
        )
    )
    cos = linalg.dot(F.col("x.embedding"), F.col("y.embedding"), dim) / (
        F.col("x.norm") * F.col("y.norm")
    )
    return (
        cand.join(n.alias("x"), F.col("vec_a") == F.col(f"x.{id_col}"))
        .join(n.alias("y"), F.col("vec_b") == F.col(f"y.{id_col}"))
        .select("vec_a", "vec_b", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_decontaminate(
    emb: DataFrame,
    is_benchmark: Column,
    threshold: float = 0.4,
    id_col: str = "vec_id",
    dim: int = DEFAULT_DIM,
    bands: int = EMB_LSH_BANDS,
    band_bits: int = EMB_LSH_BAND_BITS,
) -> DataFrame:
    """Embedding-space decontamination: corpus vectors too close to a
    held-out benchmark set.

    The n-gram decontaminator (curation.decontaminate) misses
    paraphrased leakage; this is its embedding-space complement — the
    second gate a training corpus passes before a benchmark score can
    be trusted. Same asymmetric shape as the incremental-ingest triage:
    the big side is the corpus, the small side the benchmark, and
    all-pairs never materializes:

    1. one Arrow pass signs the banded hyperplane signatures for ALL
       vectors (corpus + benchmark share the projection planes);
    2. candidates come from a (band, val) equi-join where the
       BENCHMARK side broadcasts — benchmark suites are thousands of
       rows, so the corpus band rows never shuffle;
    3. candidates are exactly re-scored with the fold cosine; hits
       aggregate per corpus vector.

    Returns ``(id_col, n_benchmark_hits, max_cosine)`` for flagged
    corpus vectors only — the drop list (or audit queue). Recall is
    bounded by LSH band collision (same constants and caveat as
    :func:`embedding_near_dup_lsh`); precision is 1 (exact verify).
    """
    from sressentials_spark.operators import linalg

    flagged = emb.withColumn("_bench", is_benchmark)
    sig = flagged.withColumn(
        "_nb", linalg.norm_bands_kernel(bands, band_bits)(F.col("embedding"))
    ).select(id_col, "_bench", F.col("_nb.bands").alias("bands"))
    exploded = _tracked_persist(
        sig.select(
            id_col, "_bench", F.posexplode("bands").alias("band", "val")
        )
    )
    corp = exploded.filter(~F.col("_bench")).select(
        F.col(id_col).alias("corpus_id"), "band", "val"
    )
    bench = exploded.filter(F.col("_bench")).select(
        F.col(id_col).alias("bench_id"), "band", "val"
    )
    cand = (
        corp.join(F.broadcast(bench), ["band", "val"])
        .select("corpus_id", "bench_id")
        .distinct()
    )
    n = _tracked_persist(
        with_norm(flagged, dim=dim).select(
            F.col(id_col), F.col("_bench"), F.col("embedding"), F.col("norm")
        )
    )
    cos = linalg.dot(F.col("x.embedding"), F.col("y.embedding"), dim) / (
        F.col("x.norm") * F.col("y.norm")
    )
    hits = (
        cand.join(
            n.filter(~F.col("_bench")).alias("x"),
            F.col("corpus_id") == F.col(f"x.{id_col}"),
        )
        .join(
            F.broadcast(n.filter(F.col("_bench")).alias("y")),
            F.col("bench_id") == F.col(f"y.{id_col}"),
        )
        .select("corpus_id", "bench_id", cos.alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return (
        hits.groupBy("corpus_id")
        .agg(
            F.count(F.lit(1)).alias("n_benchmark_hits"),
            F.max("cosine").alias("max_cosine"),
        )
        .select(
            F.col("corpus_id").alias(id_col), "n_benchmark_hits", "max_cosine"
        )
    )


#: SemDeDup quantization grid. Coarser than the k-means grid (2^20) on
#: purpose: the duplicate test squares the dot product, so the grid
#: must keep ``q^2 * dot^2`` inside int64 — at 2^10, components are
#: <= ~512, ``dot <= dim * 512^2 ~ 2^24``, and the cross-multiplied
#: comparison peaks near 2^53. Quantization error (~1e-3 per
#: component) is noise against a 0.4 cosine threshold, and both
#: engines quantize identically so the DECISION is bit-reproducible.
SEMDEDUP_SCALE = 1 << 10

#: Cosine threshold as a rational p/q so the >= test is exact integer
#: cross-multiplication (no float compare to drift between engines).
#: 2/5 = 0.4 — same operating point as embedding_near_dup_lsh.
SEMDEDUP_COS = (2, 5)


def semantic_dedup(
    emb: DataFrame,
    assignments: DataFrame,
    threshold: tuple[int, int] = SEMDEDUP_COS,
    scale: int = SEMDEDUP_SCALE,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: cluster-bounded semantic deduplication (Abbas et al.
    2023, arXiv:2303.09540) — the third embedding-dedup strategy next
    to banded LSH (probabilistic candidates) and connected components
    (transitive groups).

    Pairwise cosine over a web-scale corpus is quadratic; SemDeDup's
    observation is that near-duplicates land in the same k-means
    cluster, so it suffices to compare WITHIN clusters. With K scaled
    proportionally to corpus size (the paper runs ~110k clusters over
    LAION-440M) expected cluster size — and therefore per-cluster pair
    work — stays CONSTANT, making total work O(N * avg_cluster_size):
    the clustering is the candidate generator. Each vector is kept iff
    no LOWER-id member of its cluster sits within the cosine
    threshold (lowest-id representative — a total order, so the
    keep/drop decision is unique and hash-gate stable).

    Exactness: vectors are quantized to the ``scale`` grid once, and
    the threshold test is integer cross-multiplication —
    ``dot > 0 AND q^2*dot^2 >= p^2*|a|^2*|b|^2`` for cosine >= p/q —
    so engine and DuckDB oracle agree bit-for-bit (zero-norm vectors
    are never duplicates). Dots run through the exact int64 Arrow
    kernel (linalg.int_dot_arrow), one batch per join partition.

    Scale shape: one Arrow pass for (q, |q|^2); the self-join
    shuffles each side ONCE on the uniform cluster key and never
    leaves its cluster; output aggregates per vector. Skew guard at
    100 TB: an oversized cluster is sub-split by re-clustering its
    members (the paper's K keeps clusters ~4k vectors) — pair work is
    bounded by design, not by hope.

    Returns ``(id_col, cluster, status 'kept'|'semantic_dup',
    dup_of, n_prior_matches)``; ``dup_of`` is -1 for kept rows (not
    NULL — keeps the column int64 through both engines' pandas
    bridges).
    """
    from sressentials_spark.operators import linalg
    from sressentials_spark.operators.cluster import quantize_vec

    p, q = threshold
    qv = emb.select(
        F.col(id_col), quantize_vec(vec_col, scale).alias("qv")
    ).withColumn("n2", linalg.int_dot_arrow(F.col("qv"), F.col("qv")))
    members = _tracked_persist(
        assignments.select(id_col, "cluster").join(qv, id_col)
    )
    a = members.select(
        F.col(id_col).alias("prior_id"),
        F.col("cluster").alias("a_cluster"),
        F.col("qv").alias("aq"),
        F.col("n2").alias("an2"),
    )
    b = members.select(
        F.col(id_col).alias("cand_id"),
        F.col("cluster").alias("b_cluster"),
        F.col("qv").alias("bq"),
        F.col("n2").alias("bn2"),
    )
    hits = (
        a.join(
            b,
            (F.col("a_cluster") == F.col("b_cluster"))
            & (F.col("prior_id") < F.col("cand_id")),
        )
        .withColumn("dot", linalg.int_dot_arrow(F.col("aq"), F.col("bq")))
        .filter(
            (F.col("an2") > 0)
            & (F.col("bn2") > 0)
            & (F.col("dot") > 0)
            & (
                F.lit(q * q) * F.col("dot") * F.col("dot")
                >= F.lit(p * p) * F.col("an2") * F.col("bn2")
            )
        )
    )
    agg = hits.groupBy(F.col("cand_id").alias(id_col)).agg(
        F.min("prior_id").alias("dup_of_raw"),
        F.count(F.lit(1)).alias("n_matches_raw"),
    )
    return (
        members.select(id_col, "cluster")
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.col("cluster").cast("long").alias("cluster"),
            F.when(F.col("dup_of_raw").isNull(), F.lit("kept"))
            .otherwise(F.lit("semantic_dup"))
            .alias("status"),
            F.coalesce(F.col("dup_of_raw"), F.lit(-1))
            .cast("long")
            .alias("dup_of"),
            F.coalesce(F.col("n_matches_raw"), F.lit(0))
            .cast("long")
            .alias("n_prior_matches"),
        )
    )


# --------------------------------------------------------------------------
# Persisted dedup index (the 100 TB ingest shape, materialized)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class DedupIndexTables:
    """Names of the bucketed session-catalog tables making up a
    persisted MinHash dedup index (see :func:`build_dedup_index`)."""

    shingles: str    # (id, g)               bucketed+sorted on id
    signatures: str  # (id, s1..s24, n_sh)   bucketed+sorted on id
    bands: str       # (id, band, r0, r1)    bucketed+sorted on (band, r0, r1)


def band_rows_flat(sig: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Flatten a signature table to one (id, band, r0, r1) row per
    band — the band join's native key layout, and (unlike a struct
    column) directly bucketable by ``write_bucketed``."""
    band_structs = [
        F.struct(
            F.lit(bi).alias("band"),
            *[
                F.col(f"s{bi * MINHASH_ROWS + r + 1}").alias(f"r{r}")
                for r in range(MINHASH_ROWS)
            ],
        )
        for bi in range(MINHASH_BANDS)
    ]
    return sig.select(
        F.col(id_col), F.explode(F.array(*band_structs)).alias("bv")
    ).select(
        id_col,
        F.col("bv.band").alias("band"),
        *[F.col(f"bv.r{r}").alias(f"r{r}") for r in range(MINHASH_ROWS)],
    )


def build_dedup_index(
    docs: DataFrame,
    base_path: str,
    table_prefix: str,
    n: int = 3,
    id_col: str = "doc_id",
    num_buckets: int = 8,
) -> DedupIndexTables:
    """Materialize the MinHash dedup index over an ingested corpus as
    three BUCKETED parquet tables (``sinks.write_bucketed``):

    * shingles ``(id, g)`` bucketed on ``id`` — the exact-verification
      side;
    * signatures ``(id, s1..s24, n_sh)`` bucketed on ``id`` — set
      sizes for Jaccard;
    * bands ``(id, band, r0, r1)`` bucketed AND sorted on
      ``(band, r0, r1)`` — the LSH candidate join's build side.

    This is the artifact the incremental-ingest story rides at 100 TB:
    the history's shingling/signature cost is paid ONCE at index-build
    time; every subsequent ingest batch joins against these tables
    with ZERO shuffle on the history side (the band join's history
    input is already hash-distributed on the join key — pinned by
    tests/test_sinks.py), so ingest cost scales with the batch, not
    the corpus. Size ``num_buckets ≈ band_table_bytes / 256 MB`` at the
    target scale.
    """
    from sressentials_spark import sinks

    ex = shingle_rows(docs, n, id_col).persist(StorageLevel.MEMORY_AND_DISK)
    sig = signatures_from_shingles(
        ex, id_col, extra_aggs=[F.count(F.lit(1)).alias("n_sh")]
    ).persist(StorageLevel.MEMORY_AND_DISK)
    t = DedupIndexTables(
        shingles=f"{table_prefix}_shingles",
        signatures=f"{table_prefix}_signatures",
        bands=f"{table_prefix}_bands",
    )
    try:
        sinks.write_bucketed(
            ex, t.shingles, f"{base_path}/shingles", [id_col], num_buckets
        )
        sinks.write_bucketed(
            sig, t.signatures, f"{base_path}/signatures", [id_col], num_buckets
        )
        sinks.write_bucketed(
            band_rows_flat(sig, id_col),
            t.bands,
            f"{base_path}/bands",
            ["band", "r0", "r1"],
            num_buckets,
        )
    finally:
        ex.unpersist()
        sig.unpersist()
    return t


# Disk-backed artifact registry: table-name handles for indexes already
# built this session. Deliberately NOT cleared by release_persisted():
# a persisted index's entire point is durability across queries/passes
# (reuse costs a catalog lookup; no executor blocks are held). Keyed by
# applicationId so a new session never trusts another session's
# catalog registrations.
_DISK_ARTIFACTS: dict[tuple, object] = {}


def get_or_build_disk_artifact(spark, key_parts: tuple, builder):
    """Build-once handle cache for disk-backed artifacts (bucketed
    index tables). Unlike :func:`get_or_build_artifact` this survives
    :func:`release_persisted` — the artifact lives in the warehouse,
    not the block store."""
    try:
        key = (spark.sparkContext.applicationId,) + key_parts
    except Exception:  # no live context → build uncached
        return builder()
    if key not in _DISK_ARTIFACTS:
        ARTIFACT_EVENTS.append(("build", key_parts))
        _DISK_ARTIFACTS[key] = builder()
    else:
        ARTIFACT_EVENTS.append(("hit", key_parts))
    return _DISK_ARTIFACTS[key]


def minhash_incremental_from_index(
    spark,
    batch_docs: DataFrame,
    index: DedupIndexTables,
    split_id: int,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """:func:`minhash_incremental`, but the history side LOADS the
    persisted bucketed index instead of recomputing shingles and
    signatures from the corpus — the production ingest shape promised
    by the index docstring. Per-batch cost: shingle + signature the
    BATCH only, one bucket-aligned band join (history side shuffle-free
    — its table is pre-hashed on the band key), and relational
    verification whose history shingles stream from the bucketed
    table. Semantics are identical to :func:`minhash_incremental` on
    ``history ∪ batch`` (same banding, same bucket cap over the
    combined band population, same exact-Jaccard verification);
    ``batch_docs`` must hold exactly the ids ``>= split_id``.
    """
    from sressentials_spark import sinks

    hist_ex = sinks.read_bucketed(spark, index.shingles)
    hist_sig = sinks.read_bucketed(spark, index.signatures)
    hist_bands = sinks.read_bucketed(spark, index.bands)

    batch_ex = _tracked_persist(shingle_rows(batch_docs, n, id_col))
    batch_sig = _tracked_persist(
        signatures_from_shingles(
            batch_ex, id_col, extra_aggs=[F.count(F.lit(1)).alias("n_sh")]
        )
    )
    batch_bands = band_rows_flat(batch_sig, id_col)

    keys = ["band"] + [f"r{r}" for r in range(MINHASH_ROWS)]
    if max_bucket is not None:
        over = (
            hist_bands.select(*keys)
            .unionByName(batch_bands.select(*keys))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select(*keys)
        )
        # broadcast anti-joins preserve the history side's bucket
        # distribution (no exchange is inserted above the bucketed scan)
        hist_bands = hist_bands.join(F.broadcast(over), keys, "left_anti")
        batch_bands = batch_bands.join(F.broadcast(over), keys, "left_anti")

    ha = hist_bands.select(*keys, F.col(id_col).alias("doc_a"))
    bb = batch_bands.select(*keys, F.col(id_col).alias("doc_b"))
    # history×batch: every history id < split_id <= every batch id, so
    # the usual a.id < b.id predicate is implied by construction.
    hist_cand = ha.join(bb, keys).select("doc_a", "doc_b")
    ba = batch_bands.select(*keys, F.col(id_col).alias("doc_a"))
    batch_cand = (
        ba.join(bb, keys)
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
    )
    cand = hist_cand.unionByName(batch_cand).distinct()

    # doc_a may be history or batch (union); doc_b is ALWAYS a batch
    # document, so its shingle join and size lookup touch only the
    # batch-side frames — the history shingle table is scanned once
    # (doc_a side), not twice.
    ex_all = hist_ex.unionByName(batch_ex)
    sizes = hist_sig.select(id_col, "n_sh").unionByName(
        batch_sig.select(id_col, "n_sh")
    )
    sizes_b = batch_sig.select(id_col, "n_sh")
    inter = (
        cand.join(ex_all.select(F.col(id_col).alias("doc_a"), "g"), "doc_a")
        .join(batch_ex.select(F.col(id_col).alias("doc_b"), "g"), ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    verified = (
        inter.join(sizes.withColumnRenamed(id_col, "doc_a"), "doc_a")
        .withColumnRenamed("n_sh", "n_a")
        .join(sizes_b.withColumnRenamed(id_col, "doc_b"), "doc_b")
        .withColumnRenamed("n_sh", "n_b")
        .filter(
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= threshold
        )
        .select("doc_a", "doc_b")
    )
    per_doc = verified.groupBy(F.col("doc_b").alias(id_col)).agg(
        F.sum(F.when(F.col("doc_a") < split_id, 1).otherwise(0))
        .cast("long")
        .alias("n_hist_matches"),
        F.sum(F.when(F.col("doc_a") >= split_id, 1).otherwise(0))
        .cast("long")
        .alias("n_batch_matches"),
    )
    new_docs = batch_docs.select(id_col)
    return new_docs.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_hist_matches", F.lit(0)).cast("long").alias("n_hist_matches"),
        F.coalesce("n_batch_matches", F.lit(0)).cast("long").alias("n_batch_matches"),
        F.when(F.coalesce("n_hist_matches", F.lit(0)) > 0, F.lit("dup_of_history"))
        .when(F.coalesce("n_batch_matches", F.lit(0)) > 0, F.lit("dup_in_batch"))
        .otherwise(F.lit("kept"))
        .alias("status"),
    )


def minhash_history_triage(
    spark,
    batch_docs: DataFrame,
    index: DedupIndexTables,
    split_id: int,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
    max_bucket: int | None = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """History-only triage of an arriving batch against the persisted
    index: ``dup_of_history`` / ``kept`` per new document, with NO
    batch-internal quadrant.

    This is the synchronous-at-ingest half of the production dedup
    story (the streaming ``foreachBatch`` consumer calls this per
    micro-batch): each document's verdict depends only on (document,
    index), so it is BATCHING-INVARIANT — the union of verdicts over
    any partitioning of the arrivals equals the one-shot triage of the
    whole split, which is what lets the streaming twin share the
    one-shot's exact-Jaccard oracle. New-vs-new duplicates within the
    arrival window are deliberately out of scope here; they belong to
    the periodic batch compaction (:func:`minhash_incremental_from_index`
    covers that quadrant).

    Same banding and exact-Jaccard verification as the one-shot; the
    bucket cap sees history ∪ current batch, and because smaller
    batches only make buckets colder, per-micro-batch capping never
    drops a candidate the one-shot would keep (precision is exact
    either way).
    """
    from sressentials_spark import sinks

    hist_ex = sinks.read_bucketed(spark, index.shingles)
    hist_sig = sinks.read_bucketed(spark, index.signatures)
    hist_bands = sinks.read_bucketed(spark, index.bands)

    batch_ex = _tracked_persist(shingle_rows(batch_docs, n, id_col))
    batch_sig = _tracked_persist(
        signatures_from_shingles(
            batch_ex, id_col, extra_aggs=[F.count(F.lit(1)).alias("n_sh")]
        )
    )
    batch_bands = band_rows_flat(batch_sig, id_col)

    keys = ["band"] + [f"r{r}" for r in range(MINHASH_ROWS)]
    if max_bucket is not None:
        over = (
            hist_bands.select(*keys)
            .unionByName(batch_bands.select(*keys))
            .groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_bucket)
            .select(*keys)
        )
        hist_bands = hist_bands.join(F.broadcast(over), keys, "left_anti")
        batch_bands = batch_bands.join(F.broadcast(over), keys, "left_anti")

    ha = hist_bands.select(*keys, F.col(id_col).alias("doc_a"))
    bb = batch_bands.select(*keys, F.col(id_col).alias("doc_b"))
    cand = ha.join(bb, keys).select("doc_a", "doc_b").distinct()

    inter = (
        cand.join(hist_ex.select(F.col(id_col).alias("doc_a"), "g"), "doc_a")
        .join(batch_ex.select(F.col(id_col).alias("doc_b"), "g"), ["doc_b", "g"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    verified = (
        inter.join(
            hist_sig.select(F.col(id_col).alias("doc_a"), "n_sh"), "doc_a"
        )
        .withColumnRenamed("n_sh", "n_a")
        .join(
            batch_sig.select(F.col(id_col).alias("doc_b"), "n_sh"), "doc_b"
        )
        .withColumnRenamed("n_sh", "n_b")
        .filter(
            F.col("inter").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("inter"))
            >= threshold
        )
        .select("doc_a", "doc_b")
    )
    per_doc = verified.groupBy(F.col("doc_b").alias(id_col)).agg(
        F.count(F.lit(1)).cast("long").alias("n_hist_matches")
    )
    return batch_docs.select(id_col).join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce("n_hist_matches", F.lit(0)).cast("long").alias(
            "n_hist_matches"
        ),
        F.when(F.coalesce("n_hist_matches", F.lit(0)) > 0, "dup_of_history")
        .otherwise("kept")
        .alias("status"),
    )
