"""Near-duplicate detection operators for training-data pipelines.

Four detectors over a ``documents``-shaped table, all pure column
expressions (whole-stage codegen; the only Python is plan assembly):

* **exact** — content-hash groupBy (:mod:`.text`);
* **n-gram Jaccard** — exact pairwise similarity via a shingle
  inverted-index join;
* **SimHash** — 48-bit signatures + banded Hamming-LSH candidate join;
* **MinHash + LSH** — banded minhash signatures for candidate
  generation, exact-Jaccard verification.

Every hash is derived from ``md5`` (``conv(substr(md5(x),1,15),16,10)``
→ the same 60-bit integer DuckDB computes with
``('0x'||substr(md5(x),1,15))::BIGINT``), so each operator's output is
bit-reproducible against a relational oracle — see
``sressentials_spark.catalog``.

Scale notes (100 TB): the shingle join shuffles on the shingle string —
uniform for rare shingles but quadratic in document frequency for
common ones; production runs cap shingle DF (drop shingles appearing
in > N docs — they contribute only to already-similar pairs) and lean
on MinHash-LSH, which replaces the all-pairs explosion with
``bands × (docs sharing a band bucket)``. SimHash bands behave the
same way. All groupBys key on hashes → uniformly distributed shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sressentials_spark.operators.text import tokens

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


def minhash_params(num_hashes: int = MINHASH_HASHES) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for h_i(x) = (a*x + b) mod p."""
    return [
        ((i * 2654435761 + 104729) % MERSENNE31 or 1, (i * 97 + 1_000_003) % MERSENNE31)
        for i in range(1, num_hashes + 1)
    ]


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (space-joined token windows)."""
    t = tokens(text_col)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(t) - n),
        lambda i: F.concat_ws(" ", F.slice(t, i + 1, n)),
    )
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(F.array()))


def _pair_jaccard(
    base: DataFrame, id_col: str = "doc_id", sh_col: str = "sh"
) -> DataFrame:
    """All-pairs exact Jaccard via inverted-index join on shingles."""
    sizes = base.select(F.col(id_col), F.size(sh_col).alias("n_sh"))
    ex = base.select(F.col(id_col), F.explode(sh_col).alias("g"))
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
    docs: DataFrame, n: int = 3, threshold: float = 0.2, id_col: str = "doc_id"
) -> DataFrame:
    """Exact n-gram Jaccard near-duplicate pairs (``jaccard >= threshold``)."""
    base = docs.select(F.col(id_col), shingles("text", n).alias("sh"))
    return _pair_jaccard(base, id_col).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def simhash_signatures(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """48-bit SimHash per document from token-frequency-weighted md5 bits.

    One explode + one hash-keyed groupBy (map-side combinable): each
    token votes ±1 per bit position, the signature takes the sign.
    """
    ex = docs.select(
        F.col(id_col), F.explode(tokens("text")).alias("tok")
    ).withColumn("h", md5_long(F.col("tok")))
    votes = [
        F.sum(
            (F.shiftright("h", b).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
        ).alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = ex.groupBy(id_col).agg(*votes)
    sig = None
    for b in range(SIMHASH_BITS):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return agg.select(F.col(id_col), sig.alias("simhash"))


def simhash_pairs(
    docs: DataFrame, max_hamming: int = 8, id_col: str = "doc_id"
) -> DataFrame:
    """Near-duplicate pairs by banded Hamming LSH over SimHash.

    Candidates share at least one of the 4 12-bit bands (any pair
    within Hamming distance 3 is guaranteed caught; larger distances
    probabilistically); the exact ``bit_count(xor)`` filter then keeps
    pairs with distance <= ``max_hamming``.
    """
    sig = simhash_signatures(docs, id_col)
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

def minhash_signatures(
    docs: DataFrame, n: int = 3, id_col: str = "doc_id"
) -> DataFrame:
    """Per-document minhash signature columns ``s1..s{k}`` over shingles."""
    base = docs.select(F.col(id_col), shingles("text", n).alias("sh")).filter(
        F.size("sh") > 0
    )
    hashed = base.withColumn(
        "hv", F.transform("sh", lambda s: F.pmod(md5_long(s), F.lit(MERSENNE31)))
    )
    sigs = [
        F.array_min(
            F.transform(
                "hv", lambda h: F.pmod(F.lit(a) * h + F.lit(b), F.lit(MERSENNE31))
            )
        ).alias(f"s{i}")
        for i, (a, b) in enumerate(minhash_params(), start=1)
    ]
    return hashed.select(F.col(id_col), F.col("sh"), *sigs)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 3,
    threshold: float = 0.8,
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash-LSH candidate pairs verified with exact Jaccard.

    Signatures are banded (``MINHASH_BANDS`` bands × ``MINHASH_ROWS``
    rows); documents sharing any full band bucket become candidates —
    the at-scale replacement for the all-pairs shingle join — and only
    candidates pay the exact verification.
    """
    sig = minhash_signatures(docs, n, id_col).persist()
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
    # Candidates travel as bare id pairs — never carry the shingle
    # arrays through the band join/distinct (they dominate shuffle
    # volume when buckets collide); fetch arrays back only for the
    # surviving distinct pairs.
    bands = sig.select(F.col(id_col), F.explode(F.array(*band_structs)).alias("bv"))
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
    sh_only = sig.select(F.col(id_col), F.col("sh"))
    cand = (
        cand.join(
            sh_only.select(
                F.col(id_col).alias("doc_a"), F.col("sh").alias("sh_a")
            ),
            "doc_a",
        )
        .join(
            sh_only.select(
                F.col(id_col).alias("doc_b"), F.col("sh").alias("sh_b")
            ),
            "doc_b",
        )
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    return (
        cand.select(
            "doc_a",
            "doc_b",
            inter.cast("long").alias("intersection_size"),
            union.cast("long").alias("union_size"),
            (inter.cast("double") / union).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# Embedding cosine near-duplicates
# --------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    """Deterministic left-fold dot product over double-cast elements."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def with_norm(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Attach the L2 norm once per vector (pairs then pay one dot each
    instead of three)."""
    return emb.withColumn("norm", F.sqrt(_dot(F.col(vec_col), F.col(vec_col))))


def embedding_cosine_pairs(
    emb: DataFrame, threshold: float = 0.4, id_col: str = "vec_id"
) -> DataFrame:
    """All-pairs embedding cosine near-duplicates (brute force).

    Quadratic by construction — the correctness baseline. The scale
    path buckets vectors first (see
    :mod:`sressentials_spark.operators.similarity`) so each join
    compares only within-bucket candidates.
    """
    n = with_norm(emb)
    a, b = n.alias("a"), n.alias("b")
    cos = _dot(F.col("a.embedding"), F.col("b.embedding")) / (
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
