"""Blocked fuzzy matching: blocking semantics and the recall contract.

The catalog oracle test pins fuzzy_match_part_names cell-exactly; these
pin the operator's CONTRACT on engineered fixtures: pairs co-block only
when they share their strictly-rarest token (the documented recall
boundary of rarest-token blocking), exact duplicates are excluded by
min_dist, and row-count expansion factors ride along.
"""

from __future__ import annotations

from sressentials_spark.operators.fuzzy import fuzzy_match_dictionary


def _match(spark, values, **kw):
    df = spark.createDataFrame([(v,) for v in values], "name string")
    out = fuzzy_match_dictionary(df, "name", **kw).toPandas()
    return {
        (r.name_a, r.name_b): (r.dist, r.n_rows_a, r.n_rows_b)
        for r in out.itertuples()
    }


# Shared fixture shape: first tokens made COMMON by filler names, so
# the shared second token "bolt" is strictly rarest for both candidate
# names and they land in one block.
CO_BLOCKED = [
    "red bolt", "red bolt", "red bolt",
    "rad bolt", "rad bolt",
    "red x1", "red x2", "rad y1", "rad y2",
]


def test_shared_rarest_token_pair_found_with_counts(spark):
    # tfs over DISTINCT names: red=3, rad=3, bolt=2, x*/y*=1.
    # Both bolt-names key on "bolt" -> same block; dist("red bolt",
    # "rad bolt") = 1; expansion counts come from the raw rows.
    got = _match(spark, CO_BLOCKED)
    assert got == {("rad bolt", "red bolt"): (1, 2, 3)}


def test_differing_rarest_tokens_are_missed(spark):
    # "blue bolt" keys on bolt (tf 1), "blue boltz" on boltz (tf 1):
    # different blocks, so the dist-1 pair is NOT produced — the
    # documented recall boundary of single-key rarest-token blocking.
    got = _match(spark, ["blue bolt", "blue bolt", "blue boltz"])
    assert got == {}


def test_exact_duplicates_excluded_by_min_dist(spark):
    # "red bolt" appears 3x -> the dictionary collapses it to one name
    # and no (x, x) pair exists; min_dist=1 also excludes dist-0 pairs
    # that would arise from distinct-but-equal names (impossible after
    # the groupBy, pinned here by construction).
    got = _match(spark, ["red bolt"] * 3)
    assert got == {}


def test_dist_bounds_respected(spark):
    # dist("aaaa bolt", "azza bolt") = 2 -> included at max_dist=2,
    # excluded at max_dist=1.
    vals = [
        "aaaa bolt", "azza bolt",
        "aaaa p1", "aaaa p2", "azza q1", "azza q2",
    ]
    assert set(_match(spark, vals)) == {("aaaa bolt", "azza bolt")}
    assert _match(spark, vals, max_dist=1) == {}


def test_length_gap_is_a_free_reject(spark):
    # Same block, but length gap 6 > max_dist -> rejected before any
    # distance computation.
    vals = [
        "aaaa bolt", "aaaa bolt extras", "azza bolt",
        "aaaa p1", "aaaa p2", "azza q1", "azza q2", "azza q3",
        "extras e1", "extras e2",
    ]
    got = _match(spark, vals)
    assert ("aaaa bolt", "aaaa bolt extras") not in got
    assert ("aaaa bolt", "azza bolt") in got


def test_fuzz_matches_duckdb_on_random_ascii_dictionaries(spark):
    """Seeded fuzz: full operator output vs the DuckDB oracle on random
    ASCII dictionaries (skewed token reuse so blocks actually form).
    Levenshtein parity is ASCII-only — Spark edits codepoints, DuckDB
    edits bytes — so the alphabet here is deliberately ASCII; the
    operator docstring records that boundary."""
    import random

    import duckdb
    import pandas as pd

    from sressentials_spark.operators.fuzzy import (
        fuzzy_match_dictionary_oracle_sql,
    )

    firsts = ["red", "rad", "rod", "blue", "blu", "green"]
    seconds = ["bolt", "bolz", "belt", "gear", "gearz", "ring", "rung"]
    for seed in (3, 19, 71):
        rng = random.Random(seed)
        names = [
            f"{rng.choice(firsts)} {rng.choice(seconds)}" for _ in range(120)
        ]
        sdf = (
            fuzzy_match_dictionary(
                spark.createDataFrame([(n,) for n in names], "name string"),
                "name",
            )
            .toPandas()
        )
        con = duckdb.connect()
        con.execute("CREATE TABLE src(name VARCHAR)")
        con.executemany("INSERT INTO src VALUES (?)", [(n,) for n in names])
        odf = con.execute(
            fuzzy_match_dictionary_oracle_sql("SELECT name FROM src")
        ).fetchdf()
        con.close()

        def canon(df: pd.DataFrame) -> pd.DataFrame:
            df = df.reindex(sorted(df.columns), axis=1)
            return (
                df.sort_values(sorted(df.columns))
                .reset_index(drop=True)
                .astype(str)
            )

        assert canon(sdf).equals(canon(odf)), f"seed {seed}"
