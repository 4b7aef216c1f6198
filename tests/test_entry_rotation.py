"""Driver-contract rotation (__spark_entry__.py): the 50-row/round
driver artifact must rotate through the whole registry, so the
ordering of ``queries()`` is load-bearing — pin it."""

from __future__ import annotations

import importlib
import sys


def _entry():
    sys.path.insert(0, "/root/repo")
    try:
        return importlib.import_module("__spark_entry__")
    finally:
        sys.path.pop(0)


def test_force_first_then_least_recently_rowed():
    ent = _entry()
    names = list(ent.queries())
    # Forced (just-fixed oracles) lead, in declaration order.
    assert tuple(names[: len(ent._FORCE_FIRST)]) == ent._FORCE_FIRST
    # After the forced block: non-decreasing last-rowed round, i.e.
    # never-rowed (round 0) before stale before fresh; name-tiebreak
    # inside a round.
    latest = ent._last_rowed_round()
    rest = names[len(ent._FORCE_FIRST) :]
    keys = [(latest.get(n, 0), n) for n in rest]
    assert keys == sorted(keys)


def test_registry_and_oracles_align():
    ent = _entry()
    qs, oracles = ent.queries(), ent.oracle_sql()
    missing = [n for n in qs if n not in oracles]
    assert not missing, f"queries without oracles: {missing}"
    extra = [n for n in oracles if n not in qs]
    assert not extra, f"oracles without queries: {extra}"


def test_rotation_budget_not_overflowed():
    """The driver records only 50 correctness rows per round, and every
    query with no ledger row sorts ahead of stale rows — so
    |_FORCE_FIRST| + |never-rowed| must stay within the budget, or the
    stale backlog (and in the worst case part of the never-rowed set
    itself) silently stops refreshing. This is the r6-verdict failure
    mode (53 new queries displaced 6 never-rowed ones for a full
    round); adding queries faster than the budget absorbs them now
    fails here first."""
    ent = _entry()
    latest = ent._last_rowed_round()
    qs = ent.queries()
    never = [n for n in qs if latest.get(n, 0) == 0]
    forced_extra = [n for n in ent._FORCE_FIRST if latest.get(n, 0) != 0]
    used = len(never) + len(forced_extra)
    assert used <= 50, (
        f"{len(never)} never-rowed + {len(forced_extra)} forced stale rows "
        f"= {used} > 50-row driver budget; register fewer new queries this "
        f"round or drop _FORCE_FIRST entries"
    )
    # Stale-row displacement guard (the r7-verdict extension): rows
    # whose latest green is >= 3 rounds old are a weak warranty; the
    # forced + never-rowed + oldest-stale demand must fit the budget,
    # or the backlog silently ages another round.
    if latest:
        head = max(latest.values())
        stale = [
            n for n in qs
            if n not in ent._FORCE_FIRST and 0 < latest.get(n, 0) <= head - 3
        ]
        demand = used + len(stale)
        assert demand <= 50, (
            f"{used} forced/never-rowed + {len(stale)} stale(<= r{head - 3}) "
            f"rows = {demand} > 50; the stale backlog cannot refresh this "
            f"round — register fewer queries or force fewer rows"
        )
