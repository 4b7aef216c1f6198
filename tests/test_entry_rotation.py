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
