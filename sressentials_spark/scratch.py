"""Process-scoped scratch directories for disk-backed artifacts.

Persisted indexes (dedup band tables, IVF cell stores, staged
streaming arrival sequences) live on disk so they survive
``release_persisted`` and serve many queries per session — but a
session's scratch must not outlive the process, or repeated runs
accumulate unbounded /tmp data (round-5 advisory). Every artifact
builder allocates through :func:`scratch_dir`, which registers the
directory for removal at interpreter exit. At production scale the
same call sites point at warehouse/object-store paths with an
explicit retention policy instead.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile

_SCRATCH_DIRS: list[str] = []


def scratch_dir(prefix: str) -> str:
    """mkdtemp that is removed at process exit."""
    d = tempfile.mkdtemp(prefix=prefix)
    _SCRATCH_DIRS.append(d)
    return d


def register_scratch(path: str) -> str:
    """Register an existing directory for exit-time removal."""
    _SCRATCH_DIRS.append(path)
    return path


def _cleanup() -> None:
    while _SCRATCH_DIRS:
        shutil.rmtree(_SCRATCH_DIRS.pop(), ignore_errors=True)


atexit.register(_cleanup)
