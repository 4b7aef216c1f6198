"""Crash-atomic (manifest-versioned) IVF index lifecycle.

The bare cell-partitioned IVF index (operators/similarity.py) documents
one honesty boundary: its REBALANCE publishes through directory renames
and is not crash-atomic — a kill between the retire and the child moves
leaves that cell's rows staged (repair = idempotent rebuild). This
module closes that boundary by giving the IVF index the same commit
discipline the snapshot tables already have (operators/maintenance.py):

- data files are IMMUTABLE and append-only under ``data/commit-<id>/``
  (a parquet writer never reuses a part-file name);
- what makes an index version is a tiny JSON MANIFEST listing, per
  visible file, its cell and row count — plus the centroid set itself
  (K x dim doubles, small enough to live inline, so one atomic publish
  covers lists AND centroids: no sidecar can ever be newer than the
  lists it describes, the race the bare layout's ``_rebalanced`` marker
  papers over);
- the manifest link-lands with an exclusive ``os.link`` — a crashed
  writer leaves orphan commit dirs (reclaimed by
  :func:`vacuum_ivf_index`), NEVER a half-split index, and two racing
  rebalances resolve as optimistic concurrency (loser gets
  ``FileExistsError``, retries against the new latest).

At 100 TB the economics are the snapshot tier's: the rebalance job
reads and writes O(oversized cells' rows), the publish is O(files)
JSON, readers resolve a version by reading one small file, and the
per-file row counts in the manifest make the SPLIT DECISION itself a
manifest-only computation — no count scan over the index at all (the
bare layout pays a full groupBy-count). Per-file cell attribution
doubles as manifest-level scan pruning: a query batch plans only its
probed cells' files, the same whole-directories-skipped effect as
partition pruning but decided driver-side from the manifest.

Kill-between-steps model test: tests/test_ivf_versioned.py injects a
crash after every mutation step and asserts readers always see exactly
the pre-split or the post-split index, never a mix.
"""

from __future__ import annotations

import glob as globmod
import json
import os
import shutil
from typing import Callable

from pyspark.sql import DataFrame, functions as F

from sressentials_spark.localrel import local_df

from sressentials_spark.operators.similarity import (
    DEFAULT_DIM,
    IVF_CELLS,
    IVF_NPROBE,
    IVF_REBALANCE_PCT,
    IVF_SPLIT_SEED,
    _ivf_query,
    ivf_annotate_frozen,
    ivf_seed_centroids,
)
from sressentials_spark.operators.dedup import md5_long

_MANIFEST_FMT = "index-manifest-v{version}.json"

#: Keys every manifest owns structurally; anything else is a rider a
#: transactional upstream stamped in (e.g. the streaming ingest's
#: ``stream_batch_id`` high-water mark) and MUST survive maintenance.
#: ``manifest_list`` is the two-level layout's pointer array;
#: ``_blocks`` is the in-memory pointer->entries cache the transparent
#: read attaches (never serialized — core status keeps the rider
#: carry-forward from ever copying it into a publish payload).
_MANIFEST_CORE_KEYS = frozenset(
    {"version", "files", "centroids", "coarse", "books", "manifest_list", "_blocks"}
)


def _carry_manifest_extra(parent: dict, payload: dict) -> dict:
    """Copy the parent manifest's non-core keys into a child publish
    payload (payload's own keys win). Every publish path that descends
    from a committed parent — ingest, rebalance, refresh, compact,
    delete — must carry these forward like it carries the quantizers:
    the streaming exactly-once recipe (streaming/ann_ingest.py) reads
    its ``stream_batch_id`` stamp from the VISIBLE manifests, so a
    maintenance verb that dropped it would, after vacuum expires the
    stamped version, let a redelivered in-flight micro-batch re-ingest
    its rows (duplicates with no error)."""
    for k, v in parent.items():
        if k not in _MANIFEST_CORE_KEYS and k not in payload:
            payload[k] = v
    return payload


def _manifest_path(base_path: str, version: int) -> str:
    return os.path.join(base_path, _MANIFEST_FMT.format(version=version))


def ivf_index_versions(base_path: str) -> list[int]:
    """Committed index versions, ascending (empty for a fresh path)."""
    out = []
    for p in globmod.glob(os.path.join(base_path, "index-manifest-v*.json")):
        base = os.path.basename(p)
        out.append(int(base[len("index-manifest-v"):-len(".json")]))
    return sorted(out)


def _read_manifest_raw(base_path: str, version: int) -> dict:
    """The version JSON exactly as published (quantizer keys back to
    int), WITHOUT resolving a two-level ``manifest_list`` into entries.
    This is the O(1)-read surface: quantizers, riders (e.g. the
    streaming ``stream_batch_id`` stamp) and the pointer rollup stats
    all live here, so callers that don't need per-file entries — probe
    derivation, the exactly-once stamp scan, the history catalog —
    never pay the block reads."""
    with open(_manifest_path(base_path, version)) as fh:
        man = json.load(fh)
    if "centroids" in man:
        man["centroids"] = {int(c): v for c, v in man["centroids"].items()}
    if "coarse" in man:
        man["coarse"] = {int(c): v for c, v in man["coarse"].items()}
    return man


def _read_manifest_entries(base_path: str, pointer: dict) -> list[dict]:
    """One manifest FILE's entry block (two-level layout)."""
    with open(os.path.join(base_path, pointer["path"])) as fh:
        return json.load(fh)["files"]


def read_ivf_manifest(base_path: str, version: int) -> dict:
    """One committed version: ``{"version", "files": [{"path", "cell",
    "rows"}]}`` plus the quantizer — ``centroids: {cid: [f64]}`` for
    the cosine-IVF tier, or ``coarse: {cid: [i64]}`` + ``books``
    (per-subspace ``[cid, [i64]]`` lists) for the IVF-PQ tier (cid
    keys back to int either way).

    Reads BOTH layouts transparently: a two-level manifest (published
    by :func:`promote_ivf_manifest_list` or any descendant of one) is
    resolved by loading each pointed-to manifest file and flattening
    into the same ``files`` shape, so every verb sees one contract.
    The resolved dict keeps ``manifest_list`` (the pointer array) and
    attaches ``_blocks`` (pointer, entries) pairs so a descendant
    publish can reuse untouched blocks without re-reading them."""
    man = _read_manifest_raw(base_path, version)
    if "manifest_list" in man:
        blocks = [
            (ptr, _read_manifest_entries(base_path, ptr))
            for ptr in man["manifest_list"]
        ]
        man["files"] = [e for _, block in blocks for e in block]
        man["_blocks"] = blocks
    return man


def _publish_ivf_manifest(base_path: str, version: int, payload: dict) -> None:
    """Atomic exclusive durable publish — shared with the snapshot
    tables (maintenance.atomic_publish_json: writer-unique staging
    name, fsync file + directory, exclusive link; exactly one of two
    racing writers wins, the loser raises FileExistsError with its
    commit dirs left orphaned for vacuum)."""
    from sressentials_spark.operators.maintenance import atomic_publish_json

    atomic_publish_json(_manifest_path(base_path, version), payload)


def _write_manifest_file(base_path: str, entries: list[dict]) -> dict:
    """Stage one immutable manifest FILE (two-level layout) holding an
    entry block, and return its pointer with rolled-up stats — the
    list-level pruning surface: ``cells`` (every cell the block
    touches), ``n_files``/``n_rows``, and the block's id range when
    every entry carries footer stats. Names are writer-unique (uuid),
    written through the same fsync discipline as version manifests;
    a block staged by a writer that then loses its publish race is
    unreferenced and reclaims as vacuum fodder."""
    import uuid

    from sressentials_spark.operators.maintenance import atomic_publish_json

    os.makedirs(os.path.join(base_path, "manifests"), exist_ok=True)
    rel = os.path.join("manifests", f"manifest-{uuid.uuid4().hex[:16]}.json")
    atomic_publish_json(os.path.join(base_path, rel), {"files": entries})
    ptr = {
        "path": rel,
        "n_files": len(entries),
        "n_rows": int(sum(e["rows"] for e in entries)),
        "cells": sorted({int(e["cell"]) for e in entries}),
    }
    if entries and all("min_id" in e for e in entries):
        ptr["min_id"] = min(int(e["min_id"]) for e in entries)
        ptr["max_id"] = max(int(e["max_id"]) for e in entries)
    return ptr


def _files_payload(
    base_path: str, parent_man: dict | None, entries: list[dict]
) -> dict:
    """The files-listing half of a child publish payload, in the
    PARENT's layout — the rule that makes every maintenance verb
    layout-preserving without knowing about layouts:

    - single-level parent (or none): ``{"files": entries}`` — the
      original O(index files) JSON, fine at maintenance cadence;
    - two-level parent: parent blocks whose entries survive intact are
      REUSED by pointer (zero bytes written), blocks the verb shrank
      (delete/rebalance/compact dropped some of their files) are
      rewritten with just the survivors, and entries the parent never
      listed (the verb's fresh commits) land as new blocks grouped by
      their immutable ``commit-<id>`` dir. Publish cost becomes
      O(commits touched): an ingest writes exactly one new block and
      re-points the rest.

    ``entries`` is the child's complete flattened file list (kept +
    new), exactly what the verbs already compute."""
    if parent_man is None or "manifest_list" not in parent_man:
        return {"files": entries}
    blocks = parent_man.get("_blocks") or [
        (ptr, _read_manifest_entries(base_path, ptr))
        for ptr in parent_man["manifest_list"]
    ]
    kept_paths = {e["path"] for e in entries}
    pointers: list[dict] = []
    parent_paths: set[str] = set()
    for ptr, block in blocks:
        parent_paths.update(e["path"] for e in block)
        surviving = [e for e in block if e["path"] in kept_paths]
        if len(surviving) == len(block):
            pointers.append(ptr)
        elif surviving:
            pointers.append(_write_manifest_file(base_path, surviving))
    fresh = [e for e in entries if e["path"] not in parent_paths]
    by_commit: dict[str, list[dict]] = {}
    for e in fresh:
        by_commit.setdefault(e["path"].split("/", 1)[0], []).append(e)
    for _, block in sorted(by_commit.items()):
        pointers.append(_write_manifest_file(base_path, block))
    return {"manifest_list": pointers}


def _commit_lists(
    df: DataFrame, data_dir: str, id_col: str = "vec_id"
) -> list[dict]:
    """Write annotated list rows under a fresh ``commit-<id>/``,
    one directory per cell (``cellp=<c>`` — a DUPLICATE of the real
    ``cell`` column, so the data files themselves keep ``cell`` and
    manifest-listed files read back standalone, no partition-discovery
    dependence). Returns manifest entries with per-file cell, row
    count, AND the ``id_col`` min/max — all read from the parquet
    FOOTERS (metadata pages only, no data read: the commit cost stays
    one write pass over the batch). The id range is what lets DELETE
    locate its files driver-side instead of scanning the index — the
    same file-skipping the snapshot tier's manifest stats buy.
    Attribution lists only THIS commit dir, so a racing writer's files
    can never be absorbed (the maintenance.py rule)."""
    import uuid

    commit_id = f"commit-{uuid.uuid4().hex[:16]}"
    commit_dir = os.path.join(data_dir, commit_id)
    (
        df.withColumn("cellp", F.col("cell"))
        .write.partitionBy("cellp")
        .mode("error")
        .parquet(commit_dir)
    )
    import pyarrow.parquet as pq

    entries = []
    for d in sorted(globmod.glob(os.path.join(commit_dir, "cellp=*"))):
        cell = int(os.path.basename(d).split("=", 1)[1])
        for f in sorted(globmod.glob(os.path.join(d, "*.parquet"))):
            rel = os.path.join(os.path.basename(d), os.path.basename(f))
            meta = pq.ParquetFile(f).metadata
            idx = meta.schema.names.index(id_col)
            lo = hi = None
            for rg in range(meta.num_row_groups):
                st = meta.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            entry = {
                "path": f"{commit_id}/{rel}",
                "cell": cell,
                "rows": int(meta.num_rows),
            }
            if lo is not None:
                entry["min_id"] = int(lo)
                entry["max_id"] = int(hi)
            entries.append(entry)
    return entries


def build_ivf_index_versioned(
    emb: DataFrame,
    base_path: str,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
) -> int:
    """Commit version 1 of a manifest-versioned IVF index: the same
    hash-seeded centroids and Arrow assignment pass as
    :func:`similarity.build_ivf_index` (results are pinned identical by
    tests), but lists land as immutable commit files and the centroid
    set rides INSIDE the manifest. Per-row probe arrays are NOT stored
    — the manifest centroids are the single probe truth, so the bare
    layout's stale-probe hazard (its ``_rebalanced`` marker) cannot
    exist here by construction."""
    ids, mat = ivf_seed_centroids(emb, n_cells, id_col=id_col)
    annotated = ivf_annotate_frozen(emb, ids, mat, nprobe).drop("cells")
    entries = _commit_lists(annotated, os.path.join(base_path, "data"))
    _publish_ivf_manifest(
        base_path,
        1,
        {
            "version": 1,
            "centroids": {
                str(int(i)): [float(x) for x in row] for i, row in zip(ids, mat)
            },
            "files": entries,
        },
    )
    return 1


def _load_centroids(man: dict):
    import numpy as np

    ids = sorted(man["centroids"])
    mat = np.stack(
        [np.asarray(man["centroids"][i], dtype=np.float64) for i in ids]
    )
    return ids, mat


def read_ivf_index_version(
    spark,
    base_path: str,
    version: int | None = None,
    cells: list[int] | None = None,
) -> DataFrame:
    """The index lists exactly as of ``version`` (default latest),
    optionally pruned to ``cells`` at the MANIFEST level — only the
    named cells' files are handed to the scan, the driver-side twin of
    partition pruning. Under the two-level layout the pruning happens
    at the LIST level first: pointer blocks whose rolled-up ``cells``
    miss every probed cell are skipped without even loading their
    entry file, so a probe-narrow read costs O(blocks touched) JSON,
    not O(commits)."""
    version = version or ivf_index_versions(base_path)[-1]
    man = _read_manifest_raw(base_path, version)
    if "manifest_list" in man:
        ptrs = man["manifest_list"]
        if not ptrs:
            raise ValueError(f"version {version} of {base_path} lists no files")
        sel = ptrs
        if cells is not None:
            want = set(cells)
            sel = [p for p in ptrs if want.intersection(p["cells"])]
        entries = [e for p in sel for e in _read_manifest_entries(base_path, p)]
        schema_entry = (
            entries[0]
            if entries
            else _read_manifest_entries(base_path, ptrs[0])[0]
        )
    else:
        if not man["files"]:
            raise ValueError(f"version {version} of {base_path} lists no files")
        entries = man["files"]
        schema_entry = entries[0]
    if cells is not None:
        want = set(cells)
        entries = [e for e in entries if e["cell"] in want]
    if not entries:
        # All pruned: ONE footer read for the schema, not O(index).
        first = os.path.join(base_path, "data", schema_entry["path"])
        return spark.read.parquet(first).limit(0)
    return spark.read.parquet(
        *[os.path.join(base_path, "data", e["path"]) for e in entries]
    )


def cosine_topk_ivf_versioned(
    spark,
    base_path: str,
    query_ids: list[int],
    k: int = 10,
    version: int | None = None,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    dim: int = DEFAULT_DIM,
    query_src: DataFrame | None = None,
) -> DataFrame:
    """IVF top-k served from a committed version: probes derive from
    the MANIFEST centroid set (query rows re-annotated by the same
    Arrow kernel as the build — always consistent with the lists the
    same manifest names), and the corpus scan plans only the probed
    cells' files. Bit-identical to the bare index's
    ``probe_from_centroids`` path at the same centroid set (pinned by
    tests).

    ``query_src`` (``id_col`` + ``embedding``) is where the query
    vectors come from — normally the source embeddings table, a
    point-lookup-cheap O(queries) read. When omitted, they resolve by
    scanning the FULL index version (every manifest file, then
    ``isin`` filter): an O(index) read per batch that exists only as a
    self-contained fallback — at scale, always pass ``query_src`` (the
    corpus scan stays manifest-pruned either way)."""
    version = version or ivf_index_versions(base_path)[-1]
    man = _read_manifest_raw(base_path, version)  # centroids ride inline
    ids, mat = _load_centroids(man)
    src = (
        query_src
        if query_src is not None
        else read_ivf_index_version(spark, base_path, version)
    )
    qcols = [id_col, "embedding"]
    qrows = (
        src.filter(F.col(id_col).isin(query_ids)).select(*qcols).collect()
    )
    qsrc = local_df(spark, qrows, src.select(*qcols).schema)
    qann = ivf_annotate_frozen(qsrc, ids, mat, nprobe)
    qann_rows = qann.collect()
    probed = sorted({int(c) for r in qann_rows for c in r["cells"]})
    corpus = read_ivf_index_version(spark, base_path, version, cells=probed)
    queries_src = local_df(spark, qann_rows, qann.schema)
    return _ivf_query(
        corpus, query_ids, k, id_col, dim,
        filter_col=None, prune_cells=False, queries_src=queries_src,
    )


def ingest_ivf_index_versioned(
    emb_batch: DataFrame,
    base_path: str,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    fault: Callable[[str], None] | None = None,
    retries: int = 5,
    manifest_extra: dict | None = None,
) -> int:
    """Append a batch as a new committed version: the batch is assigned
    under the LATEST manifest's centroids (frozen — one Arrow pass over
    the batch only), its lists land as a fresh immutable commit, and
    the new manifest = parent's files + the batch's files, centroids
    unchanged, published by one atomic link. A crashed ingest leaves
    orphan commit files and the parent version fully intact (same
    warranty as the rebalance); concurrent readers of the parent
    version are never disturbed. Cost O(batch), never O(index).

    Losing a publish race is RECOVERED here, not documented away (the
    Iceberg fast-append retry): on ``FileExistsError`` the ingest
    re-reads the new latest and re-publishes on top of it — reusing its
    already-staged commit files when the winner left the centroid set
    unchanged (another ingest: the encode is centroid-determined, so
    the staged rows are still exactly right), and RE-ENCODING the batch
    when the winner was a rebalance (its split retired cells; appending
    rows under a retired cell id would make them invisible to every
    probe). ``retries`` bounds pathological contention; the staged
    files of abandoned attempts are vacuum fodder.

    ``manifest_extra`` rides verbatim in the published manifest —
    the hook a transactional upstream uses to make ingest IDEMPOTENT:
    a streaming writer stamps its micro-batch id and skips redelivered
    batches whose stamp is already committed (streaming/ann_ingest.py:
    the Structured-Streaming foreachBatch exactly-once recipe, the
    manifest doubling as the transaction log)."""
    fault = fault or (lambda step: None)
    version = ivf_index_versions(base_path)[-1]
    man = read_ivf_manifest(base_path, version)
    ids, mat = _load_centroids(man)
    entries = _commit_lists(
        ivf_annotate_frozen(emb_batch, ids, mat, nprobe).drop("cells"),
        os.path.join(base_path, "data"),
    )
    if not entries:
        return version  # empty batch: nothing to commit
    fault("staged")
    for _ in range(retries + 1):
        try:
            payload = {
                "version": version + 1,
                "centroids": {
                    str(c): v for c, v in sorted(man["centroids"].items())
                },
                **_files_payload(base_path, man, man["files"] + entries),
            }
            payload.update(manifest_extra or {})
            _carry_manifest_extra(man, payload)
            _publish_ivf_manifest(base_path, version + 1, payload)
            return version + 1
        except FileExistsError:
            version = ivf_index_versions(base_path)[-1]
            man = read_ivf_manifest(base_path, version)
            new_ids, new_mat = _load_centroids(man)
            if new_ids != ids or (new_mat != mat).any():
                # A rebalance won the race: re-encode under its cells.
                ids, mat = new_ids, new_mat
                entries = _commit_lists(
                    ivf_annotate_frozen(emb_batch, ids, mat, nprobe).drop(
                        "cells"
                    ),
                    os.path.join(base_path, "data"),
                )
            fault("retrying")
    raise RuntimeError(
        f"ingest lost the publish race {retries + 1} times under {base_path}"
    )


def rebalance_ivf_index_versioned(
    spark,
    base_path: str,
    *,
    factor_pct: int = IVF_REBALANCE_PCT,
    split_seed: str = IVF_SPLIT_SEED,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
    fault: Callable[[str], None] | None = None,
    retries: int = 5,
) -> dict:
    """CRASH-ATOMIC rebalance: same split semantics as
    :func:`similarity.rebalance_ivf_index` (cells over
    ``rows * factor_pct // (n_centroids * 100)`` split into two
    hash-picked child seeds; members re-pointed to the nearer child by
    the build's own kernel) — but committed as one manifest version.

    Ordering: every split's child lists land as immutable commit files
    first; the new manifest (old entries minus split cells' files, plus
    child files, centroids swapped) publishes LAST via one atomic
    exclusive link. A crash anywhere before the link leaves the
    previous version fully intact and readable — orphan commit dirs are
    reclaimed by :func:`vacuum_ivf_index`; there is no window where a
    reader can observe retired lists, missing rows, or a centroid set
    that disagrees with the lists (the model test kills the job after
    every step and checks exactly this).

    The split DECISION reads only the manifest (per-file row counts):
    at 100 TB, deciding costs one JSON read; the job itself costs
    O(oversized cells' rows), never O(index).

    ``fault`` is the test seam: called with a step label after each
    mutation (``staged:<cell>``, ``prepared``, ``published``); a hook
    that raises simulates a kill at that point.

    The split loop is one staging job per oversized cell, and the
    threshold arithmetic bounds how many that can be: a cell must hold
    >115% of the uniform share, so fewer than ``n_cells * 100/115``
    cells can qualify — and in the skew regime this op exists for
    (ingest heat concentrated in a FEW cells) the loop is a handful of
    O(cell) jobs. If most cells qualify, the index is mis-sized, and
    the honest verb is a re-seeded rebuild, not a rebalance.
    """
    import numpy as np

    fault = fault or (lambda step: None)
    versions = ivf_index_versions(base_path)
    version = versions[-1]
    man = read_ivf_manifest(base_path, version)
    sizes: dict[int, int] = {}
    for e in man["files"]:
        sizes[e["cell"]] = sizes.get(e["cell"], 0) + e["rows"]
    n_rows = sum(sizes.values())
    cents = dict(man["centroids"])
    threshold = n_rows * factor_pct // (len(cents) * 100)
    oversized = sorted(c for c, n in sizes.items() if n > threshold)

    data_dir = os.path.join(base_path, "data")
    new_entries: list[dict] = []
    for c in oversized:
        members = read_ivf_index_version(
            spark, base_path, version, cells=[c]
        ).drop("norm", "cell")
        h = md5_long(
            F.concat(F.lit(split_seed + ":"), F.col(id_col).cast("string"))
        )
        seed_rows = (
            members.withColumn("_h", h)
            .orderBy("_h", id_col)
            .limit(2)
            .select(id_col, "embedding")
            .collect()
        )
        ch_ids = [int(r[id_col]) for r in seed_rows]
        ch_mat = np.stack(
            [np.asarray(r["embedding"], dtype=np.float64) for r in seed_rows]
        )
        new_entries += _commit_lists(
            ivf_annotate_frozen(members, ch_ids, ch_mat, nprobe).drop("cells"),
            data_dir,
        )
        cents.pop(c, None)
        for cid, row in zip(ch_ids, ch_mat):
            cents[int(cid)] = [float(x) for x in row]
        fault(f"staged:{c}")

    if oversized:
        split = set(oversized)
        files = [e for e in man["files"] if e["cell"] not in split]
        files += new_entries
        fault("prepared")
        try:
            _publish_ivf_manifest(
                base_path,
                version + 1,
                _carry_manifest_extra(man, {
                    "version": version + 1,
                    "centroids": {str(c): v for c, v in sorted(cents.items())},
                    **_files_payload(base_path, man, files),
                }),
            )
        except FileExistsError:
            # Lost the version race. Unlike ingest, the staged work is
            # NOT reusable: the winner changed the file set (and maybe
            # the centroids), so the split decision's inputs are stale.
            # The correct retry is a full re-run against the new
            # latest — a fresh decision over fresh sizes. Abandoned
            # stages are vacuum fodder.
            if retries <= 0:
                raise
            fault("retrying")
            return rebalance_ivf_index_versioned(
                spark,
                base_path,
                factor_pct=factor_pct,
                split_seed=split_seed,
                nprobe=nprobe,
                id_col=id_col,
                fault=fault,
                retries=retries - 1,
            )
        fault("published")
    return {
        "cells_split": len(oversized),
        "split_cells": oversized,
        "threshold": int(threshold),
        "n_centroids": len(cents),
        "version": version + 1 if oversized else version,
    }


# ---- IVF-PQ on the same commit discipline --------------------------------


def _books_to_json(books) -> list:
    """``pq_train_codebooks`` shape -> manifest-storable nested lists
    (per subspace: ``[[cid, [i64 components]], ...]``). Integer-exact:
    the codebooks live on the QUANT_SCALE integer grid, so JSON
    round-trips them losslessly."""
    return [
        [[int(cid), [int(x) for x in row]] for cid, row in zip(cids.tolist(), C)]
        for cids, C in books
    ]


def _books_from_json(js) -> list:
    import numpy as np

    out = []
    for sub in js:
        cids = np.array([c for c, _ in sub], dtype=np.int64)
        C = np.stack([np.asarray(v, dtype=np.int64) for _, v in sub])
        out.append((cids, C))
    return out


def build_ivfpq_index_versioned(
    emb: DataFrame,
    base_path: str,
    n_cells: int = IVF_CELLS,
    m: int | None = None,
    k: int | None = None,
    iters: int | None = None,
    id_col: str = "vec_id",
) -> int:
    """Commit version 1 of a manifest-versioned IVF-PQ index: the same
    trained coarse quantizer + residual codebooks + encode pass as
    :func:`similarity.build_ivfpq_index` (results pinned bit-identical
    by tests), but BOTH frozen artifacts ride inside the
    atomically-published manifest instead of sidecar parquet dirs — so
    there is no window where lists and quantizers can disagree, the
    exact hazard sidecars re-introduce on every maintenance write."""
    from sressentials_spark.operators import similarity as S
    from sressentials_spark.operators.cluster import kmeans_fit_centroids

    m = m if m is not None else S.PQ_M
    k = k if k is not None else S.PQ_K
    iters = iters if iters is not None else S.PQ_ITERS
    coarse = kmeans_fit_centroids(emb, k=n_cells, iters=iters, id_col=id_col)
    books = S.pq_train_codebooks(
        emb, m, k, iters=iters, id_col=id_col, residual_coarse=coarse
    )
    entries = _commit_lists(
        S._encode_ivfpq_lists(emb, coarse, books, m=m, id_col=id_col),
        os.path.join(base_path, "data"),
    )
    _publish_ivf_manifest(
        base_path,
        1,
        {
            "version": 1,
            "coarse": {
                str(int(c)): [int(x) for x in v] for c, v in sorted(coarse.items())
            },
            "books": _books_to_json(books),
            "files": entries,
        },
    )
    return 1


def ingest_ivfpq_index_versioned(
    emb_batch: DataFrame,
    base_path: str,
    id_col: str = "vec_id",
    fault: Callable[[str], None] | None = None,
    retries: int = 5,
    manifest_extra: dict | None = None,
) -> int:
    """Append a batch under the latest manifest's FROZEN coarse
    centroids and residual codebooks as one committed version (encode
    the batch only; parent files untouched; publish last, atomically).
    Same drift trade as the bare ingest: the manifest pins exactly
    which quantizers encoded every visible row. A lost publish race
    retries on top of the new latest, reusing the staged files while
    the winner kept the quantizers (always, between ingests — they are
    frozen at build) and re-encoding defensively if some future
    maintenance verb ever swaps them."""
    fault = fault or (lambda step: None)
    from sressentials_spark.operators import similarity as S

    version = ivf_index_versions(base_path)[-1]
    man = read_ivf_manifest(base_path, version)

    def _encode() -> list[dict]:
        return _commit_lists(
            S._encode_ivfpq_lists(
                emb_batch,
                man["coarse"],
                _books_from_json(man["books"]),
                m=len(man["books"]),
                id_col=id_col,
            ),
            os.path.join(base_path, "data"),
        )

    entries = _encode()
    if not entries:
        return version  # empty batch: nothing to commit
    fault("staged")
    for _ in range(retries + 1):
        try:
            payload = {
                "version": version + 1,
                "coarse": {
                    str(c): v for c, v in sorted(man["coarse"].items())
                },
                "books": man["books"],
                **_files_payload(base_path, man, man["files"] + entries),
            }
            payload.update(manifest_extra or {})
            _publish_ivf_manifest(
                base_path, version + 1, _carry_manifest_extra(man, payload)
            )
            return version + 1
        except FileExistsError:
            prev_coarse, prev_books = man["coarse"], man["books"]
            version = ivf_index_versions(base_path)[-1]
            man = read_ivf_manifest(base_path, version)
            if man["coarse"] != prev_coarse or man["books"] != prev_books:
                entries = _encode()
            fault("retrying")
    raise RuntimeError(
        f"ingest lost the publish race {retries + 1} times under {base_path}"
    )


def pq_adc_topk_ivfpq_versioned(
    spark,
    emb: DataFrame,
    base_path: str,
    query_ids: list[int],
    topk: int = 10,
    version: int | None = None,
    nprobe: int = IVF_NPROBE,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVFADC search served from a committed IVF-PQ version: probes,
    distance tables and codes all derive from ONE manifest (quantizers
    inline), and the candidate scan plans only the probed cells' files
    — bit-identical to the bare store's search at equal artifacts
    (shared scoring core: similarity._ivfpq_adc_search)."""
    from sressentials_spark.operators import similarity as S

    version = version or ivf_index_versions(base_path)[-1]
    man = _read_manifest_raw(base_path, version)  # quantizers ride inline
    books = _books_from_json(man["books"])
    return S._ivfpq_adc_search(
        spark,
        emb,
        man["coarse"],
        books,
        lambda probed: read_ivf_index_version(
            spark, base_path, version, cells=probed
        ),
        query_ids,
        topk=topk,
        nprobe=nprobe,
        m=len(books),
        id_col=id_col,
    )


def compact_ivf_index_versioned(
    spark,
    base_path: str,
    *,
    target_bytes: int | None = None,
    min_files: int = 2,
    id_col: str = "vec_id",
    fault: Callable[[str], None] | None = None,
    retries: int = 5,
) -> dict:
    """CRASH-ATOMIC small-file compaction — the missing fourth verb of
    the table-format quartet (append/ingest, rewrite/rebalance-delete,
    expire/vacuum, COMPACT): every ingest lands each touched cell as a
    fresh small commit file, so a hot cell accumulates one file per
    batch and its serve-time scan pays per-file open cost instead of
    sequential reads. Compaction rewrites each fragmented cell
    (``>= min_files`` files, and only when that reduces the file
    count) into ``ceil(cell_bytes / target_bytes)`` size-targeted
    files and publishes ONE manifest swapping exactly those cells'
    files — rows, cells and quantizers are untouched, so serving is
    bit-equal by construction (pinned by tests), and any committed
    version still reads exactly as committed. A crash before the link
    leaves the fragmented version fully live; replaced files are
    reclaimed when vacuum expires the old version. Works on BOTH tiers
    (the verb never looks past ``cell`` and the id column).

    Cost: O(fragmented cells' bytes) read+write — the same
    maintenance economics as rebalance, and like it the per-cell loop
    is bounded by how much fragmentation accumulated since the last
    pass. A lost publish race re-plans against the new latest."""
    import math

    from sressentials_spark.operators.maintenance import DEFAULT_TARGET_BYTES

    fault = fault or (lambda step: None)
    target = int(target_bytes or DEFAULT_TARGET_BYTES)
    for _ in range(retries + 1):
        version = ivf_index_versions(base_path)[-1]
        man = read_ivf_manifest(base_path, version)
        by_cell: dict[int, list[dict]] = {}
        for e in man["files"]:
            by_cell.setdefault(e["cell"], []).append(e)
        data_dir = os.path.join(base_path, "data")
        plan: dict[int, tuple[list[dict], int]] = {}
        for cell, es in sorted(by_cell.items()):
            if len(es) < min_files:
                continue
            total = sum(
                os.path.getsize(os.path.join(data_dir, e["path"])) for e in es
            )
            k = max(1, math.ceil(total / target))
            if k < len(es):
                plan[cell] = (es, k)
        if not plan:
            return {
                "cells_compacted": 0,
                "files_before": len(man["files"]),
                "files_after": len(man["files"]),
                "version": version,
            }
        replaced: set[str] = set()
        new_entries: list[dict] = []
        for cell, (es, k) in sorted(plan.items()):
            rows = spark.read.parquet(
                *[os.path.join(data_dir, e["path"]) for e in es]
            )
            # Range-partition on the id so each compacted file covers a
            # disjoint id interval: round-robin would give every file
            # the cell's full id span in its footer min/max, and one
            # compaction pass would degrade delete's driver-side
            # manifest-stats pruning to scanning every compacted file.
            new_entries += _commit_lists(
                rows.repartitionByRange(k, id_col), data_dir, id_col=id_col
            )
            replaced.update(e["path"] for e in es)
            fault(f"staged:{cell}")
        kept = [e for e in man["files"] if e["path"] not in replaced]
        payload = {
            "version": version + 1,
            **_files_payload(base_path, man, kept + new_entries),
        }
        for key in ("centroids", "coarse", "books"):
            if key in man:
                payload[key] = (
                    {str(c): v for c, v in sorted(man[key].items())}
                    if isinstance(man[key], dict)
                    else man[key]
                )
        _carry_manifest_extra(man, payload)
        fault("prepared")
        try:
            _publish_ivf_manifest(base_path, version + 1, payload)
        except FileExistsError:
            # The winner changed the file set; the plan is stale —
            # re-plan against the new latest. Staged rewrites of the
            # lost attempt are vacuum fodder.
            fault("retrying")
            continue
        fault("published")
        return {
            "cells_compacted": len(plan),
            "files_before": len(man["files"]),
            "files_after": len(kept) + len(new_entries),
            "version": version + 1,
        }
    raise RuntimeError(
        f"compact lost the publish race {retries + 1} times under {base_path}"
    )


def delete_ivf_index_versioned(
    spark,
    base_path: str,
    ids: list[int],
    id_col: str = "vec_id",
    fault: Callable[[str], None] | None = None,
    retries: int = 5,
) -> dict:
    """CRASH-ATOMIC row delete — copy-on-write at FILE granularity
    (the Iceberg COW delete): rewrite only the list files that
    actually contain the target ids (minus those rows, same cells),
    publish a manifest swapping exactly those files, and leave every
    other file byte-untouched. Works on BOTH tiers (cosine-IVF and
    IVF-PQ lists both carry ``cell`` as a data column); quantizers are
    untouched — removing rows never moves a centroid, and serving
    quality drift stays the refresh gauge's business.

    This is the takedown verb a training-data estate needs
    (right-to-be-forgotten, dedup-driven removals): a crash anywhere
    before the final link leaves the pre-delete version fully live
    (rewritten files are staged commits — vacuum fodder), readers of
    any committed version are never disturbed, and the PRE-delete
    version still time-travels until vacuum expires it — which is also
    the compliance story: the data is provably gone exactly when
    vacuum reclaims the unreferenced files.

    Cost: the locate pass prunes DRIVER-SIDE on the manifest's
    per-file ``min_id``/``max_id`` stats (footer-derived at commit
    time, free), then id-column-scans only the files whose range
    intersects a victim — for id-clustered commits (every ingest
    batch) this skips whole commits without opening them, the same
    file-skipping the snapshot tier's manifest stats buy; files from
    manifests predating the stats scan unconditionally. Rewrite is
    O(affected files). A lost publish race re-locates against the new
    latest (the winner may have rewritten or split the very files this
    delete targeted).

    LOCAL-FILESYSTEM CONTRACT (module-wide, explicit here because this
    verb would fail hard first): the hit-mapping below resolves
    ``input_file_name`` URIs back to manifest entries via
    ``os.path.realpath``, which only exists for driver-visible POSIX
    paths — an ``hdfs://``/``s3a://``-backed ``base_path`` raises
    RuntimeError on every delete that finds victims rather than
    publishing a wrong manifest. The rest of the module shares the
    assumption (``glob``/``getsize``/``os.link`` in commit, compact
    and vacuum), matching the sandbox and the single-writer local
    layout; porting to an object store means swapping the path
    resolution to manifest-relative suffix matching and the atomic
    link publish to a conditional put — isolated behind
    ``_commit_lists``/``atomic_publish_json``/this mapping."""
    import bisect

    fault = fault or (lambda step: None)
    want = sorted(set(int(i) for i in ids))

    def _may_contain(e: dict) -> bool:
        if "min_id" not in e or "max_id" not in e:
            return True  # pre-stats manifest entry: must scan
        i = bisect.bisect_left(want, int(e["min_id"]))
        return i < len(want) and want[i] <= int(e["max_id"])

    for _ in range(retries + 1):
        version = ivf_index_versions(base_path)[-1]
        man = read_ivf_manifest(base_path, version)
        paths = {
            os.path.join(base_path, "data", e["path"]): e for e in man["files"]
        }
        candidates = [p for p, e in paths.items() if _may_contain(e)]
        if not candidates:
            return {
                "deleted_rows": 0,
                "files_rewritten": 0,
                "files_scanned": 0,
                "version": version,
            }
        hits = (
            spark.read.parquet(*candidates)
            .select(F.col(id_col), F.input_file_name().alias("_f"))
            .filter(F.col(id_col).isin(want))
            .groupBy("_f")
            .count()
            .collect()
        )
        if not hits:
            return {
                "deleted_rows": 0,
                "files_rewritten": 0,
                "files_scanned": len(candidates),
                "version": version,
            }
        # input_file_name is a file URI; map it back to the MANIFEST's
        # own path strings via the candidate list, comparing realpaths
        # (normpath equality breaks under symlinked scratch dirs or a
        # relative base_path — and a silent mismatch would keep every
        # victim-bearing file in the new manifest while also appending
        # the rewritten survivors: victims stay served, survivors
        # duplicate). Every hit MUST resolve to a known candidate;
        # abort rather than publish a manifest that keeps victims live.
        from urllib.parse import unquote, urlparse

        real_to_candidate = {os.path.realpath(p): p for p in candidates}
        affected: dict[str, int] = {}
        for r in hits:
            local = unquote(urlparse(r["_f"]).path)
            cand = real_to_candidate.get(os.path.realpath(local))
            if cand is None:
                raise RuntimeError(
                    f"delete located victim rows in {r['_f']!r}, which "
                    f"resolves to no manifest entry of {base_path} "
                    f"v{version} — refusing to publish a delete that "
                    "would leave victims visible"
                )
            affected[cand] = int(r["count"])
        n_deleted = sum(affected.values())
        survivors = spark.read.parquet(*affected).filter(
            ~F.col(id_col).isin(want)
        )
        entries = _commit_lists(survivors, os.path.join(base_path, "data"))
        fault("staged")
        kept = [e for p, e in paths.items() if p not in affected]
        payload = {
            "version": version + 1,
            **_files_payload(base_path, man, kept + entries),
        }
        for k in ("centroids", "coarse", "books"):
            if k in man:
                payload[k] = (
                    {str(c): v for c, v in sorted(man[k].items())}
                    if isinstance(man[k], dict)
                    else man[k]
                )
        _carry_manifest_extra(man, payload)
        try:
            _publish_ivf_manifest(base_path, version + 1, payload)
        except FileExistsError:
            # The winner may have rewritten/split/vacuumed the very
            # files this delete targeted: the affected set is stale,
            # so re-locate against the new latest. Staged rewrites of
            # the lost attempt are vacuum fodder.
            fault("retrying")
            continue
        fault("published")
        return {
            "deleted_rows": n_deleted,
            "files_rewritten": len(affected),
            "files_scanned": len(candidates),
            "version": version + 1,
        }
    raise RuntimeError(
        f"delete lost the publish race {retries + 1} times under {base_path}"
    )


#: Child cell ids for IVF-PQ rebalance splits are the seed member's
#: vec_id shifted past any kmeans-born cid (those are < n_cells) and
#: any plain vec_id, so a split can never collide with a live cell id
#: (a vector lives in exactly one cell, so at most one live child can
#: derive from a given vec_id at a time).
IVFPQ_CHILD_ID_BASE = 1 << 32


def rebalance_ivfpq_index_versioned(
    spark,
    emb: DataFrame,
    base_path: str,
    *,
    factor_pct: int = IVF_REBALANCE_PCT,
    split_seed: str = IVF_SPLIT_SEED,
    id_col: str = "vec_id",
    fault: Callable[[str], None] | None = None,
    retries: int = 5,
) -> dict:
    """CRASH-ATOMIC rebalance for the IVF-PQ tier — the verb that
    completes the compressed index's lifecycle symmetry with the
    cosine tier (build / ingest / REBALANCE / refresh / import /
    vacuum): cells whose manifest row count exceeds
    ``rows * factor_pct // (n_centroids * 100)`` split into two
    hash-picked child seeds, exactly the cosine-tier split rule.

    What differs under PQ is that the lists store CODES, not vectors,
    and codes are residuals against the cell centroid — so moving a
    member to a child cell changes its residual basis and its codes
    must be RE-ENCODED. The split therefore fetches the oversized
    cells' raw vectors from ``emb`` by id (an id-pushdown read of
    O(oversized cells' rows) — the raw corpus is cold storage, touched
    only for the rows that move) and re-encodes them against the new
    child centroids under the FROZEN codebooks (the subspace books are
    global, not per-cell, so a cell split does not retrain them; the
    drift gauge / refresh verb owns that decision). Child centroids
    are the seeds' own embeddings on the QUANT_SCALE integer grid
    (quantize_exact — the same half-up grid every probe ranks
    against); child cell ids are ``vec_id + IVFPQ_CHILD_ID_BASE``.

    Commit discipline is the cosine rebalance's verbatim: child lists
    land first as immutable commit files, the new manifest (old files
    minus split cells', plus child files; coarse swapped; books
    byte-identical) publishes LAST via one atomic exclusive link, a
    crash anywhere leaves the previous version intact, and a lost
    publish race re-runs the whole decision against the new latest
    (stale staging is vacuum fodder). The split decision itself reads
    only manifest row counts — at 100 TB deciding costs one JSON
    read."""
    import numpy as np

    from sressentials_spark.operators import similarity as S
    from sressentials_spark.operators.linalg import quantize_exact

    fault = fault or (lambda step: None)
    version = ivf_index_versions(base_path)[-1]
    man = read_ivf_manifest(base_path, version)
    books = _books_from_json(man["books"])
    m = len(books)
    sizes: dict[int, int] = {}
    for e in man["files"]:
        sizes[e["cell"]] = sizes.get(e["cell"], 0) + e["rows"]
    n_rows = sum(sizes.values())
    cents = {int(c): list(v) for c, v in man["coarse"].items()}
    threshold = n_rows * factor_pct // (len(cents) * 100)
    oversized = sorted(c for c, n in sizes.items() if n > threshold)

    data_dir = os.path.join(base_path, "data")
    # The re-encode can only be as complete as the caller's corpus: if
    # `emb` is stale (e.g. a concurrent ingest committed rows after the
    # caller read the corpus — the same hazard on the lost-publish-race
    # retry, where the re-read manifest is newer than `emb`), the
    # per-cell inner join below would silently drop those members from
    # the rewritten child lists — permanent row loss. Verify ONCE, up
    # front, that every oversized cell's manifest member id resolves in
    # `emb` — one left_anti pass over the union instead of a
    # full-corpus join per cell — and abort before any staging; the
    # caller re-reads the source of truth and retries
    # (refresh_ivfpq_index_versioned's contract).
    if oversized:
        missing = (
            read_ivf_index_version(spark, base_path, version, cells=oversized)
            .select(id_col)
            .join(emb.select(id_col), id_col, "left_anti")
            .count()
        )
        if missing:
            raise ValueError(
                f"corpus is stale for cells {oversized}: {missing} member "
                f"id(s) in manifest v{version} of {base_path} are absent "
                "from the supplied embeddings — re-read the source-of-truth "
                "corpus and retry the rebalance"
            )
    new_entries: list[dict] = []
    for c in oversized:
        member_ids = read_ivf_index_version(
            spark, base_path, version, cells=[c]
        ).select(id_col)
        members = emb.join(member_ids, id_col).select(id_col, "embedding")
        h = md5_long(
            F.concat(F.lit(split_seed + ":"), F.col(id_col).cast("string"))
        )
        seed_rows = (
            members.withColumn("_h", h)
            .orderBy("_h", id_col)
            .limit(2)
            .collect()
        )
        ch_coarse = {
            int(r[id_col]) + IVFPQ_CHILD_ID_BASE: [
                int(x)
                for x in quantize_exact(
                    np.asarray(r["embedding"], dtype=np.float64)
                )
            ]
            for r in seed_rows
        }
        new_entries += _commit_lists(
            S._encode_ivfpq_lists(members, ch_coarse, books, m=m, id_col=id_col),
            data_dir,
        )
        cents.pop(c, None)
        cents.update(ch_coarse)
        fault(f"staged:{c}")

    if oversized:
        split = set(oversized)
        files = [e for e in man["files"] if e["cell"] not in split]
        files += new_entries
        fault("prepared")
        try:
            _publish_ivf_manifest(
                base_path,
                version + 1,
                _carry_manifest_extra(man, {
                    "version": version + 1,
                    "coarse": {str(c): v for c, v in sorted(cents.items())},
                    "books": man["books"],
                    **_files_payload(base_path, man, files),
                }),
            )
        except FileExistsError:
            # Same recovery as the cosine tier: the winner changed the
            # file set (and maybe the cells), so the split decision's
            # inputs are stale — re-run against the new latest.
            if retries <= 0:
                raise
            fault("retrying")
            return rebalance_ivfpq_index_versioned(
                spark,
                emb,
                base_path,
                factor_pct=factor_pct,
                split_seed=split_seed,
                id_col=id_col,
                fault=fault,
                retries=retries - 1,
            )
        fault("published")
    return {
        "cells_split": len(oversized),
        "split_cells": oversized,
        "threshold": int(threshold),
        "n_centroids": len(cents),
        "version": version + 1 if oversized else version,
    }


def refresh_ivfpq_index_versioned(
    emb: DataFrame,
    base_path: str,
    n_cells: int = IVF_CELLS,
    m: int | None = None,
    k: int | None = None,
    iters: int | None = None,
    id_col: str = "vec_id",
    fault: Callable[[str], None] | None = None,
) -> int:
    """CRASH-ATOMIC codebook refresh — the maintenance verb the drift
    gauge (``similarity.ivfpq_refresh_decision``) schedules: retrain
    BOTH quantizers on the CURRENT corpus ``emb``, re-encode every row
    under the fresh artifacts, and publish lists + coarse centroids +
    codebooks as ONE new manifest version. Readers of the previous
    version are never disturbed; a crash anywhere before the final
    link leaves the old quantizers fully live (staged files are vacuum
    fodder) — the swap the bare sidecar layout cannot do safely, since
    rewriting ``_coarse``/``_pq_books`` next to live lists has a
    window where lists and quantizers disagree.

    Cost is O(corpus) — a refresh IS the periodic rebuild, amortized
    across the many O(batch) ingests it re-anchors. Single
    maintenance writer by contract: losing the publish race (e.g. to
    a concurrent ingest, whose batch the caller-supplied ``emb`` may
    not contain) raises ``FileExistsError`` to the caller, who
    re-reads the source-of-truth corpus and re-decides — retrying with
    a stale ``emb`` would silently drop the winner's rows."""
    from sressentials_spark.operators import similarity as S
    from sressentials_spark.operators.cluster import kmeans_fit_centroids

    fault = fault or (lambda step: None)
    m = m if m is not None else S.PQ_M
    k = k if k is not None else S.PQ_K
    iters = iters if iters is not None else S.PQ_ITERS
    version = ivf_index_versions(base_path)[-1]
    parent = read_ivf_manifest(base_path, version)
    coarse = kmeans_fit_centroids(emb, k=n_cells, iters=iters, id_col=id_col)
    books = S.pq_train_codebooks(
        emb, m, k, iters=iters, id_col=id_col, residual_coarse=coarse
    )
    entries = _commit_lists(
        S._encode_ivfpq_lists(emb, coarse, books, m=m, id_col=id_col),
        os.path.join(base_path, "data"),
    )
    fault("staged")
    _publish_ivf_manifest(
        base_path,
        version + 1,
        _carry_manifest_extra(parent, {
            "version": version + 1,
            "coarse": {
                str(int(c)): [int(x) for x in v] for c, v in sorted(coarse.items())
            },
            "books": _books_to_json(books),
            **_files_payload(base_path, parent, entries),
        }),
    )
    fault("published")
    return version + 1


def import_ivfpq_index_versioned(
    spark,
    bare_path: str,
    base_path: str,
    id_col: str = "vec_id",
) -> int:
    """Migrate a bare sidecar-layout IVF-PQ index
    (:func:`similarity.build_ivfpq_index`: ``cell=*/`` code lists +
    ``_coarse``/``_pq_books`` parquet sidecars) into the
    manifest-versioned store as version 1 — the adoption path for an
    existing index estate: no retrain, no re-encode (the codes are
    copied verbatim, so serving is bit-identical by construction —
    pinned by tests), one read+write pass over the compressed lists
    (M small ints per vector, ~32x under the raw corpus) and the
    quantizers move INSIDE the atomically-published manifest. A crash
    anywhere before the final link leaves no manifest — readers see
    "no versions", never a partial import; the staged commit files are
    vacuum fodder. After import, the bare store is unreferenced and
    can be retired."""
    from sressentials_spark.operators import similarity as S

    books = S.load_pq_books(spark, bare_path)
    coarse = S.load_ivfpq_coarse(spark, bare_path)
    m = len(books)
    lists = spark.read.parquet(bare_path).select(
        F.col(id_col),
        F.col("cell").cast("long").alias("cell"),
        *[f"code_{i}" for i in range(m)],
    )
    entries = _commit_lists(lists, os.path.join(base_path, "data"))
    _publish_ivf_manifest(
        base_path,
        1,
        {
            "version": 1,
            "coarse": {
                str(int(c)): [int(x) for x in v] for c, v in sorted(coarse.items())
            },
            "books": _books_to_json(books),
            "files": entries,
        },
    )
    return 1


def promote_ivf_manifest_list(
    base_path: str,
    *,
    fault: Callable[[str], None] | None = None,
    retries: int = 5,
) -> dict:
    """Promote the LATEST version to the TWO-LEVEL manifest layout —
    the Iceberg manifest-list split, and the 100 TB growth path the
    single-JSON manifest can't walk: one flat manifest is re-written
    in full by every publish (O(index files) JSON — ~20-40 MB at
    200k files), which is fine at maintenance cadence but the wrong
    shape for high-frequency streaming ingest. Promotion maps the
    existing layout onto the split 1:1 WITHOUT rewriting history or
    touching a single data file: entries are already grouped by their
    immutable ``commit-<id>`` dir, so each commit's entry block lands
    as its own immutable manifest FILE (``manifests/manifest-*.json``)
    and the published version shrinks to a manifest LIST — one pointer
    per live commit with rolled-up ``cells``/``n_rows``/id-range stats
    for driver-side pruning at the list level. After promotion every
    descendant publish is layout-preserving (``_files_payload``):
    untouched blocks are reused by pointer, so an ingest's publish
    cost drops to O(commits touched), and reads/serving are bit-equal
    by construction (rows, cells and quantizers are byte-identical —
    only the listing's shape changed).

    Commit discipline is the house verb's verbatim: blocks stage
    first (writer-unique names), the version JSON publishes LAST via
    one atomic exclusive link, riders carry forward, a crash anywhere
    before the link leaves the flat version fully live (staged blocks
    are vacuum fodder), and a lost publish race re-plans against the
    new latest. Idempotent: an already-two-level latest returns
    ``promoted=False`` without writing anything."""
    fault = fault or (lambda step: None)
    for _ in range(retries + 1):
        version = ivf_index_versions(base_path)[-1]
        raw = _read_manifest_raw(base_path, version)
        if "manifest_list" in raw:
            return {
                "promoted": False,
                "version": version,
                "n_manifests": len(raw["manifest_list"]),
            }
        entries = raw["files"]
        by_commit: dict[str, list[dict]] = {}
        for e in entries:
            by_commit.setdefault(e["path"].split("/", 1)[0], []).append(e)
        pointers: list[dict] = []
        for commit, block in sorted(by_commit.items()):
            pointers.append(_write_manifest_file(base_path, block))
            fault(f"staged:{commit}")
        payload: dict = {"version": version + 1, "manifest_list": pointers}
        for key in ("centroids", "coarse", "books"):
            if key in raw:
                payload[key] = (
                    {str(c): v for c, v in sorted(raw[key].items())}
                    if isinstance(raw[key], dict)
                    else raw[key]
                )
        _carry_manifest_extra(raw, payload)
        fault("prepared")
        try:
            _publish_ivf_manifest(base_path, version + 1, payload)
        except FileExistsError:
            # The winner changed the file set; staged blocks of this
            # attempt are vacuum fodder — re-plan against the new latest.
            fault("retrying")
            continue
        fault("published")
        return {
            "promoted": True,
            "version": version + 1,
            "n_manifests": len(pointers),
            "n_files": len(entries),
        }
    raise RuntimeError(
        f"promotion lost the publish race {retries + 1} times under {base_path}"
    )


def ivf_index_history(spark, base_path: str) -> "DataFrame":
    """The index's committed-version catalog as a queryable DataFrame —
    the versioned tier's twin of Iceberg's ``snapshots`` metadata
    table: one row per live manifest with its logical stats
    (``version``, ``n_files``, ``n_rows``, ``n_cells``) and the
    streaming high-water stamp (``stream_batch_id``, null when the
    version predates any stamped ingest). Everything derives from the
    manifests alone — O(live versions) small JSON reads driver-side,
    never a data-file scan — which is exactly the operational surface a
    maintenance scheduler wants: row growth between versions is the
    ingest audit, n_cells jumps mark rebalances, a full file-set swap
    at constant rows marks a refresh/compact, and the stamp column is
    the exactly-once ingest ledger. ``n_rows``/``n_cells`` are
    relationally restatable (counts + the split rule), so the verb can
    sit under the oracle gate; ``n_files`` is physical layout and stays
    a model-tested column."""
    rows = []
    for v in ivf_index_versions(base_path):
        # Raw read: both layouts answer from the version JSON alone —
        # flat manifests list entries inline, two-level ones carry the
        # per-block rollups — so history never loads an entry block.
        man = _read_manifest_raw(base_path, v)
        quant = man.get("centroids") or man.get("coarse") or {}
        stamp = man.get("stream_batch_id")
        if "manifest_list" in man:
            n_files = sum(int(p["n_files"]) for p in man["manifest_list"])
            n_rows = sum(int(p["n_rows"]) for p in man["manifest_list"])
        else:
            n_files = len(man["files"])
            n_rows = sum(e["rows"] for e in man["files"])
        rows.append(
            (
                int(v),
                int(n_files),
                int(n_rows),
                len(quant),
                int(stamp) if stamp is not None else None,
            )
        )
    return local_df(
        spark,
        rows,
        "version bigint, n_files bigint, n_rows bigint, n_cells bigint, "
        "stream_batch_id bigint",
    )


def vacuum_ivf_index(
    base_path: str, *, keep_last: int = 1, orphan_min_age_s: float = 3600.0
) -> dict:
    """Reclaim data files unreachable from the ``keep_last`` newest
    manifests, drop expired manifests, and sweep stray staging
    manifests (a writer killed inside publish). Surviving versions read
    exactly as committed — the snapshot tier's vacuum contract,
    including its in-flight-writer grace window: files referenced by an
    EXPIRED manifest were durably committed and delete freely, but
    files no manifest explains may be a live writer's staged commit and
    delete only once quiesced for ``orphan_min_age_s`` (pass 0 only
    when no writer can be live). ``keep_last`` must be >= 1: an index
    with zero versions is unreadable, so "expire everything" is not a
    vacuum verb (the snapshot tier enforces the same floor)."""
    import time

    from sressentials_spark.operators.maintenance import _quiesced

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = ivf_index_versions(base_path)
    keep = versions[-keep_last:]
    # Reachability walks BOTH layouts: the transparent read flattens a
    # two-level version's blocks into entries (data-file liveness),
    # and the pointer paths themselves are collected as live/committed
    # MANIFEST files — a block shared between an expired and a kept
    # version (pointer reuse) stays live.
    live: set[str] = set()
    live_manifests: set[str] = set()
    for v in keep:
        man = read_ivf_manifest(base_path, v)
        for e in man["files"]:
            live.add(os.path.normpath(e["path"]))
        for p in man.get("manifest_list", []):
            live_manifests.add(os.path.normpath(p["path"]))
    committed: set[str] = set()  # referenced by an expired manifest
    committed_manifests: set[str] = set()
    for v in versions:
        if v not in keep:
            man = read_ivf_manifest(base_path, v)
            for e in man["files"]:
                committed.add(os.path.normpath(e["path"]))
            for p in man.get("manifest_list", []):
                committed_manifests.add(os.path.normpath(p["path"]))
    data_dir = os.path.join(base_path, "data")
    removed_files = 0
    now = time.time()
    # ``touched`` = dirs whose mtime THIS vacuum bumps by deleting dead
    # entries inside them. Commit dirs are writer-unique, so a dir we
    # emptied held only expired-committed or quiesced-orphan files —
    # its writer is provably done, and the dir counts as quiesced no
    # matter what its (our own) fresh mtime says. Without this, the
    # dir sweeps race vacuum's own pass-1 mutations: the old code's
    # single entry-time ``now`` made ``_quiesced(d, 0, now)`` see
    # ``now - mtime < 0`` whenever the unlink landed a clock tick
    # later, and the explicitly-waived grace window silently held
    # (flaky test_vacuum_grace_window_protects_inflight_staging).
    touched: set[str] = set()
    for f in globmod.glob(os.path.join(data_dir, "commit-*", "*", "*.parquet")):
        rel = os.path.normpath(os.path.relpath(f, data_dir))
        if rel in live:
            continue
        if rel in committed or _quiesced(f, orphan_min_age_s, now):
            os.unlink(f)
            removed_files += 1
            cell_dir = os.path.dirname(f)
            touched.add(cell_dir)
            touched.add(os.path.dirname(cell_dir))
    # A writer killed mid-Spark-write leaves its parquet under
    # commit-*/_temporary/... — unreachable by the two-level glob above
    # and (being parquet) keeping the commit-dir sweep below from ever
    # reclaiming the dir. A quiesced _temporary means no task attempt
    # has touched staging within the grace window: the job is dead, so
    # the subtree reclaims explicitly.
    for t in globmod.glob(os.path.join(data_dir, "commit-*", "_temporary")):
        if os.path.isdir(t) and _quiesced(t, orphan_min_age_s, now):
            shutil.rmtree(t)
            touched.add(os.path.dirname(t))
    # Re-capture now so vacuum's own pass-1 mutations are in the past;
    # with the grace window waived (orphan_min_age_s=0) the sweeps
    # below are then deterministic.
    now = time.time()
    # Drop now-empty cell dirs and parquet-free commit dirs — but only
    # our own leftovers (``touched``) or quiesced ones: a live writer's
    # job-commit has momentarily-empty destination cellp= dirs before
    # task files move in, and sweeping one would fail that writer.
    for d in globmod.glob(os.path.join(data_dir, "commit-*", "*")):
        if (
            os.path.isdir(d)
            and not os.listdir(d)
            and (d in touched or _quiesced(d, orphan_min_age_s, now))
        ):
            os.rmdir(d)
            touched.add(os.path.dirname(d))
    for d in globmod.glob(os.path.join(data_dir, "commit-*")):
        if (
            os.path.isdir(d)
            and not any(
                globmod.glob(os.path.join(d, "**", "*.parquet"), recursive=True)
            )
            and (d in touched or _quiesced(d, orphan_min_age_s, now))
        ):
            shutil.rmtree(d)
    removed_manifests = 0
    for v in versions:
        if v not in keep:
            os.unlink(_manifest_path(base_path, v))
            removed_manifests += 1
    for t in globmod.glob(
        os.path.join(base_path, "index-manifest-v*.json.tmp-*")
    ):
        if _quiesced(t, orphan_min_age_s, now):
            os.unlink(t)
    # Manifest FILES (two-level blocks), swept AFTER the expired
    # version JSONs so a crash mid-vacuum can never strand a readable
    # expired version with missing blocks: blocks referenced only by a
    # now-unlinked expired version reclaim freely; blocks no version
    # explains may be a live writer's staging (a promotion or a
    # layout-preserving publish mid-flight) and honor the grace
    # window, exactly like orphan commit dirs.
    removed_manifest_files = 0
    for f in globmod.glob(os.path.join(base_path, "manifests", "*.json")):
        rel = os.path.normpath(os.path.relpath(f, base_path))
        if rel in live_manifests:
            continue
        if rel in committed_manifests or _quiesced(f, orphan_min_age_s, now):
            os.unlink(f)
            removed_manifest_files += 1
    for t in globmod.glob(
        os.path.join(base_path, "manifests", "*.json.tmp-*")
    ):
        if _quiesced(t, orphan_min_age_s, now):
            os.unlink(t)
    return {
        "removed_files": removed_files,
        "removed_manifests": removed_manifests,
        "removed_manifest_files": removed_manifest_files,
        "kept_versions": keep,
    }
