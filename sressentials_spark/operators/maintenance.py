"""Table maintenance: small-file compaction.

The small-files problem is the quiet killer of 100 TB lakehouse
tables: a streaming sink or over-parallel batch write lands thousands
of KB-scale parquet files per partition, and every subsequent scan
pays per-file open/footer costs that dwarf the data read (plus
NameNode/object-store listing pressure). Compaction rewrites a
directory to size-targeted files WITHOUT a shuffle: the row data never
re-keys, so ``coalesce`` (a narrow dependency that concatenates input
partitions) is the whole physical plan — each output task streams N
input files into one output file. Contrast ``repartition``, which
would pay a full shuffle of the table to achieve the same file count.

Sizing comes from the filesystem manifest, not a guess: output file
count = ceil(total_bytes / target_bytes), so the rewrite hits the
target regardless of how skewed the input files are. (Object-store
deployments read the same numbers from the listing API; a lakehouse
table format — Delta/Iceberg — from its manifest.)

Clustering caveat — MEASURED, not assumed: plain ``coalesce`` does NOT
preserve a range-clustered layout. Its partition coalescer groups
input partitions by locality, not listing order, so ranges from
opposite ends of the sort interleave into the same output file and
footer-stats skipping dies (the first version of this module claimed
otherwise; tests/test_maintenance.py caught it). Compacting a
clustered layout therefore goes through
:func:`compact_clustered_files`, which bins CONTIGUOUS files (listing
order = cluster order for the range/Z-order layouts) and concatenates
each bin into one output file — per-file min/max stay disjoint, still
zero shuffles, at the price of one small read job per output file.
"""

from __future__ import annotations

import glob as globmod
import os
from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Production-shaped target (the parquet sweet spot on object storage).
DEFAULT_TARGET_BYTES = 128 * 1024 * 1024


def file_manifest(path: str) -> list[tuple[str, int]]:
    """(file, bytes) for every parquet part file under ``path``,
    recursively (snapshot tables nest commits in subdirectories;
    plain layouts stay flat — both are covered)."""
    return [
        (p, os.path.getsize(p))
        for p in sorted(
            globmod.glob(os.path.join(path, "**", "part-*.parquet"), recursive=True)
        )
    ]


def compact_small_files(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Rewrite ``src_dir``'s parquet files into ceil(total/target)
    size-targeted files at ``out_dir`` with a shuffle-free plan.
    Returns the before/after manifest stats (pinned by tests)."""
    manifest = file_manifest(src_dir)
    if not manifest:
        raise ValueError(f"no parquet part files under {src_dir}")
    total = sum(b for _, b in manifest)
    n_out = max(1, -(-total // target_bytes))
    (
        spark.read.parquet(src_dir)
        .coalesce(n_out)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    out_manifest = file_manifest(out_dir)
    return {
        "files_before": len(manifest),
        "files_after": len(out_manifest),
        "bytes_before": total,
        "bytes_after": sum(b for _, b in out_manifest),
        "target_files": n_out,
    }


def compact_clustered_files(
    spark: SparkSession,
    src_dir: str,
    out_dir: str,
    target_bytes: int = DEFAULT_TARGET_BYTES,
) -> dict:
    """Clustering-PRESERVING compaction: bin contiguous files from the
    sorted listing (= cluster order for the range/Z-order layouts in
    ``sources.columnar``) and concatenate each bin into one output
    file, so per-file min/max footer stats stay disjoint and data
    skipping survives the nightly compaction. Plain
    :func:`compact_small_files` cannot guarantee this — coalesce's
    partition coalescer groups by locality and interleaves ranges —
    so the choice between the two is the clustered-vs-unclustered
    layout question, made explicit instead of silently wrong. One
    narrow read job per output file, zero shuffles; row-group stats
    inside an output file may widen (rows of a bin can interleave),
    but file-level pruning — the granularity object-store listing
    cares about — is preserved (pinned by tests)."""
    import shutil

    manifest = file_manifest(src_dir)
    if not manifest:
        raise ValueError(f"no parquet part files under {src_dir}")
    total = sum(b for _, b in manifest)

    bins: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for f, b in manifest:
        if cur and cur_bytes + b > target_bytes:
            bins.append(cur)
            cur, cur_bytes = [], 0
        cur.append(f)
        cur_bytes += b
    if cur:
        bins.append(cur)

    os.makedirs(out_dir, exist_ok=True)
    for i, bin_files in enumerate(bins):
        tmp = os.path.join(out_dir, f"_bin{i}")
        (
            spark.read.parquet(*bin_files)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = globmod.glob(os.path.join(tmp, "part-*.parquet"))[0]
        os.replace(
            part, os.path.join(out_dir, f"part-{i:05d}-compacted.parquet")
        )
        shutil.rmtree(tmp, ignore_errors=True)

    out_manifest = file_manifest(out_dir)
    return {
        "files_before": len(manifest),
        "files_after": len(out_manifest),
        "bytes_before": total,
        "bytes_after": sum(b for _, b in out_manifest),
        "target_files": len(bins),
    }


@contextmanager
def _dynamic_partition_overwrite(spark: SparkSession):
    """Scope ``partitionOverwriteMode=dynamic``: ``mode("overwrite")``
    then replaces ONLY the partitions present in the written data —
    STATIC (the default) would truncate the whole table first, which on
    a 3-year fact table turns a one-day repair into a total rewrite."""
    key = "spark.sql.sources.partitionOverwriteMode"
    old = spark.conf.get(key, "static")
    spark.conf.set(key, "dynamic")
    try:
        yield
    finally:
        spark.conf.set(key, old)


def overwrite_day_partition(
    spark: SparkSession, layout_path: str, day_rows: DataFrame
) -> None:
    """Idempotently rebuild the day partition(s) covered by
    ``day_rows`` (which must carry the ``d`` partition column) in a
    day-partitioned parquet layout. Dynamic partition overwrite makes
    this the atomic unit of backfill/repair: re-running it converges
    to the same state, and untouched days' files are never listed,
    read, or rewritten (pinned by tests/test_maintenance.py via file
    mtimes). This is the everyday maintenance verb on a partitioned
    100 TB fact table — a corrupted or late-restated day is recomputed
    from source and swapped in, with readers of other days unaffected."""
    with _dynamic_partition_overwrite(spark):
        (
            day_rows.repartition("d")
            .write.mode("overwrite")
            .partitionBy("d")
            .parquet(layout_path)
        )


def corrupt_then_rebuild_day(
    spark: SparkSession, sf_dir: str, layout_path: str, day: str
) -> DataFrame:
    """Repair drill for the partition-overwrite query: deliberately
    clobber one day's partition (half the rows, values zeroed — a
    botched backfill), rebuild it from the source of truth, and return
    the repaired day re-read from the layout. The oracle then asserts
    the repaired partition equals the source exactly — proof the
    overwrite both fixed the target day and touched nothing else."""
    from sressentials_spark.sources.tables import load_table

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    day_src = events.filter(F.to_date("ts") == F.lit(day)).withColumn(
        "d", F.to_date("ts")
    )
    bad = day_src.filter(F.col("event_id") % 2 == 0).withColumn(
        "value", F.lit(0.0)
    )
    overwrite_day_partition(spark, layout_path, bad)
    overwrite_day_partition(spark, layout_path, day_src)
    return (
        spark.read.parquet(layout_path)
        .filter(F.col("d") == F.lit(day))
        .select("event_id", "user_id", "ts", "event_type", "value")
    )


# --------------------------------------------------------------------------
# Manifest-based snapshots: time travel + vacuum (the Delta/Iceberg
# pattern rebuilt on bare parquet + JSON manifests)
# --------------------------------------------------------------------------

#: Manifest files live next to the data, one per committed version.
_MANIFEST_FMT = "manifest-v{version}.json"


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, _MANIFEST_FMT.format(version=version))


def _enc_stat(v):
    """Manifest-storable stat value: JSON-native types pass through;
    datetime/date encode as ISO-8601 strings (fixed-width, so string
    comparison preserves order — what pruning needs). Anything else
    fails FAST, before any data is written."""
    import datetime

    if v is None or isinstance(v, (int, float, str, bool)):
        return v
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    raise ValueError(
        f"stats_cols value of type {type(v).__name__} is not manifest-"
        "storable (use int/float/str/timestamp/date columns)"
    )


def _commit_data(
    spark: SparkSession,
    df: DataFrame,
    data_dir: str,
    stats_cols: list[str] | None,
) -> list[dict]:
    """Write ``df`` under a unique ``commit-<id>/`` dir and return the
    manifest entries (with per-file min/max stats when requested) —
    the commit half shared by snapshot_write and snapshot_merge."""
    import uuid

    if stats_cols:
        # Fail fast on un-storable stat column types BEFORE writing.
        from pyspark.sql import types as T

        ok = (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.StringType, T.BooleanType,
            T.TimestampType, T.DateType,
        )
        for c in stats_cols:
            dt = df.schema[c].dataType
            if not isinstance(dt, ok):
                raise ValueError(
                    f"stats_cols column {c!r} has type {dt.simpleString()} "
                    "— not manifest-storable (numeric/string/timestamp/"
                    "date only)"
                )
    commit_id = f"commit-{uuid.uuid4().hex[:16]}"
    commit_dir = os.path.join(data_dir, commit_id)
    # errorifexists: a uuid collision must fail loudly, never merge.
    df.write.mode("error").parquet(commit_dir)
    entries = [
        {"path": f"{commit_id}/{os.path.basename(f)}", "stats": {}}
        for f, _ in file_manifest(commit_dir)
    ]
    if stats_cols:
        rows = (
            spark.read.parquet(commit_dir)
            .groupBy(F.input_file_name().alias("_f"))
            .agg(
                *[
                    f
                    for c in stats_cols
                    for f in (
                        F.min(c).alias(f"_mn_{c}"),
                        F.max(c).alias(f"_mx_{c}"),
                    )
                ]
            )
            .collect()
        )
        by_base = {
            os.path.basename(r["_f"].split("?")[0]): r for r in rows
        }
        for e in entries:
            r = by_base.get(os.path.basename(e["path"]))
            if r is not None:
                e["stats"] = {
                    c: [_enc_stat(r[f"_mn_{c}"]), _enc_stat(r[f"_mx_{c}"])]
                    for c in stats_cols
                }
    return entries


def atomic_publish_json(path: str, payload: dict) -> None:
    """Exclusive, DURABLE json publish — the one commit idiom every
    manifest tier shares (snapshot tables here; the versioned ANN
    indexes in operators/ivf_versioned.py):

    * the staging file name is WRITER-UNIQUE (uuid suffix): two racers
      must never share a staging inode, or the winner's ``os.link``
      can publish the loser's half-written bytes as a committed
      version;
    * the bytes are fsync'd before the link and the DIRECTORY after
      it: without both, a power loss can leave the committed name
      durable while its contents are not — "crash-atomic" must mean
      machine crashes, not just process kills;
    * ``os.link`` onto the final name is exclusive: exactly one racer
      wins, the loser raises ``FileExistsError`` and must retry
      against the new latest (the Delta/Iceberg commit-conflict
      rule)."""
    import json
    import uuid

    tmp = f"{path}.tmp-{uuid.uuid4().hex[:12]}"
    fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
    try:
        with os.fdopen(fd, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.link(tmp, path)
        dfd = os.open(os.path.dirname(path) or ".", os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
    finally:
        os.unlink(tmp)


def _publish_manifest(
    table_dir: str, version: int, mode: str, files: list
) -> None:
    """Write + atomically link-publish one version manifest (refuses
    to overwrite: the optimistic-concurrency loser gets
    FileExistsError) — shared by every committing verb."""
    atomic_publish_json(
        _manifest_path(table_dir, version),
        {"version": version, "mode": mode, "files": files},
    )


def snapshot_versions(table_dir: str) -> list[int]:
    """Committed versions, ascending (empty for a fresh table)."""
    out = []
    for p in globmod.glob(os.path.join(table_dir, "manifest-v*.json")):
        base = os.path.basename(p)
        out.append(int(base[len("manifest-v"):-len(".json")]))
    return sorted(out)


def snapshot_write(
    spark: SparkSession,
    df: DataFrame,
    table_dir: str,
    *,
    mode: str = "replace",
    stats_cols: list[str] | None = None,
) -> int:
    """Commit ``df`` as the next snapshot version of ``table_dir``.

    The table-format contract in miniature: data files are immutable
    and append-only under ``data/`` (parquet writers never reuse part
    file names); what makes a version is the MANIFEST — a JSON list
    of the files visible at that version. ``mode="replace"`` makes
    the new files the whole table (a rewrite/overwrite commit);
    ``mode="append"`` makes the new version the parent's file set
    plus the new files. Readers of old versions are never disturbed:
    nothing is deleted or rewritten until :func:`snapshot_vacuum`.

    ``stats_cols`` records per-file min/max for those columns in the
    manifest (one extra pass over the FRESH commit only — the
    Iceberg-style file statistics): :func:`read_snapshot` then prunes
    files from a predicate range at the MANIFEST level, before any
    parquet footer is opened — at 100 TB that is the difference
    between listing a thousand files and opening them.

    Commit ordering: data files land first, the manifest link-lands
    last — a crashed writer leaves orphan data files (reclaimed by
    vacuum), never a manifest pointing at missing data. Each commit
    writes its data under a UNIQUE ``data/commit-<id>/`` directory and
    attributes its files by listing that directory alone — never by
    diffing the shared ``data/`` dir — so a racing writer's part files
    can never be absorbed into this writer's manifest (nor duplicated
    on its retry). The final manifest is published with an atomic
    exclusive ``os.link`` onto the version name, so two writers racing
    to the same version resolve as optimistic concurrency: exactly one
    commit wins, the loser raises ``FileExistsError`` and must retry
    against the new latest (the Delta/Iceberg commit-conflict rule) —
    its already-written commit directory stays orphaned until vacuum.
    At 100 TB the manifest write is O(files), the data write is the
    job itself, and concurrent readers resolve versions by listing
    tiny JSON files — the same economics as Delta's _delta_log.
    """
    import json

    if mode not in ("replace", "append"):
        raise ValueError(f"mode must be replace|append, got {mode!r}")
    data_dir = os.path.join(table_dir, "data")
    entries = _commit_data(spark, df, data_dir, stats_cols)
    versions = snapshot_versions(table_dir)
    version = (versions[-1] if versions else 0) + 1
    visible = list(entries)
    if mode == "append" and versions:
        with open(_manifest_path(table_dir, versions[-1])) as fh:
            visible = [
                _norm_entry(e) for e in json.load(fh)["files"]
            ] + visible
    _publish_manifest(table_dir, version, mode, visible)
    return version


def _norm_entry(e) -> dict:
    """Manifest entry in the stats shape (pre-stats manifests stored
    bare path strings)."""
    return {"path": e, "stats": {}} if isinstance(e, str) else e


def read_snapshot(
    spark: SparkSession,
    table_dir: str,
    version: int,
    *,
    prune: tuple | None = None,
) -> DataFrame:
    """Time-travel read: the table exactly as of ``version``.

    ``prune=(col, lo, hi)`` drops every file whose manifest min/max
    range for ``col`` cannot intersect ``[lo, hi]`` BEFORE the scan is
    planned — manifest-level data skipping (files without stats are
    always read; correctness never depends on pruning, only cost —
    pinned by tests). Returns an empty frame with the table's schema
    when every file prunes away."""
    import json

    with open(_manifest_path(table_dir, version)) as fh:
        manifest = json.load(fh)
    data_dir = os.path.join(table_dir, "data")
    entries = [_norm_entry(e) for e in manifest["files"]]
    if prune is not None:
        col, lo, hi = prune
        entries = [
            e
            for e in entries
            if not (
                (st := e["stats"].get(col)) is not None
                and st[0] is not None
                and st[1] is not None
                and (st[0] > hi or st[1] < lo)
            )
        ]
        if not entries:
            all_paths = [
                os.path.join(data_dir, _norm_entry(e)["path"])
                for e in manifest["files"]
            ]
            empty = spark.read.parquet(*all_paths).limit(0)
            return empty
    paths = [os.path.join(data_dir, e["path"]) for e in entries]
    return spark.read.parquet(*paths)


def snapshot_files(table_dir: str, version: int) -> list[str]:
    """The data_dir-relative file paths visible at ``version``."""
    import json

    with open(_manifest_path(table_dir, version)) as fh:
        return [_norm_entry(e)["path"] for e in json.load(fh)["files"]]


def _quiesced(path: str, min_age_s: float, now: float) -> bool:
    """True when nothing under ``path`` (itself, or any entry below a
    directory) was modified within ``min_age_s`` — the in-flight-writer
    guard vacuum needs before touching files no manifest explains."""
    try:
        if now - os.path.getmtime(path) < min_age_s:
            return False
    except FileNotFoundError:
        return True
    if os.path.isdir(path):
        for root, dirs, files in os.walk(path):
            for name in dirs + files:
                try:
                    if now - os.path.getmtime(os.path.join(root, name)) < min_age_s:
                        return False
                except FileNotFoundError:
                    continue
    return True


def snapshot_vacuum(
    table_dir: str, *, keep_last: int = 1, orphan_min_age_s: float = 3600.0
) -> dict:
    """Reclaim data files unreachable from the ``keep_last`` newest
    manifests (and drop the expired manifests). Returns counts; the
    surviving versions still read exactly as committed. The 100 TB
    retention job: deletes are manifest-driven file unlinks, never a
    data scan.

    Two reclamation classes (the Iceberg split): files referenced by
    an EXPIRED manifest were durably committed, so they delete freely;
    files referenced by NO manifest at all may belong to an IN-FLIGHT
    writer that has staged its commit but not yet published — those
    delete only once quiesced for ``orphan_min_age_s`` (default 1 h).
    Without the grace window, a vacuum racing a writer deletes the
    staged files and the writer's subsequent publish commits a
    manifest pointing at nothing. Pass ``orphan_min_age_s=0`` only
    when no writer can be live (tests; single-writer maintenance).
    ``keep_last`` must be >= 1: a table with zero snapshots is
    unreadable, so "expire everything" is not a vacuum verb (the IVF
    index tier enforces the same floor)."""
    import json
    import time

    if keep_last < 1:
        raise ValueError(f"keep_last must be >= 1, got {keep_last}")
    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots under {table_dir}")
    keep = versions[-keep_last:]
    expired = [v for v in versions if v not in keep]
    live: set[str] = set()
    for v in keep:
        with open(_manifest_path(table_dir, v)) as fh:
            live.update(
                _norm_entry(e)["path"] for e in json.load(fh)["files"]
            )
    committed: set[str] = set()  # referenced by an expired manifest
    for v in expired:
        with open(_manifest_path(table_dir, v)) as fh:
            committed.update(
                _norm_entry(e)["path"] for e in json.load(fh)["files"]
            )
    data_dir = os.path.join(table_dir, "data")
    removed = 0
    now = time.time()
    # ``touched`` = commit dirs whose mtime THIS vacuum bumps by
    # unlinking dead files inside them. Commit dirs are writer-unique,
    # so a dir we emptied held only expired-committed or
    # quiesced-orphan files — its writer is provably done, and the dir
    # counts as quiesced regardless of its (our own) fresh mtime.
    # Without this the sweep races vacuum's own unlink pass: a single
    # entry-time ``now`` makes ``_quiesced(d, 0, now)`` see
    # ``now - mtime < 0`` whenever the unlink lands a clock tick later,
    # and the explicitly-waived grace window silently holds (the race
    # that made the IVF twin's grace-window test flaky).
    touched: set[str] = set()
    # Manifest paths are data_dir-relative (commit-<id>/part-... for
    # r8+ commits, bare part-... for pre-r8 flat tables).
    for f, _ in file_manifest(data_dir):
        rel = os.path.relpath(f, data_dir)
        if rel in live:
            continue
        if rel in committed or _quiesced(f, orphan_min_age_s, now):
            os.remove(f)
            removed += 1
            # A _temporary file can be one job's long-dead task attempt
            # while the JOB is still live — unlinking it says nothing
            # about the commit dir's writer, so only post-commit files
            # mark their ancestors self-emptied.
            if "_temporary" not in rel.split(os.sep):
                d = os.path.dirname(f)
                while d != data_dir and os.path.dirname(d) != d:
                    touched.add(d)
                    d = os.path.dirname(d)
    # Re-capture now so vacuum's own unlinks are in the past; with the
    # grace window waived the sweep below is then deterministic.
    now = time.time()
    # Drop commit directories with no live part files left (loser-retry
    # or expired-version leftovers — only marker files like _SUCCESS
    # remain) so the data dir stays list-cheap. Our own leftovers
    # (``touched``) or quiesced-only: a live writer's staging
    # (_temporary/...) must never be swept.
    import shutil

    for d in globmod.glob(os.path.join(data_dir, "commit-*")):
        if (
            os.path.isdir(d)
            and not globmod.glob(os.path.join(d, "part-*.parquet"))
            and (d in touched or _quiesced(d, orphan_min_age_s, now))
        ):
            shutil.rmtree(d)
    for v in expired:
        os.remove(_manifest_path(table_dir, v))
    # Stray staging manifests (a writer killed inside publish): unique
    # per writer, so quiesced ones are dead.
    for t in globmod.glob(os.path.join(table_dir, "manifest-v*.json.tmp-*")):
        if _quiesced(t, orphan_min_age_s, now):
            os.unlink(t)
    return {
        "files_removed": removed,
        "files_live": len(live),
        "versions_expired": len(expired),
        "versions_kept": len(keep),
    }


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    *,
    target_bytes: int = DEFAULT_TARGET_BYTES,
    stats_cols: list[str] | None = None,
) -> int:
    """Compaction AS a snapshot commit — the composition real table
    maintenance runs: rewrite the HEAD version's file set into
    ceil(total/target) size-targeted files and land them as a new
    manifest version (same rows, fewer files). Nothing is deleted:
    time travel to any pre-compaction version still reads the old
    files byte-for-byte until :func:`snapshot_vacuum` reclaims them,
    and a crashed compaction leaves only an orphaned commit directory
    (the manifest link lands last). The rewrite plan is shuffle-free
    (``coalesce``); at 100 TB this is the nightly job that keeps the
    file count bounded while readers keep their snapshot isolation.
    Returns the new version number."""
    import json

    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots under {table_dir}")
    head = versions[-1]
    files = snapshot_files(table_dir, head)
    if not files:
        raise ValueError(f"head version v{head} of {table_dir} is empty")
    data_dir = os.path.join(table_dir, "data")
    paths = [os.path.join(data_dir, f) for f in files]
    total = sum(os.path.getsize(p) for p in paths)
    n_out = max(1, -(-total // target_bytes))
    compacted = spark.read.parquet(*paths).coalesce(n_out)
    # stats_cols keeps the rewritten files stats-carrying, so a later
    # copy-on-write merge can still prune against the compacted files
    # instead of conservatively rewriting everything.
    return snapshot_write(
        spark, compacted, table_dir, mode="replace", stats_cols=stats_cols
    )


def snapshot_merge(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    *,
    key_col: str,
    stats_cols: list[str] | None = None,
) -> dict:
    """Copy-on-write MERGE (the Delta/Iceberg ``MERGE INTO`` shape)
    committed as a snapshot version: rows in ``updates`` replace
    head-version rows with the same ``key_col`` and new keys append —
    but only the files whose manifest ``key_col`` min/max range can
    intersect the update keys are rewritten. Untouched files carry
    over into the new manifest BY REFERENCE, byte-identical (pinned by
    tests): at 100 TB a point-update batch rewrites a handful of files
    out of a million, which is exactly what the per-file stats exist
    for. Readers keep snapshot isolation — the parent version still
    reads the pre-merge files until :func:`snapshot_vacuum`.

    Requires the head commit to carry ``key_col`` stats (written with
    ``stats_cols``); files without stats are conservatively treated as
    affected (correctness never depends on pruning). Returns
    ``{"version", "files_rewritten", "files_carried"}``."""
    import json

    versions = snapshot_versions(table_dir)
    if not versions:
        raise ValueError(f"no snapshots under {table_dir}")
    head = versions[-1]
    with open(_manifest_path(table_dir, head)) as fh:
        entries = [_norm_entry(e) for e in json.load(fh)["files"]]
    if updates.limit(1).count() == 0:
        raise ValueError("empty updates batch")
    data_dir = os.path.join(table_dir, "data")

    # Exact file attribution: broadcast the (tiny, manifest-sized)
    # file-range table against the update keys — one O(|updates|)
    # pass; a file is affected iff SOME update key falls inside its
    # recorded [min, max]. Inserted keys beyond every range touch
    # nothing (a min/max envelope of the batch would smear them over
    # the whole table). Stats-less files are conservatively rewritten.
    ranged = [
        (e["path"], e["stats"][key_col][0], e["stats"][key_col][1])
        for e in entries
        if e["stats"].get(key_col) is not None
        and e["stats"][key_col][0] is not None
        and e["stats"][key_col][1] is not None
    ]
    no_stats = {e["path"] for e in entries} - {p for p, _, _ in ranged}
    hit: set[str] = set(no_stats)
    if ranged:
        # schema inferred from the JSON-round-tripped stat values, so
        # string/float keys work as well as the common integer case
        files_df = spark.createDataFrame(ranged, ["path", "mn", "mx"])
        hits = (
            updates.select(F.col(key_col).alias("_k"))
            .join(
                F.broadcast(files_df),
                (F.col("_k") >= F.col("mn")) & (F.col("_k") <= F.col("mx")),
            )
            .select("path")
            .distinct()
            .collect()
        )
        hit.update(r["path"] for r in hits)

    touched = [e for e in entries if e["path"] in hit]
    carried = [e for e in entries if e["path"] not in hit]

    cols = (
        spark.read.parquet(os.path.join(data_dir, entries[0]["path"]))
        .limit(0)
        .columns
    )
    if touched:
        base = spark.read.parquet(
            *[os.path.join(data_dir, e["path"]) for e in touched]
        )
        survivors = base.join(
            updates.select(key_col), key_col, "left_anti"
        )
        merged = survivors.unionByName(updates.select(*cols))
    else:
        merged = updates.select(*cols)

    scols = stats_cols if stats_cols is not None else [key_col]
    new_entries = _commit_data(spark, merged, data_dir, scols)
    version = head + 1
    _publish_manifest(table_dir, version, "merge", carried + new_entries)
    return {
        "version": version,
        "files_rewritten": len(touched),
        "files_carried": len(carried),
    }
