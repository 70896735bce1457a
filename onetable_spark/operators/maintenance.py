"""Table-maintenance planning operators (compaction / clustering).

The reference consumes clustering results — Hudi replace-commits carry a
"files replaced by bigger files" plan
(`core/src/main/java/io/onetable/hudi/HudiDataFileExtractor.java:181-198`,
`HudiTargetClient.java:296-298`) and our Hudi plane writes the same
replace-commit (formats/hudi.py, K8) — but planning WHICH small files to
coalesce is left to the table's own OPTIMIZE/clustering service. This
module supplies that planner as a pure DataFrame operator so the engine
can feed its own replace-commits.

Design for 100 TB: bin assignment is ``floor(exclusive_cumsum / target)``
over a per-partition sorted window — the standard fixed-stride bin-packing
relaxation every distributed OPTIMIZE uses (greedy first-fit needs a
sequential scan; the stride form is one window function, fully parallel
across table partitions, and overshoots a bin by at most one file). The
window shuffles by the table partition columns only, so skew is bounded by
the largest single table partition's FILE COUNT (not bytes), and the
subsequent groupBy reuses the same partitioning (no second shuffle of the
full inventory).
"""

from __future__ import annotations

from typing import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from onetable_spark.session import local_rows_df


def assign_compaction_bins(
    files: DataFrame,
    target_bytes: int,
    part_cols: Sequence[str] = (),
    size_col: str = "size",
    order_col: str = "path",
    pick_bytes: int | None = None,
) -> DataFrame:
    """Tag each small file with its compaction ``bin_id`` (the
    pre-aggregation step ``compact_table`` executes from).

    Files at or above ``pick_bytes`` (default: the bin stride
    ``target_bytes``) are excluded up front: they are already "compacted"
    and would each occupy a full stride anyway. ``compact_table`` passes
    ``pick_bytes = target_bytes // 2`` (the min-file-size heuristic).
    """
    parts = [F.col(c) for c in part_cols]
    w = Window.partitionBy(*parts).orderBy(order_col)
    size = F.col(size_col).cast("long")
    cum_excl = F.coalesce(
        F.sum(size).over(w.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
    )
    return files.where(size < (pick_bytes if pick_bytes is not None else target_bytes)).withColumn(
        "bin_id", F.floor(cum_excl / F.lit(target_bytes))
    )


def plan_compaction_bins(
    files: DataFrame,
    target_bytes: int,
    part_cols: Sequence[str] = (),
    size_col: str = "size",
    order_col: str = "path",
    min_files: int = 2,
) -> DataFrame:
    """Group small files into ~``target_bytes`` compaction bins.

    One output row per planned rewrite group:
    ``(*part_cols, bin_id, n_files, total_bytes, first_file, last_file)``
    where the bounds are the ``order_col`` extremes of the bin (deterministic,
    making the plan itself testable and idempotent). Bins with fewer than
    ``min_files`` members are dropped — rewriting a lone file is a no-op
    that real OPTIMIZE implementations skip.
    """
    binned = assign_compaction_bins(files, target_bytes, part_cols, size_col, order_col)
    size = F.col(size_col).cast("long")
    return (
        binned.groupBy(*[F.col(c) for c in part_cols], "bin_id")
        .agg(
            F.count("*").alias("n_files"),
            F.sum(size).alias("total_bytes"),
            F.min(order_col).alias("first_file"),
            F.max(order_col).alias("last_file"),
        )
        .where(F.col("n_files") >= min_files)
    )


def morton_key(cols: Sequence, bits_per_col: int = 8):
    """Z-order (Morton) clustering key: interleave the low ``bits_per_col``
    bits of each column — bit ``i`` of column ``j`` lands at position
    ``i * k + j`` — so rows close in EVERY dimension get close keys. The
    space-filling-curve primitive behind Delta OPTIMIZE ZORDER and Hudi
    z-order clustering; pure integer bit math, engine-identical. Columns
    beyond the masked low bits need a rank/bucket normalization upstream
    (the usual production refinement); the low-bit form is exact for
    id-like columns and is what the zorder_layout oracle pins."""
    k = len(cols)
    mask = F.lit((1 << bits_per_col) - 1)
    # widen to long BEFORE shifting: with k >= 4 int columns, bit position
    # i*k+j reaches 31 and a 32-bit shiftleft would sign-flip the term
    masked = [
        (F.col(c) if isinstance(c, str) else c).cast("long").bitwiseAND(mask)
        for c in cols
    ]
    z = None
    for i in range(bits_per_col):
        for j, x in enumerate(masked):
            term = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), i * k + j)
            z = term if z is None else z + term
    return z.cast("long")


def reader_for(spark, fmt, table_path: str):
    """The format's native metadata reader (one registry for every
    maintenance consumer — compact_table, AutoOptimize)."""
    from onetable_spark.formats.delta import DeltaLog
    from onetable_spark.formats.hudi import HudiTimeline
    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import TableFormat

    fmt = TableFormat(fmt) if not isinstance(fmt, TableFormat) else fmt
    return {
        TableFormat.DELTA: DeltaLog,
        TableFormat.ICEBERG: IcebergTable,
        TableFormat.HUDI: HudiTimeline,
    }[fmt](spark, table_path)


def hive_partition_path(col: str = "partition_values"):
    """Hive partition string from a partition_values map — a MapType
    column cannot key a window/group partition, so inventories derive this
    (same derivation the Hudi commit plane uses)."""
    return F.concat_ws(
        "/",
        F.transform(
            F.map_entries(col), lambda e: F.concat_ws("=", e["key"], e["value"])
        ),
    ).alias("_pp")


#: directories the lister never descends into — each format's metadata
#: plane plus compaction scratch
_METADATA_DIRS = ("_delta_log", ".hoodie", "metadata")


class LocalFilesystem:
    """Filesystem seam for the maintenance plane (r11). Vacuum's lister
    and deleter go through this interface instead of binding to POSIX
    calls, so an object-store deployment injects its own implementation
    (S3/GCS list + delete) without touching the operators. Instances are
    pickled into executor tasks — keep them stateless."""

    def list_dirs(self, root: str) -> list[str]:
        """All directories under ``root`` (inclusive), excluding metadata
        and hidden directories. Driver-side; bounded by directory count."""
        import os

        dirs = []
        for r, dnames, _ in os.walk(root):
            dnames[:] = [
                d for d in dnames
                if d not in _METADATA_DIRS and not d.startswith((".", "_"))
            ]
            dirs.append(r)
        return dirs

    def list_files(self, directory: str) -> list[tuple[str, int, int]]:
        """``(path, size, mtime_millis)`` for each plain file directly in
        ``directory``, hidden/marker names excluded. Executor-side."""
        import os

        rows = []
        for name in sorted(os.listdir(directory)):
            p = os.path.join(directory, name)
            if name.startswith((".", "_")) or not os.path.isfile(p):
                continue
            st = os.stat(p)
            rows.append((p, st.st_size, int(st.st_mtime * 1000)))
        return rows

    def remove(self, path: str) -> None:
        """Delete one file; missing files must NOT raise (a racing vacuum
        winning the delete is the same outcome). Executor-side."""
        import os

        try:
            os.remove(path)
        except FileNotFoundError:
            pass


def _strip_scheme(p: str) -> str:
    """Normalize local-FS scheme URIs to plain paths: ``file:///x`` /
    ``file://x`` / ``file:/x`` → ``/x``. Foreign writers (delta-spark,
    Iceberg java) record absolute paths WITH the scheme while os-level
    listings produce bare paths — comparing them raw makes every
    referenced file look like an orphan (and vacuum would delete live
    data). Non-file schemes pass through untouched."""
    if p.startswith("file:"):
        rest = p[5:]
        while rest.startswith("//"):
            rest = rest[1:]
        return rest
    return p


def _strip_scheme_col(col):
    """Column form of ``_strip_scheme`` in pure SQL expressions (no
    Python crossing): strip a leading ``file:`` plus any extra slashes
    down to a single root slash."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(c, r"^file:/+", "/")
    return F.when(c.startswith("file:"), stripped).otherwise(c)


def list_table_files(spark, table_path: str, fs: LocalFilesystem | None = None) -> DataFrame:
    """Distributed data-file listing: the driver enumerates DIRECTORIES
    (bounded by the partition-directory count, thousands at 100 TB — never
    the file count, millions), executors list each directory's files.
    Hidden/marker files (leading ``.`` or ``_``) and the metadata dirs are
    excluded — those belong to the formats' own retention machinery. All
    I/O goes through the ``fs`` seam (default: local POSIX)."""
    fs = fs or LocalFilesystem()
    dirs = fs.list_dirs(table_path)

    def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for d in pdf["d"]:
                rows.extend(
                    {"path": p, "size": size, "mtime_millis": mtime}
                    for p, size, mtime in fs.list_files(d)
                )
            yield pd.DataFrame(rows, columns=["path", "size", "mtime_millis"])

    base = local_rows_df(spark, [(d,) for d in dirs], "d string", slices=len(dirs))
    return base.mapInPandas(
        scan, "path string, size long, mtime_millis long"
    )


def referenced_paths(spark, fmt, table_path: str, reader=None) -> DataFrame:
    """Every data-file path ANY retained metadata version references — not
    just the live snapshot, so time travel survives a vacuum. One string
    column ``path`` (absolute), distinct-able by the caller.

    Delta: add AND remove paths across ALL log versions plus the
    checkpoint's — a remove tombstone proves the file was recently live,
    and until the remove action itself ages out of the log (clean_log owns
    that) time travel to a pre-delete version must still find it. Iceberg:
    every snapshot's manifests, every entry status (an entry DELETED in
    snapshot N is still readable at N-1), DELETE manifests (content=1)
    included — position-delete files are live metadata, not orphans.
    Hudi: every completed commit's write stats, log files included."""
    import os

    from onetable_spark.model import TableFormat

    fmt = TableFormat(fmt) if not isinstance(fmt, TableFormat) else fmt
    if reader is None:
        reader = reader_for(spark, fmt, table_path)
    prefix = table_path.rstrip("/") + "/"

    def absolute(col):
        # scheme-strip FIRST: a foreign `file:/x` (single-slash) path is
        # neither `/`-rooted nor `://`-marked and would otherwise be
        # mis-prefixed with the table root
        c = _strip_scheme_col(col)
        return F.when(
            c.startswith("/") | c.contains("://"), c
        ).otherwise(F.concat(F.lit(prefix), F.url_decode(c)))

    if fmt is TableFormat.DELTA:
        versions = reader._versions()
        both = F.coalesce(F.col("add.path"), F.col("remove.path")).alias("p")
        actions = (
            reader._actions_df(versions)
            if versions
            else local_rows_df(spark, [], "add struct<path:string>, remove struct<path:string>")
        )
        refs = actions.select(both).where(F.col("p").isNotNull())
        dv_actions = [actions]
        ckpt = reader._last_checkpoint()
        if ckpt is not None:
            # _checkpoint_actions resolves every checkpoint form (classic,
            # multi-part, V2 + sidecars) — never hardcode the file name
            ck = reader._checkpoint_actions(ckpt)
            refs = refs.unionByName(ck.select(both).where(F.col("p").isNotNull()))
            dv_actions.append(ck)
        # deletion-vector .bin files are LIVE metadata too (r11): a DV'd
        # add references its bitmap by uuid payload, not by path — resolve
        # each descriptor to its file or vacuum eats the bitmaps and the
        # table's data plane silently resurrects the deleted rows
        def dv_paths(batches):
            from onetable_spark.formats.delta_dv import dv_file_path

            for pdf in batches:
                rows = []
                for st, payload in zip(pdf["storageType"], pdf["pathOrInlineDv"]):
                    if st == "u":
                        rows.append({"path": dv_file_path(table_path, payload)})
                    elif st == "p":
                        rows.append({"path": payload})
                yield pd.DataFrame(rows, columns=["path"])

        dv_refs = None
        for a in dv_actions:
            add_type = a.schema["add"].dataType
            if "deletionVector" not in getattr(add_type, "fieldNames", lambda: [])():
                continue
            part = (
                a.where(F.col("add.deletionVector").isNotNull())
                .select(
                    F.col("add.deletionVector.storageType").alias("storageType"),
                    F.col("add.deletionVector.pathOrInlineDv").alias("pathOrInlineDv"),
                )
                .mapInPandas(dv_paths, "path string")
            )
            dv_refs = part if dv_refs is None else dv_refs.unionByName(part)
        out = refs.select(absolute("p").alias("path"))
        if dv_refs is not None:
            out = out.unionByName(dv_refs)
        return out
    if fmt is TableFormat.ICEBERG:
        from onetable_spark.formats.avro_codec import read_container

        md = reader.metadata()
        manifest_paths = []
        for snap in md.get("snapshots", []):
            # driver-ok: bounded by the manifest count per snapshot
            _, manifests = read_container(snap["manifest-list"])
            manifest_paths.extend(m["manifest_path"] for m in manifests)
        if not manifest_paths:
            return local_rows_df(spark, [], "path string")

        def scan(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for mp in pdf["p"]:
                    _, entries = read_container(mp)
                    rows.extend(
                        {"path": e["data_file"]["file_path"]} for e in entries
                    )
                yield pd.DataFrame(rows, columns=["path"])

        uniq = sorted(set(manifest_paths))
        base = local_rows_df(spark, [(p,) for p in uniq], "p string", slices=len(uniq))
        return base.mapInPandas(scan, "path string")
    # HUDI: all completed commits' write stats (no base/log filtering),
    # plus supplemental cdc log files (r14 — they live in cdcStats, not
    # path; without this vacuum would destroy live CDC history)
    instants = reader.completed_instants()
    if not instants:
        return local_rows_df(spark, [], "path string")
    ws = (
        reader._commits_df(instants)
        .select(F.explode_outer("partitionToWriteStats").alias("partition", "stats"))
        .select(F.explode("stats").alias("ws"))
    )
    return ws.select(absolute("ws.path").alias("path")).unionByName(
        ws.select(
            F.explode_outer(F.map_keys("ws.cdcStats")).alias("cdc_rel")
        )
        .where(F.col("cdc_rel").isNotNull())
        .select(absolute("cdc_rel").alias("path"))
    )


def vacuum_table(
    spark,
    fmt,
    table_path: str,
    retention_hours: float = 168.0,
    dry_run: bool = False,
    reader=None,
    now_millis: int | None = None,
    fs: LocalFilesystem | None = None,
) -> DataFrame:
    """Remove ORPHAN data files: files under the table path that no
    retained metadata version references and that are older than the
    retention window (Delta VACUUM / Iceberg ``remove_orphan_files`` — the
    one maintenance operator the reference leaves to the table's own
    services; completes this engine's clean/archive/expiry/log-retention
    plane).

    Returns one row per scanned file: ``(path, status)`` with status in
    ``referenced`` / ``kept_recent`` (orphan inside the retention window —
    a writer may be mid-commit) / ``removed`` (``orphan`` in dry-run).
    Everything is distributed: the listing fans out per directory, the
    reference set is the formats' own metadata as DataFrames, the
    anti-join classifies, and deletion happens inside the executors —
    driver state never holds a file list."""
    import time

    from onetable_spark.model import TableFormat

    fmt = TableFormat(fmt) if not isinstance(fmt, TableFormat) else fmt
    if reader is None:
        reader = reader_for(spark, fmt, table_path)
    if not reader.exists():
        # refusing beats an empty no-op: with no metadata there is no
        # reference set, and "vacuum" would just mean "delete everything"
        raise ValueError(f"no {fmt.value} table at {table_path}")
    fs = fs or LocalFilesystem()
    now = now_millis if now_millis is not None else int(time.time() * 1000)
    cutoff = now - int(retention_hours * 3600_000)
    listing = list_table_files(spark, table_path, fs=fs)
    # normalize scheme URIs on BOTH sides of the join: foreign writers
    # (delta-spark, Iceberg java) record file:///-prefixed absolute paths
    # while the lister produces bare ones — raw string equality would
    # classify every live file as an orphan and DELETE it
    refs = (
        referenced_paths(spark, fmt, table_path, reader=reader)
        .select(_strip_scheme_col("path").alias("path"))
        .distinct()
    )
    classified = (
        listing.join(refs.withColumn("_ref", F.lit(True)), "path", "left_outer")
        .select(
            "path",
            F.when(F.col("_ref").isNotNull(), "referenced")
            .when(F.col("mtime_millis") >= cutoff, "kept_recent")
            .otherwise("orphan")
            .alias("status"),
        )
    )
    if dry_run:
        return classified

    # destructive-operator sanity guard: metadata references files, files
    # exist under the table path, yet ZERO references matched the listing.
    # That state never means "a table of pure orphans" — it means the two
    # sides disagree on path representation (scheme, mount point, symlink)
    # and proceeding would delete the entire live table. Refuse.
    # `classified` is consumed twice (guard agg + delete pass) — persist
    # so the listing fan-out and reference join run once, not twice.
    from pyspark import StorageLevel

    classified = classified.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # driver-ok: one 2-long-column aggregate row
        counts = classified.agg(
            F.count("*").alias("n_listed"),
            F.sum((F.col("status") == "referenced").cast("long")).alias("n_matched"),
        ).first()
        if counts["n_listed"] and not counts["n_matched"] and not refs.isEmpty():
            raise ValueError(
                f"vacuum refused for {table_path}: metadata references data "
                "files but none matched the filesystem listing — path "
                "representation skew (scheme/mount/symlink), not orphans; "
                "deleting would destroy live data"
            )

        def delete(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for path, status in zip(pdf["path"], pdf["status"]):
                    if status == "orphan":
                        fs.remove(path)  # seam: missing-file races absorbed
                        status = "removed"
                    out.append({"path": path, "status": status})
                yield pd.DataFrame(out, columns=["path", "status"])

        # eagerly localCheckpoint the delete pass: the deletes are a
        # side-effecting operation and must run EXACTLY once, while the
        # persisted classification is still pinned; the caller's collect
        # then reads the checkpointed result (executor block storage,
        # never the driver) instead of re-listing and re-deleting
        return classified.mapInPandas(
            delete, "path string, status string"
        ).localCheckpoint(eager=True)
    finally:
        classified.unpersist(blocking=False)


def compact_table(
    spark,
    fmt,
    table_path: str,
    target_bytes: int,
    min_files: int = 2,
    max_bins: int | None = None,
    reader=None,
    files: DataFrame | None = None,
    zorder_by: Sequence[str] | None = None,
) -> dict:
    """Execute OPTIMIZE end-to-end on a native table: plan bins over
    ``snapshot_files()``, rewrite each bin into one merged data file, and
    publish ONE transactional metadata commit in the table's own format —
    Delta remove+add (operation OPTIMIZE), Iceberg OverwriteFiles, Hudi
    clustering replace-commit (the exact commit shape the reference reads
    back, HudiDataFileExtractor.java:181-198).

    The merged file is written next to its bin's members, so hive-derived
    partition values carry over unchanged. Returns
    ``{"bins", "files_removed", "files_added", "bins_deferred"}``; a table
    with nothing to compact returns zeros and commits nothing (idempotent).

    Only files under ``target_bytes // 2`` are picked — the standard
    OPTIMIZE min-file-size heuristic. This bounds rewrite amplification
    under bounded runs: an under-target merged file re-enters a later bin
    only while it is still below HALF the target, so every byte's rewrite
    count follows a doubling ladder (O(log) rewrites) instead of being
    re-merged with each new batch of smalls.

    Scale note: bin PLANNING is fully distributed; bin EXECUTION is one
    bounded Spark job per bin issued from a driver loop over the planned
    bins (driver state is O(bins), the same order as the commit payload
    itself). At 100 TB, bound the loop with ``max_bins`` the way real
    OPTIMIZE jobs do — the deterministic (partition, bin_id) order makes
    repeated bounded runs converge, and each run's commit is transactional
    either way. The result reports ``bins_deferred`` so a bounded run
    never silently reads as "fully compacted" (the no-silent-caps rule).
    ``reader``/``files`` let a caller that already materialized the
    snapshot (AutoOptimize's gate) pass it through instead of re-scanning.

    ``zorder_by`` switches the rewrite to OPTIMIZE ZORDER: per table
    partition, ALL picked files' rows are globally sorted by the Morton
    key of the given columns and re-split into ~``target_bytes`` files
    along DISJOINT z ranges (``repartitionByRange`` on the key + in-range
    sort). Sorting within one merged file cannot change its min/max — the
    stats win comes from the disjoint range SPLIT, which shrinks every
    output file's bounding box on the z-order columns so multi-column
    range predicates prune files. Picks everything under ``target_bytes``
    (a layout rewrite, not just a size fix); one rewrite unit = one table
    partition, so ``max_bins`` bounds partitions per run and the commit
    stays one transaction.
    """
    import math
    import os
    import uuid

    from onetable_spark.formats.hudi import _file_id_for
    from onetable_spark.model import TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    fmt = TableFormat(fmt) if not isinstance(fmt, TableFormat) else fmt
    if reader is None:
        reader = reader_for(spark, fmt, table_path)
    if files is None:
        files = reader.snapshot_files()
    if zorder_by:
        # one rewrite unit per PARTITION: the z-sort must be global across
        # the partition's files or the range split tightens nothing
        bins = (
            files.withColumn("_pp", hive_partition_path())
            .where(F.col("size").cast("long") < target_bytes)
            .groupBy("_pp")
            .agg(
                F.collect_list("path").alias("members"),
                F.sum(F.col("size").cast("long")).alias("total_bytes"),
            )
            .where(F.size("members") >= min_files)
            .orderBy("_pp")
            # driver-ok: O(partitions + member paths), commit-payload order
            .collect()
        )
    else:
        assigned = assign_compaction_bins(
            files.withColumn("_pp", hive_partition_path()),
            target_bytes,
            part_cols=("_pp",),
            pick_bytes=max(1, target_bytes // 2),
        )
        bins = (
            assigned.groupBy("_pp", "bin_id")
            .agg(F.collect_list("path").alias("members"))
            .where(F.size("members") >= min_files)
            .orderBy("_pp", "bin_id")
            # driver-ok: O(planned bins + member paths), the commit payload's own size
            .collect()
        )
    deferred = 0
    if max_bins is not None and len(bins) > max_bins:
        deferred = len(bins) - max_bins
        bins = bins[:max_bins]
    if not bins:
        return {"bins": 0, "files_removed": 0, "files_added": 0, "bins_deferred": deferred}

    import shutil as _shutil

    merged_paths: list[str] = []
    removed_paths: list[str] = []
    for b in bins:
        members = sorted(b["members"])
        dest_dir = os.path.dirname(members[0])
        scratch = os.path.join(table_path, f"_compact_{uuid.uuid4().hex[:12]}")
        if zorder_by:
            n_out = max(1, math.ceil(int(b["total_bytes"]) / target_bytes))
            (
                spark.read.parquet(*members)
                .withColumn("_z", morton_key(list(zorder_by)))
                .repartitionByRange(n_out, "_z")
                .sortWithinPartitions("_z")
                .drop("_z")
                .write.parquet(scratch)
            )
            for part in sorted(f for f in os.listdir(scratch) if f.endswith(".parquet")):
                out = os.path.join(dest_dir, f"zordered-{uuid.uuid4().hex[:12]}.parquet")
                os.replace(os.path.join(scratch, part), out)
                merged_paths.append(out)
        else:
            spark.read.parquet(*members).coalesce(1).write.parquet(scratch)
            part = next(f for f in os.listdir(scratch) if f.endswith(".parquet"))
            merged = os.path.join(dest_dir, f"compacted-{uuid.uuid4().hex[:12]}.parquet")
            os.replace(os.path.join(scratch, part), merged)
            merged_paths.append(merged)
        _shutil.rmtree(scratch, ignore_errors=True)
        removed_paths.extend(members)

    adds = build_inventory(spark, merged_paths, root=table_path)
    # semi-join, not isin(): tens of thousands of removed paths as Catalyst
    # literals would bloat the plan; a broadcast join keeps it O(1)
    removed_df = local_rows_df(spark, [(p,) for p in removed_paths], "path string")
    removes = files.join(F.broadcast(removed_df), "path", "left_semi")
    if fmt is TableFormat.DELTA:
        # dataChange=false: a compaction rewrites layout, not logical rows
        # — delta-spark marks OPTIMIZE commits this way so CDC/streaming
        # readers (skipChangeCommits) don't replay the rewritten rows
        reader.commit(
            adds=adds, removes=removes, operation="OPTIMIZE", data_change=False
        )
    elif fmt is TableFormat.ICEBERG:
        reader.commit_overwrite(adds=adds, removes=removes)
    else:
        # Hudi file-group ids derive from the TABLE-RELATIVE path (the same
        # derivation the commit plane applies to adds) — basename alone
        # would mis-id files under hive partition dirs
        prefix = table_path.rstrip("/") + "/"
        replace: dict[str, list[str]] = {}
        for b in bins:
            replace.setdefault(b["_pp"], []).extend(
                _file_id_for(p[len(prefix):] if p.startswith(prefix) else p)
                for p in sorted(b["members"])
            )
        # CLUSTER, not the default UPSERT: real Hudi marks clustering
        # replacecommits with WriteOperationType.CLUSTER, and the r13
        # changelog skips them — a layout rewrite is not a logical change
        reader.commit(adds=adds, replace_file_ids=replace, operation="CLUSTER")
    return {
        "bins": len(bins),
        "files_removed": len(removed_paths),
        "files_added": len(merged_paths),
        "bins_deferred": deferred,
    }
