"""Round-11 hardening: torn-checkpoint refusal, JSON-v2-checkpoint
refusal, vacuum path-skew guards, the maintenance filesystem seam, and the
BPE duplicate-merged-string conflict — the r10 ADVICE items plus the
VERDICT's filesystem-seam task, each reproduced before the fix and pinned
after it."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from onetable_spark.formats.delta import DeltaLog
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory


def _stage_delta(spark, sf_dir, base, n_small=2):
    os.makedirs(base)
    small = []
    for i in range(n_small):
        p = os.path.join(base, f"small{i}.parquet")
        shutil.copy(os.path.join(sf_dir, "region.parquet"), p)
        small.append(p)
    schema = spark.read.parquet(base).schema
    log = DeltaLog(spark, base)
    log.init_table(
        Table(
            name="r11",
            base_path=base,
            table_format=TableFormat.DELTA,
            read_schema=schema,
            layout=DataLayoutStrategy.FLAT,
        )
    )
    log.commit(adds=build_inventory(spark, small, root=base))
    return log


# --------------------------------------------------------------- checkpoints


def test_torn_multipart_checkpoint_refused(spark, sf_dir, tmp_path):
    """A multi-part checkpoint with a missing part must REFUSE, not replay
    a partial snapshot (dropped live files = silent wrong data)."""
    base = str(tmp_path / "torn")
    log = _stage_delta(spark, sf_dir, base)
    log.checkpoint()
    v = log._last_checkpoint()
    single = os.path.join(log.log_path, f"{v:020d}.checkpoint.parquet")
    # fake a 2-part checkpoint where only part 1 survived
    torn = os.path.join(
        log.log_path, f"{v:020d}.checkpoint.{1:010d}.{2:010d}.parquet"
    )
    os.rename(single, torn)
    with pytest.raises(ValueError, match="incomplete/torn"):
        DeltaLog(spark, base)._checkpoint_files(v)
    # a COMPLETE 2-part checkpoint (duplicate content is fine: replay
    # dedups per path) passes the guard and replays
    part2 = os.path.join(
        log.log_path, f"{v:020d}.checkpoint.{2:010d}.{2:010d}.parquet"
    )
    shutil.copy(torn, part2)
    fresh = DeltaLog(spark, base)
    assert len(fresh._checkpoint_files(v)) == 2
    assert fresh.snapshot_files().count() == 2


def test_last_checkpoint_parts_mismatch_refused(spark, sf_dir, tmp_path):
    """_last_checkpoint's ``parts`` must agree with the on-disk part count
    — the protocol's reader-side completeness rule."""
    base = str(tmp_path / "parts")
    log = _stage_delta(spark, sf_dir, base)
    log.checkpoint()
    v = log._last_checkpoint()
    single = os.path.join(log.log_path, f"{v:020d}.checkpoint.parquet")
    p1 = os.path.join(log.log_path, f"{v:020d}.checkpoint.{1:010d}.{1:010d}.parquet")
    os.rename(single, p1)
    lc = os.path.join(log.log_path, "_last_checkpoint")
    with open(lc, "w") as f:
        json.dump({"version": v, "parts": 3}, f)
    with pytest.raises(ValueError, match="declares 3"):
        DeltaLog(spark, base)._checkpoint_files(v)


def test_json_v2_checkpoint_refused_explicitly(spark, sf_dir, tmp_path):
    """A JSON-format v2 checkpoint gets a clean 'unsupported' refusal, not
    a confusing no-checkpoint-files FileNotFoundError."""
    base = str(tmp_path / "jsonv2")
    log = _stage_delta(spark, sf_dir, base)
    log.checkpoint()
    v = log._last_checkpoint()
    single = os.path.join(log.log_path, f"{v:020d}.checkpoint.parquet")
    os.remove(single)
    j = os.path.join(
        log.log_path, f"{v:020d}.checkpoint.80a083e8-7026-4e79-81be-64bd76c43a11.json"
    )
    open(j, "w").write("{}\n")
    with pytest.raises(ValueError, match="JSON-format v2"):
        DeltaLog(spark, base)._checkpoint_files(v)


# -------------------------------------------------------------------- vacuum


def test_vacuum_normalizes_scheme_uris(spark, sf_dir, tmp_path):
    """A foreign writer that records file:///-prefixed absolute add paths
    must NOT make live files look like orphans (the r10 ADVICE destructive
    case). Both file:// and the single-slash file:/ form are exercised."""
    from onetable_spark.operators.maintenance import vacuum_table

    base = str(tmp_path / "schemes")
    log = _stage_delta(spark, sf_dir, base)
    inv = log.snapshot_files()
    # rewrite the log so the add paths carry schemes, alternating forms
    uri = F.when(
        F.col("path").endswith("small0.parquet"),
        F.concat(F.lit("file://"), "path"),
    ).otherwise(F.concat(F.lit("file:"), "path"))
    log.commit(removes=inv, adds=inv.withColumn("path", uri))
    for p in ("small0.parquet", "small1.parquet"):
        os.utime(os.path.join(base, p), (946684800, 946684800))

    plan = {
        os.path.basename(r["path"]): r["status"]
        for r in vacuum_table(
            spark, TableFormat.DELTA, base, retention_hours=1, dry_run=True
        ).collect()
    }
    assert plan == {"small0.parquet": "referenced", "small1.parquet": "referenced"}
    # non-dry-run is a no-op delete and leaves the table intact
    vacuum_table(spark, TableFormat.DELTA, base, retention_hours=1).collect()
    assert os.path.exists(os.path.join(base, "small0.parquet"))
    assert os.path.exists(os.path.join(base, "small1.parquet"))


def test_vacuum_refuses_on_zero_reference_match(spark, sf_dir, tmp_path):
    """References exist, listing exists, but ZERO refs matched: that is
    path-representation skew, never a table of pure orphans — the
    destructive pass must refuse (dry-run may still report the plan)."""
    from onetable_spark.operators.maintenance import vacuum_table

    base = str(tmp_path / "skew")
    os.makedirs(base)
    for i in range(2):
        shutil.copy(
            os.path.join(sf_dir, "region.parquet"),
            os.path.join(base, f"small{i}.parquet"),
        )
    schema = spark.read.parquet(base).schema
    log = DeltaLog(spark, base)
    log.init_table(
        Table(
            name="skew",
            base_path=base,
            table_format=TableFormat.DELTA,
            read_schema=schema,
            layout=DataLayoutStrategy.FLAT,
        )
    )
    # simulate a mount-point mismatch: the ONLY file commit points at
    # another root, so nothing in metadata matches the listing
    inv = build_inventory(
        spark, [os.path.join(base, f"small{i}.parquet") for i in range(2)], root=base
    )
    log.commit(adds=inv.withColumn("path", F.concat(F.lit("/mnt/elsewhere"), "path")))
    for p in ("small0.parquet", "small1.parquet"):
        os.utime(os.path.join(base, p), (946684800, 946684800))

    with pytest.raises(ValueError, match="path .*skew|representation skew"):
        vacuum_table(spark, TableFormat.DELTA, base, retention_hours=1).collect()
    assert os.path.exists(os.path.join(base, "small0.parquet"))


def test_vacuum_through_injected_filesystem(spark, sf_dir, tmp_path):
    """The fs seam: vacuum lists and deletes through an injected
    filesystem. The fake object store loses a delete race (file already
    gone) — absorbed, still reported as removed."""
    from onetable_spark.operators import maintenance as M

    class FakeObjectStoreFS(M.LocalFilesystem):
        """Local files behind an object-store-shaped API; the audit log
        lands in a sidecar file because executor pickles don't share
        driver state."""

        def __init__(self, audit_path):
            self.audit_path = audit_path

        def remove(self, path):
            with open(self.audit_path, "a") as f:
                f.write(path + "\n")
            if path.endswith("orphan_gone.parquet") and os.path.exists(path):
                # a racing client deletes it between classification and
                # our delete: the seam's remove then sees it missing and
                # must absorb the 404, not raise
                os.remove(path)
            super().remove(path)

    base = str(tmp_path / "seam")
    _stage_delta(spark, sf_dir, base)
    orphan = os.path.join(base, "orphan_old.parquet")
    gone = os.path.join(base, "orphan_gone.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), orphan)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), gone)
    os.utime(orphan, (946684800, 946684800))
    os.utime(gone, (946684800, 946684800))
    audit = str(tmp_path / "audit.log")
    fs = FakeObjectStoreFS(audit)
    got = {
        os.path.basename(r["path"]): r["status"]
        for r in M.vacuum_table(
            spark, TableFormat.DELTA, base, retention_hours=1, fs=fs
        ).collect()
    }
    assert got["orphan_old.parquet"] == "removed" and not os.path.exists(orphan)
    assert got["orphan_gone.parquet"] == "removed" and not os.path.exists(gone)
    audited = set(open(audit).read().split())
    assert audited == {orphan, gone}  # referenced files never touched


def test_vacuum_keeps_live_position_delete_files(spark, sf_dir, tmp_path):
    """Delete-aware vacuum (r11): a v2 merge-on-read table's position-
    delete parquet is LIVE METADATA — the reference set must include it or
    vacuum eats the delete file and resurrects rows on the next read."""
    from onetable_spark.operators.maintenance import vacuum_table
    from tools.foreign_iceberg import add_position_deletes, write_foreign_iceberg_table

    base = str(tmp_path / "mor_vac")
    os.makedirs(base)
    truth = write_foreign_iceberg_table(
        spark, base, os.path.join(sf_dir, "region.parquet")
    )
    truth = add_position_deletes(spark, base, truth)
    del_file = os.path.join(base, "data", "deletes-B.parquet")
    os.utime(del_file, (946684800, 946684800))  # old enough to delete

    got = {
        os.path.basename(r["path"]): r["status"]
        for r in vacuum_table(
            spark, TableFormat.ICEBERG, base, retention_hours=1
        ).collect()
    }
    assert got["deletes-B.parquet"] == "referenced"
    assert os.path.exists(del_file)
    # and the table still reads with net counts afterwards
    from onetable_spark.formats.iceberg import IcebergTable

    rows = {
        os.path.basename(r["path"]): r["record_count"]
        for r in IcebergTable(spark, base).snapshot_files().collect()
    }
    assert rows["B.parquet"] == truth["b_rows_net"]


# ----------------------------------------------------------------------- bpe


def test_bpe_batch_rejects_duplicate_merged_string():
    """('a','bc') and ('ab','c') share no symbol but both yield 'abc'; the
    second must CONFLICT (stop the prefix), or pairs containing 'abc' gain
    count from two sources and the batch-exactness bound breaks."""
    from onetable_spark.functions.bpe import _select_batch

    rows = [
        {"a": "a", "b": "bc", "cnt": 10},
        {"a": "ab", "b": "c", "cnt": 9},
        {"a": "x", "b": "y", "cnt": 8},
    ]
    batch = _select_batch(rows, overflow_cnt=0, universe={"a", "b", "c", "ab", "bc", "x", "y"})
    assert batch == [("a", "bc")]


def test_vacuum_keeps_live_delta_dv_bitmaps(spark, sf_dir, tmp_path):
    """Delta DV .bin files are live metadata: the add references its
    bitmap by uuid payload, not path, so the vacuum reference set must
    RESOLVE the descriptors — or vacuum eats the bitmaps and the data
    plane silently resurrects the deleted rows."""
    from onetable_spark.operators.maintenance import vacuum_table

    # stage a DV'd table the same way the DV suite does
    import importlib

    dvmod = importlib.import_module("tests.test_delta_dv")
    base = str(tmp_path / "dv_vac")
    log, n, n_del, _ = dvmod._stage_dv_table(spark, sf_dir, base)
    bins = [f for f in os.listdir(base) if f.startswith("deletion_vector_")]
    assert len(bins) == 1
    bin_path = os.path.join(base, bins[0])
    os.utime(bin_path, (946684800, 946684800))  # old enough to delete

    got = {
        os.path.basename(r["path"]): r["status"]
        for r in vacuum_table(
            spark, TableFormat.DELTA, base, retention_hours=1
        ).collect()
    }
    assert got[bins[0]] == "referenced"
    assert os.path.exists(bin_path)
    # the DV still decodes after the vacuum
    checks = DeltaLog(spark, base).verify_deletion_vectors().collect()
    assert checks and all(c["dv_ok"] for c in checks)


def test_multipart_checkpoint_write_and_replay(spark, sf_dir, tmp_path):
    """The writer now produces the classic MULTI-PART checkpoint form
    (parts write in parallel, names embed (index, total), _last_checkpoint
    declares parts) and the reader's completeness guard accepts it whole
    and refuses it torn."""
    base = str(tmp_path / "multipart")
    log = _stage_delta(spark, sf_dir, base, n_small=3)
    log.checkpoint(parts=3)
    lc = json.load(open(os.path.join(log.log_path, "_last_checkpoint")))
    v = lc["version"]
    # `parts` is a fan-out TARGET: round-robin can leave a target
    # partition empty on tiny tables and Spark skips empty output files.
    # The contract is CONSISTENCY — names, _last_checkpoint, and disk all
    # agree — plus genuinely multi-part output.
    n = lc["parts"]
    assert 2 <= n <= 3
    parts = sorted(
        f for f in os.listdir(log.log_path)
        if f.startswith(f"{v:020d}.checkpoint.") and f.endswith(".parquet")
    )
    assert parts == [
        f"{v:020d}.checkpoint.{i:010d}.{n:010d}.parquet"
        for i in range(1, n + 1)
    ]
    # checkpoint-only replay: sweep the commit JSONs, read back whole
    removed = log.clean_log(retention_hours=0)
    assert removed >= 1
    fresh = DeltaLog(spark, base)
    assert fresh.snapshot_files().count() == 3
    # torn: losing one part refuses
    os.remove(os.path.join(log.log_path, parts[1]))
    with pytest.raises(ValueError, match="incomplete/torn"):
        DeltaLog(spark, base).snapshot_files().count()


def test_commit_plane_goes_through_filesystem_seam(spark, sf_dir, tmp_path, monkeypatch):
    """r12 (VERDICT #8): the commit plane's visibility-changing writes —
    commit publish, checkpoint-part replace, _last_checkpoint swap — go
    through the injectable CommitFilesystem seam. A fake object store
    (conditional-put via exists-check + copy, NO hard links) drives a
    full commit + multi-part checkpoint lifecycle; os.link is poisoned to
    prove the log writer no longer binds POSIX directly."""
    import shutil as _sh

    class FakeObjectStore:
        """Copy-based conditional put — what an S3/GCS adapter does."""

        def __init__(self):
            self.puts = []
            self.replaces = []
            self.docs = []

        def publish_if_absent(self, src, dest):
            if os.path.exists(dest):
                raise FileExistsError(dest)
            _sh.copyfile(src, dest)
            self.puts.append(dest)

        def replace(self, src, dest):
            _sh.copyfile(src, dest)
            os.remove(src)
            self.replaces.append(dest)

        def write_atomic(self, path, data):
            with open(path + ".staged", "w") as f:
                f.write(data)
            os.rename(path + ".staged", path)
            self.docs.append(path)

    base = str(tmp_path / "seam")
    fake = FakeObjectStore()
    _stage_delta(spark, sf_dir, base, n_small=3)

    def no_link(*a, **k):
        raise AssertionError("commit plane bound os.link directly")

    monkeypatch.setattr(os, "link", no_link)
    log = DeltaLog(spark, base, fs=fake)
    log.commit(operation="SEAM-PROBE")
    log.checkpoint(parts=2)
    assert fake.puts, "commit publish bypassed the seam"
    assert fake.replaces, "checkpoint parts bypassed the seam"
    assert any(p.endswith("_last_checkpoint") for p in fake.docs)
    # the table written through the fake store reads back whole
    fresh = DeltaLog(spark, base)
    assert fresh.snapshot_files().count() == 3
