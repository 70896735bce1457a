"""Round-2 regression tests for the judge/advisor findings.

Covers: inflight-commit carry-through on incremental syncs (TableFormatSync
pendingCommits parity), Iceberg STATUS_DELETED manifests feeding incremental
consumers, id-keyed schema/spec lookup on evolved external tables, atomic
metadata version claims, and Hudi epoch-millis file timestamps.
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from onetable_spark.formats.hudi import HudiTimeline, instant_to_millis
from onetable_spark.formats.iceberg import CommitConflictError, IcebergTable
from onetable_spark.model import SyncStatus, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory, inventory_from_directory
from onetable_spark.sync import SyncClient, source_for, target_for


@pytest.fixture()
def seeded_hudi(spark, sf_dir, tmp_path):
    """A Hudi COW table with one committed parquet file."""
    table_path = str(tmp_path / "h")
    os.makedirs(table_path)
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), os.path.join(table_path, "f1.parquet"))
    schema = spark.read.parquet(table_path).schema
    tl = HudiTimeline(spark, table_path)
    tl.init_table(
        Table(name="h", base_path=table_path, table_format=TableFormat.HUDI, read_schema=schema)
    )
    tl.commit(adds=inventory_from_directory(spark, table_path), schema=schema)
    return table_path


def _complete_pending_commit(tl: HudiTimeline, instant: str, rel_path: str, size: int, rows: int):
    """Finish a previously-pending instant by hand (a late-landing writer)."""
    meta = {
        "partitionToWriteStats": {
            "": [
                {
                    "fileId": "late-file-id",
                    "path": rel_path,
                    "prevCommit": "null",
                    "numWrites": rows,
                    "numInserts": rows,
                    "totalWriteBytes": size,
                    "fileSizeInBytes": size,
                    "partitionPath": "",
                    "columnStats": None,
                }
            ]
        },
        "compacted": False,
        "operationType": "UPSERT",
        "extraMetadata": {},
    }
    with open(os.path.join(tl.hoodie_path, f"{instant}.commit"), "w") as f:
        json.dump(meta, f)
    for leftover in (f"{instant}.commit.requested", f"{instant}.inflight"):
        p = os.path.join(tl.hoodie_path, leftover)
        if os.path.exists(p):
            os.remove(p)


def test_incremental_sync_preserves_inflight_commits(spark, sf_dir, seeded_hudi):
    """ADVICE(high): the first incremental sync must NOT wipe the pending-
    commit watermark; a commit that completes after the watermark advances
    is still synced on the next round."""
    table_path = seeded_hudi
    tl = HudiTimeline(spark, table_path)

    # a writer starts a commit... and stalls (requested + inflight markers)
    pending_instant = tl.new_instant()
    open(os.path.join(tl.hoodie_path, f"{pending_instant}.commit.requested"), "w").close()
    open(os.path.join(tl.hoodie_path, f"{pending_instant}.inflight"), "w").close()

    client = SyncClient(spark)
    source = source_for(spark, TableFormat.HUDI, table_path)
    target = target_for(spark, TableFormat.DELTA, table_path)

    r1 = client.sync(source, [target])
    assert r1[TableFormat.DELTA].status == SyncStatus.SUCCESS
    meta1 = target.get_sync_metadata()
    assert instant_to_millis(pending_instant) in meta1.inflight_commits

    # the watermark advances past the stalled instant via a newer commit
    time.sleep(0.05)
    new_file = os.path.join(table_path, "f2.parquet")
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), new_file)
    tl.commit(adds=build_inventory(spark, [new_file], root=table_path))

    r2 = client.sync(source, [target])
    assert r2[TableFormat.DELTA].status == SyncStatus.SUCCESS
    meta2 = target.get_sync_metadata()
    # the incremental path must carry the still-pending instant forward
    assert instant_to_millis(pending_instant) in meta2.inflight_commits
    assert meta2.last_instant_synced_millis > meta1.last_instant_synced_millis

    # the stalled writer finally lands — with its ORIGINAL (old) instant
    late_file = os.path.join(table_path, "f3.parquet")
    shutil.copy(os.path.join(sf_dir, "nation.parquet"), late_file)
    _complete_pending_commit(
        tl, pending_instant, "f3.parquet", os.path.getsize(late_file), 25
    )

    r3 = client.sync(source, [target])
    assert r3[TableFormat.DELTA].status == SyncStatus.SUCCESS
    from onetable_spark.formats.delta import DeltaLog

    delta_paths = {r["path"] for r in DeltaLog(spark, table_path).snapshot_files().collect()}
    assert late_file in delta_paths, "late-completing pending commit was lost"
    # once synced, it is no longer tracked as inflight
    assert instant_to_millis(pending_instant) not in target.get_sync_metadata().inflight_commits


def test_iceberg_overwrite_emits_deleted_entries(spark, sf_dir, tmp_path):
    """ADVICE(medium): removed files appear as STATUS_DELETED entries, so a
    downstream IcebergSource sees the deletions incrementally."""
    table_path = str(tmp_path / "ice")
    os.makedirs(table_path)
    for n in ("a", "b"):
        shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, f"{n}.parquet"))
    schema = spark.read.parquet(table_path).schema
    ice = IcebergTable(spark, table_path)
    ice.init_table(
        Table(name="ice", base_path=table_path, table_format=TableFormat.ICEBERG, read_schema=schema)
    )
    inv = inventory_from_directory(spark, table_path)
    ice.commit_overwrite(adds=inv, schema=schema)

    doomed = inv.orderBy("path").limit(1)
    sid = ice.commit_overwrite(removes=doomed, schema=schema)

    change = ice.changes_for_snapshot(sid)
    removed = [r["path"] for r in change.diff.removed.collect()]
    assert removed == [doomed.first()["path"]]
    # live snapshot no longer contains it
    live = {r["path"] for r in ice.snapshot_files().collect()}
    assert doomed.first()["path"] not in live and len(live) == 1


def test_iceberg_id_keyed_schema_and_spec_lookup():
    """ADVICE(medium): schema-id / spec-id are identifiers, not positions."""
    md = {
        "schemas": [
            {"schema-id": 7, "type": "struct", "fields": [{"id": 1, "name": "x", "required": False, "type": "long"}]},
            {"schema-id": 2, "type": "struct", "fields": [{"id": 1, "name": "old", "required": False, "type": "int"}]},
        ],
        "current-schema-id": 7,
        "partition-specs": [
            {"spec-id": 4, "fields": [{"name": "p", "transform": "identity", "source-id": 1, "field-id": 1000}]},
            {"spec-id": 0, "fields": []},
        ],
        "default-spec-id": 4,
    }
    assert IcebergTable._schema_for(md)["fields"][0]["name"] == "x"
    assert IcebergTable._spec_for(md)[0]["name"] == "p"
    with pytest.raises(ValueError):
        IcebergTable._schema_for({**md, "current-schema-id": 99})


def test_iceberg_metadata_version_claim_is_exclusive(spark, sf_dir, tmp_path):
    """ADVICE(medium): two committers racing from the same base version —
    the second claim of v(N+1) must fail, not silently clobber."""
    table_path = str(tmp_path / "race")
    os.makedirs(table_path)
    shutil.copy(os.path.join(sf_dir, "region.parquet"), os.path.join(table_path, "r.parquet"))
    schema = spark.read.parquet(table_path).schema
    ice = IcebergTable(spark, table_path)
    ice.init_table(
        Table(name="race", base_path=table_path, table_format=TableFormat.ICEBERG, read_schema=schema)
    )
    md = ice.metadata()
    v = ice.current_version()
    ice._write_metadata(v + 1, md)
    with pytest.raises(CommitConflictError):
        ice._write_metadata(v + 1, md)
    # commit_overwrite re-reads and lands on the NEXT version instead
    sid = ice.commit_overwrite(adds=inventory_from_directory(spark, table_path), schema=schema)
    assert ice.current_snapshot_meta()["snapshot-id"] == sid
    assert ice.current_version() == v + 2


def test_no_driver_collect_in_query_paths():
    """Scale guard: no unbounded driver materialization in operator/query
    code. A site must carry a ``# driver-ok:`` justification (same or
    preceding line — the tools/check_plans.py convention) AND appear in
    the reviewed per-file allowance below; a glib marker alone cannot
    self-certify a new collect — adding one forces an edit here, i.e. a
    review of its boundedness argument."""
    import pathlib
    from collections import Counter

    # file -> number of sanctioned driver-materialization sites:
    #   similarity.py: IVF trainer's max_train_rows-capped sample
    #   bpe.py: per-iteration bounded top-(N+1) fetch + the alphabet-sized
    #     symbol universe (|alphabet| + n_merges entries)
    #   maintenance.py: O(planned bins) compaction plan + the per-partition
    #     zorder rewrite plan (same commit-payload order)
    #   queries.py: zorder_compaction's per-file z-bounds (4 staged files)
    #     and its snapshot read-back (commit-payload order), plus
    #     vacuum_orphans' 4-file staged status fetch, r11's
    #     hudi_mor_views + iceberg_eq_deletes refusal probes (raise
    #     before rows materialize), sync_delta_dv's DV cross-check (one
    #     row per DV'd file), and dv_translation's two staged-probe
    #     fetches (DV verify row + the single descriptor row) plus the
    #     round-trip contract's two 2-file read-backs
    #   queries.py r12 sites: hudi_delete_translation's refusal probe +
    #     its one-log verify fetch (raise/flag before rows materialize),
    #     hudi_mor_compaction's 1-file staged equivalence read-back,
    #     iceberg_rewrite_files' two 2-file staged read-backs (post-
    #     rewrite inventory + pre-rewrite time-travel check), and
    #     delta_dv_purge's two 2-file staged read-backs (post-purge
    #     inventory + pre-purge time-travel check), iceberg_upsert's
    #     refusal probe (raises before rows materialize), delta_upsert's
    #     DV cross-check (one row per live DV'd file), and hudi_upsert's
    #     refusal probe + one-log verify fetch (2 sites)
    #   maintenance.py third site: Iceberg referenced_paths' manifest-list
    #     walk (bounded by manifest count per snapshot)
    #   queries.py r13 sites: sync_bucket_spec's per-bucket count fetch
    #     (≤4 aggregated rows — one per bucket[4] value) and its
    #     truncate-sibling distinct-dir fetch (≤5 rows — 2-char prefixes)
    sanctioned = {
        "functions/similarity.py": 1,
        "functions/bpe.py": 2,
        "operators/maintenance.py": 3,
        # r14: +1 — sync_bucket_decimal's ≤4-row per-bucket aggregate
        "queries.py": 24,
    }
    root = pathlib.Path(__file__).parent.parent / "onetable_spark"
    offenders, marked = [], Counter()
    for py in list((root / "functions").glob("*.py")) + list((root / "operators").glob("*.py")) + [
        root / "queries.py"
    ]:
        rel = str(py.relative_to(root))
        lines = py.read_text().splitlines()
        for i, line in enumerate(lines, 1):
            code = line.split("#", 1)[0]
            if ".collect()" in code or "toLocalIterator" in code:
                justified = "# driver-ok:" in line or (
                    i >= 2 and "# driver-ok:" in lines[i - 2]
                )
                # similarity.py's capped sample predates the marker style
                justified = justified or (
                    rel == "functions/similarity.py" and "sample.collect()" in code
                )
                if not justified:
                    offenders.append(f"{rel}:{i}: {line.strip()} (no driver-ok marker)")
                else:
                    marked[rel] += 1
    for rel, n in marked.items():
        if n > sanctioned.get(rel, 0):
            offenders.append(
                f"{rel}: {n} marked collect sites but only "
                f"{sanctioned.get(rel, 0)} sanctioned — review and extend the allowance"
            )
    assert not offenders, "driver-side materialization in query path:\n" + "\n".join(offenders)


def test_checkerboard_near_dup_matches_broadcast_reference(spark, sf_dir):
    """The blocked all-pairs GEMM must produce the exact pair set of a
    naive bucket-free quadratic check (on the small sf)."""
    from onetable_spark.functions.similarity import brute_force_near_dup_pairs, cosine

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    got = {
        (r["id_a"], r["id_b"])
        for r in brute_force_near_dup_pairs(emb, threshold=0.3, n_blocks=3).collect()
    }
    a, b = emb.alias("a"), emb.alias("b")
    want = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(cosine(F.col("a.embedding"), F.col("b.embedding")), 4).alias("c"),
        )
        .filter(F.col("c") >= 0.3)
        .collect()
    }
    assert got == want and len(want) > 0


def test_hudi_last_modified_is_epoch_millis(spark, seeded_hudi):
    """ADVICE(low): last_modified_millis is epoch millis, not the instant
    literal cast to long."""
    tl = HudiTimeline(spark, seeded_hudi)
    row = tl.snapshot_files().first()
    instant = tl.latest_instant()
    assert row["last_modified_millis"] == instant_to_millis(instant)
    # sanity: within a day of now, not a 2e16 yyyyMMdd literal
    assert abs(row["last_modified_millis"] - time.time() * 1000) < 86_400_000
