"""HoodieLogFormat byte plane (r11): the block reader parses REAL
Hudi-0.14 log files from the reference's demo fixture, round-trips our
own AVRO_DATA blocks through the byte-certified Avro codec, and
verify_log_stats cross-checks decoded record counts against the timeline
write-stats the realtime MOR view trusts."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from onetable_spark.formats.hudi import HudiTimeline, _file_id_for
from onetable_spark.formats.hudi_log import (
    avro_block_records,
    log_file_record_count,
    read_log_blocks,
    write_avro_log_block,
)
from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
from onetable_spark.sources.parquet_inventory import build_inventory

_REAL_LOG_DIR = (
    "/root/reference/demo/data/db/hudi_dimCustomer/.hoodie/metadata/files"
)


@pytest.mark.skipif(
    not os.path.isdir(_REAL_LOG_DIR), reason="reference demo fixtures not present"
)
def test_reader_parses_real_hudi_014_log_files():
    """Foreign-bytes conformance: both real metadata-table log files
    (written by the actual Hudi 0.14 runtime) parse block-complete with
    the documented layout — a DELETE block and an HFILE data block."""
    logs = sorted(
        os.path.join(_REAL_LOG_DIR, f)
        for f in os.listdir(_REAL_LOG_DIR)
        if ".log." in f
    )
    assert len(logs) == 2
    b1 = read_log_blocks(logs[0])
    assert [b["type"] for b in b1] == ["delete"]
    assert b1[0]["headers"]["instant_time"] == "00000000000000010"
    b2 = read_log_blocks(logs[1])
    assert [b["type"] for b in b2] == ["hfile_data"]
    assert "schema" in b2[0]["headers"]
    # count extraction flags the hfile block as unparsable, never guesses
    got = log_file_record_count(logs[1])
    assert got["unparsed_block_types"] == ["hfile_data"]


def test_avro_block_roundtrip_and_multi_block_walk(tmp_path):
    sch = {
        "type": "record", "name": "r",
        "fields": [
            {"name": "k", "type": "int"},
            {"name": "v", "type": ["null", "string"], "default": None},
        ],
    }
    lp = str(tmp_path / ".fid_0-0-1.log.1")
    write_avro_log_block(lp, [{"k": 1, "v": "a"}, {"k": 2, "v": None}], sch, "20240101000000000")
    write_avro_log_block(lp, [{"k": 3, "v": "c"}], sch, "20240101000001000")
    blocks = read_log_blocks(lp)
    assert [b["type"] for b in blocks] == ["avro_data", "avro_data"]
    cnt, recs = avro_block_records(blocks[0], decode=True)
    assert cnt == 2 and recs == [{"k": 1, "v": "a"}, {"k": 2, "v": None}]
    assert log_file_record_count(lp) == {
        "records": 3, "deletes": 0, "unparsed_block_types": []
    }


def test_verify_log_stats_cross_checks_bytes_against_timeline(spark, sf_dir, tmp_path):
    """The realtime view trusts write-stats; verify_log_stats re-derives
    the count from the log BYTES and must agree — and must catch a lying
    stat."""
    base = str(tmp_path / "morv")
    os.makedirs(base)
    f1 = os.path.join(base, "f1.parquet")
    shutil.copy(os.path.join(sf_dir, "region.parquet"), f1)
    schema = spark.read.parquet(base).schema
    tl = HudiTimeline(spark, base)
    tl.init_table(
        Table(name="morv", base_path=base, table_format=TableFormat.HUDI,
              read_schema=schema, layout=DataLayoutStrategy.FLAT)
    )
    tl.commit(adds=build_inventory(spark, [f1], root=base), action="deltacommit")

    gid = _file_id_for("f1.parquet")
    log_rel = f".{gid}_0-0-1.log.1"
    log_path = os.path.join(base, log_rel)
    sch = {"type": "record", "name": "r",
           "fields": [{"name": "r_regionkey", "type": "int"}]}
    n = write_avro_log_block(
        log_path, [{"r_regionkey": i} for i in range(7)], sch, "20240101000000000"
    )
    from onetable_spark.model import FILES_SCHEMA

    log_inv = spark.createDataFrame(
        [(log_path, "hoodie_log", {}, os.path.getsize(log_path), n, None, None)],
        FILES_SCHEMA,
    )
    tl.commit(adds=log_inv, action="deltacommit")

    checks = tl.verify_log_stats().collect()
    assert len(checks) == 1
    c = checks[0]
    assert c["log_ok"] and c["decoded_records"] == c["stat_num_writes"] == 7
    # the realtime view and the byte-derived count agree end-to-end
    rt = tl.snapshot_files(view="realtime").collect()
    base_n = spark.read.parquet(f1).count()
    assert rt[0]["record_count"] == base_n + 7

    # a lying write-stat is caught: append 2 more records the stat omits
    write_avro_log_block(
        log_path, [{"r_regionkey": 99}, {"r_regionkey": 100}], sch,
        "20240101000002000",
    )
    checks = tl.verify_log_stats().collect()
    assert checks[0]["decoded_records"] == 9 and checks[0]["log_ok"] is False
