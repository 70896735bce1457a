"""One-off profiler for the Iceberg changelog's per-snapshot constant
(r14): build an N-commit upsert chain once (kept in /tmp for reuse),
then split wall time into (a) changelog() plan construction — which
runs the per-snapshot driver jobs (eq-tuple collects) — and (b) the
final .count() execution (manifest decodes + row reads). Run phases
under cProfile to see where the driver time goes.

Usage: python tools/profile_ice_changelog.py [N] [--rebuild]
"""

from __future__ import annotations

import cProfile
import io
import os
import pstats
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BASE = "/tmp/otb_ice_prof"


def build(spark, n: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    from onetable_spark.formats.iceberg import IcebergTable
    from onetable_spark.model import DataLayoutStrategy, Table, TableFormat
    from onetable_spark.sources.parquet_inventory import build_inventory

    shutil.rmtree(BASE, ignore_errors=True)
    os.makedirs(BASE)

    def wf(rows, path):
        pq.write_table(
            pa.table({"id": [r[0] for r in rows], "name": [r[1] for r in rows]}),
            path,
        )

    wf([(i, f"n{i}") for i in range(50)], os.path.join(BASE, "seed.parquet"))
    schema = spark.read.parquet(os.path.join(BASE, "seed.parquet")).schema
    ice = IcebergTable(spark, BASE)
    ice.init_table(
        Table(name="p", base_path=BASE, table_format=TableFormat.ICEBERG,
              read_schema=schema, layout=DataLayoutStrategy.FLAT),
        format_version=2,
    )
    ice.commit_overwrite(
        adds=build_inventory(spark, [os.path.join(BASE, "seed.parquet")], root=BASE)
    )
    for k in range(n):
        f = os.path.join(BASE, f"u{k}.parquet")
        wf([(k % 50, f"v{k}")], f)
        ice.commit_upsert(build_inventory(spark, [f], root=BASE), ["id"])
        if (k + 1) % 40 == 0:
            ice.rewrite_data_files(apply_equality_deletes=True)
            ice.compact_manifests()


def main() -> None:
    n = 100
    rebuild = False
    for a in sys.argv[1:]:
        if a == "--rebuild":
            rebuild = True
        else:
            n = int(a)

    from onetable_spark.session import get_spark

    spark = get_spark("ice_prof")
    if rebuild or not os.path.exists(os.path.join(BASE, "metadata")):
        t0 = time.time()
        build(spark, n)
        print(f"build: {time.time() - t0:.1f}s")

    from onetable_spark.formats.iceberg import IcebergTable

    ice = IcebergTable(spark, BASE)

    for phase in ("plan", "count"):
        pr = cProfile.Profile()
        t0 = time.time()
        pr.enable()
        if phase == "plan":
            df = ice.changelog()
        else:
            cnt = df.count()
        pr.disable()
        wall = time.time() - t0
        s = io.StringIO()
        pstats.Stats(pr, stream=s).sort_stats("cumulative").print_stats(14)
        print(f"\n===== {phase}: {wall:.2f}s "
              + (f"rows={cnt}" if phase == "count" else ""))
        for line in s.getvalue().splitlines():
            if line.strip() and ("cumtime" in line or "/" in line or "{" in line):
                print(line)


if __name__ == "__main__":
    main()
