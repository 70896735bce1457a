"""Core-scaling probe for the dedup/ANN family on a multi-row-group corpus
(VERDICT r15 #8): every sf0.1 testdata parquet is ONE file / ONE row group,
so base scans are irreducibly 1 task and 13 queries sit at 8->32-core
ratio ~1 BY CONSTRUCTION. This probe re-runs the family over the ~K×
replicated probe corpus (built by tools/scale_probe.build_probe_corpus,
written as 8 files per table so scans parallelize) at the CURRENT core
count and prints one JSON line per query.

Run it twice — SPARK_GRAFT_CPUS=8 and =32 — and diff the outputs; a query
whose ratio stays ~1 at this shape has a real serial bottleneck, not a
fixture artifact.

Usage:
  SPARK_GRAFT_CPUS=32 python tools/scale_cores_probe.py [K] [--build]
  SPARK_GRAFT_CPUS=8  python tools/scale_cores_probe.py [K]
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from onetable_spark.session import get_spark  # noqa: E402
from tools.scale_probe import FAMILY, build_probe_corpus  # noqa: E402


def _steal() -> int:
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        return int(parts[8]) if parts and parts[0] == "cpu" else 0
    except (OSError, IndexError, ValueError):
        return 0


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 10
    probe_dir = f"/tmp/otb_scale_probe_x{k}"
    spark = get_spark("scale-cores-probe")
    cpus = spark.sparkContext.defaultParallelism

    if "--build" in sys.argv or not os.path.isdir(probe_dir):
        print(f"building ~{k}x probe corpus at {probe_dir} ...", flush=True)
        build_probe_corpus(spark, k, probe_dir)

    from onetable_spark.queries import SPARK_QUERIES

    SPARK_QUERIES["dedup_exact"](spark, probe_dir).count()
    spark.range(4).mapInPandas(lambda it: it, "id long").count()
    spark.range(4).select(F.pandas_udf(lambda s: s, "long")("id")).count()

    results: dict[str, float] = {}
    steal0 = _steal()
    for name in FAMILY:
        fn = SPARK_QUERIES[name]
        spark.sparkContext.setJobDescription(f"corescale:{name}")
        fn(spark, probe_dir).count()  # warm: builds shared indexes
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, probe_dir).count()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)
        print(f"{name}: {best:.2f}s @ {cpus} cores", flush=True)

    doc = {"cpus": cpus, "k": k, "steal_jiffies": _steal() - steal0, "queries": results}
    out = REPO / f"plans/r16/corescale_c{cpus}_x{k}.json"
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(doc, indent=1) + "\n")
    print(json.dumps(doc, separators=(",", ":")), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
