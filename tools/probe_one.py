"""Serialized min-of-N probe for ONE registry query at a given sf dir.

Same-host back-to-back A/B evidence per BASELINE.md protocol: warm the
session (JVM + Arrow pool) exactly like bench.py, then time the query's
collect() min-of-N. Usage: python tools/probe_one.py <query> [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from onetable_spark.session import get_spark  # noqa: E402


def main() -> None:
    qname = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = get_spark("probe-one")

    from onetable_spark.queries import SPARK_QUERIES

    # bench-equivalent warmup: JVM codegen, Arrow pool
    SPARK_QUERIES["g1_files_diff"](spark, sf_dir).count()
    spark.range(4).mapInPandas(lambda it: it, "id long").count()
    spark.range(4).select(F.pandas_udf(lambda s: s, "long")("id")).count()

    q = SPARK_QUERIES[qname]
    spark.sparkContext.setJobDescription(f"probe:{qname}")
    t0 = time.perf_counter()
    n = len(q(spark, sf_dir).collect())
    cold = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        q(spark, sf_dir).collect()
        times.append(time.perf_counter() - t0)
    print(
        f"PROBE {qname} rows={n} cold={cold:.3f} min={min(times):.3f} "
        f"all={[round(t, 3) for t in times]}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
