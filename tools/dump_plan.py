"""Dump `.explain("formatted")` for the given registry queries to files.

Usage: python tools/dump_plan.py <out_dir> <suffix> <query> [query ...]
Writes <out_dir>/<query>_<suffix>.txt for each query (the plans/r15
evidence convention).
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from onetable_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir = Path(sys.argv[1])
    suffix = sys.argv[2]
    names = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark("dump-plan")
    from onetable_spark.queries import SPARK_QUERIES

    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = SPARK_QUERIES[name](spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (out_dir / f"{name}_{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {out_dir / f'{name}_{suffix}.txt'}")
    spark.stop()


if __name__ == "__main__":
    main()
