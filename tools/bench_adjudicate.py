"""Bench adjudication: separate host-throttle noise from real regressions.

This automates the protocol used manually in rounds 2-4 (BASELINE.md): the
per-round bench artifact runs on a shared, visibly-throttling host, so a
query can read 3-10x its true cost. For the N worst artifact-vs-history
deltas, rerun the query SERIALIZED (one Spark session, nothing concurrent)
min-of-3 and append the adjudication table to BASELINE.md.

Usage:
    python tools/bench_adjudicate.py                 # newest BENCH_r*.json
    python tools/bench_adjudicate.py BENCH_r05.json --top 8 --sf /root/testdata/sf0.1
    python tools/bench_adjudicate.py --no-append     # print table only

Verdict rule: a rerun within 1.5x of the best-known historical number (or
faster) is throttle noise; anything slower is flagged as a real regression
for plan investigation.
"""

from __future__ import annotations

import argparse
import glob
import json
import re
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

REAL_REGRESSION_FACTOR = 1.5


def _queries_of(doc: dict) -> dict[str, float]:
    """Unwrap a bench document: bench.py prints {"queries": ...} directly;
    the driver's recorded BENCH_r*.json nests that under "parsed". When the
    driver's tail window truncated the stdout line (BENCH_r05.json has
    ``parsed: null``), fall back to regex-scavenging ``"name": sec`` pairs
    from the raw ``tail`` fragment so the round still contributes history."""
    if isinstance(doc.get("queries"), dict):
        return doc["queries"]
    parsed = doc.get("parsed")
    if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
        return parsed["queries"]
    tail = doc.get("tail")
    if isinstance(tail, str):
        out: dict[str, float] = {}
        for name, sec in re.findall(r'"([A-Za-z0-9_]+)":\s*([0-9]+(?:\.[0-9]+)?)', tail):
            # every query name contains an interior underscore; this drops
            # the driver's meta keys (n/rc/cpus/sf/value) and the leading
            # half-name at the truncation boundary (e.g. "_transitions")
            if "_" in name and not name.startswith("_"):
                out[name] = float(sec)
        return out
    return {}


# Queries whose registered SHAPE changed in a given round — they now do
# strictly MORE work by design, so pre-change history is not comparable
# and must not seed best-known (it would flag the intentional change as a
# "real regression" forever). Maps query → first round whose artifact is
# comparable.
RESHAPED_AT: dict[str, int] = {
    # r7: the probabilistic layer moved under the oracle gate — each query
    # now ALSO computes its exact ground truth + in-plan contract
    # (previously: the approximate result alone, rows-only checked)
    "minhash_lsh_dedup": 7,
    "simhash_near_dups": 7,   # md5-derived hashes for oracle parity
    "ann_lsh_topk": 7,
    "ann_ivf_topk": 7,
    "semdedup_pairs": 7,
    # r7: sync_changes now builds the stage SHARED with sync_time_travel
    # (handle capture moved into its first call)
    "sync_changes": 7,
    # r14: read_cdf_stream became the UNION of two streaming legs (the
    # cdc-file tail + the log-derived insert/delete leg that closed the
    # append hole) — structurally more work than the r13 single-leg
    # feed; r13's 0.62 s is not a comparable baseline (VERDICT r14
    # called the 1.48x structural and justified)
    "streaming_cdf": 14,
    # r15: both row-level streaming sources restructured from one
    # serial task per snapshot/commit into two stages (metadata pass +
    # explicit repartition + per-file reads) — the per-micro-batch
    # shuffle costs a constant on sf0.1's tiny staged tables but is the
    # scale-correct plan (VERDICT r14 #1); single-task r14 numbers are
    # not comparable
    "streaming_iceberg_appends": 15,
    "streaming_hudi_rows": 15,
}


def load_history() -> dict[str, float]:
    """Best-known (min) per-query seconds across every recorded round,
    plus the committed local bench snapshot (BENCH_LOCAL.json, written by
    every bench.py run — survives driver-side truncation). Rounds before
    a query's RESHAPED_AT entry are skipped for that query."""

    def round_of(p: Path) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", p.name)
        return int(m.group(1)) if m else 10**6  # BENCH_LOCAL: always current

    best: dict[str, float] = {}
    for path in sorted(REPO.glob("BENCH_r*.json")) + [REPO / "BENCH_LOCAL.json"]:
        try:
            doc = json.loads(path.read_text())
        except (OSError, json.JSONDecodeError):
            continue
        rnd = round_of(path)
        for name, sec in _queries_of(doc).items():
            if rnd < RESHAPED_AT.get(name, 0):
                continue
            if isinstance(sec, (int, float)):
                best[name] = min(best.get(name, float("inf")), float(sec))
    return best


def newest_artifact() -> Path | None:
    def round_of(p: str) -> int:
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        return int(m.group(1)) if m else -1

    paths = sorted(glob.glob(str(REPO / "BENCH_r*.json")), key=round_of)
    return Path(paths[-1]) if paths else None


def worst_deltas(
    artifact: dict[str, float], history: dict[str, float], top: int
) -> list[tuple[str, float, float, float]]:
    """(name, best_known, artifact_sec, ratio) for the top-N worst ratios.

    History excludes the artifact itself where possible: callers pass a
    history built from ALL rounds, so a query whose artifact time IS its
    best time simply has ratio 1 and never ranks."""
    rows = []
    for name, sec in artifact.items():
        base = history.get(name)
        if base is None or base <= 0:
            continue
        rows.append((name, base, float(sec), float(sec) / base))
    rows.sort(key=lambda r: r[3], reverse=True)
    return [r for r in rows[:top] if r[3] > 1.0]


def rerun_min_of_3(names: list[str], sf_dir: str) -> dict[str, float]:
    """Serialized min-of-3 rerun in one fresh session — the quiet-host
    protocol: a warmup pass first, then 3 timed passes per query, nothing
    else running in the JVM."""
    from onetable_spark.queries import SPARK_QUERIES
    from onetable_spark.session import get_spark

    spark = get_spark("bench-adjudicate")
    results: dict[str, float] = {}
    for name in names:
        fn = SPARK_QUERIES.get(name)
        if fn is None:
            continue
        try:
            fn(spark, sf_dir).collect()  # warm JIT + footers
            best = float("inf")
            for _ in range(3):
                start = time.perf_counter()
                fn(spark, sf_dir).collect()
                best = min(best, time.perf_counter() - start)
            results[name] = round(best, 3)
        except Exception as ex:  # noqa: BLE001 - record, keep adjudicating
            print(f"  rerun error {name}: {str(ex)[:100]}", file=sys.stderr)
    spark.stop()
    return results


def render_table(
    deltas: list[tuple[str, float, float, float]],
    reruns: dict[str, float],
    artifact_name: str,
) -> str:
    lines = [
        "",
        f"## Adjudication of {artifact_name} (generated by tools/bench_adjudicate.py)",
        "",
        "Serialized min-of-3 rerun of the worst artifact-vs-history deltas;",
        f"rerun ≤ {REAL_REGRESSION_FACTOR}× best-known ⇒ throttle noise, else real regression:",
        "",
        "| query | best known | artifact | min-of-3 | verdict |",
        "|---|---|---|---|---|",
    ]
    for name, base, art, ratio in deltas:
        rerun = reruns.get(name)
        if rerun is None:
            verdict = "rerun failed"
            rerun_s = "—"
        else:
            rerun_s = f"{rerun:.2f} s"
            verdict = (
                "throttle noise"
                if rerun <= base * REAL_REGRESSION_FACTOR
                else f"**real regression ({rerun / base:.1f}× best)**"
            )
        lines.append(
            f"| {name} | {base:.2f} s | {art:.2f} s ({ratio:.1f}×) | {rerun_s} | {verdict} |"
        )
    lines.append("")
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact", nargs="?", help="bench artifact JSON (default: newest BENCH_r*.json)")
    ap.add_argument("--top", type=int, default=8, help="adjudicate the N worst deltas")
    ap.add_argument("--sf", default="/root/testdata/sf0.1", help="sf dir for reruns")
    ap.add_argument("--no-append", action="store_true", help="print only; don't touch BASELINE.md")
    args = ap.parse_args()

    artifact_path = Path(args.artifact) if args.artifact else newest_artifact()
    if artifact_path is None or not artifact_path.exists():
        print("no bench artifact found", file=sys.stderr)
        return 1
    artifact = _queries_of(json.loads(artifact_path.read_text()))
    history = load_history()
    deltas = worst_deltas(artifact, history, args.top)
    if not deltas:
        print(f"{artifact_path.name}: no query above its best-known time — nothing to adjudicate")
        return 0

    print(f"adjudicating {len(deltas)} queries from {artifact_path.name}:")
    for name, base, art, ratio in deltas:
        print(f"  {name}: best {base:.2f}s, artifact {art:.2f}s ({ratio:.1f}x)")
    reruns = rerun_min_of_3([d[0] for d in deltas], args.sf)
    table = render_table(deltas, reruns, artifact_path.name)
    print(table)
    if not args.no_append:
        baseline = REPO / "BASELINE.md"
        with open(baseline, "a") as f:
            f.write(table + "\n")
        print(f"appended to {baseline}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
