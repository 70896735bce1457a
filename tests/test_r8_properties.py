"""Property-based checks (hypothesis) for the round-8 operators: the
compaction planner's invariants under arbitrary file inventories, the BPE
merge fold against a pure-Python reference on arbitrary words, and the
OLS calibration's closed form against numpy's least squares."""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from onetable_spark.functions.bpe import apply_merge
from onetable_spark.operators.maintenance import assign_compaction_bins, plan_compaction_bins

_SETTINGS = dict(
    max_examples=12,  # each example spins Spark jobs — a dozen covers the shapes
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@st.composite
def inventories(draw):
    n = draw(st.integers(min_value=1, max_value=24))
    rows = []
    for i in range(n):
        part = draw(st.sampled_from(["a", "b", "c"]))
        size = draw(st.integers(min_value=1, max_value=4000))
        rows.append((part, f"f{i:03d}", size))
    target = draw(st.integers(min_value=100, max_value=3000))
    return rows, target


@settings(**_SETTINGS)
@given(inventories())
def test_compaction_planner_invariants(spark, inv):
    rows, target = inv
    files = spark.createDataFrame(rows, "part string, path string, size long")
    assigned = assign_compaction_bins(
        files, target, part_cols=("part",), order_col="path"
    ).collect()
    plan = plan_compaction_bins(
        files, target, part_cols=("part",), order_col="path"
    ).collect()

    # 1. assignment covers exactly the small files, each exactly once
    small = {(p, f) for p, f, s in rows if s < target}
    assert {(r["part"], r["path"]) for r in assigned} == small

    # 2. no bin crosses a partition, and the plan aggregates the assignment
    by_bin: dict = {}
    for r in assigned:
        by_bin.setdefault((r["part"], r["bin_id"]), []).append(r)
    for p in plan:
        members = by_bin[(p["part"], p["bin_id"])]
        assert p["n_files"] == len(members) >= 2
        assert p["total_bytes"] == sum(m["size"] for m in members)

    # 3. stride bound: a bin exceeds target only via its LAST file (the
    # documented one-file overshoot), never by two
    for (part, _bin), members in by_bin.items():
        members.sort(key=lambda m: m["path"])
        if len(members) >= 2:
            assert sum(m["size"] for m in members[:-1]) < target + max(
                m["size"] for m in members
            )
            # all but the last fit strictly under one stride start
            assert sum(m["size"] for m in members[:-1]) < 2 * target


WORD = st.text(alphabet="abc", min_size=0, max_size=12)


@settings(**_SETTINGS)
@given(st.lists(WORD, min_size=1, max_size=8), st.sampled_from(["ab", "aa", "bc", "ca"]))
def test_apply_merge_fold_matches_reference(spark, words, pair):
    a, b = pair[0], pair[1]

    def ref(w: str) -> list[str]:
        syms, out, i = list(w), [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    vocab = spark.createDataFrame(
        [(w, 1) for w in words], "word string, freq long"
    ).withColumn("syms", F.split("word", ""))
    # split('', '') yields [''] for the empty word; the fold must pass it through
    got = {r["word"]: r["syms"] for r in apply_merge(vocab, a, b).collect()}
    for w in words:
        want = ref(w) if w else [""]
        assert got[w] == want, (w, pair)


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5000),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=3,
        max_size=40,
    )
)
def test_ols_closed_form_matches_numpy(spark, xy):
    # degenerate var(x)=0 inputs are legal SQL (inf/nan) but not OLS — skip
    xs = [x for x, _ in xy]
    if len(set(xs)) < 2:
        return
    df = spark.createDataFrame(
        [("s", x, y) for x, y in xy], "source string, x long, y long"
    )
    dec = "decimal(38,0)"
    xc, yc = F.col("x").cast("long"), F.col("y").cast("long")
    stats = df.groupBy("source").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(xc.cast(dec)).alias("sx"),
        F.sum(yc.cast(dec)).alias("sy"),
        F.sum((xc * yc).cast(dec)).alias("sxy"),
        F.sum((xc * xc).cast(dec)).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    var_x = (n * sxx - sx * sx).cast("double")
    row = stats.select(
        ((n * sxy - sx * sy).cast("double") / var_x).alias("slope"),
        ((sy * sxx - sx * sxy).cast("double") / var_x).alias("intercept"),
    ).first()

    A = np.array([[x, 1.0] for x, _ in xy])
    b = np.array([y for _, y in xy], dtype=float)
    slope, intercept = np.linalg.lstsq(A, b, rcond=None)[0]
    assert abs(row["slope"] - slope) < 1e-7 * max(1.0, abs(slope))
    assert abs(row["intercept"] - intercept) < 1e-6 * max(1.0, abs(intercept))
