from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from dedupe_spark.operators.asof import asof_join, asof_join_pandas, range_join_count

T0 = datetime(2026, 1, 1)


@pytest.fixture(scope="module")
def asof_data(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", T0 + timedelta(minutes=10)),
            (2, "u1", T0 + timedelta(minutes=30)),
            (3, "u2", T0 + timedelta(minutes=5)),
            (4, "u3", T0 + timedelta(minutes=60)),  # u3 has no events
        ],
        "oid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", T0 + timedelta(minutes=1), 100),
            ("u1", T0 + timedelta(minutes=9), 101),
            ("u1", T0 + timedelta(minutes=29), 102),
            ("u2", T0 + timedelta(minutes=7), 200),  # after u2's order
        ],
        "k string, rts timestamp, v long",
    )
    return left, right


def _expected():
    return {1: 101, 2: 102, 3: None, 4: None}


def test_asof_join_composed(asof_data):
    left, right = asof_data
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts", right_vals=["v"])
    got = {r["oid"]: r["asof_v"] for r in out.collect()}
    assert got == _expected()


def test_asof_join_pandas_matches(asof_data):
    left, right = asof_data
    out = asof_join_pandas(left, right, key="k", left_ts="lts", right_ts="rts", right_vals=["v"])
    got = {r["oid"]: r["asof_v"] for r in out.collect()}
    assert got == _expected()


@pytest.fixture(scope="module")
def asof_ties(spark):
    """Right-side timestamp ties + duplicate left rows + equal-ts match:
    the deterministic tie-break is 'latest ts, then greatest value
    columns' (the SQL oracle's ts DESC, v DESC)."""
    left = spark.createDataFrame(
        [
            (1, "u1", T0 + timedelta(minutes=10)),
            (2, "u1", T0 + timedelta(minutes=10)),  # duplicate-shaped left row
            (3, "u1", T0 + timedelta(minutes=5)),   # equal-ts right match (inclusive <=)
        ],
        "oid long, k string, lts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", T0 + timedelta(minutes=5), 300),
            ("u1", T0 + timedelta(minutes=5), 302),  # tie at 5m -> greatest v wins
            ("u1", T0 + timedelta(minutes=5), 301),
            ("u1", T0 + timedelta(minutes=2), 999),  # earlier, must lose to 5m rows
        ],
        "k string, rts timestamp, v long",
    )
    return left, right


def test_asof_tie_break_composed(asof_ties):
    left, right = asof_ties
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts", right_vals=["v"])
    got = {r["oid"]: r["asof_v"] for r in out.collect()}
    assert got == {1: 302, 2: 302, 3: 302}


def test_asof_tie_break_pandas_matches_composed(asof_ties):
    """ADVICE r2: merge_asof's pick on (key, ts) ties was sort-order
    arbitrary; the stable (ts, vals) sort pins it to the documented
    greatest-value tie-break."""
    left, right = asof_ties
    out = asof_join_pandas(left, right, key="k", left_ts="lts", right_ts="rts", right_vals=["v"])
    got = {r["oid"]: r["asof_v"] for r in out.collect()}
    assert got == {1: 302, 2: 302, 3: 302}


def test_asof_join_plan_has_no_join(asof_data):
    """The composed variant is a union + window — the plan must contain
    no join operator at all (the r2 unbounded-intermediate fix)."""
    left, right = asof_data
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts", right_vals=["v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_count(spark, asof_data):
    left, right = asof_data
    out = range_join_count(
        left, right, left_id="oid", key="k", left_ts="lts", right_ts="rts",
        window_seconds=20 * 60,
    )
    got = {r["oid"]: r["n_in_range"] for r in out.collect()}
    # oid1 window [10m, 30m): u1 events at 29m -> 1
    # oid2 window [30m, 50m): none -> 0
    # oid3 window [5m, 25m): u2 event at 7m -> 1
    # oid4: u3 none -> 0
    assert got == {1: 1, 2: 0, 3: 1, 4: 0}


def test_asof_pandas_left_column_named_like_right_ts(spark):
    """The left frame carrying a data column with the same name as
    right_ts must not break the cogroup merge (merge_asof suffixing)."""
    from dedupe_spark.operators.asof import asof_join_pandas

    left = spark.createDataFrame(
        [("k1", 10, "left-data")], "k string, lts long, ts string"
    )
    right = spark.createDataFrame([("k1", 5, 99)], "k string, ts long, v long")
    (r,) = asof_join_pandas(
        left, right, key="k", left_ts="lts", right_ts="ts", right_vals=["v"]
    ).collect()
    assert r["asof_v"] == 99 and r["ts"] == "left-data"
