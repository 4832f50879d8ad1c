"""Time-series operators (crawler/timeseries.py) vs independent twins:
asof_join vs pandas merge_asof, range_join vs a brute-force pair scan,
rollup_time_buckets vs per-grain pandas groupbys."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from crawler import timeseries

def _ts(s: int) -> dt.datetime:
    # naive wall-clock: the session TZ is pinned UTC (session.py), so
    # naive datetimes round-trip Spark exactly like the NTZ test tables
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=int(s))


def _rand_frames(seed: int, n_left=300, n_right=200, n_keys=7):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_left),
            "ts": [_ts(s) for s in rng.choice(200_000, n_left, replace=False)],
            "lval": rng.integers(0, 1000, n_left),
        }
    )
    # unique (k, ts) on the right: ties at identical key+ts are broken
    # by largest-payload (documented), which merge_asof can't mirror
    right = pd.DataFrame(
        {
            "k": rng.integers(0, n_keys, n_right),
            "ts": [_ts(s) for s in rng.choice(200_000, n_right, replace=False)],
            "rval": rng.integers(0, 1000, n_right),
        }
    ).drop_duplicates(["k", "ts"])
    # plant an exact-ts collision across sides: allow_exact_matches=True
    left.loc[0, "k"] = right.iloc[0]["k"]
    left.loc[0, "ts"] = right.iloc[0]["ts"]
    return left, right


@pytest.mark.parametrize("seed,tol", [(1, None), (2, None), (3, 5_000 * 10**6)])
def test_asof_join_matches_pandas_merge_asof(spark, seed, tol):
    left, right = _rand_frames(seed)
    got = (
        timeseries.asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key_cols=["k"],
            ts_col="ts",
            payload_cols=["rval"],
            tolerance_us=tol,
        )
        .toPandas()
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "ts_asof", "rval": "rval_asof"}),
        left_on="ts",
        right_on="ts_asof",
        by="k",
        direction="backward",
        allow_exact_matches=True,
        tolerance=None if tol is None else pd.Timedelta(microseconds=tol),
    ).sort_values(["k", "ts", "lval"]).reset_index(drop=True)
    assert len(got) == len(left) == len(want)
    for i in range(len(got)):
        g, w = got.iloc[i], want.iloc[i]
        assert (g["k"], g["ts"], g["lval"]) == (w["k"], w["ts"], w["lval"])
        if pd.isna(w["rval_asof"]):
            assert pd.isna(g["rval_asof"]) and pd.isna(g["ts_asof"])
        else:
            assert g["rval_asof"] == w["rval_asof"]
            assert g["ts_asof"] == w["ts_asof"]


def test_asof_join_exact_and_missing_edges(spark):
    left = pd.DataFrame(
        {"k": [1, 1, 2], "ts": [_ts(100), _ts(50), _ts(10)], "lval": [1, 2, 3]}
    )
    right = pd.DataFrame({"k": [1, 1], "ts": [_ts(100), _ts(60)], "rval": [7, 8]})
    got = {
        r["lval"]: (r["ts_asof"], r["rval_asof"])
        for r in timeseries.asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            ["k"],
            "ts",
            ["rval"],
        ).collect()
    }
    assert got[1] == (_ts(100), 7)  # exact ts matches (≤)
    assert got[2] == (None, None)  # left precedes every right row
    assert got[3] == (None, None)  # key never seen on the right


def test_range_join_matches_bruteforce(spark):
    rng = np.random.default_rng(11)
    points = pd.DataFrame(
        {
            "pid": range(400),
            "pts": [_ts(s) for s in rng.integers(0, 50_000, 400)],
        }
    )
    starts = rng.integers(0, 50_000, 60)
    # interval lengths from zero-width to many-bucket spans
    ends = starts + rng.integers(0, 9_000, 60)
    intervals = pd.DataFrame(
        {
            "iid": range(60),
            "sts": [_ts(s) for s in starts],
            "ets": [_ts(e) for e in ends],
        }
    )
    # boundary plants: point exactly at a start (IN) and at an end (OUT)
    points.loc[0, "pts"] = intervals.iloc[0]["sts"]
    points.loc[1, "pts"] = intervals.iloc[1]["ets"]
    got = {
        (r["pid"], r["iid"])
        for r in timeseries.range_join(
            spark.createDataFrame(points),
            spark.createDataFrame(intervals),
            "pts",
            "sts",
            "ets",
            bucket_s=1800,  # << interval span: forces multi-bucket explode
        ).collect()
    }
    want = {
        (p.pid, i.iid)
        for p in points.itertuples()
        for i in intervals.itertuples()
        if i.sts <= p.pts < i.ets
    }
    assert got == want
    assert (0, 0) in got and (1, 1) not in got
    assert len(got) > 100  # non-vacuous


def test_rollup_matches_pandas(spark):
    rng = np.random.default_rng(5)
    n = 500
    ev = pd.DataFrame(
        {
            "ts": [_ts(s) for s in rng.integers(0, 40 * 86_400, n)],
            "event_type": rng.choice(["a", "b"], n),
            "value": np.round(rng.uniform(0, 100, n), 2),
        }
    )
    out = timeseries.rollup_time_buckets(
        spark.createDataFrame(ev), "ts", ["event_type"], "value"
    ).toPandas()
    naive = ev
    # pandas W-<day> anchors the week END: Monday-start weeks = W-SUN
    for grain, freq in (("hour", "h"), ("day", "D"), ("week", "W-SUN")):
        sub = out[out["grain"] == grain]
        if grain == "week":
            b = naive["ts"].dt.to_period(freq).dt.start_time
        else:
            b = naive["ts"].dt.floor(freq)
        want = (
            naive.assign(bucket=b)
            .groupby(["bucket", "event_type"])
            .agg(n_events=("value", "size"), total_value=("value", "sum"))
            .reset_index()
        )
        assert len(sub) == len(want)
        gm = {
            (r["bucket_us"], r["event_type"]): (r["n_events"], r["total_value"])
            for _, r in sub.iterrows()
        }
        for _, r in want.iterrows():
            us = int(r["bucket"].value // 1000)
            gn, gv = gm[(us, r["event_type"])]
            assert gn == r["n_events"]
            assert abs(gv - round(r["total_value"], 4)) < 1e-6
    # the three grains really are three granularities of the same data
    tot = {g: out[out["grain"] == g]["n_events"].sum() for g in ("hour", "day", "week")}
    assert tot == {"hour": n, "day": n, "week": n}


def test_asof_join_multi_key(spark):
    """Composite join keys: the window partitions on ALL key columns —
    fuzzed against merge_asof(by=[k1, k2])."""
    rng = np.random.default_rng(9)
    left = pd.DataFrame(
        {
            "k1": rng.integers(0, 3, 150),
            "k2": rng.choice(["x", "y"], 150),
            "ts": [_ts(s) for s in rng.choice(100_000, 150, replace=False)],
            "lval": range(150),
        }
    )
    right = pd.DataFrame(
        {
            "k1": rng.integers(0, 3, 80),
            "k2": rng.choice(["x", "y"], 80),
            "ts": [_ts(s) for s in rng.choice(100_000, 80, replace=False)],
            "rval": range(80),
        }
    ).drop_duplicates(["k1", "k2", "ts"])
    got = (
        timeseries.asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key_cols=["k1", "k2"],
            ts_col="ts",
            payload_cols=["rval"],
        )
        .toPandas()
        .sort_values("lval")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "ts_asof", "rval": "rval_asof"}),
        left_on="ts",
        right_on="ts_asof",
        by=["k1", "k2"],
        direction="backward",
    ).sort_values("lval").reset_index(drop=True)
    for i in range(len(got)):
        g, w = got.iloc[i], want.iloc[i]
        if pd.isna(w["rval_asof"]):
            assert pd.isna(g["rval_asof"])
        else:
            assert (g["rval_asof"], g["ts_asof"]) == (w["rval_asof"], w["ts_asof"])


@pytest.mark.parametrize("seed,tol", [(4, None), (5, 3_000 * 10**6)])
def test_asof_join_forward(spark, seed, tol):
    """direction='forward': the smallest right ts ≥ the left's, exact
    matches included — fuzzed against merge_asof(direction='forward')."""
    left, right = _rand_frames(seed)
    got = (
        timeseries.asof_join(
            spark.createDataFrame(left),
            spark.createDataFrame(right),
            key_cols=["k"],
            ts_col="ts",
            payload_cols=["rval"],
            tolerance_us=tol,
            direction="forward",
        )
        .toPandas()
        .sort_values(["k", "ts", "lval"])
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("ts"),
        right.sort_values("ts").rename(columns={"ts": "ts_asof", "rval": "rval_asof"}),
        left_on="ts",
        right_on="ts_asof",
        by="k",
        direction="forward",
        tolerance=None if tol is None else pd.Timedelta(microseconds=tol),
    ).sort_values(["k", "ts", "lval"]).reset_index(drop=True)
    assert len(got) == len(want)
    for i in range(len(got)):
        g, w = got.iloc[i], want.iloc[i]
        if pd.isna(w["rval_asof"]):
            assert pd.isna(g["rval_asof"])
        else:
            assert (g["rval_asof"], g["ts_asof"]) == (w["rval_asof"], w["ts_asof"])
