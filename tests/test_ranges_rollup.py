"""Tests for functions/ranges.range_join and functions/rollup (time_rollup
+ coarsen cascade): semantics vs a pure-Python reference, boundary cases
on the half-open interval, the bin-fanout guard, and the exactness of the
integer-micros bucket math near bucket boundaries."""

import datetime as dt

import pytest

from amundsendatabuilder_spark.functions.ranges import range_join
from amundsendatabuilder_spark.functions.rollup import (
    DAY_US, HOUR_US, coarsen, time_rollup)

EPOCH = dt.datetime(1970, 1, 1)


def _ts(us):
    return EPOCH + dt.timedelta(microseconds=us)


def _points(spark, rows):
    return spark.createDataFrame(
        [(i, k, _ts(us)) for i, (k, us) in enumerate(rows)],
        "event_id long, user_id long, ts timestamp_ntz")


def _intervals(spark, rows):
    return spark.createDataFrame(
        [(i, k, _ts(s) if s is not None else None,
          _ts(e) if e is not None else None)
         for i, (k, s, e) in enumerate(rows)],
        "interval_id long, user_id long,"
        " start_ts timestamp_ntz, end_ts timestamp_ntz")


def _py_range_join(points, intervals):
    out = set()
    for pid, (pk, pus) in enumerate(points):
        for iid, (ik, s, e) in enumerate(intervals):
            if s is None or e is None or e <= s:
                continue
            if pk == ik and s <= pus < e:
                out.add((pid, iid))
    return out


def test_range_join_vs_reference(spark):
    H = HOUR_US
    # points straddling bins, exact boundary hits, multi-interval overlap
    points = [(1, 0), (1, H - 1), (1, H), (1, H + 5), (2, 3 * H),
              (3, 10), (1, 10 * H)]
    intervals = [
        (1, 0, H),              # [0, 1h): catches 0 and H-1, not H
        (1, H, 2 * H),          # adjacent window
        (1, H - 2, H + 10),     # straddles the bin boundary
        (2, 3 * H, 3 * H),      # empty (e == s): matches nothing
        (2, None, 4 * H),       # NULL start: matches nothing
        (9, 0, 20 * H),         # key with no points
    ]
    got = range_join(_points(spark, points), _intervals(spark, intervals),
                     key="user_id", right_cols=["interval_id"],
                     bin_width_us=H).collect()
    got_pairs = {(r["event_id"], r["interval_id_r"]) for r in got}
    assert got_pairs == _py_range_join(points, intervals)
    # each matched pair appears exactly once despite the bin explode
    assert len(got) == len(got_pairs)


def test_range_join_randomized_vs_reference(spark):
    # Seeded fuzz across awkward bin widths (non-divisors of interval
    # lengths, width 1, width >> span): the binned plan must equal the
    # brute-force point-in-interval semantics for every width.
    import random

    rng = random.Random(7)
    span = 500_000
    points = [(rng.randint(1, 4), rng.randint(0, span)) for _ in range(120)]
    intervals = []
    for _ in range(40):
        s = rng.randint(0, span)
        intervals.append((rng.randint(1, 4), s, s + rng.randint(0, 40_000)))
    pdf, idf = _points(spark, points), _intervals(spark, intervals)
    want = _py_range_join(points, intervals)
    for bw in (1_777, 40_000, 10_000_000, 1):
        got = range_join(pdf, idf, key="user_id",
                         right_cols=["interval_id"], bin_width_us=bw,
                         max_bins_per_interval=10**9).collect()
        pairs = {(r["event_id"], r["interval_id_r"]) for r in got}
        assert pairs == want and len(got) == len(pairs), f"bw={bw}"


def test_range_join_left_keeps_unmatched(spark):
    H = HOUR_US
    pts = _points(spark, [(1, 5), (2, 5)])
    iv = _intervals(spark, [(1, 0, H)])
    out = range_join(pts, iv, key="user_id", right_cols=["interval_id"],
                     bin_width_us=H, how="left").collect()
    by_ev = {r["event_id"]: r for r in out}
    assert by_ev[0]["interval_id_r"] == 0
    assert by_ev[1]["interval_id_r"] is None and by_ev[1]["start_ts_us_r"] is None


def test_range_join_no_key_and_null_ts(spark):
    H = HOUR_US
    pts = spark.createDataFrame(
        [(0, _ts(5)), (1, None)], "event_id long, ts timestamp_ntz")
    iv = _intervals(spark, [(7, 0, H)]).drop("user_id")
    out = range_join(pts, iv, key=None, right_cols=["interval_id"],
                     bin_width_us=H).collect()
    assert [(r["event_id"], r["interval_id_r"]) for r in out] == [(0, 0)]


def test_range_join_fanout_guard_raises(spark):
    iv = _intervals(spark, [(1, 0, 10 * HOUR_US)])
    pts = _points(spark, [(1, 5)])
    df = range_join(pts, iv, key="user_id", bin_width_us=HOUR_US,
                    max_bins_per_interval=3)
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "max_bins_per_interval" in str(ei.value)


def test_range_join_bad_args(spark):
    pts = _points(spark, [(1, 5)])
    iv = _intervals(spark, [(1, 0, HOUR_US)])
    with pytest.raises(ValueError):
        range_join(pts, iv, key=None, how="full")
    with pytest.raises(ValueError):
        range_join(pts, iv, key=None, bin_width_us=0)


def _events(spark, rows):
    return spark.createDataFrame(
        [(k, _ts(us), v) for (k, us, v) in rows],
        "event_type string, ts timestamp_ntz, value double")


def test_rollup_cascade_matches_direct(spark):
    # 2020s-era micros, values placed a few us either side of hour and
    # day boundaries — the exact cases double-division bucket math gets
    # wrong (functions/ranges._floordiv docstring)
    base = 1_700_000_000_000_000
    day0 = base - base % DAY_US
    rows = []
    for k, off, v in [
        ("a", 0, 1.005), ("a", HOUR_US - 1, 2.0), ("a", HOUR_US, 3.5),
        ("a", DAY_US - 1, -1.25), ("a", DAY_US, 10.0),
        ("b", 50, None), ("b", DAY_US + 3, 7.77),
    ]:
        rows.append((k, day0 + off, v))
    ev = _events(spark, rows)

    hourly = time_rollup(ev, ts_col="ts", bucket_us=HOUR_US,
                         keys=["event_type"], value_col="value")
    daily = coarsen(hourly, DAY_US, keys=["event_type"])
    direct = time_rollup(ev, ts_col="ts", bucket_us=DAY_US,
                         keys=["event_type"], value_col="value")
    key = lambda r: (r["bucket_us"], r["event_type"])  # noqa: E731
    got = sorted([tuple(r) for r in daily.collect()])
    want = sorted([tuple(r) for r in direct.collect()])
    assert got == want
    by = {key(r): r for r in daily.collect()}
    # day0/'a': 1.005 -> 1.01 (HALF_UP) = 101c, 2.0, 3.5, -1.25
    a0 = by[(day0, "a")]
    assert a0["n_rows"] == 4
    assert a0["sum_cents"] == 101 + 200 + 350 - 125
    assert a0["min_cents"] == -125 and a0["max_cents"] == 350
    # day0/'b': single NULL value — counted, money parts NULL
    b0 = by[(day0, "b")]
    assert b0["n_rows"] == 1 and b0["sum_cents"] is None
    # bucket starts are exact day multiples
    assert all(r["bucket_us"] % DAY_US == 0 for r in daily.collect())


def test_rollup_without_value_col(spark):
    ev = _events(spark, [("a", 10, 1.0), ("a", 20, 2.0)])
    out = time_rollup(ev, ts_col="ts", bucket_us=HOUR_US,
                      keys=[], value_col=None)
    rows = out.collect()
    assert rows[0]["n_rows"] == 2
    assert set(out.columns) == {"bucket_us", "n_rows"}
    with pytest.raises(ValueError):
        time_rollup(ev, bucket_us=0)
    with pytest.raises(ValueError):
        coarsen(out, bucket_us=-1)
