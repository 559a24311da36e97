"""As-of join + gap-fill resample (operators/temporal.py).

The reference has no range/as-of/interval joins (SURVEY §2.3 'absent');
these are the engine's time-axis extension. The tests pin:
- backward/forward nearest-match semantics, inclusive at equal ts
- tolerance nulling
- deterministic duplicate-ts resolution (max payload)
- no-match rows survive with null payload (left-join semantics)
- plan shape: the union-sort rewrite produces NO join node and exactly
  one exchange — never a nested-loop range join
- resample grid alignment and forward fill
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from time_series_classification_using_knn_with_dtw_under_big_data_schema_spark.operators import (
    asof_join,
    interval_join,
    resample_ffill,
)


@pytest.fixture(scope="module")
def quotes(spark):
    # key, ts, payload value
    return spark.createDataFrame(
        [
            (1, 10, 1.0),
            (1, 20, 2.0),
            (1, 30, 3.0),
            (2, 15, 5.0),
        ],
        "k long, ts long, px double",
    )


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame(
        [
            (1, 5, 100),   # before any quote
            (1, 20, 101),  # exactly on a quote (inclusive)
            (1, 25, 102),  # between quotes
            (1, 99, 103),  # after last quote
            (2, 14, 104),  # just before key-2's only quote
            (3, 50, 105),  # key with no quotes at all
        ],
        "k long, ts long, trade_id long",
    )


def _by_trade(rows):
    return {r.trade_id: (r.ts_matched, r.px) for r in rows}


def test_asof_backward(spark, quotes, trades):
    out = _by_trade(
        asof_join(trades, quotes, on="k", ts="ts", value_cols=["px"]).collect()
    )
    assert out[100] == (None, None)
    assert out[101] == (20, 2.0)  # inclusive at equal ts
    assert out[102] == (20, 2.0)
    assert out[103] == (30, 3.0)
    assert out[104] == (None, None)
    assert out[105] == (None, None)  # key absent from right


def test_asof_forward(spark, quotes, trades):
    out = _by_trade(
        asof_join(
            trades, quotes, on="k", ts="ts", value_cols=["px"], direction="forward"
        ).collect()
    )
    assert out[100] == (10, 1.0)
    assert out[101] == (20, 2.0)  # inclusive in forward direction too
    assert out[102] == (30, 3.0)
    assert out[103] == (None, None)
    assert out[104] == (15, 5.0)
    assert out[105] == (None, None)


def test_asof_tolerance(spark, quotes, trades):
    out = _by_trade(
        asof_join(
            trades, quotes, on="k", ts="ts", value_cols=["px"], tolerance=5
        ).collect()
    )
    assert out[101] == (20, 2.0)   # gap 0
    assert out[102] == (20, 2.0)   # gap 5 == tolerance, kept
    assert out[103] == (None, None)  # gap 69 > tolerance
    assert out[105] == (None, None)


def test_asof_duplicate_right_ts_deterministic(spark):
    left = spark.createDataFrame([(1, 10, 7)], "k long, ts long, trade_id long")
    right = spark.createDataFrame(
        [(1, 10, 1.0), (1, 10, 9.0), (1, 10, 4.0)], "k long, ts long, px double"
    )
    rows = asof_join(left, right, on="k", ts="ts", value_cols=["px"]).collect()
    # total order on the payload struct: max (ts, px) wins — stable across runs
    assert _by_trade(rows)[7] == (10, 9.0)


def test_asof_left_columns_and_count_preserved(spark, quotes, trades):
    out = asof_join(trades, quotes, on="k", ts="ts", value_cols=["px"])
    assert out.count() == trades.count()
    assert set(out.columns) == {"k", "ts", "trade_id", "ts_matched", "px"}


def test_asof_value_clash_raises(spark, quotes):
    with pytest.raises(ValueError, match="clash"):
        asof_join(quotes, quotes, on="k", ts="ts", value_cols=["px"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(quotes, quotes.select("k", "ts"), on="k", ts="ts", direction="nearest")


def test_asof_plan_has_no_join_and_one_exchange(spark, quotes, trades):
    plan = (
        asof_join(trades, quotes, on="k", ts="ts", value_cols=["px"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Join" not in plan and "Cartesian" not in plan
    # one hash exchange (the window sort); union sides read with no shuffle
    assert plan.count("Exchange hashpartitioning") == 1


def test_interval_join_containment(spark):
    pts = spark.createDataFrame(
        [(1, 5, 100), (1, 10, 101), (1, 19, 102), (1, 25, 103), (2, 10, 104)],
        "k long, ts long, pid long",
    )
    ivl = spark.createDataFrame(
        [(1, 8, 19, "a"), (1, 15, 30, "b"), (2, 50, 60, "c"), (3, 0, 99, "d")],
        "k long, start long, end long, tag string",
    )
    for bucket in (1, 5, 7, 100, "auto"):  # result must be bucket-invariant
        got = sorted(
            (r.pid, r.tag)
            for r in interval_join(
                pts, ivl, on="k", ts="ts", start="start", end="end", bucket=bucket
            ).collect()
        )
        # inclusive ends; overlapping intervals both match; no cross-key hits
        assert got == [(101, "a"), (102, "a"), (102, "b"), (103, "b")], bucket
    with pytest.raises(ValueError, match="bucket"):
        interval_join(pts, ivl, on="k", ts="ts", bucket="median")


def test_interval_join_degenerate_and_clash(spark):
    pts = spark.createDataFrame([(1, 5, 100)], "k long, ts long, pid long")
    bad = spark.createDataFrame([(1, 9, 3, "x")], "k long, start long, end long, tag string")
    assert interval_join(pts, bad, on="k", ts="ts", bucket=10).count() == 0
    clash = spark.createDataFrame([(1, 0, 9, 7)], "k long, start long, end long, pid long")
    with pytest.raises(ValueError, match="clash"):
        interval_join(pts, clash, on="k", ts="ts", bucket=10)


def test_interval_join_plan_is_equi_not_nested_loop(spark):
    pts = spark.createDataFrame([(1, 5, 100)], "k long, ts long, pid long")
    ivl = spark.createDataFrame([(1, 0, 9, "x")], "k long, start long, end long, tag string")
    plan = (
        interval_join(pts, ivl, on="k", ts="ts", bucket=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


def test_resample_ffill_grid_and_fill(spark):
    obs = spark.createDataFrame(
        [(1, 12, 1.0), (1, 27, 2.0), (2, 40, 9.0)],
        "k long, ts long, v double",
    )
    rows = resample_ffill(obs, key="k", ts="ts", step=10, value_cols=["v"]).collect()
    got = {(r.k, r.ts): (r.ts_obs, r.v) for r in rows}
    # key 1: grid 10,20 (floor(12/10)*10 .. 27)
    assert got[(1, 10)] == (None, None)  # grid point before first obs
    assert got[(1, 20)] == (12, 1.0)
    assert (1, 30) not in got  # grid stops at max ts (27)
    # key 2: grid exactly one point, on the observation
    assert got[(2, 40)] == (40, 9.0)
    assert len(got) == 3


def test_asof_matches_pandas_merge_asof(spark):
    """Random data vs pandas.merge_asof (independent reference), both
    directions, with and without tolerance. Right ts deduped per key so
    duplicate-ts tie policies can't differ."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "ts": rng.integers(0, 1000, 200),
            "pid": np.arange(200),
        }
    )
    right = (
        pd.DataFrame(
            {
                "k": rng.integers(0, 6, 150),
                "ts": rng.integers(0, 1000, 150),
                "val": rng.normal(size=150).round(6),
            }
        )
        .drop_duplicates(["k", "ts"])
        .reset_index(drop=True)
    )
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    for direction in ("backward", "forward"):
        for tol in (None, 50):
            got = (
                asof_join(
                    ldf, rdf, on="k", ts="ts", value_cols=["val"],
                    direction=direction, tolerance=tol,
                )
                .toPandas()
                .sort_values("pid")
                .reset_index(drop=True)
            )
            exp = pd.merge_asof(
                left.sort_values("ts"),
                right.sort_values("ts"),
                on="ts",
                by="k",
                direction=direction,
                tolerance=tol,
                suffixes=("", "_r"),
            ).sort_values("pid").reset_index(drop=True)
            assert len(got) == len(exp)
            pd.testing.assert_series_equal(
                got["val"], exp["val"], check_names=False
            ), (direction, tol)


def test_interval_join_matches_bruteforce(spark):
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    pts = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 120),
            "ts": rng.integers(0, 500, 120),
            "pid": np.arange(120),
        }
    )
    starts = rng.integers(0, 450, 60)
    ivl = pd.DataFrame(
        {
            "k": rng.integers(0, 4, 60),
            "start": starts,
            "end": starts + rng.integers(0, 80, 60),
            "iid": np.arange(60),
        }
    )
    got = sorted(
        (r.pid, r.iid)
        for r in interval_join(
            spark.createDataFrame(pts),
            spark.createDataFrame(ivl),
            on="k", ts="ts", start="start", end="end", bucket=64,
        ).collect()
    )
    merged = pts.merge(ivl, on="k")
    exp = sorted(
        map(
            tuple,
            merged[(merged.ts >= merged.start) & (merged.ts <= merged.end)][
                ["pid", "iid"]
            ].to_numpy(),
        )
    )
    assert got == exp and len(exp) > 50


def test_asof_and_resample_composite_key(spark):
    pts = spark.createDataFrame(
        [("a", 1, 10, 100), ("a", 2, 10, 101), ("b", 1, 10, 102)],
        "region string, dev long, ts long, pid long",
    )
    obs = spark.createDataFrame(
        [("a", 1, 5, 1.0), ("a", 2, 7, 2.0), ("b", 2, 3, 9.0)],
        "region string, dev long, ts long, v double",
    )
    got = {
        r.pid: (r.ts_matched, r.v)
        for r in asof_join(
            pts, obs, on=["region", "dev"], ts="ts", value_cols=["v"]
        ).collect()
    }
    # matches respect BOTH key columns: (b,1) must not see (b,2)'s obs
    assert got == {100: (5, 1.0), 101: (7, 2.0), 102: (None, None)}

    grid = resample_ffill(obs, key=["region", "dev"], ts="ts", step=5, value_cols=["v"])
    rows = {(r.region, r.dev, r.ts): r.v for r in grid.collect()}
    assert rows[("a", 1, 5)] == 1.0
    assert rows[("a", 2, 5)] is None and ("a", 2, 10) not in rows  # grid ends at max ts 7
    assert rows[("b", 2, 0)] is None
