"""As-of join and range join semantics (operators/temporal.py)."""

import datetime

from pyspark.sql import functions as F

from xdlake_spark.operators.temporal import asof_join, range_join


def _ts(minute: int) -> datetime.datetime:
    return datetime.datetime(2024, 1, 1, 0, minute)


class TestAsofJoin:
    def test_backward_inclusive(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(5)), (1, 11, _ts(10)), (1, 12, _ts(30)),
             (2, 20, _ts(7))],
            "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame(
            [(1, _ts(0), 100.0), (1, _ts(10), 110.0), (1, _ts(20), 120.0),
             (2, _ts(9), 200.0)],
            "user_id INT, ts TIMESTAMP, px DOUBLE")
        out = {r["event_id"]: r["px"]
               for r in asof_join(left, right, on="ts", by="user_id",
                                  right_cols=["px"]).collect()}
        # t=5 -> r@0; t=10 -> r@10 (inclusive match); t=30 -> r@20
        assert out == {10: 100.0, 11: 110.0, 12: 120.0, 20: None}

    def test_no_right_rows_gives_null(self, spark):
        left = spark.createDataFrame([(1, 1, _ts(5))],
                                     "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame([], "user_id INT, ts TIMESTAMP, px DOUBLE")
        rows = asof_join(left, right, on="ts", by="user_id",
                         right_cols=["px"]).collect()
        assert rows[0]["px"] is None

    def test_tolerance_expires_stale(self, spark):
        left = spark.createDataFrame([(1, 1, _ts(59))],
                                     "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame([(1, _ts(0), 9.0)],
                                      "user_id INT, ts TIMESTAMP, px DOUBLE")
        fresh = asof_join(left, right, on="ts", by="user_id",
                          right_cols=["px"]).collect()[0]["px"]
        stale = asof_join(left, right, on="ts", by="user_id",
                          right_cols=["px"],
                          tolerance="'30' MINUTE").collect()[0]["px"]
        assert fresh == 9.0 and stale is None

    def test_forward_inclusive(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(5)), (1, 11, _ts(10)), (1, 12, _ts(30)),
             (2, 20, _ts(7))],
            "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame(
            [(1, _ts(0), 100.0), (1, _ts(10), 110.0), (1, _ts(20), 120.0),
             (2, _ts(5), 200.0)],
            "user_id INT, ts TIMESTAMP, px DOUBLE")
        out = {r["event_id"]: r["px"]
               for r in asof_join(left, right, on="ts", by="user_id",
                                  right_cols=["px"],
                                  direction="forward").collect()}
        # t=5 -> r@10; t=10 -> r@10 (inclusive); t=30 -> none ahead;
        # user 2 t=7 -> nothing at/after 7
        assert out == {10: 110.0, 11: 110.0, 12: None, 20: None}

    def test_nearest_picks_closer_and_backward_ties(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(4)), (1, 11, _ts(16)), (1, 12, _ts(10)),
             (1, 13, _ts(15)), (2, 20, _ts(7))],
            "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame(
            [(1, _ts(0), 100.0), (1, _ts(10), 110.0), (1, _ts(20), 120.0)],
            "user_id INT, ts TIMESTAMP, px DOUBLE")
        out = {r["event_id"]: r["px"]
               for r in asof_join(left, right, on="ts", by="user_id",
                                  right_cols=["px"],
                                  direction="nearest").collect()}
        # t=4: back@0 (d=4) vs fwd@10 (d=6) -> back; t=16: back@10 (6)
        # vs fwd@20 (4) -> fwd; t=10: exact -> 110; t=15: equidistant
        # 10/20 -> backward wins tie; user 2: no right rows -> NULL
        assert out == {10: 100.0, 11: 120.0, 12: 110.0,
                       13: 110.0, 20: None}

    def test_nearest_tolerance_gates_each_side(self, spark):
        left = spark.createDataFrame(
            [(1, 10, _ts(18))], "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame(
            [(1, _ts(0), 100.0), (1, _ts(25), 125.0)],
            "user_id INT, ts TIMESTAMP, px DOUBLE")
        # nearest overall is fwd@25 (d=7) vs back@0 (d=18); a 5-minute
        # tolerance kills both
        near = asof_join(left, right, on="ts", by="user_id",
                         right_cols=["px"],
                         direction="nearest").collect()[0]["px"]
        gated = asof_join(left, right, on="ts", by="user_id",
                          right_cols=["px"], direction="nearest",
                          tolerance="'5' MINUTE").collect()[0]["px"]
        assert near == 125.0 and gated is None

    def test_null_right_value_not_skipped(self, spark):
        """A NULL payload on the matched right row must come through as
        NULL (pandas merge_asof semantics) — not fall through to an
        older/farther row's non-null value, which would silently
        violate tolerance and nearest-side gating."""
        left = spark.createDataFrame(
            [(1, 10, _ts(12))], "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame(
            [(1, _ts(0), 100.0), (1, _ts(10), None)],
            "user_id INT, ts TIMESTAMP, px DOUBLE")
        for d in ("backward", "nearest"):
            got = asof_join(left, right, on="ts", by="user_id",
                            right_cols=["px"], direction=d,
                            tolerance="'5' MINUTE").collect()[0]["px"]
            assert got is None, d
        # and without tolerance: still the matched (NULL) row's value
        got = asof_join(left, right, on="ts", by="user_id",
                        right_cols=["px"]).collect()[0]["px"]
        assert got is None
        # forward mirror: next row has NULL, a farther one has a value
        right_f = spark.createDataFrame(
            [(1, _ts(15), None), (1, _ts(40), 200.0)],
            "user_id INT, ts TIMESTAMP, px DOUBLE")
        got = asof_join(left, right_f, on="ts", by="user_id",
                        right_cols=["px"],
                        direction="forward").collect()[0]["px"]
        assert got is None

    def test_single_shuffle_all_directions(self, spark):
        """Every direction plans ONE exchange (the window sort on the
        key) — nearest's two frames must share it, and no direction may
        fall back to an inequality nested-loop join."""
        left = spark.createDataFrame(
            [(1, 1, _ts(5))], "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame(
            [(1, _ts(0), 1.0)], "user_id INT, ts TIMESTAMP, px DOUBLE")
        for d in ("backward", "forward", "nearest"):
            plan = asof_join(left, right, on="ts", by="user_id",
                             right_cols=["px"], direction=d) \
                ._jdf.queryExecution().executedPlan().toString()
            import re
            assert len(re.findall(r"Exchange hashpartitioning", plan)) \
                == 1, (d, plan)
            assert "NestedLoop" not in plan and "Cartesian" not in plan, d
            assert plan.count("Window") == 1, (d, plan)

    def test_bad_direction_raises(self, spark):
        import pytest
        left = spark.createDataFrame(
            [(1, 1, _ts(5))], "user_id INT, event_id INT, ts TIMESTAMP")
        with pytest.raises(ValueError, match="direction"):
            asof_join(left, left, direction="sideways")

    def test_left_rows_preserved(self, spark, sf_dir):
        from xdlake_spark.sources.readers import read_parquet_any
        ev = read_parquet_any(spark, f"{sf_dir}/events.parquet") \
            .select("event_id", "user_id", "ts")
        hourly = (ev.groupBy("user_id",
                             F.date_trunc("hour", "ts").alias("ts"))
                  .agg(F.count(F.lit(1)).alias("n")))
        out = asof_join(ev, hourly, on="ts", by="user_id", right_cols=["n"])
        assert out.count() == ev.count()
        # every event matches at least its own hour's rollup
        assert out.filter(F.col("n").isNull()).count() == 0


class TestAsofDifferentialVsPandas:
    def test_random_tables_all_directions(self, spark):
        """Randomized differential test: 40 random (left, right) group
        scenarios — varying densities, empty right sides, duplicate
        left timestamps, NULL payloads — joined in ONE Spark call per
        direction and compared row-for-row against pandas merge_asof
        (an independent reference implementation)."""
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(1234)
        lrows, rrows = [], []
        base = datetime.datetime(2024, 1, 1)
        eid = 0
        for g in range(40):
            n_l = int(rng.integers(1, 12))
            n_r = int(rng.integers(0, 10))  # sometimes empty
            for _ in range(n_l):
                eid += 1
                lrows.append((g, eid, base + datetime.timedelta(
                    seconds=int(rng.integers(0, 3600)))))
            for _ in range(n_r):
                ts = base + datetime.timedelta(
                    seconds=int(rng.integers(0, 3600)))
                px = None if rng.random() < 0.15 \
                    else round(float(rng.uniform(1, 100)), 2)
                rrows.append((g, ts, px))
        lpdf = pd.DataFrame(lrows, columns=["user_id", "event_id", "ts"])
        # pandas merge_asof requires unique right keys per time for a
        # well-defined answer — dedup right on (group, ts)
        rpdf = (pd.DataFrame(rrows, columns=["user_id", "ts", "px"])
                .drop_duplicates(["user_id", "ts"]))
        left = spark.createDataFrame(lpdf)
        right = spark.createDataFrame(rpdf)

        def norm(v):
            # createDataFrame maps pandas NaN payloads to Spark NaN
            # (not NULL); both encode "missing px" here
            return None if v is None or pd.isna(v) else v

        for d in ("backward", "forward", "nearest"):
            got = {r["event_id"]: norm(r["px"])
                   for r in asof_join(left, right, on="ts", by="user_id",
                                      right_cols=["px"],
                                      direction=d).collect()}
            exp = pd.merge_asof(
                lpdf.sort_values("ts", kind="stable"),
                rpdf.sort_values("ts", kind="stable"),
                on="ts", by="user_id", direction=d)
            for _, row in exp.iterrows():
                e = norm(row["px"])
                assert got[row["event_id"]] == e, \
                    (d, row["event_id"], got[row["event_id"]], e)

    def test_tolerance_matches_pandas(self, spark):
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(77)
        base = datetime.datetime(2024, 1, 1)
        lpdf = pd.DataFrame(
            [(g, 100 * g + i, base + datetime.timedelta(
                seconds=int(rng.integers(0, 1800))))
             for g in range(15) for i in range(int(rng.integers(1, 6)))],
            columns=["user_id", "event_id", "ts"])
        rpdf = pd.DataFrame(
            [(g, base + datetime.timedelta(
                seconds=int(rng.integers(0, 1800))),
              round(float(rng.uniform(1, 9)), 2))
             for g in range(15) for _ in range(int(rng.integers(0, 4)))],
            columns=["user_id", "ts", "px"]).drop_duplicates(
                ["user_id", "ts"])
        left = spark.createDataFrame(lpdf)
        right = spark.createDataFrame(rpdf)
        for d in ("backward", "forward", "nearest"):
            got = {r["event_id"]: r["px"]
                   for r in asof_join(left, right, on="ts", by="user_id",
                                      right_cols=["px"], direction=d,
                                      tolerance="'3' MINUTE").collect()}
            exp = pd.merge_asof(
                lpdf.sort_values("ts", kind="stable"),
                rpdf.sort_values("ts", kind="stable"),
                on="ts", by="user_id", direction=d,
                tolerance=pd.Timedelta("3min"))
            for _, row in exp.iterrows():
                e = None if pd.isna(row["px"]) else row["px"]
                assert got[row["event_id"]] == e, (d, row["event_id"])


class TestRangeJoin:
    def test_open_closed_bounds(self, spark):
        left = spark.createDataFrame([(1, 1, _ts(0))],
                                     "user_id INT, event_id INT, ts TIMESTAMP")
        right = spark.createDataFrame(
            [(1, 90, _ts(0)),    # == left ts: excluded (open lower)
             (1, 91, _ts(10)),   # inside
             (1, 92, _ts(15)),   # == upper bound: included (closed)
             (1, 93, _ts(16)),   # beyond
             (2, 94, _ts(5))],   # other key
            "user_id INT, event_id INT, ts TIMESTAMP")
        got = sorted(r["r_event_id"] for r in range_join(
            left, right, by="user_id", on="ts",
            upper="15 minutes").collect())
        assert got == [91, 92]

    def test_bucket_width_does_not_change_result(self, spark):
        left = spark.createDataFrame(
            [(1, i, _ts(i)) for i in range(0, 50, 7)],
            "user_id INT, event_id INT, ts TIMESTAMP")
        wide = range_join(left, left, by="user_id", on="ts",
                          upper="15 minutes", bucket="15 minutes")
        narrow = range_join(left, left, by="user_id", on="ts",
                            upper="15 minutes", bucket="4 minutes")
        k = ["l_event_id", "r_event_id"]
        assert sorted(map(tuple, wide.select(k).collect())) == \
            sorted(map(tuple, narrow.select(k).collect()))


class TestBucketGapfill:
    def test_gaps_filled_and_locf(self, spark):
        import datetime as dt

        import pandas as pd

        from xdlake_spark.operators.temporal import bucket_gapfill
        t0 = dt.datetime(2024, 1, 1, 0, 30)
        rows = [
            # series A: hours 0, 1, 3 (hour 2 is a gap)
            ("A", t0, 10.0), ("A", t0 + dt.timedelta(hours=1), 20.0),
            ("A", t0 + dt.timedelta(hours=3), 40.0),
            # series B: hour 1 only
            ("B", t0 + dt.timedelta(hours=1), 7.0),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["event_type", "ts", "value"]))
        got = {(r["series"], r["bucket"].hour):
               (r["n_events"], r["avg_value"], r["value_locf"],
                r["is_gap"])
               for r in bucket_gapfill(df).collect()}
        # full grid: 2 series x hours 0..3
        assert len(got) == 8
        assert got[("A", 2)] == (0, None, 20.0, True)     # gap + locf
        assert got[("A", 3)] == (1, 40.0, 40.0, False)
        # B before its first observation: gap with NULL locf
        assert got[("B", 0)] == (0, None, None, True)
        assert got[("B", 1)] == (1, 7.0, 7.0, False)
        assert got[("B", 3)] == (0, None, 7.0, True)      # carried fwd

    def test_all_null_value_bucket_keeps_locf_pair_aligned(self, spark):
        """A bucket whose rows all have NULL values has a row count but
        no sum — the LOCF carry must take sum AND count from the same
        observed bucket (regression: independent ignorenulls-lasts
        paired hour1's sum with hour2's count, halving the carry)."""
        import datetime as dt

        from xdlake_spark.operators.temporal import bucket_gapfill
        t0 = dt.datetime(2024, 1, 1, 0, 30)
        rows = [("A", t0, 2.0),
                ("A", t0 + dt.timedelta(hours=1), None),
                ("A", t0 + dt.timedelta(hours=1), None),
                ("A", t0 + dt.timedelta(hours=2), None)]
        # DDL schema, not pandas: pandas converts None -> NaN, which
        # Spark treats as a VALUE (sum = NaN), not a NULL
        df = spark.createDataFrame(
            rows, "event_type string, ts timestamp, value double")
        got = {r["bucket"].hour: (r["n_events"], r["avg_value"],
                                  r["value_locf"], r["is_gap"])
               for r in bucket_gapfill(df).collect()}
        assert got[0] == (1, 2.0, 2.0, False)
        # hour 1: two rows, no values -> no average, carry hour 0's 2.0
        # (NOT 2.0/2=1.0 from the misaligned pair)
        assert got[1] == (2, None, 2.0, False)
        assert got[2] == (1, None, 2.0, False)

    def test_partially_null_bucket_divides_by_value_count(self, spark):
        """avg_value matches F.avg semantics: NULL values don't count
        in the denominator."""
        import datetime as dt

        from xdlake_spark.operators.temporal import bucket_gapfill
        t0 = dt.datetime(2024, 1, 1, 0, 30)
        df = spark.createDataFrame(
            [("A", t0, 4.0), ("A", t0, None)],
            "event_type string, ts timestamp, value double")
        r = bucket_gapfill(df).collect()[0]
        assert (r["n_events"], r["avg_value"]) == (2, 4.0)

    def test_no_locf_mode(self, spark):
        import datetime as dt

        import pandas as pd

        from xdlake_spark.operators.temporal import bucket_gapfill
        df = spark.createDataFrame(pd.DataFrame(
            [("A", dt.datetime(2024, 1, 1, 0, 5), 1.0),
             ("A", dt.datetime(2024, 1, 1, 2, 5), 3.0)],
            columns=["event_type", "ts", "value"]))
        out = bucket_gapfill(df, locf=False)
        assert "value_locf" not in out.columns
        assert out.count() == 3  # hours 0, 1, 2

    def test_bad_bucket_raises(self, spark):
        import pandas as pd

        from xdlake_spark.operators.temporal import bucket_gapfill
        df = spark.createDataFrame(pd.DataFrame(
            {"event_type": ["A"], "ts": [pd.Timestamp("2024-01-01")],
             "value": [1.0]}))
        import pytest as _p
        with _p.raises(ValueError, match="bucket"):
            bucket_gapfill(df, bucket="fortnight")


class TestConversionFunnel:
    def test_manual_funnel(self, spark):
        import datetime as dt

        import pandas as pd

        from xdlake_spark.operators.temporal import conversion_funnel
        t = dt.datetime(2024, 1, 1)
        h = dt.timedelta(hours=1)
        rows = [
            # u1: full ordered funnel
            (1, "view", t), (1, "click", t + h), (1, "buy", t + 2 * h),
            # u2: view then click, no buy
            (2, "view", t), (2, "click", t + h),
            # u3: click BEFORE view -> click must not count (order!)
            (3, "click", t), (3, "view", t + h),
            # u4: view only
            (4, "view", t),
            # u5: never viewed; click+buy don't count at all
            (5, "click", t), (5, "buy", t + h),
        ]
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["user_id", "event_type", "ts"]))
        got = {r["step"]: (r["n_users"], r["conversion"])
               for r in conversion_funnel(
                   df, ["view", "click", "buy"]).collect()}
        assert got["view"] == (4, 1.0)          # u1, u2, u3, u4
        assert got["click"] == (2, 0.5)         # u1, u2 (u3 out of order)
        assert got["buy"] == (1, 0.25)          # u1 only

    def test_same_timestamp_not_counted(self, spark):
        # a step at the SAME instant as the previous one is not "after"
        import datetime as dt

        import pandas as pd

        from xdlake_spark.operators.temporal import conversion_funnel
        t = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(pd.DataFrame(
            [(1, "a", t), (1, "b", t)],
            columns=["user_id", "event_type", "ts"]))
        got = {r["step"]: r["n_users"]
               for r in conversion_funnel(df, ["a", "b"]).collect()}
        assert got == {"a": 1, "b": 0}


class TestAnomalyFlags:
    def test_manual_zscores(self, spark):
        import datetime as dt

        import pandas as pd

        from xdlake_spark.operators.temporal import anomaly_flags
        t = dt.datetime(2024, 1, 1, 10, 15)
        # one bucket: values 1..9 plus one wild outlier
        vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
        df = spark.createDataFrame(pd.DataFrame({
            "event_id": range(10), "event_type": ["a"] * 10,
            "ts": [t] * 10, "value": vals}))
        rows = {r["id"]: r for r in anomaly_flags(df, k=2.0).collect()}
        import statistics
        mu, sigma = statistics.mean(vals), statistics.stdev(vals)
        assert rows[9]["zscore"] == round((100.0 - mu) / sigma, 4)
        assert rows[9]["is_anomaly"]
        assert not any(rows[i]["is_anomaly"] for i in range(9))

    def test_degenerate_buckets_flag_nothing(self, spark):
        import datetime as dt

        import pandas as pd

        from xdlake_spark.operators.temporal import anomaly_flags
        t = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(pd.DataFrame({
            "event_id": [1, 2, 3],
            "event_type": ["solo", "flat", "flat"],
            "ts": [t, t, t],
            "value": [5.0, 7.0, 7.0]}))  # 1-row bucket + zero variance
        rows = anomaly_flags(df).collect()
        assert all(not r["is_anomaly"] for r in rows)
        assert all(r["zscore"] is None for r in rows)

    def test_everyone_completes_whole_funnel(self, spark):
        # regression: a step where nobody STOPPED must inherit the
        # deeper depths' counts, not report 0
        import datetime as dt

        import pandas as pd

        from xdlake_spark.operators.temporal import conversion_funnel
        t = dt.datetime(2024, 1, 1)
        h = dt.timedelta(hours=1)
        df = spark.createDataFrame(pd.DataFrame(
            [(1, "view", t), (1, "click", t + h), (1, "buy", t + 2 * h)],
            columns=["user_id", "event_type", "ts"]))
        got = {r["step"]: (r["n_users"], r["conversion"])
               for r in conversion_funnel(
                   df, ["view", "click", "buy"]).collect()}
        assert got == {"view": (1, 1.0), "click": (1, 1.0),
                       "buy": (1, 1.0)}
