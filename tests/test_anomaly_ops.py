"""Unit coverage for operators/anomaly.py (median/MAD flags, CUSUM
changepoint) and operators/privacy.py:k_anonymity_report — the logic
extracted from the driver query wiring in round 5."""

from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.anomaly import (
    cusum_changepoint,
    mad_anomaly_flags,
)
from google_analytics_to_s3_spark.operators.privacy import (
    k_anonymity_report,
)


class TestMadAnomalyFlags:
    def test_flags_planted_spike(self, spark):
        rows = [("a", d, 10) for d in range(9)] + [("a", 9, 100)]
        s = spark.createDataFrame(rows, "g string, t long, n long")
        out = {r["t"]: r for r in
               mad_anomaly_flags(s, ["g"], "n").collect()}
        assert out[9]["is_anomaly"] is True
        assert all(out[d]["is_anomaly"] is False for d in range(9))
        assert out[0]["med"] == 10.0

    def test_constant_series_no_anomalies(self, spark):
        s = spark.createDataFrame(
            [("a", d, 5) for d in range(6)], "g string, t long, n long"
        )
        flags = mad_anomaly_flags(s, ["g"], "n").collect()
        # MAD = 0 and adev = 0 for every row: 0 > 2*0 is false
        assert not any(r["is_anomaly"] for r in flags)

    def test_groups_independent(self, spark):
        rows = [("a", d, 10) for d in range(6)] + [
            ("b", d, 1000) for d in range(6)
        ]
        s = spark.createDataFrame(rows, "g string, t long, n long")
        flags = mad_anomaly_flags(s, ["g"], "n").collect()
        # each group is judged against its own baseline
        assert not any(r["is_anomaly"] for r in flags)


class TestCusumChangepoint:
    def test_localizes_level_shift(self, spark):
        rows = [(d, 10) for d in range(10)] + [(d, 50) for d in
                                               range(10, 20)]
        s = spark.createDataFrame(rows, "day long, v long")
        out = cusum_changepoint(s, "day", "v").collect()
        cps = [r["day"] for r in out if r["is_changepoint"]]
        # |S| peaks at the last pre-shift day
        assert cps == [9]
        assert len(out) == 20

    def test_tie_breaks_earliest(self, spark):
        # symmetric series: |S| ties across several days; earliest wins
        s = spark.createDataFrame(
            [(0, 1), (1, 3), (2, 1), (3, 3)], "day long, v long"
        )
        out = cusum_changepoint(s, "day", "v").collect()
        assert sum(r["is_changepoint"] for r in out) == 1

    def test_exact_integer_statistic(self, spark):
        s = spark.createDataFrame(
            [(0, 2), (1, 4), (2, 6)], "day long, v long"
        )
        got = {r["day"]: r["cusum_scaled"] for r in
               cusum_changepoint(s, "day", "v").collect()}
        # S'_d = n*cumsum - d*total with n=3, total=12
        assert got == {0: 3 * 2 - 1 * 12, 1: 3 * 6 - 2 * 12,
                       2: 3 * 12 - 3 * 12}


class TestKAnonymityReport:
    def _report(self, spark, k=3):
        # quasi-identifier (seg, bucket): seg x has buckets 0,0,1 and
        # seg y has buckets 5,5,5 — with k=3, (x,0) n=2 at risk but
        # fixed by the /5 coarsening (coarse group (x,0) n=3);
        # (y,1) already fine
        rows = [("x", 0), ("x", 0), ("x", 1), ("y", 5), ("y", 5),
                ("y", 5)]
        df = spark.createDataFrame(rows, "seg string, b long")
        return {
            (r["seg"], r["b"]): r
            for r in k_anonymity_report(
                df, ["seg"], "b", "b5",
                F.expr("b div 5").cast("long"), k,
            ).collect()
        }

    def test_at_risk_and_ladder(self, spark):
        rep = self._report(spark)
        assert rep[("x", 0)]["at_risk"] is True
        assert rep[("x", 0)]["fixed_by_generalization"] is True
        assert rep[("x", 0)]["n_fine"] == 2
        assert rep[("x", 0)]["n_coarse"] == 3
        assert rep[("y", 5)]["at_risk"] is False
        assert rep[("y", 5)]["fixed_by_generalization"] is False

    def test_unfixable_group(self, spark):
        rep = self._report(spark, k=5)
        # coarse group for x has only 3 members: still at risk
        assert rep[("x", 1)]["at_risk"] is True
        assert rep[("x", 1)]["fixed_by_generalization"] is False


class TestMsprtMonitor:
    def _obs(self, spark, rows):
        return spark.createDataFrame(rows, "day long, arm string, conv int")

    def test_formula_matches_independent_python(self, spark):
        import math

        from google_analytics_to_s3_spark.operators.stats import (
            msprt_monitor,
        )

        # day 1: t 60/100, c 50/100; day 2 adds t 30/100, c 55/100
        rows = []
        for d, (st, sc) in [(1, (60, 50)), (2, (30, 55))]:
            rows += [(d, "t", 1)] * st + [(d, "t", 0)] * (100 - st)
            rows += [(d, "c", 1)] * sc + [(d, "c", 0)] * (100 - sc)
        out = {
            r["period"]: r
            for r in msprt_monitor(
                self._obs(spark, rows), "day", "arm", "conv",
                "t", "c", tau2=0.01,
            ).collect()
        }

        def lam(nt, nc, st, sc, tau2=0.01):
            p = (st + sc) / (nt + nc)
            v = p * (1 - p) * (1 / nt + 1 / nc)
            th = st / nt - sc / nc
            return math.sqrt(v / (v + tau2)) * math.exp(
                th * th * tau2 / (2 * v * (v + tau2))
            )

        l1, l2 = lam(100, 100, 60, 50), lam(200, 200, 90, 105)
        assert out[1]["n_t"] == 100 and out[1]["conv_t"] == 60
        assert out[1]["lambda_sprt"] == round(l1, 6)
        assert out[1]["p_always_valid"] == round(min(1.0, 1 / l1), 6)
        assert out[2]["n_t"] == 200 and out[2]["conv_c"] == 105
        assert out[2]["lambda_sprt"] == round(l2, 6)
        # always-valid p is MONOTONE: day-2 keeps day-1's max lambda
        assert out[2]["p_always_valid"] == round(
            min(1.0, 1 / max(l1, l2)), 6
        )
        assert out[2]["p_always_valid"] <= out[1]["p_always_valid"]

    def test_degenerate_periods_no_evidence(self, spark):
        from google_analytics_to_s3_spark.operators.stats import (
            msprt_monitor,
        )

        # day 1 has only treatment data; day 2 both arms all-converting
        rows = [(1, "t", 1), (1, "t", 0)] + [
            (2, "t", 1), (2, "t", 1), (2, "c", 1), (2, "c", 1),
        ]
        out = {
            r["period"]: r
            for r in msprt_monitor(
                self._obs(spark, rows), "day", "arm", "conv", "t", "c"
            ).collect()
        }
        assert out[1]["lambda_sprt"] == 1.0
        assert out[1]["p_always_valid"] == 1.0
        assert out[1]["lift"] == 0.0
        # day 2: pooled rate 5/6 -> v > 0, fine; but if all convert,
        # v = 0 -> lambda 1.0
        rows2 = [(1, "t", 1), (1, "c", 1)]
        out2 = msprt_monitor(
            self._obs(spark, rows2), "day", "arm", "conv", "t", "c"
        ).collect()[0]
        assert out2["lambda_sprt"] == 1.0 and out2["p_always_valid"] == 1.0

    def test_strong_effect_drives_p_down(self, spark):
        from google_analytics_to_s3_spark.operators.stats import (
            msprt_monitor,
        )

        rows = [(1, "t", 1)] * 400 + [(1, "t", 0)] * 100 + [
            (1, "c", 1)
        ] * 100 + [(1, "c", 0)] * 400
        out = msprt_monitor(
            self._obs(spark, rows), "day", "arm", "conv", "t", "c"
        ).collect()[0]
        assert out["lift"] == 0.6
        assert out["p_always_valid"] < 0.001

    def test_other_arms_ignored(self, spark):
        from google_analytics_to_s3_spark.operators.stats import (
            msprt_monitor,
        )

        rows = [(1, "t", 1), (1, "c", 0), (1, "holdout", 1)]
        out = msprt_monitor(
            self._obs(spark, rows), "day", "arm", "conv", "t", "c"
        ).collect()
        assert len(out) == 1
        assert out[0]["n_t"] == 1 and out[0]["n_c"] == 1


class TestBinaryAuc:
    def _auc(self, spark, rows, groups=("g",)):
        from google_analytics_to_s3_spark.operators.stats import (
            binary_auc,
        )

        df = spark.createDataFrame(rows, "g string, s double, y int")
        return {
            r["g"]: r
            for r in binary_auc(df, "s", "y", list(groups)).collect()
        }

    def test_sklearn_reference_example(self, spark):
        # scores .1 .4 .35 .8 / labels 0 0 1 1 -> AUC 0.75
        rows = [("g", 0.1, 0), ("g", 0.4, 0), ("g", 0.35, 1),
                ("g", 0.8, 1)]
        assert self._auc(spark, rows)["g"]["auc"] == 0.75

    def test_all_tied_is_half(self, spark):
        rows = [("g", 1.0, y) for y in (0, 0, 1, 1, 1)]
        out = self._auc(spark, rows)["g"]
        assert out["auc"] == 0.5
        assert out["n_pos"] == 3 and out["n_neg"] == 2

    def test_perfect_and_inverted(self, spark):
        rows = [("p", float(i), 1 if i >= 5 else 0) for i in range(10)]
        rows += [("i", float(i), 1 if i < 5 else 0) for i in range(10)]
        out = self._auc(spark, rows)
        assert out["p"]["auc"] == 1.0 and out["i"]["auc"] == 0.0

    def test_partial_ties_average_rank(self, spark):
        # scores: 1(y=0), 2(y=0), 2(y=1), 3(y=1)
        # ranks: 1, 2.5, 2.5, 4 -> S = 2.5 + 4 = 6.5
        # AUC = (6.5 - 3) / (2*2) = 0.875
        rows = [("g", 1.0, 0), ("g", 2.0, 0), ("g", 2.0, 1),
                ("g", 3.0, 1)]
        assert self._auc(spark, rows)["g"]["auc"] == 0.875

    def test_single_class_group_is_null(self, spark):
        rows = [("g", 1.0, 1), ("g", 2.0, 1)]
        out = self._auc(spark, rows)["g"]
        assert out["auc"] is None and out["n_neg"] == 0


class TestCalibrationReport:
    def test_perfectly_calibrated_bins(self, spark):
        from google_analytics_to_s3_spark.operators.stats import (
            calibration_report,
        )

        # bin [0.2,0.3): 10 rows at score 0.25, 25% positive... use
        # 4 rows, 1 positive -> acc 0.25 == conf -> zero ECE share;
        # bin [0.6,0.7): 0.65 scores, 20 rows, 13 pos -> acc 0.65
        rows = [(0.25, 1)] + [(0.25, 0)] * 3
        rows += [(0.65, 1)] * 13 + [(0.65, 0)] * 7
        df = spark.createDataFrame(rows, "s double, y int")
        out = {r["bin"]: r for r in calibration_report(
            df, "s", "y", n_bins=10
        ).collect()}
        assert out[2]["confidence"] == 0.25 and out[2]["accuracy"] == 0.25
        assert out[6]["confidence"] == 0.65 and out[6]["accuracy"] == 0.65
        assert out[2]["ece"] == 0.0

    def test_miscalibration_measured(self, spark):
        from google_analytics_to_s3_spark.operators.stats import (
            calibration_report,
        )

        # all scores 0.9 but only 40% positive: ECE = 0.5
        rows = [(0.9, 1)] * 4 + [(0.9, 0)] * 6
        df = spark.createDataFrame(rows, "s double, y int")
        r = calibration_report(df, "s", "y").first()
        assert r["bin"] == 9
        assert r["confidence"] == 0.9 and r["accuracy"] == 0.4
        assert r["ece"] == 0.5

    def test_edge_one_folds_into_last_bin(self, spark):
        from google_analytics_to_s3_spark.operators.stats import (
            calibration_report,
        )

        df = spark.createDataFrame([(1.0, 1), (0.0, 0)], "s double, y int")
        bins = {r["bin"] for r in calibration_report(df, "s", "y").collect()}
        assert bins == {0, 9}

    def test_out_of_range_raises(self, spark):
        import pytest

        from google_analytics_to_s3_spark.operators.stats import (
            calibration_report,
        )

        df = spark.createDataFrame([(1.5, 1)], "s double, y int")
        with pytest.raises(Exception, match="outside"):
            calibration_report(df, "s", "y").collect()


class TestHoltWinters:
    def test_flat_seasonal_series_predicts_exactly(self, spark):
        """A perfectly periodic series (no trend) is predicted exactly
        after init: residual-free recursion keeps every c_i fixed."""
        from google_analytics_to_s3_spark.operators.anomaly import (
            holt_winters_forecast,
        )

        season = [100, 200, 300, 150, 250, 120, 180]
        rows = [(d, season[d % 7]) for d in range(28)]
        df = spark.createDataFrame(rows, "day long, cents long")
        out = holt_winters_forecast(df, "day", "cents").collect()
        fits = [r for r in out if r.kind == "fit"]
        fc = [r for r in out if r.kind == "forecast"]
        assert len(fits) == 14 and len(fc) == 7
        for r in fits:
            assert r.predicted == float(r.actual)
        for h, r in enumerate(sorted(fc, key=lambda r: r.day), start=1):
            assert r.day == 27 + h
            assert r.predicted == float(season[(28 + h - 1) % 7])

    def test_needs_two_seasons(self, spark):
        import pytest

        from google_analytics_to_s3_spark.operators.anomaly import (
            holt_winters_forecast,
        )

        df = spark.createDataFrame(
            [(d, 10) for d in range(13)], "day long, cents long"
        )
        with pytest.raises(ValueError, match=">= 14"):
            holt_winters_forecast(df, "day", "cents")


class TestTheilSen:
    def test_exact_line_recovered(self, spark):
        from google_analytics_to_s3_spark.operators.anomaly import (
            theil_sen_trend,
        )

        rows = [(d, 50 + 3 * d) for d in range(20)]
        df = spark.createDataFrame(rows, "day long, cents long")
        out = theil_sen_trend(df, "day", "cents").collect()[0]
        assert out.slope == 3.0 and out.intercept == 50.0
        assert out.n_points == 20 and out.n_pairs == 190

    def test_outliers_do_not_move_the_slope(self, spark):
        from google_analytics_to_s3_spark.operators.anomaly import (
            theil_sen_trend,
        )

        rows = [(d, 50 + 3 * d) for d in range(21)]
        rows[5] = (5, 10_000_000)  # one wrecked day
        rows[15] = (15, -10_000_000)
        df = spark.createDataFrame(rows, "day long, cents long")
        out = theil_sen_trend(df, "day", "cents").collect()[0]
        assert out.slope == 3.0  # median shrugs; OLS would be wrecked

    def test_no_bnlj_in_plan(self, spark):
        from google_analytics_to_s3_spark.operators.anomaly import (
            theil_sen_trend,
        )

        df = spark.createDataFrame(
            [(d, d * 2) for d in range(10)], "day long, cents long"
        )
        plan = theil_sen_trend(df, "day", "cents")._jdf.queryExecution(
        ).executedPlan().toString()
        assert "CartesianProduct" not in plan
