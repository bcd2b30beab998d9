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
