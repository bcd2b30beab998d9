"""Operator-level tests for the round-8 batch — the edge semantics
the sf0.01 oracle sweep can't pin (step-up rejection, missing bins,
gap handling, bit packing), each against hand-computed expectations.
"""

import math

import pytest
from pyspark.sql import functions as F

from google_analytics_to_s3_spark.operators.anomaly import burst_windows
from google_analytics_to_s3_spark.operators.dq import (
    wasserstein_two_sample,
)
from google_analytics_to_s3_spark.operators.stats import (
    behavior_entropy,
    bh_fdr,
    chi2_uniformity,
    normal_sf,
)
from google_analytics_to_s3_spark.operators.text import (
    good_turing_smoothing,
)


class TestBhFdr:
    def test_step_up_rejects_below_kmax_even_if_individually_above(
        self, spark
    ):
        """The defining BH property: with m=4 and p = (.01, .02, .06,
        .9) at q=.25, crit = (.0625, .125, .1875, .25). p3=.06 > its
        own naive .05-style read but <= .1875, so ranks 1-3 are ALL
        rejected (step-up from the largest qualifying rank), rank 4
        is not."""
        df = spark.createDataFrame(
            [("a", 0.01), ("b", 0.02), ("c", 0.06), ("d", 0.9)],
            "h string, p_value double",
        )
        rows = {r["h"]: r for r in bh_fdr(df, alpha=0.25).collect()}
        assert [rows[h]["rejected"] for h in "abcd"] == [
            True, True, True, False,
        ]
        # adjusted p is the running min from the tail: p4*4/4=.9,
        # p3*4/3=.08, p2*4/2=.04, p1*4/1=.04
        assert rows["a"]["p_adj"] == pytest.approx(0.04)
        assert rows["c"]["p_adj"] == pytest.approx(0.08)

    def test_nothing_rejected_when_no_rank_qualifies(self, spark):
        df = spark.createDataFrame(
            [("a", 0.5), ("b", 0.8)], "h string, p_value double"
        )
        rows = bh_fdr(df, alpha=0.05).collect()
        assert all(not r["rejected"] for r in rows)

    def test_normal_sf_matches_math_erfc(self, spark):
        """A&S 26.2.17 absolute error < 7.5e-8 against the exact
        upper tail."""
        df = spark.createDataFrame(
            [(z / 10.0,) for z in range(0, 50, 3)], "z double"
        )
        got = {
            r["z"]: r["sf"]
            for r in df.select(
                "z", normal_sf(F.col("z")).alias("sf")
            ).collect()
        }
        for z, sf in got.items():
            exact = 0.5 * math.erfc(z / math.sqrt(2.0))
            assert abs(sf - exact) < 7.5e-8, z


class TestChi2Uniformity:
    def test_missing_bins_counted_in_closed_form(self, spark):
        """All mass in ONE of 4 bins, n=8: chi2 = (8-2)^2/2 + 3*(0-2)^2/2
        = 18 + 6 = 24 — the 3 unseen bins must contribute even though
        no rows exist for them."""
        df = spark.createDataFrame(
            [("g", 0)] * 8, "g string, b int"
        )
        r = chi2_uniformity(df, ["g"], "b", n_bins=4).collect()[0]
        assert r["chi2"] == pytest.approx(24.0)
        assert r["bins_seen"] == 1
        assert r["dof"] == 3

    def test_uniform_data_scores_zero(self, spark):
        df = spark.createDataFrame(
            [("g", b) for b in range(4) for _ in range(5)],
            "g string, b int",
        )
        r = chi2_uniformity(df, ["g"], "b", n_bins=4).collect()[0]
        assert r["chi2"] == pytest.approx(0.0)


class TestBurstWindows:
    def test_merges_consecutive_and_splits_gaps(self, spark):
        """Baseline days at 10, burst days at 100: days 3,4 merge into
        one window, day 8 is its own; peak tie-break picks the
        earliest peak day."""
        counts = {3: 100, 4: 100, 8: 100}
        rows = [("t", d, counts.get(d, 10)) for d in range(1, 11)]
        df = spark.createDataFrame(rows, "g string, day long, cnt long")
        out = sorted(
            burst_windows(df, "g", "day", "cnt", sigma=1.5).collect(),
            key=lambda r: r["burst_start"],
        )
        assert [(r["burst_start"], r["burst_end"], r["n_periods"])
                for r in out] == [(3, 4, 2), (8, 8, 1)]
        assert out[0]["peak_t"] == 3  # tie on cnt -> earliest day
        assert out[0]["total_events"] == 200

    def test_no_bursts_on_flat_series(self, spark):
        df = spark.createDataFrame(
            [("t", d, 10) for d in range(1, 11)],
            "g string, day long, cnt long",
        )
        assert burst_windows(df, "g", "day", "cnt").count() == 0


class TestWassersteinTwoSample:
    def test_known_shift(self, spark):
        """b = a + 5 pointwise: W1 between the empirical distributions
        is exactly 5 (translation), independent of bucketing."""
        a = [(v, "a") for v in (0, 10, 20, 30)]
        b = [(v + 5, "b") for v in (0, 10, 20, 30)]
        df = spark.createDataFrame(a + b, "v long, g string")
        r = wasserstein_two_sample(df, "v", "g", "a", "b",
                                   buckets=3).collect()[0]
        assert r["w1"] == pytest.approx(5.0)

    def test_identical_distributions_zero(self, spark):
        rows = [(v, g) for v in (1, 2, 3, 100) for g in ("a", "b")]
        df = spark.createDataFrame(rows, "v long, g string")
        r = wasserstein_two_sample(df, "v", "g", "a", "b").collect()[0]
        assert r["w1"] == 0.0

    def test_cross_bucket_gap_is_counted(self, spark):
        """a all at 0, b all at 1000, many buckets: W1 = 1000 and the
        entire integral lives in ONE cross-bucket gap — the subtotal
        pass's next-bucket-minimum must supply it."""
        df = spark.createDataFrame(
            [(0, "a")] * 3 + [(1000, "b")] * 3, "v long, g string"
        )
        r = wasserstein_two_sample(df, "v", "g", "a", "b",
                                   buckets=64).collect()[0]
        assert r["w1"] == pytest.approx(1000.0)
        assert r["w1_normalized"] == pytest.approx(1.0)


class TestWassersteinBruteForceAndPlan:
    def test_matches_brute_force_random(self, spark):
        import numpy as np

        rng = np.random.RandomState(17)
        a = rng.randint(0, 300, size=400)
        b = np.clip(rng.randint(0, 300, size=350) + 30, 0, None)
        rows = [(int(v), "a") for v in a] + [(int(v), "b") for v in b]
        df = spark.createDataFrame(rows, "v long, g string")
        got = wasserstein_two_sample(df, "v", "g", "a", "b",
                                     buckets=16).collect()[0]
        support = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        w1 = 0.0
        for i, v in enumerate(support[:-1]):
            fa = (a <= v).sum() / na
            fb = (b <= v).sum() / nb
            w1 += abs(fa - fb) * (support[i + 1] - v)
        assert got["w1"] == pytest.approx(round(w1, 6), abs=2e-6)

    def test_prefix_sum_windows_stay_bucket_partitioned(self, spark):
        """100 TB contract: the cumulative-count windows partition BY
        BUCKET, never a single global sort partition over the
        histogram. r13: the operator is ONE fully-lazy plan — the
        SinglePartition exchanges are the 1-row bounds aggregate, the
        (<= buckets)-row offset window, and the final 1-row total,
        each scale-safe."""
        from google_analytics_to_s3_spark.operators.dq import (
            wasserstein_two_sample,
        )

        rows = [(v % 977, "a" if v % 2 else "b") for v in range(4000)]
        df = spark.createDataFrame(rows, "v long, g string")
        out = wasserstein_two_sample(df, "v", "g", "a", "b", buckets=32)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "hashpartitioning(_bucket" in plan, plan
        # no globally-ordered sort may touch the per-value column
        for line in plan.splitlines():
            if "Sort [" in line and "], true," in line:
                assert "_v" not in line, line


class TestGoodTuring:
    def test_textbook_counts(self, spark):
        """freqs: 3 tokens seen once, 1 token seen twice ->
        N_1=3, N_2=1, N=5; r*=1: 2*N_2/N_1 = 2/3; unseen mass N_1/N
        = 0.6."""
        df = spark.createDataFrame(
            [("a", 1), ("b", 1), ("c", 1), ("d", 2)],
            "token string, freq long",
        )
        rows = {r["r"]: r for r in good_turing_smoothing(df).collect()}
        assert rows[0]["prob_mass"] == pytest.approx(0.6)
        assert rows[1]["r_star"] == pytest.approx(2 / 3, abs=1e-6)
        # r=2 has no N_3: r_star and prob_mass are NULL, not 0
        assert rows[2]["r_star"] is None
        assert rows[2]["prob_mass"] is None


class TestBehaviorEntropy:
    def test_pure_and_uniform_entities(self, spark):
        df = spark.createDataFrame(
            [(1, "x")] * 4 + [(2, "x"), (2, "y"), (2, "x"), (2, "y")],
            "u long, a string",
        )
        rows = {r["u"]: r for r in behavior_entropy(df, "u", "a").collect()}
        assert rows[1]["entropy_nats"] == 0.0
        assert rows[2]["entropy_nats"] == pytest.approx(
            math.log(2), abs=1e-6
        )


class TestDhashImages:
    def test_bit_packing_and_dup_groups(self, spark):
        import pandas as pd

        from google_analytics_to_s3_spark.operators.multimodal import (
            dhash_images,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_ppm

        # two ids share seed 1 -> identical hash; geometry 18x16
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "payload": [make_ppm(18, 16, 1, 1), make_ppm(18, 16, 1, 1),
                        make_ppm(18, 16, 2, 1)],
        }))
        rows = {r["doc_id"]: r for r in dhash_images(df).collect()}
        assert rows[1]["phash_lo"] == rows[2]["phash_lo"]
        assert rows[1]["phash_hi"] == rows[2]["phash_hi"]
        # hand-replay the planted formula for seed 1
        import numpy as np

        y, x = np.mgrid[0:16, 0:18]
        img = (1 + y * 31 + x * 7) % 256
        grid = img.reshape(8, 2, 9, 2).sum(axis=(1, 3))
        bits = grid[:, :-1] < grid[:, 1:]
        lo = sum(1 << (yy * 8 + xx) for yy in range(4) for xx in range(8)
                 if bits[yy, xx])
        hi = sum(1 << ((yy - 4) * 8 + xx) for yy in range(4, 8)
                 for xx in range(8) if bits[yy, xx])
        assert rows[1]["phash_lo"] == lo and rows[1]["phash_hi"] == hi
        # halves stay within 32 bits -> exact in any BIGINT engine
        assert 0 <= lo < (1 << 32) and 0 <= hi < (1 << 32)

    def test_geometry_quarantine(self, spark):
        import pandas as pd

        from google_analytics_to_s3_spark.operators.multimodal import (
            dhash_images,
        )
        from google_analytics_to_s3_spark.testing.fixtures import make_ppm

        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "payload": [make_ppm(16, 16, 1, 1),  # 16 % 9 != 0
                        b"not a ppm"],
        }))
        rows = {r["doc_id"]: r for r in dhash_images(df).collect()}
        assert "dhash needs" in rows[1]["decode_error"]
        assert rows[2]["decode_error"] is not None
        assert rows[1]["phash_lo"] is None


class TestPhashNearPairs:
    def test_pigeonhole_recall_at_threshold(self, spark):
        """hamming <= 3 across 4 bands ALWAYS shares a band (found);
        4 flipped bits spread one-per-band share none (correctly
        outside the operator's contract)."""
        import pandas as pd

        from google_analytics_to_s3_spark.operators.multimodal import (
            phash_near_pairs,
        )

        base_lo, base_hi = 0x12345678, 0x0BCDEF01
        # 3 bits flipped, one in each of bands 0, 1, 2
        near_lo = base_lo ^ 0x1 ^ 0x10000
        near_hi = base_hi ^ 0x1
        # 4 bits flipped, one per band -> no shared band
        far_lo = base_lo ^ 0x1 ^ 0x10000
        far_hi = base_hi ^ 0x1 ^ 0x10000
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "phash_hi": [base_hi, near_hi, far_hi],
            "phash_lo": [base_lo, near_lo, far_lo],
            "decode_error": [None, None, None],
        }))
        pairs = phash_near_pairs(df, max_hamming=3).collect()
        keyed = {
            tuple(sorted([(r["phash_hi_a"], r["phash_lo_a"]),
                          (r["phash_hi_b"], r["phash_lo_b"])])): r
            for r in pairs
        }
        near_key = tuple(sorted([(base_hi, base_lo),
                                 (near_hi, near_lo)]))
        assert near_key in keyed
        assert keyed[near_key]["hamming"] == 3
        far_key = tuple(sorted([(base_hi, base_lo), (far_hi, far_lo)]))
        assert far_key not in keyed  # hamming 4 > threshold
        # near vs far differ in exactly 1 bit (band 3) -> found
        nf_key = tuple(sorted([(near_hi, near_lo), (far_hi, far_lo)]))
        assert nf_key in keyed and keyed[nf_key]["hamming"] == 1

    def test_distinct_hash_grain(self, spark):
        """Pairwise work runs at distinct-hash grain: 100 docs in two
        hash classes produce ONE pair row carrying both doc counts."""
        import pandas as pd

        from google_analytics_to_s3_spark.operators.multimodal import (
            phash_near_pairs,
        )

        rows = {"doc_id": [], "phash_hi": [], "phash_lo": [],
                "decode_error": []}
        for i in range(100):
            rows["doc_id"].append(i)
            rows["phash_hi"].append(7)
            rows["phash_lo"].append(0 if i % 2 else 1)
            rows["decode_error"].append(None)
        df = spark.createDataFrame(pd.DataFrame(rows))
        pairs = phash_near_pairs(df, max_hamming=3).collect()
        assert len(pairs) == 1
        assert pairs[0]["docs_a"] + pairs[0]["docs_b"] == 100


class TestHistogramQuantilesNulls:
    def test_nulls_dropped_not_top_binned(self, spark):
        """ADVICE r7: F.least() skips NULL operands, so NULL values
        used to land in the TOP bin (least(floor(NULL*...), n-1) =
        n-1), corrupting counts and estimates. NULLs must be dropped
        before binning: with 3 real values and 5 NULLs, n_rows is 3
        and the p50 estimate reflects only the real values."""
        from google_analytics_to_s3_spark.operators.stats import (
            histogram_quantiles,
        )

        rows = [("g", 1.0), ("g", 2.0), ("g", 3.0)] + [("g", None)] * 5
        df = spark.createDataFrame(rows, "g string, v double")
        out = histogram_quantiles(df, "v", ["g"], n_bins=4,
                                  percentiles=(50,))
        r = out.collect()[0]
        assert r["n_rows"] == 3
        # rank ceil(.5*3)=2 -> value 2.0 -> bin floor((2-1)*4/2)=2
        assert r["bin"] == 2
