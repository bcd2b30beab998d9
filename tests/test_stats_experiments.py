"""Unit/property tests for the round-7 continuation operators:
difference-in-differences, exact heavy hitters (Misra-Gries
candidates + exact verify), DP noisy-count release, closed-form OLS.
"""

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


# ---------------------------------------------------------------- DiD


def test_did_lift_matches_direct_means(spark):
    from google_analytics_to_s3_spark.operators.stats import did_lift

    # (treat, post, value) cells with known means:
    # c0: 10, 20 -> 15 ; c1: 30 -> 30 ; t0: 40, 60 -> 50 ; t1: 90 -> 90
    rows = [
        (0, 0, 10), (0, 0, 20), (0, 1, 30),
        (1, 0, 40), (1, 0, 60), (1, 1, 90),
    ]
    df = spark.createDataFrame(rows, "treat int, post int, v long")
    out = did_lift(df, "v", "treat", "post").collect()[0]
    assert (out.n_c0, out.n_c1, out.n_t0, out.n_t1) == (2, 1, 2, 1)
    assert out.mean_c0 == 15.0 and out.mean_t1 == 90.0
    # (90 - 50) - (30 - 15) = 25
    assert out.did == 25.0


def test_did_lift_null_on_empty_cell(spark):
    from google_analytics_to_s3_spark.operators.stats import did_lift

    df = spark.createDataFrame(
        [(0, 0, 10), (0, 1, 30), (1, 0, 40)],  # no (1,1) cell
        "treat int, post int, v long",
    )
    out = did_lift(df, "v", "treat", "post").collect()[0]
    assert out.mean_t1 is None and out.did is None


# ------------------------------------------------------ heavy hitters


hh_keys = st.lists(
    st.integers(min_value=0, max_value=30),
    min_size=1,
    max_size=300,
)


@settings(max_examples=8, deadline=None)
@given(hh_keys)
def test_exact_heavy_hitters_matches_exact_groupby(spark_prop, keys):
    from google_analytics_to_s3_spark.operators.skew import (
        exact_heavy_hitters,
    )

    phi = 0.1
    df = spark_prop.createDataFrame(
        [(k,) for k in keys], "skey long"
    ).repartition(4)
    got = {
        (r.skey, r.n_rows)
        for r in exact_heavy_hitters(df, "skey", phi=phi).collect()
    }
    n = len(keys)
    counts = {}
    for k in keys:
        counts[k] = counts.get(k, 0) + 1
    want = {(k, c) for k, c in counts.items() if c > phi * n}
    assert got == want


def test_exact_heavy_hitters_share_and_total(spark):
    from google_analytics_to_s3_spark.operators.skew import (
        exact_heavy_hitters,
    )

    df = spark.createDataFrame(
        [(1,)] * 60 + [(2,)] * 30 + [(i,) for i in range(100, 110)],
        "skey long",
    ).repartition(8)
    rows = {r.skey: r for r in
            exact_heavy_hitters(df, "skey", phi=0.2).collect()}
    assert set(rows) == {1, 2}
    assert rows[1].total_rows == 100 and rows[1].share == 0.6


def test_misra_gries_candidates_bounded_and_superset(spark):
    from google_analytics_to_s3_spark.operators.skew import (
        misra_gries_candidates,
    )

    # hot key 0 (40%), k=4 partitions x k counters bound the summary
    data = [(0,)] * 200 + [(i % 50 + 1,) for i in range(300)]
    df = spark.createDataFrame(data, "skey long").repartition(4)
    summ = misra_gries_candidates(df, "skey", k=5).collect()
    cands = {r.skey for r in summ if r.skey is not None}
    assert 0 in cands  # global heavy hitter always survives
    assert len(cands) <= 4 * 5
    assert sum(r._rows for r in summ) == 500  # exact total, one scan


def test_exact_heavy_hitters_plan_broadcasts_candidates(spark):
    from google_analytics_to_s3_spark.operators.skew import (
        exact_heavy_hitters,
    )

    df = spark.range(1000).select((F.col("id") % 7).alias("skey"))
    plan = exact_heavy_hitters(df, "skey", phi=0.05)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


# ----------------------------------------------------------- DP release


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    from google_analytics_to_s3_spark.operators.privacy import (
        dp_noisy_counts,
    )

    df = spark.range(2000).select(
        (F.col("id") % 4).cast("string").alias("g")
    )
    eps = 0.5
    a = sorted(map(tuple, dp_noisy_counts(
        df, ["g"], epsilon=eps, threshold=0, seed="s1").collect()))
    b = sorted(map(tuple, dp_noisy_counts(
        df, ["g"], epsilon=eps, threshold=0, seed="s1").collect()))
    assert a == b  # same seed -> identical release (auditable)
    # |noise| <= ln(2^20)/eps + rounding slack
    bound = math.log(1 << 20) / eps + 1
    for _, released in a:
        assert abs(released - 500) <= bound


def test_dp_noisy_counts_suppresses_small_groups(spark):
    from google_analytics_to_s3_spark.operators.privacy import (
        dp_noisy_counts,
    )

    df = spark.createDataFrame(
        [("big",)] * 500 + [("tiny",)] * 2, "g string"
    )
    out = dp_noisy_counts(df, ["g"], epsilon=0.5, threshold=100,
                          seed="s2").collect()
    assert [r.g for r in out] == ["big"]


def test_dp_noisy_counts_seed_changes_noise(spark):
    from google_analytics_to_s3_spark.operators.privacy import (
        dp_noisy_counts,
    )

    df = spark.range(3000).select(
        (F.col("id") % 6).cast("string").alias("g")
    )
    a = dict(map(tuple, dp_noisy_counts(
        df, ["g"], epsilon=0.5, threshold=0, seed="sA").collect()))
    b = dict(map(tuple, dp_noisy_counts(
        df, ["g"], epsilon=0.5, threshold=0, seed="sB").collect()))
    assert a != b  # fresh seed -> fresh draw (budget accounting real)


# ------------------------------------------------------------------ OLS


def test_ols_closed_form_recovers_exact_fit(spark):
    from google_analytics_to_s3_spark.operators.linalg import (
        ols_closed_form,
    )

    # y = 7 + 2*x1 + 5*x2 exactly -> betas exact, r2 == 1
    rows = [
        (x1, x2, 7 + 2 * x1 + 5 * x2)
        for x1 in range(0, 20)
        for x2 in range(0, 5)
    ]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    out = ols_closed_form(df, "y", "x1", "x2").collect()[0]
    assert out.n == 100
    assert out.beta0 == 7.0 and out.beta1 == 2.0 and out.beta2 == 5.0
    assert out.r2 == 1.0


def test_ols_closed_form_singular_gives_nulls(spark):
    from google_analytics_to_s3_spark.operators.linalg import (
        ols_closed_form,
    )

    # x2 = 2*x1 -> collinear -> det == 0 -> NULL betas
    rows = [(x, 2 * x, 3 * x + 1) for x in range(10)]
    df = spark.createDataFrame(rows, "x1 long, x2 long, y long")
    out = ols_closed_form(df, "y", "x1", "x2").collect()[0]
    assert out.beta0 is None and out.r2 is None


# ----------------------------------------------------- HLL mart rollup


def test_hll_register_rollup_equals_direct_sketch(spark):
    """Merging day-grain registers by max == sketching the union raw:
    the property that makes the register table a valid mart."""
    from google_analytics_to_s3_spark.operators.stats import (
        hll_estimate, hll_registers,
    )

    df = spark.range(5000).select(
        (F.col("id") % 7).alias("day"),
        (F.col("id") % 900).alias("uid"),
    )
    day_regs = hll_registers(df, "uid", ["day"])
    rolled = hll_estimate(
        day_regs.select(F.lit(0).alias("g"), "bucket", "mj"), ["g"]
    ).collect()[0]
    direct = hll_estimate(
        hll_registers(df.select(F.lit(0).alias("g"), "uid"), "uid", ["g"]),
        ["g"],
    ).collect()[0]
    assert rolled.occupied == direct.occupied
    assert rolled.hll_estimate == direct.hll_estimate
    # calibration: within 10% of the true 900 at m=1024
    assert abs(rolled.hll_estimate - 900) / 900 < 0.1


# --------------------------------------------------------------- NDCG


def test_ndcg_perfect_ranking_is_one(spark):
    from google_analytics_to_s3_spark.operators.stats import ndcg_at_k

    rows = [("q", i, 100 - i, max(0, 3 - i)) for i in range(20)]
    df = spark.createDataFrame(
        rows, "q string, tid long, score long, rel int"
    )
    out = ndcg_at_k(df, ["q"], "score", "rel", "tid", k=10).collect()[0]
    assert out.ndcg == 1.0 and out.n_candidates == 20
    assert out.dcg == out.idcg > 0


def test_ndcg_reversed_ranking_below_one_and_exact(spark):
    import math

    from google_analytics_to_s3_spark.operators.stats import (
        ndcg_at_k, ndcg_weights,
    )

    # rel 3 at the WORST model position among 5 candidates
    rows = [("q", i, i, 3 if i == 0 else 0) for i in range(5)]
    df = spark.createDataFrame(
        rows, "q string, tid long, score long, rel int"
    )
    out = ndcg_at_k(df, ["q"], "score", "rel", "tid", k=10).collect()[0]
    ws = ndcg_weights(10)
    assert out.ndcg == round(ws[4] / ws[0], 6)
    assert math.isclose(out.ndcg, 1 / math.log2(6), abs_tol=1e-6)


def test_ndcg_all_zero_relevance_is_null(spark):
    from google_analytics_to_s3_spark.operators.stats import ndcg_at_k

    df = spark.createDataFrame(
        [("q", 1, 5, 0), ("q", 2, 3, 0)],
        "q string, tid long, score long, rel int",
    )
    assert ndcg_at_k(df, ["q"], "score", "rel", "tid").collect()[0].ndcg \
        is None


# ------------------------------------------------- label propagation


def test_label_propagation_spreads_and_seeds_fixed(spark):
    from google_analytics_to_s3_spark.operators.graph import (
        label_propagation,
    )

    # path graph 1-2-3-4-5; seeds: 1 -> A, 5 -> B
    nodes = spark.createDataFrame(
        [(1, "A"), (2, None), (3, None), (4, None), (5, "B")],
        "node long, label string",
    )
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    got = {r.node: r.label for r in
           label_propagation(nodes, edges, rounds=2).collect()}
    # round1: 2<-A, 4<-B, 3 votes {} ; round2: 3 votes {A(from 2), B(from 4)} -> tie -> A
    assert got == {1: "A", 2: "A", 3: "A", 4: "B", 5: "B"}


def test_label_propagation_majority_beats_tiebreak(spark):
    from google_analytics_to_s3_spark.operators.graph import (
        label_propagation,
    )

    # node 10 has two B-seeded neighbors and one A-seeded: majority B
    nodes = spark.createDataFrame(
        [(1, "A"), (2, "B"), (3, "B"), (10, None)],
        "node long, label string",
    )
    edges = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10)], "src long, dst long"
    )
    got = {r.node: r.label for r in
           label_propagation(nodes, edges, rounds=1).collect()}
    assert got[10] == "B"


def test_label_propagation_isolated_node_stays_null(spark):
    from google_analytics_to_s3_spark.operators.graph import (
        label_propagation,
    )

    nodes = spark.createDataFrame(
        [(1, "A"), (2, None), (99, None)], "node long, label string"
    )
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = {r.node: r.label for r in
           label_propagation(nodes, edges, rounds=3).collect()}
    assert got[99] is None and got[2] == "A"


# ------------------------------------------------------------ IPS/SNIPS


def test_ips_policy_value_arithmetic(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        ips_policy_value,
    )

    # 4 rows, 2 matches with rewards 10 and 30, propensity 0.5
    rows = [(0, 0, 10), (1, 1, 30), (0, 1, 99), (1, 0, 99)]
    df = spark.createDataFrame(rows, "logged int, target int, r long")
    out = ips_policy_value(df, "logged", "target", "r", 0.5).collect()[0]
    assert out.n == 4 and out.n_match == 2
    assert out.ips_value == 40 / (0.5 * 4)  # 20.0
    assert out.snips_value == 20.0


def test_ips_policy_no_match_snips_null(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        ips_policy_value,
    )

    df = spark.createDataFrame(
        [(0, 1, 5), (1, 0, 7)], "logged int, target int, r long"
    )
    out = ips_policy_value(df, "logged", "target", "r", 0.25).collect()[0]
    assert out.ips_value == 0.0 and out.snips_value is None


def test_ips_identity_policy_recovers_mean_over_propensity(spark):
    from pyspark.sql import functions as FF

    from google_analytics_to_s3_spark.operators.stats import (
        ips_policy_value,
    )

    # target == logged everywhere -> IPS = mean(r)/p-scaled identity:
    # sum(r)/(p*n); SNIPS = mean(r)
    df = spark.range(100).select(
        (FF.col("id") % 3).alias("a"), (FF.col("id") % 3).alias("b"),
        (FF.col("id") * 2).alias("r"),
    )
    out = ips_policy_value(df, "a", "b", "r", 1.0).collect()[0]
    assert out.ips_value == out.snips_value == 99.0


# -------------------------------------------------------- conformal


def test_conformal_exact_rank_semantics(spark):
    """q_hat is EXACTLY the ceil((n+1)(1-alpha))-th smallest score."""
    from google_analytics_to_s3_spark.operators.stats import (
        split_conformal_intervals,
    )

    # 9 calibration rows, scores 1..9; alpha=0.1 ->
    # rank ceil(10*0.9) = 9 -> q_hat = 9.0
    rows = [("g", i, 0, i, 0) for i in range(1, 10)]
    rows += [("g", 100, 0, 5, 1)]  # one test row, score 5 <= 9
    df = spark.createDataFrame(
        rows, "g string, tid long, pred long, actual long, split int"
    )
    out = split_conformal_intervals(
        df, ["g"], "pred", "actual", "split", "tid", alpha=0.1
    ).collect()[0]
    assert out.n_cal == 9 and out.q_hat == 9.0
    assert out.n_test == 1 and out.coverage == 1.0


def test_conformal_small_calibration_yields_null(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        split_conformal_intervals,
    )

    # 3 cal rows at alpha=0.1 -> rank ceil(4*0.9)=4 > 3 -> NULL q_hat
    rows = [("g", i, 0, i, 0) for i in range(3)]
    rows += [("g", 50, 0, 1, 1)]
    df = spark.createDataFrame(
        rows, "g string, tid long, pred long, actual long, split int"
    )
    out = split_conformal_intervals(
        df, ["g"], "pred", "actual", "split", "tid", alpha=0.1
    ).collect()[0]
    assert out.q_hat is None and out.coverage is None


def test_conformal_coverage_on_deterministic_noise(spark):
    """Empirical coverage lands near 1-alpha when cal and test draw
    the same (hash-deterministic) noise distribution."""
    from pyspark.sql import functions as FF

    from google_analytics_to_s3_spark.operators.stats import (
        split_conformal_intervals,
    )

    df = spark.range(2000).select(
        FF.lit("g").alias("g"),
        FF.col("id").alias("tid"),
        FF.lit(0).alias("pred"),
        (FF.xxhash64("id") % 1000).alias("actual"),
        (FF.col("id") % 5 == 0).cast("int").alias("split"),
    )
    out = split_conformal_intervals(
        df, ["g"], "pred", "actual", "split", "tid", alpha=0.1
    ).collect()[0]
    assert 0.85 <= out.coverage <= 0.97


# ------------------------------------------------------------- z-test


def test_ztest_detects_planted_large_lift(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        two_proportion_ztest,
    )

    rows = [(0, 1 if i < 100 else 0) for i in range(1000)]   # 10%
    rows += [(1, 1 if i < 300 else 0) for i in range(1000)]  # 30%
    df = spark.createDataFrame(rows, "arm int, converted int")
    out = two_proportion_ztest(df, "arm", "converted").collect()[0]
    assert out.rate_c == 0.1 and out.rate_t == 0.3
    assert out.sig_95 and out.sig_99 and out.z > 10
    assert 0 < out.mde_80 < 0.2  # this n could detect ~4.4pp


def test_ztest_null_on_degenerate(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        two_proportion_ztest,
    )

    df = spark.createDataFrame(
        [(0, 0)] * 10 + [(1, 0)] * 10, "arm int, converted int"
    )
    out = two_proportion_ztest(df, "arm", "converted").collect()[0]
    assert out.z is None and out.sig_95 is None  # pooled rate 0


# --------------------------------------------------------- Neyman


def test_neyman_allocates_by_size_times_spread(spark):
    from google_analytics_to_s3_spark.operators.curation import (
        neyman_allocation,
    )

    # stratum A: high variance; B same size, near-zero variance ->
    # nearly all budget goes to A
    rows = [("A", i, (i * 37) % 1000) for i in range(500)]
    rows += [("B", 1000 + i, 500) for i in range(500)]
    df = spark.createDataFrame(rows, "s string, rid long, v long")
    sampled, alloc = neyman_allocation(
        df, ["s"], "v", budget=100, id_col="rid"
    )
    a = {r.s: r for r in alloc.collect()}
    assert a["A"].alloc >= 95 and a["B"].alloc <= 5
    assert a["B"].stddev == 0.0
    # deterministic: same seed -> same sample
    ids1 = sorted(r.rid for r in sampled.collect())
    ids2 = sorted(r.rid for r in
                  neyman_allocation(df, ["s"], "v", budget=100,
                                    id_col="rid")[0].collect())
    assert ids1 == ids2


def test_neyman_alloc_capped_at_stratum_size(spark):
    from google_analytics_to_s3_spark.operators.curation import (
        neyman_allocation,
    )

    rows = [("A", i, i % 7) for i in range(10)]
    rows += [("B", 100 + i, (i * 13) % 1000) for i in range(200)]
    df = spark.createDataFrame(rows, "s string, rid long, v long")
    _, alloc = neyman_allocation(df, ["s"], "v", budget=500,
                                 id_col="rid")
    a = {r.s: r for r in alloc.collect()}
    assert a["A"].alloc <= 10 and a["B"].alloc <= 200


# ------------------------------------------------------------ log-rank


def test_logrank_detects_planted_hazard_difference(spark):
    from google_analytics_to_s3_spark.operators.stats import logrank_test

    # arm 0 fails early (durations 1-3), arm 1 late (8-10): strongly
    # significant
    rows = [(0, 1 + i % 3, 1) for i in range(60)]
    rows += [(1, 8 + i % 3, 1) for i in range(60)]
    df = spark.createDataFrame(rows, "arm int, dur long, ev int")
    out = logrank_test(df, "dur", "ev", "arm").collect()[0]
    assert out.sig_99 and out.chi2 > 50
    assert out.o1 == 60 and out.events_arm0 == 60


def test_logrank_identical_arms_not_significant(spark):
    from google_analytics_to_s3_spark.operators.stats import logrank_test

    rows = [(a, 1 + i % 5, 1) for a in (0, 1) for i in range(50)]
    df = spark.createDataFrame(rows, "arm int, dur long, ev int")
    out = logrank_test(df, "dur", "ev", "arm").collect()[0]
    assert out.chi2 is not None and out.chi2 < 0.001
    assert out.sig_95 is False


def test_logrank_all_censored_is_null(spark):
    from google_analytics_to_s3_spark.operators.stats import logrank_test

    rows = [(a, 1 + i % 5, 0) for a in (0, 1) for i in range(20)]
    df = spark.createDataFrame(rows, "arm int, dur long, ev int")
    out = logrank_test(df, "dur", "ev", "arm").collect()[0]
    assert out.chi2 is None and out.o1 == 0


def test_logrank_censoring_shrinks_risk_set_not_events(spark):
    from google_analytics_to_s3_spark.operators.stats import logrank_test

    # censored subjects at t=2 leave the risk set for t=3 without
    # being events: E1 at t=3 must use the reduced n
    rows = [(0, 1, 1)] * 5 + [(1, 2, 0)] * 5 + [(1, 3, 1)] * 5
    df = spark.createDataFrame(rows, "arm int, dur long, ev int")
    out = logrank_test(df, "dur", "ev", "arm").collect()[0]
    # t=1: d=5 (arm0), n=15, n1=10 -> E1 += 5*10/15 = 10/3
    # t=3: d=5 (arm1), n=5, n1=5  -> E1 += 5*5/5   = 5
    assert out.e1 == round(10 / 3 + 5, 6)
    assert out.o1 == 5 and out.events_arm0 == 5


# --------------------------------------------------------- Mann-Whitney


def test_mann_whitney_matches_scipy_free_reference(spark):
    """Pin U, z against a hand-computed tie-corrected reference."""
    from google_analytics_to_s3_spark.operators.stats import (
        mann_whitney_u,
    )

    # arm0: [1, 2, 2, 5]; arm1: [2, 3, 5, 5, 8]
    rows = [(0, 1), (0, 2), (0, 2), (0, 5),
            (1, 2), (1, 3), (1, 5), (1, 5), (1, 8)]
    df = spark.createDataFrame(rows, "arm int, v long")
    out = mann_whitney_u(df, "v", "arm").collect()[0]
    # avg ranks: 1->1; 2,2,2 -> 3; 3 -> 5; 5,5,5 -> 7; 8 -> 9
    # R1 = 3 + 5 + 7 + 7 + 9 = 31 ; U1 = 31 - 5*6/2 = 16
    assert out.u1 == 16.0
    import math

    n0, n1, n = 4, 5, 9
    tie = (3**3 - 3) + (3**3 - 3)
    var = n0 * n1 / 12.0 * ((n + 1) - tie / (n * (n - 1)))
    z = (16.0 - n0 * n1 / 2.0) / math.sqrt(var)
    assert out.z == round(z, 6)


def test_mann_whitney_separated_arms_significant(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        mann_whitney_u,
    )

    rows = [(0, i) for i in range(100)] + [(1, 1000 + i)
                                           for i in range(100)]
    df = spark.createDataFrame(rows, "arm int, v long").repartition(8)
    out = mann_whitney_u(df, "v", "arm").collect()[0]
    assert out.sig_99 and out.z > 10
    assert out.u1 == 100.0 * 100.0  # arm1 wins every comparison


def test_mann_whitney_all_tied_null(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        mann_whitney_u,
    )

    df = spark.createDataFrame(
        [(a, 7) for a in (0, 1) for _ in range(10)], "arm int, v long"
    )
    out = mann_whitney_u(df, "v", "arm").collect()[0]
    assert out.z is None  # zero variance: every value ties


# -------------------------------------------- streaming heavy hitters


def test_mg_summary_merge_keeps_superset_guarantee(spark):
    """Per-batch MG summaries merged across 'micro-batches' retain
    every true heavy hitter — the incremental candidate pass — and a
    final exact verify over the union recovers exactly the true
    phi-heavy hitters."""
    from pyspark.sql import functions as F

    from google_analytics_to_s3_spark.operators.skew import (
        merge_mg_summaries, mg_batch_summary,
    )

    k = 10
    batches, all_rows = [], []
    for b in range(3):
        rows = [(0,)] * 300  # hot key in every batch
        rows += [(1 + (i + b * 7) % 40,) for i in range(500)]
        if b == 2:
            rows += [(99,)] * 250  # late-arriving second hot key
        batches.append(rows)
        all_rows += rows
    standing = None
    for rows in batches:
        df = spark.createDataFrame(rows, "skey long").repartition(4)
        summ = mg_batch_summary(df, "skey", k)
        standing = summ if standing is None else merge_mg_summaries(
            standing, summ, "skey", k
        )
        standing = standing.localCheckpoint()
    summary = {r.skey: r.weight for r in standing.collect()}
    n = len(all_rows)
    assert len(summary) <= k
    assert 0 in summary and 99 in summary  # both hot keys survived
    # weights are lower bounds within the merged error budget
    true = {}
    for (v,) in [(r[0],) for r in all_rows]:
        true[v] = true.get(v, 0) + 1
    for key, w in summary.items():
        assert w <= true[key]
        assert true[key] - w <= n / (k + 1) * 3  # 3 merge stages
    # exact verify over the full corpus: candidates -> true HH set
    full = spark.createDataFrame(all_rows, "skey long")
    cands = [int(x) for x in summary]
    phi = 0.1
    got = {
        r.skey
        for r in full.filter(F.col("skey").isin(cands))
        .groupBy("skey").count()
        .filter(F.col("count") > phi * n).collect()
    }
    want = {key for key, c in true.items() if c > phi * n}
    assert got == want and want == {0}


# ---------------------------------------------------- l-diversity / DR


def test_l_diversity_flags_homogeneous_group(spark):
    from google_analytics_to_s3_spark.operators.privacy import (
        l_diversity_report,
    )

    rows = [("g1", "a")] * 10                      # homogeneous: leak
    rows += [("g2", "a")] * 5 + [("g2", "b")] * 5  # 2-diverse
    df = spark.createDataFrame(rows, "q string, s string")
    out = {r.q: r for r in
           l_diversity_report(df, ["q"], "s", l_min=2).collect()}
    assert not out["g1"].is_diverse and out["g1"].entropy == 0.0
    assert out["g2"].is_diverse
    import math

    assert out["g2"].entropy == round(math.log(2), 6)


def test_dr_policy_perfect_model_equals_baseline_mean(spark):
    """When the model is exact (baseline == reward), the correction
    term vanishes and DR = mean reward regardless of propensity —
    the double-robustness property, on its model side."""
    from google_analytics_to_s3_spark.operators.stats import (
        dr_policy_value,
    )

    rows = [(i % 4, (i * 7) % 4, 100 + i % 50, 100 + i % 50)
            for i in range(400)]
    df = spark.createDataFrame(
        rows, "logged int, target int, r long, b long"
    )
    out = dr_policy_value(
        df, "logged", "target", "r", "b", propensity=0.25
    ).collect()[0]
    mean_r = sum(100 + i % 50 for i in range(400)) / 400
    assert out.dr_value == round(mean_r, 6)


def test_dr_policy_zero_model_reduces_to_ips(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        dr_policy_value, ips_policy_value,
    )

    rows = [(i % 4, (i * 13) % 4, (i * 31) % 200, 0)
            for i in range(300)]
    df = spark.createDataFrame(
        rows, "logged int, target int, r long, b long"
    )
    dr = dr_policy_value(
        df, "logged", "target", "r", "b", propensity=0.25
    ).collect()[0]
    ips = ips_policy_value(
        df, "logged", "target", "r", propensity=0.25
    ).collect()[0]
    assert dr.dr_value == ips.ips_value == dr.ips_value


# ------------------------------------------------------------ isotonic


def test_isotonic_minimax_equals_pav(spark):
    """The minimax closed form == the sequential PAV fit (reference
    implementation inline), on a violating sequence."""
    from google_analytics_to_s3_spark.operators.stats import (
        isotonic_calibrate,
    )

    # bins 0..4 with rates [0.1, 0.5, 0.3, 0.2, 0.9] and weights
    rates = [(0, 100, 10), (1, 100, 50), (2, 100, 30),
             (3, 100, 20), (4, 100, 90)]
    rows = []
    for b, n, pos in rates:
        rows += [(b * 200000 + 1, 1)] * pos + [(b * 200000 + 1, 0)] * (n - pos)
    df = spark.createDataFrame(rows, "score long, y int")
    out = {r.bin: r.iso_rate for r in
           isotonic_calibrate(df, "score", "y", n_bins=5).collect()}

    # reference PAV
    blocks = [[n, pos] for _, n, pos in rates]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] / blocks[i][0] > blocks[i + 1][1] / blocks[i + 1][0]:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            del blocks[i + 1]
            i = max(0, i - 1)
        else:
            i += 1
    fit = []
    bi = 0
    for n, pos in blocks:
        for _ in range(n // 100):
            fit.append(pos / n)
    for b in range(5):
        assert out[b] == round(fit[b], 6), (b, out[b], fit[b])
    # monotone by construction
    assert all(out[b] <= out[b + 1] for b in range(4))


def test_isotonic_already_monotone_is_identity(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        isotonic_calibrate,
    )

    rows = []
    for b, pos in [(0, 10), (1, 30), (2, 60)]:
        rows += [(b * 333334, 1)] * pos + [(b * 333334, 0)] * (100 - pos)
    df = spark.createDataFrame(rows, "score long, y int")
    out = {r.bin: r for r in
           isotonic_calibrate(df, "score", "y", n_bins=3).collect()}
    for b in range(3):
        assert out[b].iso_rate == out[b].rate


# --------------------------------------------------------------- EB


def test_eb_smoothing_pulls_small_groups_to_prior(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        eb_beta_binomial_smooth,
    )

    # many medium groups at ~20%, one tiny 2-of-2 group: raw rate 1.0
    # must shrink far toward the prior; big groups barely move
    rows = [(f"g{i}", 100, 20 + i % 5) for i in range(20)]
    rows.append(("lucky", 2, 2))
    df = spark.createDataFrame(rows, "g string, n long, pos long")
    out = {r.g: r for r in
           eb_beta_binomial_smooth(df, ["g"], "n", "pos").collect()}
    assert out["lucky"].rate == 1.0
    assert out["lucky"].smoothed < 0.6  # pulled hard toward ~0.25
    assert abs(out["g0"].smoothed - out["g0"].rate) < 0.05


def test_eb_smoothing_degenerate_variance_identity(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        eb_beta_binomial_smooth,
    )

    df = spark.createDataFrame(
        [(f"g{i}", 10, 3) for i in range(5)], "g string, n long, pos long"
    )
    out = eb_beta_binomial_smooth(df, ["g"], "n", "pos").collect()
    for r in out:
        assert r.smoothed == r.rate == 0.3


# --------------------------------------------------------- event study


def test_event_study_recovers_planted_dynamic_effect(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        did_event_study,
    )

    # pre periods 0-4: constant gap 10 (parallel trends);
    # post periods 5-9: treated jumps by +50 at t=5, +100 later
    rows = []
    for day in range(10):
        for u in range(20):
            rows.append((0, day, 100))
            bump = 0 if day < 5 else (50 if day == 5 else 100)
            rows.append((1, day, 110 + bump))
    df = spark.createDataFrame(rows, "treat int, day long, v long")
    out = {r.period: r for r in
           did_event_study(df, "v", "treat", "day", 5).collect()}
    for d in range(5):
        assert out[d].effect == 0.0 and not out[d].is_post
    assert out[5].effect == 50.0 and out[5].is_post
    assert out[9].effect == 100.0


def test_event_study_missing_arm_period_is_null(spark):
    from google_analytics_to_s3_spark.operators.stats import (
        did_event_study,
    )

    rows = [(0, 0, 10), (1, 0, 12), (0, 1, 10)]  # day 1 has no treated
    df = spark.createDataFrame(rows, "treat int, day long, v long")
    out = {r.period: r for r in
           did_event_study(df, "v", "treat", "day", 1).collect()}
    assert out[1].gap is None and out[1].effect is None
    assert out[0].gap == 2.0
