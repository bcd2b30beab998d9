"""Property-based tests (hypothesis) for the round-8 surface:
progressive-JPEG == baseline on random planted coefficients, FLAC
roundtrips across the full option grid, BH-FDR step-up invariants,
and Wasserstein translation identity."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    geom=st.sampled_from([(16, 16), (32, 16), (32, 32), (48, 32)]),
    channels=st.sampled_from([1, 3]),
    sub=st.sampled_from(["444", "422", "420"]),
    al=st.integers(min_value=1, max_value=2),
)
def test_progressive_always_equals_baseline(seed, geom, channels, sub, al):
    """For ANY planted coefficient seed/geometry/subsampling/Al depth,
    the progressive re-encoding decodes pixel-identical to the
    baseline encoding of the same plan — the multi-scan accumulation
    is exact, not approximately right on the pinned corpus."""
    from google_analytics_to_s3_spark.operators.multimodal import (
        _parse_jpeg,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_jpeg_baseline, make_jpeg_progressive,
    )

    w, h = geom
    if channels == 1:
        sub = "444"
    if sub == "420" and (w % 16 or h % 16):
        h = w = 32
    if sub == "422" and w % 16:
        w = 32
    base = _parse_jpeg(
        make_jpeg_baseline(seed, w, h, channels, subsampling=sub)
    )
    prog = _parse_jpeg(
        make_jpeg_progressive(seed, w, h, channels, subsampling=sub,
                              al=al)
    )
    assert base[:3] == prog[:3]
    assert (base[3] == prog[3]).all()


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    n=st.integers(min_value=1, max_value=2000),
    bs=st.sampled_from([256, 512, 1024]),
    channels=st.sampled_from([1, 2]),
    mode=st.sampled_from(
        ["independent", "left_side", "right_side", "mid_side"]
    ),
    esc=st.booleans(),
    wasted=st.sampled_from([0, 1, 2]),
)
def test_flac_roundtrip_full_option_grid(seed, n, bs, channels, mode,
                                         esc, wasted):
    """FLAC is lossless: decode reproduces the planted sample rules
    EXACTLY for any seed/length/blocksize/channel-mode/escape/wasted
    combination the fixture can emit (mid_side excluded from wasted
    runs: (L+R)>>1 need not stay on the 2^k grid)."""
    from google_analytics_to_s3_spark.operators.multimodal import (
        _parse_flac,
    )
    from google_analytics_to_s3_spark.testing.fixtures import make_flac

    if wasted and mode == "mid_side":
        mode = "independent"
    mult = 1 << wasted
    raw = make_flac(seed, n_samples=n, block_size=bs,
                    channels=channels, stereo_mode=mode,
                    rice_escape=esc, wasted_bits=wasted)
    sr, total, s = _parse_flac(raw)
    assert total == n

    def series(base_seed, a, m, const):
        out = np.empty(n, dtype=np.int64)
        pos, fno = 0, 0
        cyc = ("fixed2", "verbatim", "constant")
        while pos < n:
            blk = min(bs, n - pos)
            if cyc[fno % 3] == "constant":
                out[pos:pos + blk] = const * mult
            else:
                i = np.arange(pos, pos + blk)
                out[pos:pos + blk] = (
                    ((base_seed + i * a) % m) - (m - 1) // 2
                ) * mult
            pos += blk
            fno += 1
        return out

    left = series(seed, 257, 2001, seed % 512)
    if channels == 1:
        assert (s == left).all()
    else:
        right = series(seed * 3, 181, 1801, (seed * 3) % 512)
        assert (s[:, 0] == left).all()
        assert (s[:, 1] == right).all()


@settings(max_examples=8, deadline=None)
@given(
    ps=st.lists(
        st.floats(min_value=1e-9, max_value=1.0,
                  allow_nan=False, allow_infinity=False),
        min_size=1, max_size=12, unique=True,
    ),
    alpha=st.sampled_from([0.05, 0.1, 0.25]),
)
def test_bh_fdr_invariants(spark_prop, ps, alpha):
    """Step-up invariants on random p-vectors: the rejected set is a
    PREFIX of the p-ordering, p_adj is monotone along it and bounded
    by [p, 1], and a hypothesis is rejected iff its adjusted p is at
    most alpha (the standard equivalence)."""
    from google_analytics_to_s3_spark.operators.stats import bh_fdr

    df = spark_prop.createDataFrame(
        [(f"h{i}", float(p)) for i, p in enumerate(ps)],
        "h string, p_value double",
    )
    rows = sorted(bh_fdr(df, alpha=alpha).collect(),
                  key=lambda r: r["p_rank"])
    rej = [r["rejected"] for r in rows]
    assert rej == sorted(rej, reverse=True)  # prefix property
    adj = [r["p_adj"] for r in rows]
    assert adj == sorted(adj)  # monotone along the ranking
    for r in rows:
        assert r["p_adj"] <= 1.0 + 1e-9
        # rounding at 6 decimals can only move p_adj below raw p by
        # half an ulp of the grid
        assert r["p_adj"] >= round(r["p_value"], 6) - 5e-7 or \
            r["p_adj"] >= r["p_value"] - 5e-7
        assert bool(r["rejected"]) == (
            r["p_adj"] <= alpha + 5e-7
        ), (rows, alpha)


@settings(max_examples=6, deadline=None)
@given(
    vals=st.lists(st.integers(min_value=0, max_value=500),
                  min_size=2, max_size=40),
    shift=st.integers(min_value=1, max_value=200),
)
def test_wasserstein_translation_identity(spark_prop, vals, shift):
    """W1 between a distribution and its exact translation equals the
    shift — for ANY multiset and bucketing."""
    from google_analytics_to_s3_spark.operators.dq import (
        wasserstein_two_sample,
    )

    rows = [(int(v), "a") for v in vals] + [
        (int(v) + shift, "b") for v in vals
    ]
    df = spark_prop.createDataFrame(rows, "v long, g string")
    r = wasserstein_two_sample(df, "v", "g", "a", "b",
                               buckets=7).collect()[0]
    assert abs(r["w1"] - shift) < 1e-6
