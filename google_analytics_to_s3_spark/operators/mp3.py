"""MPEG-1 Audio Layer III (MP3) integer byte-path decoder.

The last common-crawl audio codec gap (after FLAC r7-r9, WAV/G.711/
ADPCM r9, Ogg/Vorbis r9): MP3 payloads decode for REAL through the
spec's integer stages, per ISO/IEC 11172-3 (public):

- frame sync + header fields (§2.4.1.3: bitrate / sample-rate
  tables, padding, channel mode) and ID3v2 tag skip,
- side information (§2.4.1.7: main_data_begin, scfsi, per-granule
  part2_3_length / big_values / global_gain / scalefac_compress /
  table_select / region counts / preflag / scalefac_scale /
  count1table_select),
- the BIT RESERVOIR (§2.4.2.7: each frame's granule data starts
  main_data_begin bytes BEFORE its own main-data region, inside the
  previous frames' unused capacity),
- scalefactor decode with scfsi band-group sharing between the two
  granules of a frame (Table B.6 slen pairs, 11+10 long-block bands),
- the two-stage Huffman spectrum decode: big_values PAIRS across the
  three region boundaries (Table B.8 44.1 kHz scalefactor-band
  widths) with a sign bit after each nonzero value, then count1
  QUADRUPLES until part2_3_length is exhausted (§2.4.2.7).

Requantization is reported in EXACT integer quarter-log2 units —
for a nonzero line in scalefactor band b,

    E = (global_gain - 210)
        - 2 * (scalefac_scale + 1) * (scalefac[b] + preflag * pretab[b])

so that xr = sign(is) * |is|^(4/3) * 2^(E/4) (§2.4.3.4) — rather
than as irrational 2^(E/4) floats; every readout column is
exact-integer and DuckDB-replayable.

MPEG-2 (LSF, ISO/IEC 13818-3) decodes as of r10: version bits 10,
halved frame constant, the LSF bitrate/rate tables, 9/17-byte side
info (8-bit main_data_begin, ONE granule, no scfsi, no preflag,
9-bit scalefac_compress — the field widths sum exactly to the spec's
side-info sizes, pinning the layout), the first scalefac_compress
class (< 400: slen quadruple over (6,5,5,5) band groups) and the
22.05 kHz Table B.2 band widths.

Honestly gated (named ValueError, quarantined by the Spark wrapper —
one bad payload never fails the batch): MPEG-2.5 headers, Layers
I/II, free-form and reserved bitrates, CRC-protected frames,
joint/dual-channel stereo, short/mixed blocks (window_switching),
big-value Huffman tables other than 0/1 (the spec's other 30 code
tables incl. the linbits ESC tables), count1 table A, LSF
scalefac_compress classes >= 400 (intensity-oriented), and sfb-width
tables for rates other than 44.1/22.05 kHz.

Payloads are synthesized by testing/fixtures.make_mp3, which PLANTS
deterministic integer spectra/scalefactors; the DuckDB oracle
replays the planted rules in closed form, so a green driver row
proves the full chain (framing → side info → reservoir →
scalefactors → Huffman → requant exponents) inverts the encoder
exactly. Same discipline as the FLAC (multimodal.py) and Vorbis
(vorbis.py) byte paths; there is no MP3 surface in the reference
repo (this is beyond-reference LLM-pipeline surface, cf. SURVEY §2.12).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

__all__ = ["parse_mp3", "decode_mp3_features",
           "parse_mp3_synth", "decode_mp3_synth_features"]


# ---------------------------------------------------------------------------
# MSB-first bit reader (MP3 bitstreams are big-endian bit order,
# unlike Vorbis' LSB-first packing)
# ---------------------------------------------------------------------------

class _MBits:
    __slots__ = ("raw", "pos")

    def __init__(self, raw: bytes, start_bit: int = 0):
        self.raw = raw
        self.pos = start_bit

    def read(self, n: int) -> int:
        p = self.pos
        if p + n > len(self.raw) * 8:
            raise ValueError("MP3 bitstream truncated")
        v = 0
        for i in range(n):
            byte = self.raw[(p + i) >> 3]
            v = (v << 1) | ((byte >> (7 - ((p + i) & 7))) & 1)
        self.pos = p + n
        return v

    def read1(self) -> int:
        p = self.pos
        if p >= len(self.raw) * 8:
            raise ValueError("MP3 bitstream truncated")
        self.pos = p + 1
        return (self.raw[p >> 3] >> (7 - (p & 7))) & 1


# ---------------------------------------------------------------------------
# Spec tables (ISO/IEC 11172-3, public)
# ---------------------------------------------------------------------------

# §2.4.2.3: bitrate_index -> kbit/s for MPEG-1 Layer III; index 0 is
# "free format" and 15 is forbidden — both gated.
_BITRATE_KBPS = [None, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                 160, 192, 224, 256, 320, None]

# ISO/IEC 13818-3: MPEG-2 (LSF) Layer III bitrate table.
_BITRATE_KBPS_LSF = [None, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                     96, 112, 128, 144, 160, None]

# §2.4.2.3: sampling_frequency index (MPEG-1); index 3 reserved.
_SAMPLE_RATES = [44100, 48000, 32000, None]

# ISO/IEC 13818-3: MPEG-2 rates are the MPEG-1 rates halved.
_SAMPLE_RATES_LSF = [22050, 24000, 16000, None]

# Table B.6: scalefac_compress -> (slen1, slen2).
_SLEN = [(0, 0), (0, 1), (0, 2), (0, 3), (3, 0), (1, 1), (1, 2),
         (1, 3), (2, 1), (2, 2), (2, 3), (3, 1), (3, 2), (3, 3),
         (4, 2), (4, 3)]

# Table B.8: long-block scalefactor band widths at 44.1 kHz —
# 21 scalefactored bands + the 158-line rest region (no scalefactor).
_SFB_WIDTHS_44100 = [4, 4, 4, 4, 4, 4, 6, 6, 8, 8, 10, 12, 16, 20,
                     24, 28, 34, 42, 50, 54, 76, 158]
_SFB_BOUNDS_44100 = [0]
for _wd in _SFB_WIDTHS_44100:
    _SFB_BOUNDS_44100.append(_SFB_BOUNDS_44100[-1] + _wd)
assert _SFB_BOUNDS_44100[-1] == 576

# ISO/IEC 13818-3 Table B.2: long-block scalefactor band widths at
# 22.05 kHz (LSF) — 21 scalefactored bands + the rest region.
_SFB_WIDTHS_22050 = [6, 6, 6, 6, 6, 6, 8, 10, 12, 14, 16, 20, 24,
                     28, 32, 38, 46, 52, 60, 68, 58, 54]
_SFB_BOUNDS_22050 = [0]
for _wd in _SFB_WIDTHS_22050:
    _SFB_BOUNDS_22050.append(_SFB_BOUNDS_22050[-1] + _wd)
assert _SFB_BOUNDS_22050[-1] == 576

_SFB_BOUNDS = {44100: _SFB_BOUNDS_44100, 22050: _SFB_BOUNDS_22050}

# Table B.6 pretab (preflag emphasis per band, bands 0-21).
_PRETAB = [0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 3,
           3, 3, 2, 0]

# Table B.7, code table 1 (x, y <= 1): (x, y) -> MSB-first codeword
# string. Table 0 is the empty table (a region coded with it emits
# all-zero pairs and consumes no bits).
_HUFF1_ENC = {(0, 0): "1", (1, 0): "01", (0, 1): "001", (1, 1): "000"}


def _build_tree(enc: dict) -> dict:
    tree: dict = {}
    for (x, y), code in enc.items():
        node = tree
        for b in code[:-1]:
            node = node.setdefault(b, {})
        node[code[-1]] = (x, y)
    return tree


_HUFF1_TREE = _build_tree(_HUFF1_ENC)

# scfsi band groups (§2.4.2.7): scalefactor bands per group, and
# whether the group is coded with slen1 or slen2.
_SCFSI_GROUPS = [(range(0, 6), 1), (range(6, 11), 1),
                 (range(11, 16), 2), (range(16, 21), 2)]


# ---------------------------------------------------------------------------
# Header / side info
# ---------------------------------------------------------------------------

def _parse_header(b: bytes) -> dict:
    """§2.4.1.3. Returns header fields; gates everything outside the
    MPEG-1 Layer III mono / LR-stereo subset with named errors."""
    if len(b) < 4:
        raise ValueError("truncated MP3 frame header")
    (word,) = struct.unpack(">I", b[:4])
    if (word >> 21) & 0x7FF != 0x7FF:
        raise ValueError("MP3 frame sync missing")
    version = (word >> 19) & 0x3
    if version == 0b00:
        raise ValueError("MPEG-2.5 unsupported (version bits 00)")
    if version == 0b01:
        raise ValueError("reserved MPEG version bits 01")
    lsf = version == 0b10  # MPEG-2 low-sampling-frequency profile
    layer = (word >> 17) & 0x3
    if layer != 0b01:
        raise ValueError(f"only Layer III supported (layer bits {layer:02b})")
    protection = (word >> 16) & 0x1
    if protection == 0:
        raise ValueError("CRC-protected MP3 frames unsupported")
    bitrate_index = (word >> 12) & 0xF
    kbps = (_BITRATE_KBPS_LSF if lsf else _BITRATE_KBPS)[bitrate_index]
    if kbps is None:
        raise ValueError(f"free/reserved bitrate index {bitrate_index}")
    sr_index = (word >> 10) & 0x3
    rate = (_SAMPLE_RATES_LSF if lsf else _SAMPLE_RATES)[sr_index]
    if rate is None:
        raise ValueError("reserved sample-rate index 3")
    padding = (word >> 9) & 0x1
    mode = (word >> 6) & 0x3
    mode_ext = (word >> 4) & 0x3
    if mode == 0b01:
        # joint stereo: MS matrixing is a lossless spectral-domain
        # transform (decode is identical to LR stereo; the matrix
        # belongs to synthesis), so the integer byte path accepts it;
        # INTENSITY stereo changes the decode semantics and stays a
        # named gate
        if mode_ext & 0x1:
            raise ValueError("intensity stereo unsupported")
        if not mode_ext & 0x2:
            raise ValueError(
                "joint stereo with neither MS nor intensity set"
            )
    if mode == 0b10:
        raise ValueError("dual-channel MP3 unsupported")
    nch = 1 if mode == 0b11 else 2
    # §2.4.3.1: Layer III frame length in bytes (LSF frames carry 576
    # samples instead of 1152, so the constant halves to 72).
    frame_len = ((72 if lsf else 144) * kbps * 1000) // rate + padding
    return {
        "kbps": kbps, "rate": rate, "padding": padding,
        "mode": mode, "nch": nch, "frame_len": frame_len,
        "lsf": lsf, "ms_stereo": mode == 0b01,
    }


def _parse_side_info(b: bytes, nch: int, lsf: bool = False) -> dict:
    """§2.4.1.7 (MPEG-1: 17/32 bytes, 9-bit main_data_begin, scfsi,
    two granules) and ISO 13818-3 LSF (9/17 bytes, 8-bit
    main_data_begin, NO scfsi, ONE granule, 9-bit scalefac_compress,
    no preflag bit — the field widths sum exactly to the 9/17-byte
    sizes, which pins the layout)."""
    if lsf:
        need = 9 if nch == 1 else 17
    else:
        need = 17 if nch == 1 else 32
    if len(b) < need:
        raise ValueError("truncated MP3 side info")
    br = _MBits(b[:need])
    main_data_begin = br.read(8 if lsf else 9)
    if lsf:
        br.read(1 if nch == 1 else 2)  # private_bits
        scfsi = [[0, 0, 0, 0] for _ in range(nch)]
    else:
        br.read(5 if nch == 1 else 3)  # private_bits
        scfsi = [[br.read1() for _ in range(4)] for _ in range(nch)]
    granules: list[list[dict]] = []
    for _gr in range(1 if lsf else 2):
        chs = []
        for _ch in range(nch):
            g: dict = {}
            g["part2_3_length"] = br.read(12)
            g["big_values"] = br.read(9)
            if g["big_values"] * 2 > 576:
                raise ValueError(f"big_values {g['big_values']} exceeds 288")
            g["global_gain"] = br.read(8)
            g["scalefac_compress"] = br.read(9 if lsf else 4)
            ws = br.read1()
            if ws:
                raise ValueError(
                    "window_switching (short/mixed blocks) unsupported"
                )
            g["table_select"] = [br.read(5) for _ in range(3)]
            g["region0_count"] = br.read(4)
            g["region1_count"] = br.read(3)
            g["preflag"] = 0 if lsf else br.read1()
            g["scalefac_scale"] = br.read1()
            g["count1table_select"] = br.read1()
            if g["count1table_select"] != 1:
                raise ValueError("count1 table A unsupported (only table B)")
            chs.append(g)
        granules.append(chs)
    return {"main_data_begin": main_data_begin, "scfsi": scfsi,
            "granules": granules, "side_bytes": need}


# ---------------------------------------------------------------------------
# Main-data decode (scalefactors + Huffman spectrum)
# ---------------------------------------------------------------------------

def _read_scalefactors(br: _MBits, g: dict, scfsi_ch: list[int],
                       gr: int, prev_sf: list[int] | None
                       ) -> tuple[list[int], int]:
    """Long-block scalefactors with scfsi sharing (§2.4.2.7).
    Returns (21 scalefactors, bits consumed)."""
    slen1, slen2 = _SLEN[g["scalefac_compress"]]
    sf = [0] * 21
    bits = 0
    for group_i, (bands, which) in enumerate(_SCFSI_GROUPS):
        slen = slen1 if which == 1 else slen2
        if gr == 1 and scfsi_ch[group_i]:
            if prev_sf is None:
                raise ValueError("scfsi set but granule 0 missing")
            for b in bands:
                sf[b] = prev_sf[b]
        else:
            for b in bands:
                sf[b] = br.read(slen) if slen else 0
                bits += slen
    return sf, bits


def _read_scalefactors_lsf(br: _MBits, g: dict) -> tuple[list[int], int]:
    """ISO 13818-3 §2.4.3.2, non-intensity channels, first
    scalefac_compress class (< 400): slen = ((sc/16)/5, (sc/16)%5,
    (sc%16)/4, sc%4) over band groups of (6, 5, 5, 5) long-block
    scalefactor bands. The 400-499 and 500-511 classes are honestly
    gated (named error)."""
    sc = g["scalefac_compress"]
    if sc >= 400:
        raise ValueError(
            f"LSF scalefac_compress class {sc} >= 400 unsupported"
        )
    slen = (sc // 16 // 5, (sc // 16) % 5, (sc % 16) // 4, sc % 4)
    groups = (6, 5, 5, 5)
    sf = []
    bits = 0
    for n, sl in zip(groups, slen):
        for _ in range(n):
            sf.append(br.read(sl) if sl else 0)
            bits += sl
    return sf, bits


def _decode_pair(br: _MBits, table: int) -> tuple[int, int, int]:
    """One big-values pair via the embedded code tables. Returns
    (x, y, bits). Sign bit convention (§2.4.2.7): a 1-bit after each
    nonzero value, 1 = negative."""
    if table == 0:
        return 0, 0, 0
    if table != 1:
        raise ValueError(f"big-value Huffman table {table} unsupported")
    node = _HUFF1_TREE
    bits = 0
    while True:
        b = "1" if br.read1() else "0"
        bits += 1
        node = node.get(b)
        if node is None:
            raise ValueError("invalid Huffman codeword (table 1)")
        if isinstance(node, tuple):
            x, y = node
            break
    if x:
        x = -x if br.read1() else x
        bits += 1
    if y:
        y = -y if br.read1() else y
        bits += 1
    return x, y, bits


def _decode_count1_quad(br: _MBits) -> tuple[list[int], int]:
    """Count1 table B (§2.4.2.7): fixed 4-bit codewords equal to the
    bit-complement of (v w x y), then a sign bit per nonzero."""
    code = br.read(4)
    quad = (~code) & 0xF
    vals = [(quad >> 3) & 1, (quad >> 2) & 1, (quad >> 1) & 1, quad & 1]
    bits = 4
    out = []
    for v in vals:
        if v:
            v = -v if br.read1() else v
            bits += 1
        out.append(v)
    return out, bits


def _decode_granule(br: _MBits, g: dict, scfsi_ch: list[int], gr: int,
                    prev_sf: list[int] | None, rate: int,
                    lsf: bool = False) -> dict:
    """Decode one granule's main data: scalefactors then the
    big_values / count1 Huffman spectrum, exactly part2_3_length
    bits. Returns integer features + the scalefactors (for scfsi)."""
    start = br.pos
    if lsf:
        sf, _sf_bits = _read_scalefactors_lsf(br, g)
    else:
        sf, _sf_bits = _read_scalefactors(br, g, scfsi_ch, gr, prev_sf)
    bounds = _SFB_BOUNDS.get(rate)
    if bounds is None:
        raise ValueError(
            f"sfb width table for {rate} Hz not embedded"
            " (44.1/22.05 kHz only)"
        )
    r0 = g["region0_count"] + 1
    r1 = r0 + g["region1_count"] + 1
    if r1 >= len(bounds):
        raise ValueError("region counts exceed the sfb table")
    region_end = (bounds[r0], bounds[r1], 576)
    nlines = 2 * g["big_values"]
    spectrum = [0] * 576
    line = 0
    while line < nlines:
        if line < region_end[0]:
            table = g["table_select"][0]
        elif line < region_end[1]:
            table = g["table_select"][1]
        else:
            table = g["table_select"][2]
        x, y, _bits = _decode_pair(br, table)
        spectrum[line] = x
        spectrum[line + 1] = y
        line += 2
    part23 = g["part2_3_length"]
    consumed = br.pos - start
    if consumed > part23:
        raise ValueError("big_values region overran part2_3_length")
    count1_abs = 0
    while consumed < part23 and line + 4 <= 576:
        vals, _bits = _decode_count1_quad(br)
        consumed = br.pos - start
        if consumed > part23:
            raise ValueError("count1 region overran part2_3_length")
        for v in vals:
            spectrum[line] = v
            count1_abs += abs(v)
            line += 1
    if consumed < part23:
        # stuffing bits inside the granule (§2.4.2.7 allows them)
        br.pos = start + part23
    # exact quarter-log2 requant exponents over nonzero lines
    gg = g["global_gain"]
    mult = 2 * (g["scalefac_scale"] + 1)
    pre = g["preflag"]
    exp_sum = 0
    abs_sum = 0
    signed_sum = 0
    nonzero = 0
    band = 0
    for i in range(line):
        while bounds[band + 1] <= i:
            band += 1
        v = spectrum[i]
        if v == 0:
            continue
        sfac = sf[band] if band < 21 else 0
        e = (gg - 210) - mult * (sfac + pre * _PRETAB[band])
        sign = 1 if v > 0 else -1
        exp_sum += sign * e
        abs_sum += abs(v)
        signed_sum += v
        nonzero += 1
    return {
        "sf": sf,
        "sf_sum": sum(sf),
        "abs_sum": abs_sum,
        "signed_sum": signed_sum,
        "count1_abs": count1_abs,
        "exp_sum": exp_sum,
        "nonzero": nonzero,
        "n_lines": line,
        "spectrum": spectrum,
        "gg": gg, "mult": mult, "pre": pre,
    }


# ---------------------------------------------------------------------------
# Stream walk
# ---------------------------------------------------------------------------

def _skip_id3v2(raw: bytes) -> int:
    """ID3v2 tag skip (informal ID3v2.3/2.4 spec, public): 'ID3' +
    version(2) + flags(1) + syncsafe size(4), then `size` bytes."""
    if not raw.startswith(b"ID3"):
        return 0
    if len(raw) < 10:
        raise ValueError("truncated ID3v2 tag header")
    flags = raw[5]
    if flags & 0x10:
        raise ValueError("ID3v2 footer unsupported")
    size = 0
    for b in raw[6:10]:
        if b & 0x80:
            raise ValueError("invalid ID3v2 syncsafe size byte")
        size = (size << 7) | b
    if 10 + size > len(raw):
        raise ValueError("ID3v2 tag exceeds payload")
    return 10 + size


def _walk_granules(raw: bytes):
    """Shared stream walk: optional ID3v2 skip, then every frame's
    header, side info, bit reservoir resolution and main-data decode.
    Yields (hdr, mdb, gr, ch, side_granule, decoded) per
    granule-channel in stream order (mdb is reported once per frame,
    on its (gr 0, ch 0) row)."""
    pos = _skip_id3v2(raw)
    if pos >= len(raw):
        raise ValueError("no MP3 frames after ID3 tag")
    reservoir = bytearray()
    first = None
    n_frames = 0
    while pos < len(raw):
        if len(raw) - pos < 4:
            raise ValueError("trailing garbage shorter than a header")
        hdr = _parse_header(raw[pos:pos + 4])
        if first is None:
            first = hdr
        elif (hdr["rate"], hdr["nch"], hdr["lsf"]) != (
                first["rate"], first["nch"], first["lsf"]):
            raise ValueError("sample rate / channel mode changed mid-stream")
        frame = raw[pos:pos + hdr["frame_len"]]
        if len(frame) < hdr["frame_len"]:
            raise ValueError("truncated MP3 frame")
        side = _parse_side_info(frame[4:], hdr["nch"], lsf=hdr["lsf"])
        mdb = side["main_data_begin"]
        if mdb > len(reservoir):
            raise ValueError("bit reservoir underflow")
        start_byte = len(reservoir) - mdb
        reservoir.extend(frame[4 + side["side_bytes"]:])
        br = _MBits(bytes(reservoir), start_bit=start_byte * 8)
        prev_sf: list[list[int] | None] = [None] * hdr["nch"]
        for gr in range(len(side["granules"])):
            for ch in range(hdr["nch"]):
                g = side["granules"][gr][ch]
                d = _decode_granule(br, g, side["scfsi"][ch], gr,
                                    prev_sf[ch], hdr["rate"],
                                    lsf=hdr["lsf"])
                prev_sf[ch] = d["sf"]
                yield hdr, mdb if (gr, ch) == (0, 0) else 0, gr, ch, g, d
        n_frames += 1
        pos += hdr["frame_len"]
        # scale discipline: main_data_begin is 9 bits (<= 511), so
        # older reservoir bytes can never be referenced again
        if len(reservoir) > 1024:
            del reservoir[:len(reservoir) - 1024]
    if n_frames == 0:
        raise ValueError("no MP3 frames decoded")


def parse_mp3(raw: bytes) -> dict:
    """Integer byte-path stream features (module docstring) — one
    pass of :func:`_walk_granules` with exact-integer accumulators."""
    first = None
    n_frames = 0
    big_values_sum = 0
    abs_sum = signed_sum = count1_abs = 0
    sf_sum = exp_sum = nonzero = 0
    reservoir_bytes = 0
    part23_bits = 0
    for hdr, mdb, gr, ch, g, d in _walk_granules(raw):
        if first is None:
            first = hdr
        if (gr, ch) == (0, 0):
            n_frames += 1
            reservoir_bytes += mdb
        big_values_sum += g["big_values"]
        abs_sum += d["abs_sum"]
        signed_sum += d["signed_sum"]
        count1_abs += d["count1_abs"]
        sf_sum += d["sf_sum"]
        exp_sum += d["exp_sum"]
        nonzero += d["nonzero"]
        part23_bits += g["part2_3_length"]
    return {
        "sample_rate_hz": first["rate"],
        "bitrate_kbps": first["kbps"],
        "channels": first["nch"],
        "n_frames": n_frames,
        "big_values_sum": big_values_sum,
        "spectral_abs_sum": abs_sum,
        "spectral_signed_sum": signed_sum,
        "count1_abs_sum": count1_abs,
        "scalefac_sum": sf_sum,
        "requant_exp_sum": exp_sum,
        "nonzero_lines": nonzero,
        "reservoir_bytes": reservoir_bytes,
        "part23_bits": part23_bits,
    }


_INT_COLS = ("sample_rate_hz", "bitrate_kbps", "channels", "n_frames",
             "big_values_sum", "spectral_abs_sum", "spectral_signed_sum",
             "count1_abs_sum", "scalefac_sum", "requant_exp_sum",
             "nonzero_lines", "reservoir_bytes", "part23_bits")

_SMALL_INT = {"sample_rate_hz", "bitrate_kbps", "channels", "n_frames"}


def decode_mp3_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow `mapInPandas` wrapper: one exact-integer feature row per
    payload; per-payload cost, embarrassingly parallel, no shuffle.
    Malformed or out-of-scope payloads quarantine into `decode_error`
    (named message) with NULL features — one bad payload never fails
    the batch (untrusted-crawl contract, same as FLAC/Vorbis)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "decode_error", *_INT_COLS)
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                try:
                    d = parse_mp3(bytes(payload))
                    for k in _INT_COLS:
                        out[k].append(d[k])
                    out["decode_error"].append(None)
                except (ValueError, IndexError, struct.error,
                        ZeroDivisionError) as e:
                    for k in _INT_COLS:
                        out[k].append(None)
                    out["decode_error"].append(str(e) or type(e).__name__)
            cols = {"doc_id": pd.Series(out["doc_id"], dtype="int64")}
            for k in _INT_COLS:
                dt = "Int32" if k in _SMALL_INT else "Int64"
                cols[k] = pd.Series(out[k], dtype=dt)
            cols["decode_error"] = pd.Series(
                out["decode_error"], dtype="object"
            )
            yield pd.DataFrame(cols)

    schema = ("doc_id long, "
              + ", ".join(
                  f"{k} {'int' if k in _SMALL_INT else 'long'}"
                  for k in _INT_COLS)
              + ", decode_error string")
    return df.select(
        df[id_col].cast("long").alias(id_col), payload_col
    ).mapInPandas(_run, schema=schema)


# ---------------------------------------------------------------------------
# Float synthesis: requantize -> alias reduction -> IMDCT-36 ->
# window -> overlap-add -> frequency inversion (ISO/IEC 11172-3
# §2.4.3.4). Everything below is FORMULA-derivable from the public
# spec — the Table B.9 alias coefficients are the spec's eight ci
# constants, the long-block IMDCT window is sin(pi/36 (i+1/2)), and
# the IMDCT basis is cos(pi/72 (2i+1+18)(2k+1)) — so a DuckDB oracle
# can recompute every output sample with its own trig in the same
# operation order. The one remaining synthesis stage, the 32-band
# polyphase filterbank, needs the 512-entry Table B.3 D window, which
# is a designed prototype filter with NO closed form — embedding it
# from memory would be unverifiable, so it stays an honest gate and
# this path emits SUBBAND-DOMAIN samples (the polyphase input).
# ---------------------------------------------------------------------------

import math

_ALIAS_CI = (-0.6, -0.535, -0.33, -0.185, -0.095, -0.041, -0.0142,
             -0.0037)  # Table B.9
_ALIAS_CS = tuple(1.0 / math.sqrt(1.0 + c * c) for c in _ALIAS_CI)
_ALIAS_CA = tuple(c / math.sqrt(1.0 + c * c) for c in _ALIAS_CI)

_IMDCT36 = None
_IMDCT_WIN = None


def _imdct36_matrix():
    """36x18 long-block IMDCT basis, window folded in:
    A[i, k] = cos(pi/72 (2i+1+18)(2k+1)) * sin(pi/36 (i+1/2))."""
    global _IMDCT36, _IMDCT_WIN
    if _IMDCT36 is None:
        import numpy as np
        i = np.arange(36.0)[:, None]
        k = np.arange(18.0)[None, :]
        _IMDCT_WIN = np.sin(math.pi / 36.0 * (np.arange(36.0) + 0.5))
        _IMDCT36 = (np.cos(math.pi / 72.0 * (2 * i + 1 + 18) * (2 * k + 1))
                    * _IMDCT_WIN[:, None])
    return _IMDCT36


def _requantize(d: dict) -> "object":
    """xr = sign(is) |is|^(4/3) 2^(E/4) over the decoded lines
    (§2.4.3.4), E the exact integer exponent parse_mp3 reports."""
    import numpy as np

    xr = np.zeros(576)
    sf = d["sf"]
    gg, mult, pre = d["gg"], d["mult"], d["pre"]
    bounds = _SFB_BOUNDS_44100
    band = 0
    for i in range(d["n_lines"]):
        while bounds[band + 1] <= i:
            band += 1
        v = d["spectrum"][i]
        if v == 0:
            continue
        sfac = sf[band] if band < 21 else 0
        e = (gg - 210) - mult * (sfac + pre * _PRETAB[band])
        mag = float(abs(v)) ** (4.0 / 3.0) * 2.0 ** (e / 4.0)
        xr[i] = mag if v > 0 else -mag
    return xr


def _alias_reduce(xr) -> None:
    """§2.4.3.4 butterflies across each of the 31 long-block subband
    boundaries, in place."""
    for sb in range(1, 32):
        base = 18 * sb
        for i in range(8):
            a = xr[base - 1 - i]
            b = xr[base + i]
            xr[base - 1 - i] = a * _ALIAS_CS[i] - b * _ALIAS_CA[i]
            xr[base + i] = b * _ALIAS_CS[i] + a * _ALIAS_CA[i]


def parse_mp3_synth(raw: bytes, grid: float = 1e4) -> dict:
    """Decode the stream and run the synthesis chain down to the
    32-subband time domain: per granule, requantize, alias-reduce,
    36-point IMDCT with the sin window, overlap-add with the previous
    granule's tail, and frequency-invert odd samples of odd subbands.
    Each output sample is quantized to a 1/grid lattice (half-up) so
    the readout is BIGINT-exact and DuckDB-replayable. Gates are
    exactly parse_mp3's (long blocks only — window_switching already
    gates short/mixed blocks upstream)."""
    import numpy as np

    A = _imdct36_matrix()
    first = None
    n_granules = 0
    prev: dict[int, object] = {}
    grid_sum = 0
    abs_grid_sum = 0
    peak_grid = 0
    inv_mask = np.ones((32, 18))
    inv_mask[1::2, 1::2] = -1.0
    for hdr, _mdb, gr, ch, _g, d in _walk_granules(raw):
        if first is None:
            first = hdr
        xr = _requantize(d)
        _alias_reduce(xr)
        z = (A @ xr.reshape(32, 18).T).T  # (32 subbands, 36 samples)
        tail = prev.get(ch)
        if tail is None:
            tail = np.zeros((32, 18))
        out = (z[:, :18] + tail) * inv_mask
        prev[ch] = z[:, 18:]
        q = np.floor(out * grid + 0.5).astype(np.int64)
        grid_sum += int(q.sum())
        abs_grid_sum += int(np.abs(q).sum())
        peak_grid = max(peak_grid, int(np.abs(q).max()))
        n_granules += 1
    return {
        "sample_rate_hz": first["rate"],
        "channels": first["nch"],
        "n_granules": n_granules,
        "n_sb_samples": n_granules * 32 * 18,
        "sb_grid_sum": grid_sum,
        "sb_abs_grid_sum": abs_grid_sum,
        "sb_peak_grid": peak_grid,
    }


_SYNTH_INT = ("sample_rate_hz", "channels", "n_granules",
              "n_sb_samples", "sb_grid_sum", "sb_abs_grid_sum",
              "sb_peak_grid")


def decode_mp3_synth_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Arrow `mapInPandas` wrapper over :func:`parse_mp3_synth` —
    same per-payload quarantine contract as decode_mp3_features."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                k: [] for k in ("doc_id", "decode_error", *_SYNTH_INT)
            }
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                try:
                    d = parse_mp3_synth(bytes(payload))
                    for k in _SYNTH_INT:
                        out[k].append(d[k])
                    out["decode_error"].append(None)
                except (ValueError, IndexError, struct.error,
                        OverflowError, ZeroDivisionError) as e:
                    for k in _SYNTH_INT:
                        out[k].append(None)
                    out["decode_error"].append(str(e) or type(e).__name__)
            cols = {"doc_id": pd.Series(out["doc_id"], dtype="int64")}
            for k in _SYNTH_INT:
                cols[k] = pd.Series(out[k], dtype="Int64")
            cols["decode_error"] = pd.Series(out["decode_error"],
                                             dtype="object")
            yield pd.DataFrame(cols)

    schema = ("doc_id long, "
              + ", ".join(f"{k} long" for k in _SYNTH_INT)
              + ", decode_error string")
    return df.select(
        df[id_col].cast("long").alias(id_col), payload_col
    ).mapInPandas(_run, schema=schema)
