"""H.264/AVC structural layer — public spec (ITU-T H.264 / ISO/IEC
14496-10): Annex B byte streams, NAL units, RBSP emulation
prevention, exp-Golomb coding, SPS/PPS, IDR slice headers, and REAL
pixel decode for I_PCM macroblocks.

H.264 is the web's dominant video codec; its entropy-coded residual
paths (CAVLC/CABAC) rest on large published code tables that cannot
be verified from memory, so they are honest named gates here (the
Table-B.3 / libav discipline). Everything structural — which is what
crawl pipelines need to demux, validate and fingerprint video — is
implemented for real:

- **Annex B**: 3- and 4-byte start-code scanning into NAL units;
- **NAL**: forbidden-zero check, nal_ref_idc, nal_unit_type; RBSP
  extraction with 0x000003 emulation-prevention UNESCAPING;
- **exp-Golomb**: ue(v)/se(v) on an MSB-first bit reader;
- **SPS**: profile/constraints/level, seq_parameter_set_id, high-
  profile chroma/bit-depth fields when present, log2_max_frame_num,
  pic_order_cnt_type (0/2), max_num_ref_frames, gaps flag,
  pic_width_in_mbs / pic_height_in_map_units, frame_mbs_only,
  direct_8x8, frame cropping, VUI presence;
- **PPS**: ids, entropy_coding_mode (CABAC -> named gate),
  slice groups (gate), init QP, deblocking-control flags;
- **IDR slice header** (I slices, POC type 0/2): first_mb, type,
  frame_num, idr_pic_id, pic_order_cnt_lsb, dec_ref_pic_marking,
  slice_qp_delta;
- **macroblock layer**: mb_type; I_PCM (mb_type 25 in I slices) —
  pcm_alignment_zero_bits, then raw 256 luma + 2x64 chroma samples
  (8-bit 4:2:0) — decoded to exact pixel sums. Residual-coded
  macroblock types raise the CAVLC gate by name.

The fixture encoder plants PCM sample runs containing 0x000001
patterns so the emulation-prevention escape/unescape path is
genuinely exercised. Untrusted-input discipline matches the other
byte paths. No H.264 surface exists in the reference repo
(mydatastack/google-analytics-to-s3).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)
from .payload_memo import dedup_payload_batches


class _BitsMSB:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("H.264 RBSP truncated")
            out = (out << 1) | ((self.data[byte]
                                 >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return out

    def ue(self) -> int:
        zeros = 0
        while self.read(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("exp-Golomb prefix exceeds 32 bits")
        return (1 << zeros) - 1 + (self.read(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)

    def byte_align(self) -> None:
        while self.pos & 7:
            if self.read(1) != 0:
                raise ValueError("pcm alignment bits not zero")


def split_annexb(raw: bytes) -> "list[bytes]":
    """Split an Annex B stream on 00 00 (00) 01 start codes."""
    nals: list[bytes] = []
    i = raw.find(b"\x00\x00\x01")
    if i < 0:
        raise ValueError("H.264 start code missing")
    while i >= 0:
        start = i + 3
        j = raw.find(b"\x00\x00\x01", start)
        end = j if j >= 0 else len(raw)
        # trim trailing zero bytes that belong to the next start code
        while end > start and j >= 0 and raw[end - 1] == 0:
            end -= 1
        nal = raw[start:end]
        if nal:
            nals.append(nal)
        i = j
        if len(nals) > 100_000:
            raise ValueError("NAL count exceeds bound")
    return nals


def rbsp_unescape(data: bytes) -> bytes:
    """Strip emulation_prevention_three_byte (00 00 03 -> 00 00)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        if i + 2 < n and data[i] == 0 and data[i + 1] == 0 \
                and data[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(data[i])
            i += 1
    return bytes(out)


def parse_sps(rbsp: bytes) -> dict:
    br = _BitsMSB(rbsp)
    profile = br.read(8)
    br.read(8)  # constraint flags + reserved
    level = br.read(8)
    sps = {"profile_idc": profile, "level_idc": level,
           "sps_id": br.ue(), "chroma_format_idc": 1,
           "bit_depth_luma": 8}
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        sps["chroma_format_idc"] = br.ue()
        if sps["chroma_format_idc"] == 3:
            br.read(1)
        sps["bit_depth_luma"] = br.ue() + 8
        br.ue()  # bit_depth_chroma
        br.read(1)  # qpprime
        if br.read(1):  # scaling matrix
            raise ValueError("SPS scaling matrices unsupported")
    sps["log2_max_frame_num"] = br.ue() + 4
    poc_type = br.ue()
    sps["pic_order_cnt_type"] = poc_type
    if poc_type == 0:
        sps["log2_max_poc_lsb"] = br.ue() + 4
    elif poc_type == 1:
        raise ValueError("pic_order_cnt_type 1 unsupported")
    sps["max_num_ref_frames"] = br.ue()
    br.read(1)  # gaps_in_frame_num
    w_mbs = br.ue() + 1
    h_map = br.ue() + 1
    frame_mbs_only = br.read(1)
    if not frame_mbs_only:
        raise ValueError("interlaced (field) coding unsupported")
    br.read(1)  # direct_8x8
    crop = br.read(1)
    cl = cr = ct = cb = 0
    if crop:
        cl, cr, ct, cb = br.ue(), br.ue(), br.ue(), br.ue()
    sps["vui_present"] = br.read(1)
    sps["width"] = w_mbs * 16 - 2 * (cl + cr)
    sps["height"] = h_map * 16 - 2 * (ct + cb)
    sps["width_mbs"] = w_mbs
    sps["height_mbs"] = h_map
    return sps


def parse_pps(rbsp: bytes) -> dict:
    br = _BitsMSB(rbsp)
    pps = {"pps_id": br.ue(), "sps_id": br.ue(),
           "entropy_coding_mode": br.read(1)}
    br.read(1)  # bottom_field_pic_order
    if br.ue() != 0:  # num_slice_groups_minus1
        raise ValueError("slice groups (FMO) unsupported")
    pps["num_ref_idx_l0"] = br.ue() + 1
    pps["num_ref_idx_l1"] = br.ue() + 1
    br.read(1)  # weighted_pred
    br.read(2)  # weighted_bipred
    pps["pic_init_qp"] = br.se() + 26
    br.se()  # pic_init_qs
    br.se()  # chroma_qp_offset
    pps["deblocking_filter_control"] = br.read(1)
    br.read(1)  # constrained_intra_pred
    br.read(1)  # redundant_pic_cnt
    return pps


def decode_idr_ipcm(raw: bytes) -> dict:
    """Decode an Annex B stream whose IDR slice is all-I_PCM: returns
    sps fields plus exact luma/chroma sample sums."""
    sps = None
    pps = None
    out = {"n_nals": 0, "luma_sum": 0, "chroma_sum": 0, "n_mbs": 0}
    for nal in split_annexb(raw):
        out["n_nals"] += 1
        hdr = nal[0]
        if hdr & 0x80:
            raise ValueError("NAL forbidden_zero_bit set")
        ntype = hdr & 0x1F
        rbsp = rbsp_unescape(nal[1:])
        if ntype == 7:
            sps = parse_sps(rbsp)
        elif ntype == 8:
            pps = parse_pps(rbsp)
        elif ntype == 5:  # IDR slice
            if sps is None or pps is None:
                raise ValueError("IDR slice before SPS/PPS")
            if pps["entropy_coding_mode"]:
                raise ValueError("CABAC entropy coding unsupported")
            if sps["chroma_format_idc"] != 1 \
                    or sps["bit_depth_luma"] != 8:
                raise ValueError("only 8-bit 4:2:0 I_PCM supported")
            br = _BitsMSB(rbsp)
            first_mb = br.ue()
            slice_type = br.ue()
            if slice_type % 5 != 2:
                raise ValueError("non-I slice unsupported")
            if br.ue() != pps["pps_id"]:
                raise ValueError("slice references unknown PPS")
            br.read(sps["log2_max_frame_num"])  # frame_num
            br.ue()  # idr_pic_id
            if sps["pic_order_cnt_type"] == 0:
                br.read(sps["log2_max_poc_lsb"])
            # dec_ref_pic_marking (IDR form)
            br.read(1)
            br.read(1)
            br.se()  # slice_qp_delta
            if pps["deblocking_filter_control"]:
                if br.ue() != 1:
                    raise ValueError(
                        "deblocking must be disabled for exact PCM")
                # disable_deblocking_filter_idc == 1: no alpha/beta
            n_mbs = sps["width_mbs"] * sps["height_mbs"]
            for mb in range(first_mb, n_mbs):
                mb_type = br.ue()
                if mb_type != 25:
                    raise ValueError(
                        "CAVLC residual macroblocks unsupported "
                        f"(mb_type {mb_type}; only I_PCM decodes)")
                br.byte_align()
                for _ in range(256):
                    out["luma_sum"] += br.read(8)
                for _ in range(128):
                    out["chroma_sum"] += br.read(8)
                out["n_mbs"] += 1
    if sps is None or out["n_mbs"] == 0:
        raise ValueError("no decodable IDR I_PCM slice present")
    out.update(width=sps["width"], height=sps["height"],
               profile=sps["profile_idc"], level=sps["level_idc"])
    return out


H264_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("n_mbs", IntegerType()),
    StructField("n_nals", IntegerType()),
    StructField("profile", IntegerType()),
    StructField("level", IntegerType()),
    StructField("luma_sum", LongType()),
    StructField("chroma_sum", LongType()),
    StructField("decode_error", StringType()),
])


def decode_h264_ipcm(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow ``mapInPandas`` over :func:`decode_idr_ipcm`."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in (
                "doc_id", "width", "height", "n_mbs", "n_nals",
                "profile", "level", "luma_sum", "chroma_sum",
                "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    m = decode_idr_ipcm(bytes(payload))
                    for k in ("width", "height", "n_mbs", "n_nals",
                              "profile", "level", "luma_sum",
                              "chroma_sum"):
                        rows[k].append(m[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError) as e:
                    for k in ("width", "height", "n_mbs", "n_nals",
                              "profile", "level", "luma_sum",
                              "chroma_sum"):
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k], dtype="Int32")
                   for k in ("width", "height", "n_mbs", "n_nals",
                             "profile", "level")},
                "luma_sum": pd.Series(rows["luma_sum"], dtype="Int64"),
                "chroma_sum": pd.Series(rows["chroma_sum"],
                                        dtype="Int64"),
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        dedup_payload_batches(_decode, id_col, payload_col),
        schema=H264_SCHEMA
    )


def parse_avcc(data: bytes) -> dict:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.3.3.1): the
    CodecPrivate / stsd 'avcC' box carrying SPS/PPS out-of-band plus
    the NAL length-prefix size used by MP4/Matroska samples."""
    if len(data) < 7 or data[0] != 1:
        raise ValueError("avcC configurationVersion != 1")
    out = {"profile": data[1], "level": data[3],
           "nal_length_size": (data[4] & 3) + 1,
           "sps": [], "pps": []}
    pos = 5
    n_sps = data[pos] & 0x1F
    pos += 1
    for _ in range(n_sps):
        ln = int.from_bytes(data[pos:pos + 2], "big")
        pos += 2
        if pos + ln > len(data):
            raise ValueError("avcC SPS overruns record")
        out["sps"].append(data[pos:pos + ln])
        pos += ln
    if pos >= len(data):
        raise ValueError("avcC missing PPS count")
    n_pps = data[pos]
    pos += 1
    for _ in range(n_pps):
        ln = int.from_bytes(data[pos:pos + 2], "big")
        pos += 2
        if pos + ln > len(data):
            raise ValueError("avcC PPS overruns record")
        out["pps"].append(data[pos:pos + ln])
        pos += ln
    return out


def avcc_to_annexb(avcc: dict, samples: "list[bytes]") -> bytes:
    """Rewrap out-of-band parameter sets + length-prefixed sample
    NALs as one Annex B stream for :func:`decode_idr_ipcm`."""
    size = avcc["nal_length_size"]
    out = bytearray()
    for ps in avcc["sps"] + avcc["pps"]:
        out += b"\x00\x00\x00\x01" + ps
    for sample in samples:
        pos = 0
        while pos < len(sample):
            if pos + size > len(sample):
                raise ValueError("truncated NAL length prefix")
            ln = int.from_bytes(sample[pos:pos + size], "big")
            pos += size
            if pos + ln > len(sample):
                raise ValueError("NAL overruns its sample")
            out += b"\x00\x00\x00\x01" + sample[pos:pos + ln]
            pos += ln
    return bytes(out)
