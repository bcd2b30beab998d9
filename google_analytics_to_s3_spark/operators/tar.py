"""TAR (POSIX ustar) reader + the WebDataset sample convention — the
standard shard format of image/text training pipelines (a WebDataset
shard is a tar whose members group into samples by basename:
``<key>.jpg`` + ``<key>.cls`` + ``<key>.json`` ...).

Real byte path from the PUBLIC ustar layout only:

- 512-byte headers: name/prefix split, octal size/mtime fields
  (space- and NUL-terminated both accepted), typeflag, the ustar
  magic, and the HEADER CHECKSUM (sum of header bytes with the
  chksum field blanked to spaces) VERIFIED on every member;
- member data padded to 512-byte blocks; end-of-archive = two zero
  blocks (tolerated absent at EOF);
- the WebDataset grouping: members sorted into samples by the
  basename before the first dot; ``decode_webdataset`` then runs the
  REAL baseline-JPEG pipeline on ``.jpg`` members and exact integer
  parses on ``.cls`` labels, giving one row per sample — the shape
  an image-text training loader consumes.

GNU long-name/long-link extensions (typeflag L/K) and PAX extended
headers (x per-file, g global — decimal-length ``key=value\\n``
records with path/size overrides) read for REAL as of r10s3,
cross-validated against archives CPython's tarfile writes in both
GNU_FORMAT and PAX_FORMAT. Honest gates (named ValueError,
per-payload quarantine in the Spark wrappers): sparse members (S)
and non-regular-file members other than directories (which are
skipped). No TAR surface exists in the reference repo
(beyond-reference LLM-pipeline surface, SURVEY §2.12).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from .fuse import id_payload_projection
from .payload_memo import dedup_payload_batches

__all__ = ["parse_tar", "tar_features", "extract_tar_features",
           "decode_webdataset"]


def _octal(field: bytes) -> int:
    s = field.split(b"\x00")[0].strip(b" \x00")
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as e:
        raise ValueError("malformed octal field") from e


def parse_tar(raw: bytes) -> list[dict]:
    """Archive walk -> [{name, size, typeflag, data}] for regular
    files (directories skipped); checksum-verified headers."""
    members = []
    pos = 0
    zero_blocks = 0
    pending_name = None
    pending_pax = None
    global_pax: dict[str, str] = {}
    while pos + 512 <= len(raw):
        hdr = raw[pos:pos + 512]
        if hdr == b"\x00" * 512:
            zero_blocks += 1
            pos += 512
            if zero_blocks >= 2:
                break
            continue
        zero_blocks = 0
        magic = hdr[257:263]
        if magic not in (b"ustar\x00", b"ustar "):
            raise ValueError("ustar magic missing")
        recorded = _octal(hdr[148:156])
        summed = sum(hdr[:148]) + 8 * 0x20 + sum(hdr[156:])
        if recorded != summed:
            raise ValueError(
                f"tar header checksum mismatch at offset {pos}"
            )
        typeflag = chr(hdr[156])
        if typeflag == "S":
            raise ValueError("sparse tar members unsupported")
        size = _octal(hdr[124:136])
        data_start = pos + 512
        if data_start + size > len(raw):
            raise ValueError("tar member data overruns the archive")
        data = raw[data_start:data_start + size]
        if typeflag == "L":
            # GNU long name: the data block names the NEXT member
            pending_name = data.split(b"\x00")[0].decode(
                "utf-8", "replace")
            pos = data_start + ((size + 511) // 512) * 512
            continue
        if typeflag == "K":
            # GNU long linkname: applies to the next link; consumed
            pos = data_start + ((size + 511) // 512) * 512
            continue
        if typeflag in ("x", "g"):
            # PAX records: "<len> key=value\n", len counts itself
            recs: dict[str, str] = {}
            at = 0
            while at < len(data):
                sp = data.find(b" ", at)
                if sp < 0:
                    raise ValueError("PAX record length delimiter missing")
                nl_len = int(data[at:sp])
                # prefix width = bytes actually consumed by the length
                # field + the space (sp - at + 1) — NOT len(str(nl_len)),
                # which misaligns on zero-padded fields like b"027 k=v\n"
                prefix = sp - at + 1
                if nl_len <= prefix + 1 or at + nl_len > len(data):
                    raise ValueError("PAX record length invalid")
                rec = data[sp + 1:at + nl_len - 1]
                key, _, value = rec.decode("utf-8",
                                           "replace").partition("=")
                recs[key] = value
                at += nl_len
            if typeflag == "x":
                pending_pax = recs
            else:
                global_pax.update(recs)
            pos = data_start + ((size + 511) // 512) * 512
            continue
        name = hdr[0:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8",
                                                       "replace")
        if prefix:
            name = prefix + "/" + name
        eff = dict(global_pax)
        if pending_pax is not None:
            eff.update(pending_pax)
            pending_pax = None
        if pending_name is not None:
            name = pending_name
            pending_name = None
        if "path" in eff:
            name = eff["path"]
        if "size" in eff:
            new_size = int(eff["size"])
            if data_start + new_size > len(raw):
                raise ValueError("PAX size overruns the archive")
            size = new_size
            data = raw[data_start:data_start + size]
        if typeflag in ("0", "\x00"):
            members.append({
                "name": name, "size": size, "typeflag": typeflag,
                "data": data,
            })
        # directories ('5') and links carry no data blocks the way
        # regular members do (size 0 by convention) — skip them
        pos = data_start + ((size + 511) // 512) * 512
    if not members:
        raise ValueError("no regular tar members")
    return members


def tar_features(raw: bytes) -> dict:
    """Per-archive integer readout."""
    members = parse_tar(raw)
    return {
        "n_members": len(members),
        "size_sum": sum(m["size"] for m in members),
        "byte_sum": sum(sum(m["data"]) for m in members),
        "name_len_sum": sum(len(m["name"]) for m in members),
    }


_TAR_INT = ("n_members", "size_sum", "byte_sum", "name_len_sum")


def extract_tar_features(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow `mapInPandas` wrapper over :func:`tar_features`."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", *_TAR_INT, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                out["doc_id"].append(doc_id)
                try:
                    d = tar_features(bytes(payload))
                    for k in _TAR_INT:
                        out[k].append(d[k])
                    out["decode_error"].append(None)
                except (ValueError, IndexError, struct.error) as e:
                    for k in _TAR_INT:
                        out[k].append(None)
                    out["decode_error"].append(str(e) or
                                               type(e).__name__)
            cols = {"doc_id": pd.Series(out["doc_id"], dtype="int64")}
            for k in _TAR_INT:
                cols[k] = pd.Series(out[k], dtype="Int64")
            cols["decode_error"] = pd.Series(out["decode_error"],
                                             dtype="object")
            yield pd.DataFrame(cols)

    schema = ("doc_id long, " + ", ".join(f"{k} long" for k in _TAR_INT)
              + ", decode_error string")
    return id_payload_projection(df, id_col, payload_col).mapInPandas(
        dedup_payload_batches(_run, id_col, payload_col), schema=schema)


def decode_webdataset(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """WebDataset shard -> one row per SAMPLE: members grouped by the
    basename before the first dot; ``.jpg`` decoded by the REAL T.81
    baseline pipeline (width/height/exact pixel sum), ``.cls`` parsed
    as an integer label, ``.txt``/``.json`` contributing byte
    lengths. Shards that fail to parse contribute zero rows (audit
    errors via extract_tar_features)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from .multimodal import _parse_jpeg

        for pdf in batches:
            out: dict[str, list] = {k: [] for k in (
                "doc_id", "sample_key", "n_parts", "label",
                "jpeg_width", "jpeg_height", "jpeg_y_sum",
                "text_bytes")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    members = parse_tar(bytes(payload))
                except (ValueError, IndexError):
                    continue
                samples: dict[str, dict] = {}
                for m in members:
                    base = m["name"].split("/")[-1]
                    if "." not in base:
                        continue
                    key, ext = base.split(".", 1)
                    samples.setdefault(key, {})[ext] = m["data"]
                for key in sorted(samples):
                    parts = samples[key]
                    out["doc_id"].append(doc_id)
                    out["sample_key"].append(key)
                    out["n_parts"].append(len(parts))
                    label = None
                    if "cls" in parts:
                        try:
                            label = int(parts["cls"].decode("ascii"))
                        except (ValueError, UnicodeDecodeError):
                            label = None
                    out["label"].append(label)
                    w = h = ys = None
                    if "jpg" in parts:
                        try:
                            w, h, _c, px = _parse_jpeg(parts["jpg"])
                            ys = int(px.sum(dtype=np.int64))
                        except ValueError:
                            w = h = ys = None
                    out["jpeg_width"].append(w)
                    out["jpeg_height"].append(h)
                    out["jpeg_y_sum"].append(ys)
                    out["text_bytes"].append(
                        sum(len(v) for k2, v in parts.items()
                            if k2 in ("txt", "json")))
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "sample_key": pd.Series(out["sample_key"],
                                        dtype="object"),
                "n_parts": pd.Series(out["n_parts"], dtype="int64"),
                "label": pd.Series(out["label"], dtype="Int64"),
                "jpeg_width": pd.Series(out["jpeg_width"],
                                        dtype="Int32"),
                "jpeg_height": pd.Series(out["jpeg_height"],
                                         dtype="Int32"),
                "jpeg_y_sum": pd.Series(out["jpeg_y_sum"],
                                        dtype="Int64"),
                "text_bytes": pd.Series(out["text_bytes"],
                                        dtype="int64"),
            })

    return id_payload_projection(df, id_col, payload_col).mapInPandas(
        dedup_payload_batches(_run, id_col, payload_col),
        schema=("doc_id long, sample_key string, n_parts long, "
                "label long, jpeg_width int, jpeg_height int, "
                "jpeg_y_sum long, text_bytes long"),
    )
