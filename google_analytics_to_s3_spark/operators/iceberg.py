"""Apache Iceberg snapshot walking — public Iceberg table spec
(iceberg.apache.org/spec): table-metadata JSON → manifest list
(Avro) → manifest files (Avro) → live data-file inventory.

Lakehouse tables don't list directories; readers resolve the current
snapshot through a metadata chain.  This operator walks that chain
with the engine's own byte paths — JSON (stdlib), the tar bundle
walk (operators/tar.py) standing in for the object store's key space,
and the Avro container reader (operators/avro.py) for manifest lists
and manifests:

- ``metadata.json``: ``current-snapshot-id`` resolved against the
  ``snapshots`` array; the winning snapshot's ``manifest-list`` key.
- Manifest list entries (Avro records): ``manifest_path`` +
  ``manifest_length`` per manifest.
- Manifest entries (Avro records): ``status`` (0 EXISTING / 1 ADDED
  / 2 DELETED) and the nested ``data_file`` record (``file_path``,
  ``record_count``, ``file_size_in_bytes``).  DELETED entries drop
  out of the live inventory, exactly like a real scan planner.

The Avro schemas here are the spec's field subset sufficient for
scan planning; extra fields pass through the schema-directed reader
untouched.  Missing keys, dangling snapshot ids, and manifest-length
mismatches raise named ``ValueError``s (quarantined by the wrapper).
"""

from __future__ import annotations

import json
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

from .avro import avro_decode_container
from .tar import parse_tar
from .payload_memo import dedup_payload_batches

__all__ = ["parse_iceberg_snapshot", "decode_iceberg_snapshot",
           "parse_iceberg_scan", "decode_iceberg_scan",
           "parse_iceberg_scan_deletes", "decode_iceberg_scan_deletes",
           "parse_iceberg_scan_eq", "decode_iceberg_scan_eq",
           "parse_iceberg_metrics_prune",
           "decode_iceberg_metrics_prune",
           "parse_iceberg_time_travel", "decode_iceberg_time_travel",
           "murmur3_32", "iceberg_bucket",
           "parse_iceberg_bucket_prune", "decode_iceberg_bucket_prune",
           "iceberg_truncate", "parse_iceberg_truncate_prune",
           "decode_iceberg_truncate_prune",
           "parse_iceberg_day_prune", "decode_iceberg_day_prune"]


def parse_iceberg_snapshot(bundle: bytes) -> dict:
    """Walk an Iceberg metadata bundle (tar of metadata.json +
    manifest-list/manifest Avro files) to the live data-file set."""
    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    try:
        meta = json.loads(meta_raw)
    except json.JSONDecodeError as e:
        raise ValueError(f"iceberg: bad metadata JSON ({e})") from None
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    ml_key = snap.get("manifest-list")
    ml_raw = files.get(ml_key)
    if ml_raw is None:
        raise ValueError(f"iceberg: manifest list {ml_key!r} missing")
    _, ml_entries = avro_decode_container(ml_raw)
    n_live = n_deleted = 0
    total_records = total_bytes = 0
    n_manifests = 0
    for entry in ml_entries:
        path = entry.get("manifest_path")
        man_raw = files.get(path)
        if man_raw is None:
            raise ValueError(f"iceberg: manifest {path!r} missing")
        if entry.get("manifest_length") not in (None, len(man_raw)):
            raise ValueError("iceberg: manifest length mismatch")
        n_manifests += 1
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            status = me.get("status")
            df = me.get("data_file") or {}
            if status == 2:
                n_deleted += 1
                continue
            if status not in (0, 1):
                raise ValueError(f"iceberg: bad entry status {status!r}")
            n_live += 1
            total_records += int(df.get("record_count") or 0)
            total_bytes += int(df.get("file_size_in_bytes") or 0)
    return {
        "snapshot_id": cur,
        "n_manifests": n_manifests,
        "n_live_files": n_live,
        "n_deleted_files": n_deleted,
        "total_records": total_records,
        "total_bytes": total_bytes,
    }


ICEBERG_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("snapshot_id", LongType()),
    StructField("n_manifests", IntegerType()),
    StructField("n_live_files", IntegerType()),
    StructField("n_deleted_files", IntegerType()),
    StructField("total_records", LongType()),
    StructField("total_bytes", LongType()),
    StructField("decode_error", StringType()),
])


def decode_iceberg_snapshot(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_snapshot`; per-payload quarantine, no
    shuffle."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("snapshot_id", "n_manifests", "n_live_files",
                "n_deleted_files", "total_records", "total_bytes")
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    m = parse_iceberg_snapshot(bytes(payload))
                    for k in cols:
                        rows[k].append(m[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, TypeError,
                        AttributeError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "snapshot_id": pd.Series(rows["snapshot_id"],
                                         dtype="Int64"),
                "n_manifests": pd.Series(rows["n_manifests"],
                                         dtype="Int32"),
                "n_live_files": pd.Series(rows["n_live_files"],
                                          dtype="Int32"),
                "n_deleted_files": pd.Series(rows["n_deleted_files"],
                                             dtype="Int32"),
                "total_records": pd.Series(rows["total_records"],
                                           dtype="Int64"),
                "total_bytes": pd.Series(rows["total_bytes"],
                                         dtype="Int64"),
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        dedup_payload_batches(_run, id_col, payload_col),
        schema=ICEBERG_SCHEMA)


def parse_iceberg_scan(bundle: bytes, column: str) -> dict:
    """The full lakehouse read path in one walk: resolve the current
    snapshot (metadata JSON), read Avro manifests, and for every LIVE
    data file open its REAL parquet bytes — validating the manifest's
    ``record_count`` against the footer and materializing ``column``
    through the raw page reader (operators/parquet_raw).  Five engine
    byte paths chained: tar, JSON, Avro, Thrift footers, RLE/PLAIN
    pages (snappy/zstd through our own codecs)."""
    from .parquet_raw import parquet_file_meta, parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    n_live = 0
    records_manifest = 0
    records_footer = 0
    mismatches = 0
    value_sum = 0
    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            path = df.get("file_path")
            blob = files.get(path)
            if blob is None:
                raise ValueError(f"iceberg: data file {path!r} missing")
            n_live += 1
            rc = int(df.get("record_count") or 0)
            records_manifest += rc
            fm = parquet_file_meta(blob)
            records_footer += fm["num_rows"]
            if fm["num_rows"] != rc:
                mismatches += 1
            vals = parquet_read_column(blob, column)
            value_sum += sum(v for v in vals if v is not None)
    return {
        "snapshot_id": cur,
        "n_live_files": n_live,
        "records_manifest": records_manifest,
        "records_footer": records_footer,
        "n_mismatches": mismatches,
        "value_sum": value_sum,
    }


ICEBERG_SCAN_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("snapshot_id", LongType()),
    StructField("n_live_files", IntegerType()),
    StructField("records_manifest", LongType()),
    StructField("records_footer", LongType()),
    StructField("n_mismatches", IntegerType()),
    StructField("value_sum", LongType()),
    StructField("decode_error", StringType()),
])


def decode_iceberg_scan(
    df: DataFrame, column: str,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over :func:`parse_iceberg_scan`;
    per-payload quarantine, no shuffle."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("snapshot_id", "n_live_files", "records_manifest",
                "records_footer", "n_mismatches", "value_sum")
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    m = parse_iceberg_scan(bytes(payload), column)
                    for k in cols:
                        rows[k].append(m[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, TypeError,
                        AttributeError, KeyError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                "snapshot_id": pd.Series(rows["snapshot_id"],
                                         dtype="Int64"),
                "n_live_files": pd.Series(rows["n_live_files"],
                                          dtype="Int32"),
                "records_manifest": pd.Series(rows["records_manifest"],
                                              dtype="Int64"),
                "records_footer": pd.Series(rows["records_footer"],
                                            dtype="Int64"),
                "n_mismatches": pd.Series(rows["n_mismatches"],
                                          dtype="Int32"),
                "value_sum": pd.Series(rows["value_sum"], dtype="Int64"),
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        dedup_payload_batches(_run, id_col, payload_col),
        schema=ICEBERG_SCAN_SCHEMA)


# --------------------------------------------------------------------------
# Format v2: positional row-level deletes (r12).
#
# Iceberg v2 snapshots carry TWO kinds of manifests (spec §Manifests):
# the manifest-list entry's ``content`` field is 0 for data manifests
# and 1 for delete manifests.  A position-delete file is itself a
# real parquet file with columns ``file_path`` (string) and ``pos``
# (long), sorted by (file_path, pos); at scan time a reader drops the
# listed row positions from the matching data files.  Equality
# deletes (content=2 data_file entries) are handled by
# parse_iceberg_scan_eq below (single and composite keys).


def parse_iceberg_scan_deletes(bundle: bytes, column: str) -> dict:
    """The v2 read path: resolve the snapshot, split manifests by
    ``content``, build the position-delete map from REAL parquet
    delete files (engine's own raw reader), then scan live data files
    with deleted positions dropped."""
    from .parquet_raw import parquet_file_meta, parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    data_manifests: list[bytes] = []
    delete_manifests: list[bytes] = []
    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        content = entry.get("content") or 0
        if content == 0:
            data_manifests.append(man_raw)
        elif content == 1:
            delete_manifests.append(man_raw)
        else:
            raise ValueError(f"iceberg: manifest content {content} gated")
    # pass 1: position-delete map (path -> set of row positions)
    deletes: dict[str, set[int]] = {}
    n_delete_files = 0
    n_positions = 0
    for man_raw in delete_manifests:
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            blob = files.get(df.get("file_path"))
            if blob is None:
                raise ValueError("iceberg: delete file missing")
            n_delete_files += 1
            paths = parquet_read_column(blob, "file_path")
            poss = parquet_read_column(blob, "pos")
            if len(paths) != len(poss):
                raise ValueError("iceberg: ragged position-delete file")
            rc = df.get("record_count")
            if rc is not None and int(rc) != len(paths):
                raise ValueError("iceberg: delete record_count mismatch")
            for p, pos in zip(paths, poss):
                if p is None or pos is None:
                    raise ValueError("iceberg: null in position delete")
                key = p.decode() if isinstance(p, bytes) else p
                deletes.setdefault(key, set()).add(int(pos))
                n_positions += 1
    # pass 2: scan live data files, dropping deleted positions
    n_data_files = 0
    records_after = 0
    value_sum = 0
    n_deleted_applied = 0
    for man_raw in data_manifests:
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            path = df.get("file_path")
            blob = files.get(path)
            if blob is None:
                raise ValueError(f"iceberg: data file {path!r} missing")
            n_data_files += 1
            fm = parquet_file_meta(blob)
            if fm["num_rows"] != int(df.get("record_count") or 0):
                raise ValueError("iceberg: record_count mismatch")
            dead = deletes.get(path, ())
            vals = parquet_read_column(blob, column)
            for i, v in enumerate(vals):
                if i in dead:
                    n_deleted_applied += 1
                    continue
                records_after += 1
                if v is not None:
                    value_sum += v
    return {
        "snapshot_id": cur,
        "n_data_files": n_data_files,
        "n_delete_files": n_delete_files,
        "n_positions": n_positions,
        "n_deleted_applied": n_deleted_applied,
        "records_after": records_after,
        "value_sum": value_sum,
    }


ICEBERG_DELETES_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("snapshot_id", LongType()),
    StructField("n_data_files", IntegerType()),
    StructField("n_delete_files", IntegerType()),
    StructField("n_positions", LongType()),
    StructField("n_deleted_applied", LongType()),
    StructField("records_after", LongType()),
    StructField("value_sum", LongType()),
    StructField("decode_error", StringType()),
])


def decode_iceberg_scan_deletes(
    df: DataFrame, column: str,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_scan_deletes`; per-payload quarantine, no
    shuffle."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("snapshot_id", "n_data_files", "n_delete_files",
                "n_positions", "n_deleted_applied", "records_after",
                "value_sum")
        i32 = {"n_data_files", "n_delete_files"}
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    m = parse_iceberg_scan_deletes(bytes(payload), column)
                    for k in cols:
                        rows[k].append(m[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, TypeError,
                        AttributeError, KeyError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k],
                                dtype="Int32" if k in i32 else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        dedup_payload_batches(_run, id_col, payload_col),
        schema=ICEBERG_DELETES_SCHEMA)


def parse_iceberg_scan_eq(bundle: bytes, column: str) -> dict:
    """Iceberg v2 EQUALITY deletes: delete manifests whose entries
    carry ``content=2`` data files list VALUES (columns named by
    ``equality_ids``, resolved through the table schema's field ids —
    single OR composite keys, the Flink-CDC default shape); a data
    row is deleted when its key tuple matches — but only in data
    files whose ``sequence_number`` is strictly LOWER than the delete
    file's (the spec's ordering rule).  A null ``sequence_number`` on
    a manifest entry inherits the manifest-list entry's sequence
    number, per the v2 inheritance rule — never defaulted to 0, which
    would over-apply equality deletes."""
    from .parquet_raw import parquet_file_meta, parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    field_names = {f.get("id"): f.get("name")
                   for f in (meta.get("schema") or {}).get("fields", [])}
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    data_entries: list = []
    # (delete_seq, key column names, set of key value tuples)
    eq_deletes: list = []
    n_delete_files = 0
    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        content = entry.get("content") or 0
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            seq = me.get("sequence_number")
            if seq is None:
                # v2 inheritance: ADDED entries written with a null
                # sequence number take the manifest's own.
                seq = entry.get("sequence_number")
            if seq is None:
                raise ValueError(
                    "iceberg: no sequence number on entry or manifest")
            if content == 0:
                data_entries.append((seq, df))
                continue
            if df.get("content") != 2:
                raise ValueError(
                    "iceberg: non-equality entry in delete manifest "
                    "gated here (use parse_iceberg_scan_deletes)")
            ids = df.get("equality_ids") or []
            if not ids:
                raise ValueError("iceberg: delete file missing "
                                 "equality_ids")
            key_cols = []
            for fid in ids:
                col = field_names.get(fid)
                if col is None:
                    raise ValueError("iceberg: equality field id unknown")
                key_cols.append(col)
            blob = files.get(df.get("file_path"))
            if blob is None:
                raise ValueError("iceberg: delete file missing")
            n_delete_files += 1
            key_vals = [parquet_read_column(blob, c) for c in key_cols]
            if len({len(v) for v in key_vals}) > 1:
                raise ValueError("iceberg: ragged equality delete file")
            tuples = set(zip(*key_vals))
            if any(None in t for t in tuples):
                raise ValueError("iceberg: null equality delete value")
            eq_deletes.append((seq, tuple(key_cols), tuples))
    n_data_files = 0
    n_eq_deleted = 0
    records_after = 0
    value_sum = 0
    for seq, df in data_entries:
        path = df.get("file_path")
        blob = files.get(path)
        if blob is None:
            raise ValueError(f"iceberg: data file {path!r} missing")
        n_data_files += 1
        fm = parquet_file_meta(blob)
        if fm["num_rows"] != int(df.get("record_count") or 0):
            raise ValueError("iceberg: record_count mismatch")
        live = [(cols, s) for dseq, cols, s in eq_deletes if seq < dseq]
        needed = {c for cols, _ in live for c in cols}
        needed.add(column)
        col_data = {c: parquet_read_column(blob, c) for c in needed}
        vals = col_data[column]
        for i, v in enumerate(vals):
            dead = any(
                tuple(col_data[c][i] for c in cols) in s
                for cols, s in live)
            if dead:
                n_eq_deleted += 1
                continue
            records_after += 1
            if v is not None:
                value_sum += v
    return {
        "snapshot_id": cur,
        "n_data_files": n_data_files,
        "n_delete_files": n_delete_files,
        "n_eq_deleted": n_eq_deleted,
        "records_after": records_after,
        "value_sum": value_sum,
    }


ICEBERG_EQ_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("snapshot_id", LongType()),
    StructField("n_data_files", IntegerType()),
    StructField("n_delete_files", IntegerType()),
    StructField("n_eq_deleted", LongType()),
    StructField("records_after", LongType()),
    StructField("value_sum", LongType()),
    StructField("decode_error", StringType()),
])


def decode_iceberg_scan_eq(
    df: DataFrame, column: str,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_scan_eq`; per-payload quarantine, no
    shuffle."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("snapshot_id", "n_data_files", "n_delete_files",
                "n_eq_deleted", "records_after", "value_sum")
        i32 = {"n_data_files", "n_delete_files"}
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                try:
                    m = parse_iceberg_scan_eq(bytes(payload), column)
                    for k in cols:
                        rows[k].append(m[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, TypeError,
                        AttributeError, KeyError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k],
                                dtype="Int32" if k in i32 else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(
        dedup_payload_batches(_run, id_col, payload_col),
        schema=ICEBERG_EQ_SCHEMA)


def parse_iceberg_metrics_prune(bundle: bytes, column: str,
                                lo: int, hi: int) -> dict:
    """Iceberg scan planning with COLUMN METRICS (spec §Manifests):
    each data-file entry carries per-field ``lower_bounds`` /
    ``upper_bounds`` (the spec's single-value binary serialization —
    8-byte little-endian for longs); a file whose [lower, upper]
    range misses [lo, hi] is PRUNED without touching its bytes, and a
    file with no bound for the field is conservatively scanned.
    Returns files_total / files_read plus the matched row count and
    sum over survivors — true bounds make pruning lossless, so the
    tallies equal a full scan's and the oracle replays them in
    closed form."""
    from .parquet_raw import parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    field_id = next((f.get("id") for f in
                     (meta.get("schema") or {}).get("fields", [])
                     if f.get("name") == column), None)
    if field_id is None:
        raise ValueError(f"iceberg: no schema field {column!r}")
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    files_total = files_read = 0
    matched_rows = 0
    matched_sum = 0

    def _bound(df: dict, which: str):
        for kv in df.get(which) or []:
            if kv.get("key") == field_id:
                raw = kv.get("value")
                if not isinstance(raw, bytes) or len(raw) != 8:
                    raise ValueError("iceberg: bad bound value")
                return int.from_bytes(raw, "little", signed=True)
        return None

    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        if (entry.get("content") or 0) != 0:
            raise ValueError("iceberg: delete manifests gated here")
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            files_total += 1
            lower = _bound(df, "lower_bounds")
            upper = _bound(df, "upper_bounds")
            if lower is not None and upper is not None \
                    and (upper < lo or lower > hi):
                continue  # pruned: file bytes never touched
            blob = files.get(df.get("file_path"))
            if blob is None:
                raise ValueError("iceberg: data file missing")
            files_read += 1
            for v in parquet_read_column(blob, column):
                if v is not None and lo <= v <= hi:
                    matched_rows += 1
                    matched_sum += v
    return {
        "files_total": files_total,
        "files_read": files_read,
        "matched_rows": matched_rows,
        "matched_sum": matched_sum,
    }


def decode_iceberg_metrics_prune(
    df: DataFrame, column: str, lo_mod: int, width: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_metrics_prune` with the per-document window
    ``lo = (doc_id % lo_mod) * 100 + 10, hi = lo + width``;
    per-bundle quarantine, no shuffle."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("files_total", IntegerType()),
        StructField("files_read", IntegerType()),
        StructField("matched_rows", LongType()),
        StructField("matched_sum", LongType()),
        StructField("decode_error", StringType()),
    ])
    cols = ("files_total", "files_read", "matched_rows", "matched_sum")
    i32 = {"files_total", "files_read"}

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                lo = (int(doc_id) % lo_mod) * 100 + 10
                try:
                    r = parse_iceberg_metrics_prune(
                        bytes(payload), column, lo, lo + width)
                    for k in cols:
                        rows[k].append(r[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, KeyError, TypeError,
                        AttributeError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k],
                                dtype="Int32" if k in i32 else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(dedup_payload_batches(_run, id_col, payload_col, key_of_id=lambda i: i % lo_mod), schema=schema)


# --------------------------------------------------------------------------
# Time travel (r13) — snapshot resolution via the snapshot log.
#
# The spec's `snapshot-log` is the table's linear history:
# [{timestamp-ms, snapshot-id}] appended per commit.  A
# `TIMESTAMP AS OF t` read resolves the LATEST log entry with
# timestamp-ms <= t and scans THAT snapshot's manifest list — the
# current snapshot must not leak in.

def parse_iceberg_time_travel(bundle: bytes, column: str,
                              as_of_ts: int) -> dict:
    """Walk an Iceberg bundle AS OF ``as_of_ts`` (epoch millis):
    resolve the snapshot through ``snapshot-log``, then scan that
    snapshot's data files through the engine's own parquet reader,
    summing ``column``."""
    from .parquet_raw import parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    log = meta.get("snapshot-log") or []
    resolved_id = None
    for entry in log:
        ts = entry.get("timestamp-ms")
        if not isinstance(ts, int):
            raise ValueError("iceberg: snapshot-log entry lacks "
                             "timestamp-ms")
        if ts <= as_of_ts:
            resolved_id = entry.get("snapshot-id")
    if resolved_id is None:
        raise ValueError("iceberg: timestamp precedes table history")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == resolved_id), None)
    if snap is None:
        raise ValueError("iceberg: resolved snapshot id not found")
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    n_files = 0
    records = 0
    value_sum = 0
    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            blob = files.get(df.get("file_path"))
            if blob is None:
                raise ValueError("iceberg: data file missing")
            n_files += 1
            for v in parquet_read_column(blob, column):
                records += 1
                if v is not None:
                    value_sum += v
    return {
        "resolved_snapshot": resolved_id,
        "n_snapshots": len(meta.get("snapshots", [])),
        "n_files": n_files,
        "records": records,
        "value_sum": value_sum,
    }


def decode_iceberg_time_travel(
    df: DataFrame, column: str, ts_base: int, ts_step: int,
    n_points: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_time_travel` — per document the as-of
    instant is ``ts_base + ts_step*(doc_id % n_points) +
    ts_step//2``; per-bundle quarantine, no shuffle."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("resolved_snapshot", LongType()),
        StructField("n_snapshots", IntegerType()),
        StructField("n_files", IntegerType()),
        StructField("records", LongType()),
        StructField("value_sum", LongType()),
        StructField("decode_error", StringType()),
    ])
    cols = ("resolved_snapshot", "n_snapshots", "n_files",
            "records", "value_sum")
    i32 = {"n_snapshots", "n_files"}

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                as_of = (ts_base + ts_step * (int(doc_id) % n_points)
                         + ts_step // 2)
                try:
                    r = parse_iceberg_time_travel(
                        bytes(payload), column, as_of)
                    for k in cols:
                        rows[k].append(r[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, KeyError,
                        TypeError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k],
                                dtype="Int32" if k in i32 else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(dedup_payload_batches(_run, id_col, payload_col, key_of_id=lambda i: i % n_points), schema=schema)


# --------------------------------------------------------------------------
# Bucket-transform partition pruning (r13).
#
# Iceberg's `bucket[N]` partition transform (spec §Partition
# Transforms + Appendix B): the partition value is
# `(murmur3_x86_32(serialized v) & Integer.MAX_VALUE) % N`, where
# int/long sources serialize as 8-byte little-endian (ints hash as
# longs so the transform is widening-stable).  A point lookup
# `v = t` plans ONLY the files whose partition tuple carries
# bucket(t) — the hash function is part of the on-disk contract, so
# a reader with the wrong murmur3 plans the wrong file set and finds
# zero matches (the oracle's multiplicity check catches exactly
# that).

def murmur3_32(data: bytes, seed: int = 0) -> int:
    """murmur3_x86_32 (public domain algorithm; Iceberg Appendix B
    requires it with seed 0).  Returns a SIGNED 32-bit int, matching
    Java's int so the `& Integer.MAX_VALUE` idiom reads literally."""
    c1, c2 = 0xCC9E2D51, 0x1B873593
    h = seed & 0xFFFFFFFF
    n = len(data)
    for off in range(0, n - 3, 4):
        k = int.from_bytes(data[off:off + 4], "little")
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
        h = ((h << 13) | (h >> 19)) & 0xFFFFFFFF
        h = (h * 5 + 0xE6546B64) & 0xFFFFFFFF
    tail = n & ~3
    k = 0
    rem = n - tail
    if rem >= 3:
        k ^= data[tail + 2] << 16
    if rem >= 2:
        k ^= data[tail + 1] << 8
    if rem >= 1:
        k ^= data[tail]
        k = (k * c1) & 0xFFFFFFFF
        k = ((k << 15) | (k >> 17)) & 0xFFFFFFFF
        k = (k * c2) & 0xFFFFFFFF
        h ^= k
    h ^= n
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & 0xFFFFFFFF
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & 0xFFFFFFFF
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def iceberg_bucket(value: int, n_buckets: int) -> int:
    """`bucket[N]` of an int/long value per the Iceberg spec:
    murmur3_x86_32 over the 8-byte little-endian two's-complement
    serialization, `& Integer.MAX_VALUE`, `% N`."""
    raw = (value & ((1 << 64) - 1)).to_bytes(8, "little")
    return (murmur3_32(raw) & 0x7FFFFFFF) % n_buckets


def parse_iceberg_bucket_prune(bundle: bytes, column: str,
                               target: int) -> dict:
    """Point-lookup scan planning over a bucket-partitioned Iceberg
    table: read the default partition spec, compute ``bucket(target)``
    with the spec's murmur3, and scan ONLY manifest entries whose
    partition tuple matches — pruned files' bytes are never
    touched."""
    from .parquet_raw import parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    spec_id = meta.get("default-spec-id", 0)
    spec = next((s for s in meta.get("partition-specs", [])
                 if s.get("spec-id") == spec_id), None)
    if spec is None:
        raise ValueError("iceberg: default partition spec missing")
    pfields = spec.get("fields") or []
    if len(pfields) != 1:
        raise ValueError("iceberg: multi-field partition spec gated")
    pf = pfields[0]
    tr = pf.get("transform") or ""
    if not (tr.startswith("bucket[") and tr.endswith("]")):
        raise ValueError(f"iceberg: transform {tr!r} gated")
    n_buckets = int(tr[len("bucket["):-1])
    if n_buckets <= 0:
        raise ValueError("iceberg: bad bucket count")
    field_id = next((f.get("id") for f in
                     (meta.get("schema") or {}).get("fields", [])
                     if f.get("name") == column), None)
    if pf.get("source-id") != field_id:
        raise ValueError("iceberg: partition source is not the "
                         "lookup column")
    pname = pf.get("name")
    want = iceberg_bucket(target, n_buckets)
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    files_total = files_read = 0
    matched_rows = 0
    matched_sum = 0
    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            files_total += 1
            part = df.get("partition") or {}
            b = part.get(pname)
            if not isinstance(b, int):
                raise ValueError("iceberg: partition tuple missing "
                                 f"{pname!r}")
            if b != want:
                continue  # pruned: file bytes never touched
            blob = files.get(df.get("file_path"))
            if blob is None:
                raise ValueError("iceberg: data file missing")
            files_read += 1
            for v in parquet_read_column(blob, column):
                if v == target:
                    matched_rows += 1
                    matched_sum += v
    return {
        "files_total": files_total,
        "files_read": files_read,
        "matched_rows": matched_rows,
        "matched_sum": matched_sum,
    }


def decode_iceberg_bucket_prune(
    df: DataFrame, column: str, target_mul: int, target_mod: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_bucket_prune` — per document the lookup
    target is ``2*((doc_id*target_mul) % target_mod)`` (the fixture's
    planted-even domain); per-bundle quarantine, no shuffle."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("files_total", IntegerType()),
        StructField("files_read", IntegerType()),
        StructField("matched_rows", LongType()),
        StructField("matched_sum", LongType()),
        StructField("decode_error", StringType()),
    ])
    cols = ("files_total", "files_read", "matched_rows", "matched_sum")
    i32 = {"files_total", "files_read"}

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                t = 2 * ((int(doc_id) * target_mul) % target_mod)
                try:
                    r = parse_iceberg_bucket_prune(
                        bytes(payload), column, t)
                    for k in cols:
                        rows[k].append(r[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, KeyError,
                        TypeError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k],
                                dtype="Int32" if k in i32 else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(dedup_payload_batches(_run, id_col, payload_col, key_of_id=lambda i: (i * target_mul) % target_mod), schema=schema)


# --------------------------------------------------------------------------
# Truncate-transform pruning (r13).
#
# `truncate[W]` on an integer source (spec §Partition Transforms):
# the partition value is `v - (((v % W) + W) % W)` (floor to the
# bucket start, correct for negatives).  A range predicate
# `lo <= v <= hi` keeps exactly the files whose partition value `p`
# satisfies `p <= hi AND p + W - 1 >= lo` — contiguous-range
# pruning, the complement of bucket[N]'s point-lookup hashing.

def iceberg_truncate(value: int, width: int) -> int:
    """`truncate[W]` of an int/long value per the Iceberg spec."""
    return value - (((value % width) + width) % width)


def parse_iceberg_truncate_prune(bundle: bytes, column: str,
                                 lo: int, hi: int) -> dict:
    """Range-scan planning over a truncate-partitioned Iceberg
    table: keep only files whose `truncate[W]` partition value can
    intersect [lo, hi], scan survivors through the engine's own
    parquet reader, and tally matches."""
    from .parquet_raw import parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    spec_id = meta.get("default-spec-id", 0)
    spec = next((s for s in meta.get("partition-specs", [])
                 if s.get("spec-id") == spec_id), None)
    if spec is None:
        raise ValueError("iceberg: default partition spec missing")
    pfields = spec.get("fields") or []
    if len(pfields) != 1:
        raise ValueError("iceberg: multi-field partition spec gated")
    pf = pfields[0]
    tr = pf.get("transform") or ""
    if not (tr.startswith("truncate[") and tr.endswith("]")):
        raise ValueError(f"iceberg: transform {tr!r} gated")
    width = int(tr[len("truncate["):-1])
    if width <= 0:
        raise ValueError("iceberg: bad truncate width")
    field_id = next((f.get("id") for f in
                     (meta.get("schema") or {}).get("fields", [])
                     if f.get("name") == column), None)
    if pf.get("source-id") != field_id:
        raise ValueError("iceberg: partition source is not the "
                         "scan column")
    pname = pf.get("name")
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    files_total = files_read = 0
    matched_rows = 0
    matched_sum = 0
    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            files_total += 1
            part = df.get("partition") or {}
            p = part.get(pname)
            if not isinstance(p, int):
                raise ValueError("iceberg: partition tuple missing "
                                 f"{pname!r}")
            if p > hi or p + width - 1 < lo:
                continue  # pruned: file bytes never touched
            blob = files.get(df.get("file_path"))
            if blob is None:
                raise ValueError("iceberg: data file missing")
            files_read += 1
            for v in parquet_read_column(blob, column):
                if v is not None and lo <= v <= hi:
                    matched_rows += 1
                    matched_sum += v
    return {
        "files_total": files_total,
        "files_read": files_read,
        "matched_rows": matched_rows,
        "matched_sum": matched_sum,
    }


def decode_iceberg_truncate_prune(
    df: DataFrame, column: str, lo_mod: int, span: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_truncate_prune` with the per-document
    window ``lo = (doc_id % lo_mod)*100 + 10, hi = lo + span``;
    per-bundle quarantine, no shuffle."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("files_total", IntegerType()),
        StructField("files_read", IntegerType()),
        StructField("matched_rows", LongType()),
        StructField("matched_sum", LongType()),
        StructField("decode_error", StringType()),
    ])
    cols = ("files_total", "files_read", "matched_rows", "matched_sum")
    i32 = {"files_total", "files_read"}

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                lo = (int(doc_id) % lo_mod) * 100 + 10
                try:
                    r = parse_iceberg_truncate_prune(
                        bytes(payload), column, lo, lo + span)
                    for k in cols:
                        rows[k].append(r[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, KeyError,
                        TypeError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k],
                                dtype="Int32" if k in i32 else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(dedup_payload_batches(_run, id_col, payload_col, key_of_id=lambda i: i % lo_mod), schema=schema)


# --------------------------------------------------------------------------
# Date-transform pruning (r13) — `day[ts]` (spec §Partition
# Transforms): the partition value of a timestamp-micros source is
# its epoch-day ordinal; daily partitioning is the highest-volume
# real-world Iceberg layout, and a time-range scan keeps exactly
# the files whose day window can intersect it.

_MICROS_PER_DAY = 86_400_000_000


def parse_iceberg_day_prune(bundle: bytes, column: str,
                            lo: int, hi: int) -> dict:
    """Range-scan planning over a day-partitioned Iceberg table:
    keep files whose ``day`` partition value can intersect the
    [lo, hi] timestamp-micros window, scan survivors with the
    engine's own parquet reader, tally matches."""
    from .parquet_raw import parquet_read_column

    files = {m["name"]: m["data"] for m in parse_tar(bundle)}
    meta_raw = files.get("metadata.json")
    if meta_raw is None:
        raise ValueError("iceberg: bundle missing metadata.json")
    meta = json.loads(meta_raw)
    spec_id = meta.get("default-spec-id", 0)
    spec = next((s for s in meta.get("partition-specs", [])
                 if s.get("spec-id") == spec_id), None)
    if spec is None:
        raise ValueError("iceberg: default partition spec missing")
    pfields = spec.get("fields") or []
    if len(pfields) != 1:
        raise ValueError("iceberg: multi-field partition spec gated")
    pf = pfields[0]
    if (pf.get("transform") or "") != "day":
        raise ValueError(
            f"iceberg: transform {pf.get('transform')!r} gated")
    field_id = next((f.get("id") for f in
                     (meta.get("schema") or {}).get("fields", [])
                     if f.get("name") == column), None)
    if pf.get("source-id") != field_id:
        raise ValueError("iceberg: partition source is not the "
                         "scan column")
    pname = pf.get("name")
    cur = meta.get("current-snapshot-id")
    snap = next((s for s in meta.get("snapshots", [])
                 if s.get("snapshot-id") == cur), None)
    if snap is None:
        raise ValueError("iceberg: current snapshot id not found")
    ml_raw = files.get(snap.get("manifest-list"))
    if ml_raw is None:
        raise ValueError("iceberg: manifest list missing")
    _, ml_entries = avro_decode_container(ml_raw)
    files_total = files_read = 0
    matched_rows = 0
    matched_sum = 0
    for entry in ml_entries:
        man_raw = files.get(entry.get("manifest_path"))
        if man_raw is None:
            raise ValueError("iceberg: manifest missing")
        _, man_entries = avro_decode_container(man_raw)
        for me in man_entries:
            if me.get("status") == 2:
                continue
            df = me.get("data_file") or {}
            files_total += 1
            part = df.get("partition") or {}
            p = part.get(pname)
            if not isinstance(p, int):
                raise ValueError("iceberg: partition tuple missing "
                                 f"{pname!r}")
            day_lo = p * _MICROS_PER_DAY
            day_hi = day_lo + _MICROS_PER_DAY - 1
            if day_lo > hi or day_hi < lo:
                continue  # pruned: file bytes never touched
            blob = files.get(df.get("file_path"))
            if blob is None:
                raise ValueError("iceberg: data file missing")
            files_read += 1
            for v in parquet_read_column(blob, column):
                if v is not None and lo <= v <= hi:
                    matched_rows += 1
                    matched_sum += v
    return {
        "files_total": files_total,
        "files_read": files_read,
        "matched_rows": matched_rows,
        "matched_sum": matched_sum,
    }


def decode_iceberg_day_prune(
    df: DataFrame, column: str, base_day: int, n_days: int,
    id_col: str = "doc_id", payload_col: str = "payload",
) -> DataFrame:
    """Arrow ``mapInPandas`` wrapper over
    :func:`parse_iceberg_day_prune` — per document the window is
    1.5 days starting mid-day ``base_day + doc_id % n_days``;
    per-bundle quarantine, no shuffle."""
    schema = StructType([
        StructField("doc_id", LongType()),
        StructField("files_total", IntegerType()),
        StructField("files_read", IntegerType()),
        StructField("matched_rows", LongType()),
        StructField("matched_sum", LongType()),
        StructField("decode_error", StringType()),
    ])
    cols = ("files_total", "files_read", "matched_rows", "matched_sum")
    i32 = {"files_total", "files_read"}

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("doc_id", *cols, "decode_error")}
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                rows["doc_id"].append(doc_id)
                d0 = base_day + int(doc_id) % n_days
                lo = d0 * _MICROS_PER_DAY + _MICROS_PER_DAY // 2
                hi = lo + (3 * _MICROS_PER_DAY) // 2 - 1
                try:
                    r = parse_iceberg_day_prune(
                        bytes(payload), column, lo, hi)
                    for k in cols:
                        rows[k].append(r[k])
                    rows["decode_error"].append(None)
                except (ValueError, IndexError, KeyError,
                        TypeError) as e:
                    for k in cols:
                        rows[k].append(None)
                    rows["decode_error"].append(str(e))
            yield pd.DataFrame({
                "doc_id": pd.Series(rows["doc_id"], dtype="int64"),
                **{k: pd.Series(rows[k],
                                dtype="Int32" if k in i32 else "Int64")
                   for k in cols},
                "decode_error": pd.Series(rows["decode_error"],
                                          dtype=object),
            })

    return df.select(id_col, payload_col).mapInPandas(dedup_payload_batches(_run, id_col, payload_col, key_of_id=lambda i: i % n_days), schema=schema)
