"""The per-batch payload-dedup wrapper must be invisible in results:
same rows (any order) as the unwrapped generator, for 1:1 and 1:N
extractors, with and without duplicate payloads."""

import pandas as pd

from google_analytics_to_s3_spark.operators.payload_memo import (
    dedup_key_batches,
    dedup_payload_batches,
)


def _one_to_one(batches):
    for pdf in batches:
        yield pd.DataFrame({
            "doc_id": pd.Series(pdf["doc_id"], dtype="int64"),
            "n": pd.Series([len(p) for p in pdf["payload"]],
                           dtype="Int64"),
            "s": pd.Series([sum(p) for p in pdf["payload"]],
                           dtype="Int64"),
        })


def _fan_out(batches):
    for pdf in batches:
        ids, byte_val = [], []
        for i, p in zip(pdf["doc_id"], pdf["payload"]):
            for b in p:
                ids.append(i)
                byte_val.append(b)
        yield pd.DataFrame({
            "doc_id": pd.Series(ids, dtype="int64"),
            "byte_val": pd.Series(byte_val, dtype="Int32"),
        })


def _canon(df):
    return sorted(map(tuple, df.fillna(-1).itertuples(index=False)))


def _run(fn, pdf):
    return pd.concat(list(fn(iter([pdf.copy()]))), ignore_index=True)


PDF_DUPS = pd.DataFrame({
    "doc_id": pd.Series([1, 2, 3, 4, 5, 6], dtype="int64"),
    "payload": [b"abc", b"xy", b"abc", b"abc", b"xy", b""],
})
PDF_UNIQ = pd.DataFrame({
    "doc_id": pd.Series([7, 8, 9], dtype="int64"),
    "payload": [b"a", b"bc", b"def"],
})


def test_one_to_one_identical_with_dups():
    wrapped = dedup_payload_batches(_one_to_one)
    assert _canon(_run(wrapped, PDF_DUPS)) == _canon(
        _run(_one_to_one, PDF_DUPS))


def test_one_to_one_identical_all_unique():
    wrapped = dedup_payload_batches(_one_to_one)
    assert _canon(_run(wrapped, PDF_UNIQ)) == _canon(
        _run(_one_to_one, PDF_UNIQ))


def test_fan_out_identical_with_dups():
    wrapped = dedup_payload_batches(_fan_out)
    assert _canon(_run(wrapped, PDF_DUPS)) == _canon(
        _run(_fan_out, PDF_DUPS))


def test_dtypes_preserved():
    wrapped = dedup_payload_batches(_one_to_one)
    out = _run(wrapped, PDF_DUPS)
    assert str(out["doc_id"].dtype) == "int64"
    assert str(out["n"].dtype) == "Int64"


def test_key_dedup_identical():
    def id_driven(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pd.Series(pdf["doc_id"], dtype="int64"),
                "seed_sq": pd.Series(
                    [(int(i) % 3) ** 2 for i in pdf["doc_id"]],
                    dtype="Int64"),
            })

    pdf = pd.DataFrame({
        "doc_id": pd.Series(range(10), dtype="int64")})
    wrapped = dedup_key_batches(id_driven, key_of_id=lambda i: i % 3)
    assert _canon(_run(wrapped, pdf)) == _canon(_run(id_driven, pdf))
