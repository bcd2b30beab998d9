"""Driver queries: the round-9 batch.

- ``flac_decode_lpc`` — high-order LPC FLAC decode driver-checked:
  order-8 and order-4 quantized predictors with sign-varying
  coefficient histories (the `flac -8` shape) and Rice partition
  orders 2/1, closing the one codec corner the r8 verdict flagged as
  synthetic-only (SURVEY §2.12 FLAC row). FLAC is lossless, so the
  oracle replays the planted sample rule exactly — a green row
  proves the quantized-dot-product floor shift, the multi-partition
  residual path, and the per-partition Rice parameters all
  reconstruct the true samples.

Scale notes: one Arrow ``mapInPandas`` synth pass + one decode pass
per query, ids round-robined across cores (``_spread``); per-payload
cost, embarrassingly parallel at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.testdata import load_events
from .driver_queries_analytics import _FLAC_MOD, _spread

QUERIES_R9: dict = {}
ORACLES_R9: dict[str, str] = {}


def q_flac_decode_lpc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """High-order LPC FLAC driver-checked (r9): blocks cycle
    (lpc8, lpc4, lpc) — order-8 [26,-39,42,-38,28,-17,8,-2]>>5 with
    Rice partition order 2, order-4 [7,-6,2,-1]>>2 with partition
    order 1, order-2 [3,-1]>>1 — so every frame exercises the
    quantized-coefficient dot product with the arithmetic FLOOR
    shift (RFC 9639 §9.2.5) and the multi-partition residual decode
    (§9.2.7: per-partition parameters, first partition short by
    `order`). All three kinds plant the WAV sample rule, so the
    oracle is the rule's RMS — lossless equality, exact to the
    formatted 1e-6 digit. Disjoint event sample (id % 10 == 2) from
    flac_decode / flac_decode_stereo."""
    from collections.abc import Iterator as _It

    import pandas as _pd

    from ..operators.multimodal import decode_flac_features
    from ..testing.fixtures import make_flac

    e = _spread(
        load_events(spark, sf_dir).select("event_id").filter(
            F.col("event_id") % _FLAC_MOD == 2
        ),
        spark,
    )

    def _synth(batches: _It[_pd.DataFrame]) -> _It[_pd.DataFrame]:
        for pdf in batches:
            yield _pd.DataFrame({
                "doc_id": pdf["event_id"].astype("int64"),
                "payload": [
                    make_flac(int(i) % 1000,
                              n_samples=800 + (int(i) % 5) * 400,
                              subframe_cycle=("lpc8", "lpc4", "lpc"))
                    for i in pdf["event_id"]
                ],
            })

    payloads = e.mapInPandas(
        _synth, schema="doc_id long, payload binary"
    )
    return decode_flac_features(payloads, window_samples=400).select(
        "doc_id", "sample_rate_hz", "n_samples", "duration_ms",
        "n_windows",
        F.array_join(
            F.transform("rms_windows",
                        lambda x: F.format_string("%.6f", x)),
            ",",
        ).alias("rms_windows"),
    )


# every block kind (lpc8/lpc4/lpc) plants the WAV sample rule, so the
# oracle needs no block-layout CASE: v(i) = ((seed + i*257) % 2001)
# - 1000 for ALL i — the layout only affects the ENCODING, which
# decode must undo exactly (lossless)
SQL_FLAC_DECODE_LPC = f"""
WITH e AS (
  SELECT event_id, 800 + (event_id % 5) * 400 AS n,
         event_id % 1000 AS seed
  FROM events WHERE event_id % {_FLAC_MOD} = 2
),
w AS (
  SELECT event_id, n, seed, CAST(wi.w AS BIGINT) AS w
  FROM e, LATERAL (SELECT unnest(range(0, (n + 399) // 400)) AS w) wi
),
s AS (
  SELECT event_id, n, w.w,
         ((seed + i.i * 257) % 2001) - 1000 AS v
  FROM w, LATERAL (SELECT unnest(range(w.w * 400,
                                       least(n, (w.w + 1) * 400))) AS i) i
),
r AS (
  SELECT event_id, n, w,
         round(sqrt(CAST(sum(v * v) AS DOUBLE)
                    / CAST(count(*) AS DOUBLE)), 6) AS rms
  FROM s GROUP BY 1, 2, 3
)
SELECT event_id AS doc_id,
       CAST(16000 AS INTEGER) AS sample_rate_hz,
       CAST(n AS BIGINT) AS n_samples,
       CAST(n * 1000 // 16000 AS BIGINT) AS duration_ms,
       CAST(count(*) AS INTEGER) AS n_windows,
       string_agg(printf('%.6f', rms), ',' ORDER BY w) AS rms_windows
FROM r GROUP BY event_id, n
"""

QUERIES_R9["flac_decode_lpc"] = q_flac_decode_lpc
ORACLES_R9["flac_decode_lpc"] = SQL_FLAC_DECODE_LPC
