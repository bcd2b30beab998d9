"""PySpark-native analytics engine with the query and data-processing
capabilities of the `mydatastack/google-analytics-to-s3` reference pipeline.

Architecture (Spark-first, not a port):

- Every logical operator of the reference (SURVEY.md §2) is a named,
  unit-testable ``DataFrame -> DataFrame`` transform composed with
  ``df.transform(...)`` so Catalyst sees one end-to-end plan.
- No RDDs, no row-at-a-time Python UDFs in the hot path: the reference's
  ~15 scalar UDFs (main.py:1164-1259) are re-expressed as native column
  expressions (``parse_url``, ``str_to_map``, ``when`` chains, HOFs).
- The RDD flatMap unpivot + join-back (reference main.py:757-806) becomes a
  single Catalyst-native ``stack`` unpivot that carries columns through
  (no join, no Python serialization).
- Typed money (DoubleType/DecimalType) and timestamps internally; the
  reference's stringly-typed GA360 column names appear only at the export
  boundary.

Modules
-------
- ``session``      SparkSession factory (AQE, tz, sane shuffle defaults)
- ``schemas``      hit/session/product schemas (reference main.py:84-280)
- ``sources``      scans & sinks (S1-S11)
- ``functions``    scalar ops: GA mappings, URL/traffic parsing, IP, UA
- ``operators``    sessionization, attribution, unpivot, exports, dedup,
                   similarity, text analysis
- ``plans``        end-to-end daily pipeline (EP3)
- ``streaming``    structured-streaming sessionization (session_window)
"""

__version__ = "0.1.0"
