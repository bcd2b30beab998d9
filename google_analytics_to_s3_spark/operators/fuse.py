"""Driver-side fusion of chained ``mapInPandas`` stages (r13 opt).

The synth → (unwrap) → decode pipelines in the driver queries are
chains of Arrow ``mapInPandas`` nodes with nothing between them but an
optional name-only projection. Spark executes each node with its own
Python worker round trip: every intermediate row — typically the full
payload bytes — is serialized Python→Arrow→JVM and immediately handed
JVM→Arrow→Python to the next stage. The JVM adds nothing in between.

Since every stage is a batches-generator (``Iterator[pd.DataFrame] →
Iterator[pd.DataFrame]``), the chain composes in plain Python:
``decode(unwrap(synth(it)))`` is ONE ``mapInPandas`` node whose
intermediate frames never leave the Python worker. Guide §4.1: you
cannot remove the JVM↔Python boundary cost, but you control how many
times you pay it — fusion pays it once per chain instead of once per
stage (measured ~0.25-0.3 s per removed hop per query at sf0.1).

``fusable(df)`` wraps a DataFrame so that ``.mapInPandas`` chains fuse
automatically:

- ``fusable(df).mapInPandas(f, s)`` returns a :class:`_FusedMap` — a
  real DataFrame (the unfused node is built as fallback) that ALSO
  remembers ``(source, generator)``.
- ``_FusedMap.mapInPandas(g, s2)`` composes the generators and hangs
  ONE node off the original source. Chains of any depth collapse.
- ``_FusedMap.select(names...)`` with plain column names (the
  project-before-the-opaque-op idiom of guide §2.3) stays fusable: the
  projection composes into the generator chain.
- Any other DataFrame method falls back to the ordinary unfused node —
  correctness never depends on fusion triggering.

Semantics are unchanged: generators see the same frames they would
have received (each stage already yields one frame per input frame;
the JVM re-batching between stages only re-slices at
maxRecordsPerBatch, which is above the per-partition row counts these
pipelines produce), outputs are byte-identical, and the fused plan
keeps the pinned shape — scan → one id Exchange → MapInPandas.
"""

from __future__ import annotations

from pyspark.sql.classic.dataframe import DataFrame as _ClassicDataFrame


class _FusingBase(_ClassicDataFrame):
    # pyspark.sql.DataFrame.__new__ dispatches on (jdf, sql_ctx) —
    # bypass it so subclasses can take their own constructor args.
    def __new__(cls, *args, **kwargs):  # noqa: D105
        return object.__new__(cls)


class _FusedMap(_FusingBase):
    """A ``mapInPandas`` result that remembers how it was built so a
    following ``mapInPandas``/name-projection can fuse into it."""

    def __init__(self, src: _ClassicDataFrame, fn, schema):
        real = _ClassicDataFrame.mapInPandas(src, fn, schema)
        super().__init__(real._jdf, real.sparkSession)
        self._fuse_src = src
        self._fuse_fn = fn

    def mapInPandas(self, func, schema, barrier=False, profile=None):
        if barrier or profile is not None:  # non-default modes: no fusion
            return _ClassicDataFrame.mapInPandas(
                self, func, schema, barrier, profile
            )
        inner = self._fuse_fn

        def fused(batches):
            return func(inner(batches))

        return _FusedMap(self._fuse_src, fused, schema)

    def select(self, *cols):
        names = list(cols)
        have = self.columns
        if (
            names
            and all(isinstance(c, str) for c in names)
            and "*" not in names
            and set(names) <= set(have)
            # pandas frame[names] and StructType lookup are exact-name /
            # single-match operations; with duplicate or casefold-
            # colliding columns Spark's analyzer semantics differ, so
            # only fuse when every name resolves unambiguously
            and len({c.casefold() for c in have}) == len(have)
        ):
            from pyspark.sql import types as T

            base = self.schema
            sub = T.StructType([base[n] for n in names])
            inner = self._fuse_fn

            def projected(batches):
                for frame in inner(batches):
                    yield frame[names]

            return _FusedMap(self._fuse_src, projected, sub)
        return _ClassicDataFrame.select(self, *cols)

    def drop(self, *cols):
        # a string-only drop is a name-only projection of the kept
        # columns — route through the fusing select so chains like
        # decode(unwrap(x).drop("decode_error")) stay one Arrow map.
        # (Spark's drop ignores unknown names; the keep-list does too.)
        # Classic drop resolves names case-insensitively under the
        # default spark.sql.caseSensitive=false and removes EVERY
        # occurrence of a duplicated name; the fused keep-list is an
        # exact-name single-occurrence projection. Fuse only when the
        # two agree: unambiguous columns, and each dropped name either
        # matches a column exactly or is unknown to both resolutions.
        if cols and all(isinstance(c, str) for c in cols):
            have = self.columns
            exact = set(have)
            folded = [c.casefold() for c in have]
            unambiguous = len(set(folded)) == len(folded)
            agree = unambiguous and all(
                (c in exact) or (c.casefold() not in folded) for c in cols
            )
            if agree:
                gone = set(cols)
                keep = [c for c in have if c not in gone]
                if keep:
                    return self.select(*keep)
        return _ClassicDataFrame.drop(self, *cols)


class _FusingSource(_FusingBase):
    """Marks a DataFrame as the head of a fusable chain."""

    def __init__(self, df: _ClassicDataFrame):
        super().__init__(df._jdf, df.sparkSession)

    def mapInPandas(self, func, schema, barrier=False, profile=None):
        if barrier or profile is not None:
            return _ClassicDataFrame.mapInPandas(
                self, func, schema, barrier, profile
            )
        return _FusedMap(self, func, schema)

    # A name-only projection before the first mapInPandas is still a
    # valid fusable chain head — re-wrap so the projection does not
    # silently demote the chain to classic (unfused) execution.
    def select(self, *cols):
        res = _ClassicDataFrame.select(self, *cols)
        if cols and all(isinstance(c, str) for c in cols) and "*" not in cols:
            return _FusingSource(res)
        return res

    def drop(self, *cols):
        res = _ClassicDataFrame.drop(self, *cols)
        if cols and all(isinstance(c, str) for c in cols):
            return _FusingSource(res)
        return res


def fusable(df) -> _ClassicDataFrame:
    """Wrap ``df`` so subsequent ``mapInPandas`` chains fuse into one
    node. A no-op for any other usage of the DataFrame."""
    if isinstance(df, _FusingBase):
        return df
    return _FusingSource(df)


def id_payload_projection(
    df, id_col: str, payload_col: str, extra: tuple = ()
) -> _ClassicDataFrame:
    """The decode wrappers' standard ``(id, payload[, extra…])``
    projection with the id normalized to BIGINT.

    When the id column is already BIGINT the cast is a no-op, and a
    Column-expression select would needlessly break mapInPandas chain
    fusion (``_FusedMap.select`` only composes name-only projections).
    Select by name in that case; otherwise keep the explicit cast.

    The fast path requires ``id_col`` to appear exactly once —
    ``dict(df.dtypes)`` silently collapses duplicate names and could
    consult the wrong column's dtype."""
    if (
        df.columns.count(id_col) == 1
        and dict(df.dtypes).get(id_col) == "bigint"
    ):
        return df.select(id_col, payload_col, *extra)
    return df.select(
        df[id_col].cast("long").alias(id_col), payload_col, *extra
    )
