"""Unit coverage for the Markov removal-effect operator: the transition
counter on a tiny journey set, and the integer-grid absorption solve on
a hand-computable chain."""

from google_analytics_to_s3_spark.operators.markov import (
    CONV,
    MARKOV_Q,
    NULL,
    START,
    absorption_grid,
    channel_transitions,
    removal_effects,
)

# A: google → facebook, converted.  B: google, not converted.
_TRANS = [
    (START, "google", 2),
    ("google", "facebook", 1),
    ("google", NULL, 1),
    ("facebook", CONV, 1),
]


class TestAbsorptionGrid:
    def test_hand_computed_base(self):
        # start→google w.p. 1; google→facebook w.p. 1/2; facebook→conv
        # w.p. 1 ⇒ absorption exactly 1/2 (all powers of two: no
        # truncation anywhere on the grid)
        assert absorption_grid(_TRANS) == MARKOV_Q // 2

    def test_removal_kills_path(self):
        assert absorption_grid(_TRANS, removed="google") == 0
        assert absorption_grid(_TRANS, removed="facebook") == 0

    def test_removal_of_uninvolved_channel_is_noop(self):
        assert absorption_grid(_TRANS, removed="newsletter") == (
            MARKOV_Q // 2
        )

    def test_effects_shape(self):
        out = removal_effects(_TRANS, ["google", "facebook"])
        assert out["base"]["p"] == MARKOV_Q // 2
        assert out["google"] == {"p": 0, "n_in": 2}
        assert out["facebook"] == {"p": 0, "n_in": 1}


class TestChannelTransitions:
    def test_counts(self, spark):
        rows = [
            # visitor 1: g → f, converted
            (1, 10, "google", 1),
            (1, 20, "facebook", 1),
            # visitor 2: g, not converted
            (2, 10, "google", 0),
        ]
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            rows, "uid long, ts long, source string, converted int"
        ).withColumn("tb", F.col("ts"))
        out = channel_transitions(df, "uid", "ts", "source", "tb",
                                  "converted")
        got = {(r["s"], r["t"]): r["cnt"] for r in out.collect()}
        assert got == {
            (START, "google"): 2,
            ("google", "facebook"): 1,
            ("facebook", CONV): 1,
            ("google", NULL): 1,
        }
