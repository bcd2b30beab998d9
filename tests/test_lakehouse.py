"""Delta-style log fold (operators/lakehouse.py): protocol replay
semantics — last action wins, re-add resurrects, in-commit line
order breaks version ties."""

from google_analytics_to_s3_spark.operators.lakehouse import (
    delta_log_snapshot,
)


def _add(path, size):
    return f'{{"add":{{"path":"{path}","size":{size},"dataChange":true}}}}'


def _remove(path):
    return f'{{"remove":{{"path":"{path}","deletionTimestamp":1}}}}'


def test_replay_semantics(spark):
    rows = [
        # t0: add a, add b, remove a (later), re-add a (later still)
        (0, 1, 0, _add("a", 10)),
        (0, 1, 1, _add("b", 20)),
        (0, 2, 0, _remove("a")),
        (0, 3, 0, _add("a", 30)),
        # t1: add then remove in the SAME version — line order decides
        (1, 1, 0, _add("x", 5)),
        (1, 2, 0, _add("y", 7)),
        (1, 2, 1, _remove("y")),
        # non-file actions are ignored
        (1, 3, 0, '{"commitInfo":{"operation":"WRITE"}}'),
    ]
    log = spark.createDataFrame(
        rows, "table_id long, version long, line_no long, line string")
    out = {r["table_id"]: r for r in
           delta_log_snapshot(log, line_no_col="line_no").collect()}
    assert out[0]["n_live_files"] == 2          # a (re-added) + b
    assert out[0]["live_bytes"] == 50           # 30 + 20
    assert out[0]["last_version"] == 3
    assert out[0]["n_actions"] == 4
    assert out[1]["n_live_files"] == 1          # y removed in-commit
    assert out[1]["live_bytes"] == 5
    assert out[1]["n_actions"] == 3             # commitInfo dropped


def test_remove_only_table(spark):
    log = spark.createDataFrame(
        [(5, 1, 0, _remove("gone"))],
        "table_id long, version long, line_no long, line string")
    row = delta_log_snapshot(log, line_no_col="line_no").collect()[0]
    assert row["n_live_files"] == 0
    assert row["live_bytes"] == 0
    assert row["n_actions"] == 1
