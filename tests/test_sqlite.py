"""SQLite file-format reader (operators/sqlite.py), cross-validated
against the stdlib sqlite3 module — a REAL independent producer."""

from __future__ import annotations

import os
import random
import sqlite3
import tempfile

import pytest

from google_analytics_to_s3_spark.operators.sqlite import (
    sqlite_file_meta,
    sqlite_table_rows,
)


def _db_bytes(build, page_size=4096):
    path = tempfile.mktemp(suffix=".db")
    try:
        con = sqlite3.connect(path)
        con.execute(f"PRAGMA page_size={page_size}")
        build(con)
        con.commit()
        con.close()
        data = open(path, "rb").read()
        con = sqlite3.connect(path)
        yield_con = con
        return data, yield_con
    finally:
        if os.path.exists(path):
            os.unlink(path)


def _roundtrip(page_size, n, seed):
    rng = random.Random(seed)
    path = tempfile.mktemp(suffix=".db")
    try:
        con = sqlite3.connect(path)
        con.execute(f"PRAGMA page_size={page_size}")
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, "
                    "v INTEGER, s TEXT, b BLOB, f REAL)")
        con.execute("CREATE TABLE u (x)")
        con.execute("CREATE INDEX ix ON t(v)")
        rows = []
        for _ in range(n):
            rows.append((
                rng.randrange(-10**14, 10**14)
                if rng.random() > .1 else None,
                "x" * rng.choice([0, 5, 50, 3000])
                if rng.random() > .1 else None,
                bytes(rng.randrange(256)
                      for _ in range(rng.choice([0, 8, 2000])))
                if rng.random() > .1 else None,
                rng.choice([2.0, -5.0, 0.25, 1e18, -0.0, 3.5])
                if rng.random() > .1 else None,
            ))
        con.executemany("INSERT INTO t (v,s,b,f) VALUES (?,?,?,?)",
                        rows)
        con.commit()
        con.close()
        data = open(path, "rb").read()
        con = sqlite3.connect(path)
        want = [list(r) for r in
                con.execute("SELECT id,v,s,b,f FROM t ORDER BY id")]
        con.close()
        return data, want
    finally:
        if os.path.exists(path):
            os.unlink(path)


@pytest.mark.parametrize("page_size", [512, 1024, 4096, 8192])
@pytest.mark.parametrize("n", [5, 300, 2500])
def test_rows_match_sqlite3(page_size, n):
    """All serial types, interior trees (2500 rows), overflow chains
    (3000-char texts at 512-byte pages), the rowid alias and REAL
    affinity (integral reals stored as ints on disk) — byte-for-byte
    against sqlite3's own SELECT."""
    data, want = _roundtrip(page_size, n, seed=page_size * n)
    names, rows = sqlite_table_rows(data, "t")
    assert names == ["id", "v", "s", "b", "f"]
    assert rows == want


def test_meta_and_second_table():
    data, _ = _roundtrip(1024, 50, seed=9)
    m = sqlite_file_meta(data)
    assert m["page_size"] == 1024
    assert [t["name"] for t in m["tables"]] == ["t", "u"]
    names, rows = sqlite_table_rows(data, "u")
    assert names == ["x"]
    assert rows == []


def test_wal_checkpointed_file_reads():
    path = tempfile.mktemp(suffix=".db")
    try:
        con = sqlite3.connect(path)
        con.execute("PRAGMA journal_mode=wal")
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER)")
        con.executemany("INSERT INTO t (v) VALUES (?)",
                        [(i * 3,) for i in range(500)])
        con.commit()
        con.execute("PRAGMA wal_checkpoint(TRUNCATE)")
        con.close()
        data = open(path, "rb").read()
        _names, rows = sqlite_table_rows(data, "t")
        assert rows == [[i + 1, i * 3] for i in range(500)]
    finally:
        if os.path.exists(path):
            os.unlink(path)


def test_alter_table_add_column_pads_nulls():
    path = tempfile.mktemp(suffix=".db")
    try:
        con = sqlite3.connect(path)
        con.execute("CREATE TABLE t (a INTEGER)")
        con.execute("INSERT INTO t VALUES (1)")
        con.commit()
        con.execute("ALTER TABLE t ADD COLUMN b TEXT")
        con.execute("INSERT INTO t VALUES (2, 'x')")
        con.commit()
        con.close()
        data = open(path, "rb").read()
        names, rows = sqlite_table_rows(data, "t")
        assert names == ["a", "b"]
        assert rows == [[1, None], [2, "x"]]
    finally:
        if os.path.exists(path):
            os.unlink(path)


def test_gates_named():
    path = tempfile.mktemp(suffix=".db")
    try:
        con = sqlite3.connect(path)
        con.execute("CREATE TABLE t (a INTEGER)")
        con.commit()
        con.close()
        data = open(path, "rb").read()
        with pytest.raises(ValueError, match="no table"):
            sqlite_table_rows(data, "nope")
    finally:
        if os.path.exists(path):
            os.unlink(path)
    with pytest.raises(ValueError, match="magic"):
        sqlite_file_meta(b"not a database" + b"\0" * 100)


def _without_rowid(pk_sql, n, seed, order_by):
    rng = random.Random(seed)
    con = sqlite3.connect(":memory:")
    con.execute("PRAGMA page_size=512")
    con.execute(pk_sql)
    rows = [(f"k{rng.randrange(10**9):010d}", rng.randrange(10**6),
             "x" * rng.choice([0, 10, 2500]),
             None if rng.random() < .1 else rng.randrange(100))
            for _ in range(n)]
    con.executemany("INSERT OR IGNORE INTO w VALUES (?,?,?,?)", rows)
    con.commit()
    data = bytes(con.serialize())
    want = [list(r) for r in con.execute(
        f"SELECT k, a, s, v FROM w ORDER BY {order_by}")]
    con.close()
    return data, want


def test_without_rowid_tables():
    """Index b-trees (page types 2/10): in-order walk with interior
    cells as real entries, the index-page overflow threshold, and
    PK-first storage-order remap — single, composite (storage order
    differs from declared) and column-level PRIMARY KEYs, vs
    sqlite3's own ordered SELECT."""
    for n in (10, 400, 3000):
        data, want = _without_rowid(
            "CREATE TABLE w (k TEXT, a INTEGER, s TEXT, v INTEGER, "
            "PRIMARY KEY (k)) WITHOUT ROWID", n, n, "k")
        names, rows = sqlite_table_rows(data, "w")
        assert names == ["k", "a", "s", "v"]
        assert rows == want
    data, want = _without_rowid(
        "CREATE TABLE w (k TEXT, a INTEGER, s TEXT, v INTEGER, "
        "PRIMARY KEY (a, k)) WITHOUT ROWID", 800, 9, "a, k")
    assert sqlite_table_rows(data, "w")[1] == want
    data, want = _without_rowid(
        "CREATE TABLE w (k TEXT PRIMARY KEY, a INTEGER, s TEXT, "
        "v INTEGER) WITHOUT ROWID", 300, 5, "k")
    assert sqlite_table_rows(data, "w")[1] == want


@pytest.mark.parametrize("seed", range(8))
def test_corruption_never_crashes(seed):
    data, _ = _roundtrip(1024, 200, seed=5)
    rng = random.Random(seed)
    for _ in range(40):
        b = bytearray(data)
        b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
        try:
            sqlite_table_rows(bytes(b), "t")
        except (ValueError, IndexError, TypeError):
            pass


def test_fixture_inverts():
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_sqlite_db,
    )

    for seed in (0, 1, 2, 3, 17, 999):
        data = make_sqlite_db(seed)
        names, rows = sqlite_table_rows(data, "t")
        n = 30 + seed % 60
        assert len(rows) == n
        for i, r in enumerate(rows):
            assert r[0] == i + 1
            if (seed + i) % 9 == 8:
                assert r[1] is None
            else:
                assert r[1] == (seed * 7 + 13 * i) % 100000 - 50000
            if (seed + i) % 5 == 4:
                assert r[4] is None
            else:
                assert r[4] == ((seed + 11 * i) % 4000 - 2000) / 4


@pytest.mark.parametrize("enc", ["UTF-8", "UTF-16le", "UTF-16be"])
def test_text_encodings(enc):
    """The header's text-encoding field drives record text decode —
    sqlite3 produces all three via PRAGMA encoding."""
    con = sqlite3.connect(":memory:")
    con.execute(f"PRAGMA encoding='{enc}'")
    con.execute("PRAGMA page_size=512")
    con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, s TEXT, "
                "v INTEGER)")
    rows = [("héllo wörld 世界 %d" % i
             * (40 if i % 9 == 5 else 1), i * 7) for i in range(800)]
    con.executemany("INSERT INTO t (s, v) VALUES (?,?)", rows)
    con.commit()
    data = bytes(con.serialize())
    want = [list(r) for r in
            con.execute("SELECT id, s, v FROM t ORDER BY id")]
    con.close()
    assert sqlite_table_rows(data, "t")[1] == want


def test_negative_rowid_and_values_sign_fold():
    """9-byte varints carry two's-complement 64-bit values: negative
    rowids / INTEGER PRIMARY KEYs must sign-fold, not decode as huge
    unsigned ints (ADVICE r12: id=-5 read back as 2**64-5)."""
    path = tempfile.mktemp(suffix=".db")
    try:
        con = sqlite3.connect(path)
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v INTEGER)")
        rows = [(-5, -1), (-(2**62), 7), (-1, None), (3, -(2**40)),
                (-9223372036854775808, 9223372036854775807)]
        con.executemany("INSERT INTO t VALUES (?,?)", rows)
        con.commit()
        con.close()
        data = open(path, "rb").read()
        con = sqlite3.connect(path)
        want = [list(r) for r in
                con.execute("SELECT id, v FROM t ORDER BY id")]
        con.close()
        names, got = sqlite_table_rows(data, "t")
        assert names == ["id", "v"]
        assert got == want
        assert got[0][0] == -9223372036854775808
    finally:
        if os.path.exists(path):
            os.unlink(path)


def test_wal_replay_matches_sqlite3_own_recovery():
    """A live WAL-mode pair: our replay (checksums, salts, commit
    frames) must equal what sqlite3 itself recovers from the same
    pair — and the stale main file alone must NOT."""
    import shutil

    from google_analytics_to_s3_spark.operators.sqlite import (
        sqlite_table_rows,
    )
    from google_analytics_to_s3_spark.operators.tar import parse_tar
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_sqlite_wal_bundle,
    )

    for seed in (0, 1, 2, 5, 12, 999):
        members = {m["name"]: m["data"]
                   for m in parse_tar(make_sqlite_wal_bundle(seed))}
        main, wal = members["main.db"], members["wal"]
        # independent recovery: hand the pair to sqlite3 itself
        d = tempfile.mkdtemp()
        try:
            path = os.path.join(d, "x.db")
            with open(path, "wb") as fh:
                fh.write(main)
            with open(path + "-wal", "wb") as fh:
                fh.write(wal)
            con = sqlite3.connect(path)
            want = [list(r) for r in
                    con.execute("SELECT id, v, s FROM t ORDER BY id")]
            con.close()
        finally:
            shutil.rmtree(d, ignore_errors=True)
        names, got = sqlite_table_rows(main, "t", wal=wal)
        assert names == ["id", "v", "s"]
        assert got == want, seed
        _, stale = sqlite_table_rows(main, "t")
        assert stale != want, "main alone must be stale"


def test_wal_torn_tail_and_salt_mismatch_end_log():
    """Recovery rule: a frame with a corrupted checksum (torn write)
    ends the log at the last valid commit — earlier commits still
    replay; a corrupt WAL header is a named error."""
    from google_analytics_to_s3_spark.operators.sqlite import (
        parse_sqlite_wal,
        sqlite_table_rows,
    )
    from google_analytics_to_s3_spark.operators.tar import parse_tar
    from google_analytics_to_s3_spark.testing.fixtures import (
        make_sqlite_wal_bundle,
    )

    members = {m["name"]: m["data"]
               for m in parse_tar(make_sqlite_wal_bundle(3))}
    main, wal = members["main.db"], members["wal"]
    names, full = sqlite_table_rows(main, "t", wal=wal)
    # corrupt the LAST frame's page image: the log ends before it
    page_size = 4096 if 3 % 3 == 2 else [512, 1024, 4096][3 % 3]
    torn = bytearray(wal)
    torn[-1] ^= 0xFF
    got_pages, _size = parse_sqlite_wal(bytes(torn), page_size)
    all_pages, _ = parse_sqlite_wal(wal, page_size)
    assert len(got_pages) < len(all_pages) or got_pages != all_pages
    # corrupt header -> named error
    bad = bytearray(wal)
    bad[5] ^= 0xFF
    with pytest.raises(ValueError, match="WAL"):
        parse_sqlite_wal(bytes(bad), page_size)
