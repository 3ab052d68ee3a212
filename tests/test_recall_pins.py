"""gate/recall_pins.py: the fingerprint-keyed ANN recall pin sidecar
(VERDICT r12 #4 / ADVICE r12) — put-if-absent recording, seed-over-sidecar
precedence, fail-closed oracle lookup, and the strengthened
(row_count, checksum) fingerprint."""

import json
import os

import duckdb
import pytest


@pytest.fixture
def pins_env(tmp_path, monkeypatch):
    """Point the state root at a throwaway dir so pin writes never touch
    the checkout's real sidecar."""
    monkeypatch.setenv("SPARK_GRAFT_STATE_DIR", str(tmp_path))
    return tmp_path


def test_fingerprint_is_count_and_checksum(pins_env):
    from bacon_spark.gate import recall_pins as rp

    n, fp = rp.fingerprint("/root/testdata/sf0.001")
    assert (n, fp) == (500, -33)
    assert (n, fp) in rp.SEED  # the committed seed covers the fixture


def test_record_pin_put_if_absent(pins_env):
    from bacon_spark.gate import recall_pins as rp

    key = (12345, 678)
    assert key not in rp.read_pins()
    rp.record_pin(key, 0.8)
    assert rp.read_pins()[key] == 0.8
    rp.record_pin(key, 0.1)  # second write loses: the pin is frozen
    assert rp.read_pins()[key] == 0.8
    # a seed key can never be overridden by the sidecar
    seed_key = next(iter(rp.SEED))
    rp.record_pin(seed_key, 0.0)
    assert rp.read_pins()[seed_key] == rp.SEED[seed_key]


def test_oracle_sql_reads_sidecar_and_fails_closed(pins_env):
    from bacon_spark.gate import recall_pins as rp

    rp.record_pin((3, 99), 0.45)
    sql = rp.oracle_recall_sql()
    con = duckdb.connect()

    def run(view_sql):
        con.execute("DROP VIEW IF EXISTS embeddings")
        con.execute(f"CREATE VIEW embeddings AS {view_sql}")
        return con.execute(sql).fetchone()

    # sidecar corpus: 3 rows summing to 99 -> the recorded pin
    row = run(
        "SELECT [33.0::DOUBLE] AS embedding FROM range(3)"
    )
    assert row == (10, 8, 3, 0.45)
    # unpinned corpus -> -1.0, fail closed
    row = run("SELECT [1.0::DOUBLE] AS embedding FROM range(4)")
    assert row[-1] == -1.0
    # seed corpus shape: 500 rows, checksum 1 (sf0.01 arm = 0.7)
    row = run(
        "SELECT [0.002::DOUBLE] AS embedding FROM range(500)"
    )
    assert row[-1] == 0.7


def test_sidecar_file_created_empty_and_survives_garbage(pins_env):
    from bacon_spark.gate import recall_pins as rp

    p = rp.pins_path()
    assert os.path.exists(p)
    assert json.load(open(p)) == []
    # corrupted sidecar degrades to seed-only pins, not an exception
    with open(p, "w") as f:
        f.write("not json")
    assert rp.read_pins() == rp.SEED
