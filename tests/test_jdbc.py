"""Live JDBC round-trip (VERDICT r7 'what's missing #2'): the compiled
cube SQL executes inside a REAL database — embedded Derby, the one JDBC
engine shipped in Spark's jars — via JdbcCuttingBoard's pushdown query,
and the totals must match the in-memory board over the same rows."""

import pytest
from pyspark.sql import functions as F

from bacon_spark import Count, CubeDef, CubeQuery, CuttingBoard, Label, Measure, Sum
from bacon_spark.sql import JdbcCuttingBoard

DERBY = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture(scope="module")
def derby(spark, tmp_path_factory):
    """A Derby database holding a small sales table, created through
    Spark's own JDBC writer (so the round trip is Spark-native both
    ways)."""
    db = tmp_path_factory.mktemp("derby") / "salesdb"
    url = f"jdbc:derby:{db};create=true"
    rows = [
        ("CA", "open", 10, 100.0),
        ("CA", "won", 5, 50.5),
        ("NY", "open", 7, 70.25),
        ("NY", "lost", 2, None),
        (None, "open", 1, 10.0),
    ]
    df = spark.createDataFrame(
        rows, "state string, status string, units int, amount double"
    )
    # populate through RAW JDBC in the JVM (the production situation: the
    # operational DB exists independently of Spark). Spark's own Derby
    # writer maps StringType to CLOB, which Derby can neither compare to
    # literals nor accept from VARCHAR binds — a dialect limitation of
    # the WRITE path only; the read/pushdown path under test is unaffected.
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.execute(
        "CREATE TABLE sales (state VARCHAR(32), status VARCHAR(32), "
        "units INT, amount DOUBLE)"
    )
    ins = conn.prepareStatement("INSERT INTO sales VALUES (?, ?, ?, ?)")
    for state, status, units, amount in rows:
        for i, v in ((1, state), (2, status)):
            ins.setNull(i, 12) if v is None else ins.setString(i, v)
        ins.setInt(3, units)
        ins.setNull(4, 8) if amount is None else ins.setDouble(4, amount)
        ins.executeUpdate()
    conn.close()
    return url, df


def _cubedef():
    cd = CubeDef("sales")
    cd.add_label(Label("state"))
    cd.add_label(Label("status"))
    cd.add_measure(Measure("units", acc=Sum()))
    cd.add_measure(Measure("amount", acc=Sum()))
    cd.add_measure(Measure("n", "units", acc=Count()))
    return cd


def test_jdbc_pushdown_matches_in_memory_board(spark, derby):
    url, df = derby
    cd = _cubedef()
    jb = JdbcCuttingBoard(cd, spark, "sales", url, properties=DERBY)
    mem = CuttingBoard(cd, df, cache_results=False)
    q = (
        CubeQuery().add_axis("state")
        .add_value("units").add_value("amount").add_value("n")
        .add_filter("status", "in", frozenset({"open", "won"}))
    )
    got = [tuple(r) for r in jb.slice(q).collect()]
    want = [tuple(r) for r in mem.slice(q).collect()]
    assert got == want and len(got) == 3  # incl. the NULL state group


def test_jdbc_plan_contains_no_spark_aggregate(spark, derby):
    """The aggregation must run IN the database: the Spark plan is a bare
    JDBC relation scan of the pushdown query — no HashAggregate."""
    url, _ = derby
    jb = JdbcCuttingBoard(_cubedef(), spark, "sales", url, properties=DERBY)
    q = CubeQuery().add_axis("status").add_value("units")
    plan = jb.df(q)._jdf.queryExecution().executedPlan().toString()
    assert "JDBCRelation" in plan or "jdbc" in plan.lower()
    assert "HashAggregate" not in plan


def test_jdbc_dim0_and_order(spark, derby):
    url, df = derby
    cd = _cubedef()
    jb = JdbcCuttingBoard(cd, spark, "sales", url, properties=DERBY)
    mem = CuttingBoard(cd, df, cache_results=False)
    q0 = CubeQuery().add_value("units").add_value("n")
    assert [tuple(r) for r in jb.slice(q0).collect()] == [
        tuple(r) for r in mem.slice(q0).collect()
    ]
    qo = (
        CubeQuery().add_axis("state").add_value("units").set_order("units", -1)
    )
    got = [tuple(r) for r in jb.slice(qo).collect()]
    assert got == [tuple(r) for r in mem.slice(qo).collect()]


def test_jdbc_computed_label_group_by_expression(spark, derby):
    """ADVICE r8: GROUP BY must emit the label EXPRESSION, not the select
    alias — Derby resolves GROUP BY identifiers against the base table
    only, so a computed label aliased `band` fails there under the alias
    form. The CASE expression parses identically in Spark SQL and Derby,
    so the same cubedef drives both boards."""
    url, df = derby
    cd = CubeDef("sales")
    # equal-length branch literals: Derby types CASE over CHAR literals
    # as CHAR(max), padding 'big' to 'big  ' — 'hi'/'lo' sidestep the pad
    cd.add_label(Label("band", "CASE WHEN units >= 5 THEN 'hi' ELSE 'lo' END"))
    cd.add_label(Label("status"))
    cd.add_measure(Measure("units", acc=Sum()))
    cd.add_measure(Measure("n", "units", acc=Count()))
    jb = JdbcCuttingBoard(cd, spark, "sales", url, properties=DERBY)
    mem = CuttingBoard(cd, df, cache_results=False)
    q = (
        CubeQuery().add_axis("band").add_value("units").add_value("n")
        .add_filter("status", "ne", "lost")
    )
    sql = jb.compile(q)
    assert "GROUP BY CASE WHEN units >= 5" in sql  # expression, not alias
    got = [tuple(r) for r in jb.slice(q).collect()]
    want = [tuple(r) for r in mem.slice(q).collect()]
    assert got == want and len(got) == 2


def test_jdbc_partitioned_rows_read(spark, derby):
    """r9 (VERDICT task #7): raw-rows extract over JDBC with stride
    partitioning — N concurrent cursors on ranges of a numeric column,
    cube filters pushed into every cursor's WHERE; rows OUTSIDE the
    bounds still arrive via the edge partitions."""
    url, df = derby
    cd = _cubedef()
    jb = JdbcCuttingBoard(cd, spark, "sales", url, properties=DERBY)
    q = CubeQuery().add_filter("status", "ne", "lost")
    rows = jb.rows_df(
        q, partition_column="units", lower_bound=2, upper_bound=8,
        num_partitions=3,
    )
    assert rows.rdd.getNumPartitions() == 3  # stride-partitioned scan
    key = lambda t: tuple(map(repr, t))  # None-safe row ordering
    got = sorted((tuple(r) for r in rows.collect()), key=key)
    want = sorted(
        (tuple(r) for r in df.filter("status is null or status <> 'lost'").collect()),
        key=key,
    )
    assert got == want and len(got) == 4  # units=10 > upperBound included
    # unpartitioned form: same rows through one cursor
    single = sorted((tuple(r) for r in jb.rows_df(q).collect()), key=key)
    assert single == got
