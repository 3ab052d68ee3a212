"""SQL pushdown backend: compile a CubeQuery to a SQL string and execute it
via ``spark.sql`` over a registered table/view.

Re-expression of the reference's Postgres pushdown path
(/root/reference/bacon/sql.py:218-265 + the immutable SqlQuery builder,
sql.py:52-160): axes fold in via label SQL expressions, measures via each
accumulator's ``sql`` form, filters via an op map with the same null
special-casing as the in-memory path (/root/reference/bacon/cubedef.py:444-481).

Target dialect is Spark SQL: the compiled text runs against temp views,
catalog tables, or JDBC-backed tables — in each case Catalyst applies the
same pushdown/pruning it gives the DataFrame path, so this backend exists
for SQL-surface parity (tools that want query text), not performance. The
reference's trick of re-running returned aggregates through the
accumulators (aggregation of partial aggregates, sound by associativity)
is unnecessary here: Spark executes the whole query.
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass, field, replace

from pyspark.sql import DataFrame, SparkSession

from .cubedef import CubeDef
from .cubequery import MULTI_ARG_OPS, CubeQuery
from .engine import Slice
from .errors import QueryError


def sql_literal(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S')}'"
    if isinstance(v, dt.date):
        return f"DATE '{v.isoformat()}'"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _lit_array(value, dialect: str = "spark") -> str:
    items = sorted(
        str(x) for x in value if x is not None and x != ""
    )
    body = ", ".join(sql_literal(x) for x in items)
    if dialect == "duckdb":
        return f"[{body}]"
    return f"array({body})"


def _clean_set(expr: str, dialect: str = "spark") -> str:
    """SQL form of make_set (/root/reference/bacon/cutting.py:788-796)."""
    if dialect == "duckdb":
        return (
            f"list_distinct(list_filter(coalesce({expr}, []), "
            f"x -> x IS NOT NULL AND x <> ''))"
        )
    return (
        f"array_distinct(filter(coalesce({expr}, array()), "
        f"x -> x IS NOT NULL AND x <> ''))"
    )


def sql_filter(expr: str, op: str, value, dialect: str = "spark") -> str:
    """Filter op -> SQL predicate, preserving the engine's null semantics
    (see filters.py module docstring). *dialect*: the scalar/membership
    forms are portable SQL; the set-algebra forms use the target
    engine's array vocabulary (Spark ``array_*`` / DuckDB ``list_*``)."""
    if op == "eq":
        return f"{expr} IS NULL" if value is None else f"{expr} = {sql_literal(value)}"
    if op == "ne":
        if value is None:
            return f"{expr} IS NOT NULL"
        return f"({expr} IS NULL OR {expr} <> {sql_literal(value)})"
    if op in ("gt", "ge", "lt", "le"):
        sym = {"gt": ">", "ge": ">=", "lt": "<", "le": "<="}[op]
        return f"{expr} {sym} {sql_literal(value)}"
    if op in ("in", "ni"):
        vals = value if isinstance(value, (set, frozenset, list, tuple)) else {value}
        has_null = any(x is None for x in vals)
        rest = sorted((str(x) for x in vals if x is not None))
        in_list = f"{expr} IN ({', '.join(sql_literal(x) for x in rest)})" if rest else "FALSE"
        if op == "in":
            return f"({expr} IS NULL OR {in_list})" if has_null else in_list
        if has_null:
            return f"({expr} IS NOT NULL AND NOT {in_list})"
        return f"({expr} IS NULL OR NOT {in_list})"
    if op in ("match", "nmatch"):
        # Both engines do an unanchored SEARCH (Spark RLIKE = java.util.regex
        # find; DuckDB regexp_matches = RE2 partial match). Patterns must
        # stay in the shared Java∩RE2 subset — no backreferences, no
        # lookaround, no \p{...} spelling differences — the same restriction
        # PII_PATTERNS (llm/text.py) already documents for its twin oracles.
        hit = (
            f"regexp_matches({expr}, {sql_literal(value)})"
            if dialect == "duckdb"
            else f"{expr} RLIKE {sql_literal(value)}"
        )
        if op == "match":
            return hit
        return f"({expr} IS NULL OR NOT {hit})"

    s = _clean_set(expr, dialect)
    b = _lit_array(value, dialect)
    if dialect == "duckdb":
        table = {
            "hasall": f"list_has_all({s}, {b})",
            "hasany": f"list_has_any({s}, {b})",
            "hasnone": f"NOT list_has_any({s}, {b})",
            "hasonly": f"list_sort({s}) = {b}",
            "equals": f"list_sort({s}) = {b}",
            "subsetof": f"list_has_all({b}, {s})",
            "supersetof": f"list_has_all({s}, {b})",
            "disjointfrom": f"NOT list_has_any({s}, {b})",
            "intersects": f"list_has_any({s}, {b})",
        }
    else:
        table = {
            "hasall": f"size(array_except({b}, {s})) = 0",
            "hasany": f"size(array_intersect({s}, {b})) > 0",
            "hasnone": f"size(array_intersect({s}, {b})) = 0",
            "hasonly": f"sort_array({s}) = {b}",
            "equals": f"sort_array({s}) = {b}",
            "subsetof": f"size(array_except({s}, {b})) = 0",
            "supersetof": f"size(array_except({b}, {s})) = 0",
            "disjointfrom": f"size(array_intersect({s}, {b})) = 0",
            "intersects": f"size(array_intersect({s}, {b})) > 0",
        }
    neg = {
        "hasnotall": "hasall",
        "notsubsetof": "subsetof",
        "notsupersetof": "supersetof",
        "notequals": "equals",
    }
    if op in table:
        return table[op]
    if op in neg:
        return f"NOT ({table[neg[op]]})"
    raise QueryError(f"operator {op!r} has no SQL form")


def sargable_extra_sql(label, op, value) -> str | None:
    """SQL form of the sargability rewrite (reference
    /root/reference/bacon/cubedef.py:728-741): the redundant raw-column
    bound implied by ``trunc(base) OP value``, so the executing engine can
    use a raw-column index / zone map. Only truncating date labels (those
    defining ``_next_boundary``) with a named base column qualify."""
    base = getattr(label, "_base", None)
    nb_f = getattr(label, "_next_boundary", None)
    if (
        value is None
        or op not in ("ge", "gt", "le", "lt", "eq")
        or not isinstance(base, str)
        or nb_f is None
    ):
        return None
    nb = nb_f(value)
    if nb is None:
        return None
    if op == "ge":
        return f"{base} >= {sql_literal(value)}"
    if op == "gt":
        return f"{base} >= {sql_literal(nb)}"
    if op in ("le", "lt"):
        return f"{base} < {sql_literal(nb)}"
    if op == "eq":
        return f"({base} >= {sql_literal(value)} AND {base} < {sql_literal(nb)})"
    return None


@dataclass(frozen=True)
class SqlQuery:
    """Immutable SELECT builder (reference SqlQuery,
    /root/reference/bacon/sql.py:52-160); every mutator returns a copy."""

    table: str = ""
    groups: tuple[tuple[str, str], ...] = ()  # (alias, expr)
    aggregates: tuple[tuple[str, str], ...] = ()  # (alias, expr)
    filters: tuple[str, ...] = ()
    order: tuple[str, ...] = ()
    limit_n: int | None = None
    offset_n: int = 0
    ctes: tuple[tuple[str, str], ...] = ()

    def add_cte(self, name: str, sql: str) -> SqlQuery:
        return replace(self, ctes=self.ctes + ((name, sql),))

    def add_group(self, alias: str, expr: str) -> SqlQuery:
        return replace(self, groups=self.groups + ((alias, expr),))

    def add_aggregate(self, alias: str, expr: str) -> SqlQuery:
        return replace(self, aggregates=self.aggregates + ((alias, expr),))

    def add_filter(self, pred: str) -> SqlQuery:
        return replace(self, filters=self.filters + (pred,))

    def add_order(self, expr: str) -> SqlQuery:
        return replace(self, order=self.order + (expr,))

    def limit(self, n: int | None, offset: int = 0) -> SqlQuery:
        return replace(self, limit_n=n, offset_n=offset)

    def to_sql(self) -> str:
        parts = []
        if self.ctes:
            parts.append("WITH " + ", ".join(f"{n} AS ({s})" for n, s in self.ctes))
        cols = [f"{e} AS {a}" for a, e in self.groups]
        cols += [f"{e} AS {a}" for a, e in self.aggregates]
        parts.append("SELECT " + (", ".join(cols) if cols else "*"))
        parts.append(f"FROM {self.table}")
        if self.filters:
            parts.append("WHERE " + " AND ".join(f"({p})" for p in self.filters))
        if self.groups and self.aggregates:
            # group by the label EXPRESSION, not the select alias: strict
            # engines (Derby) resolve GROUP BY identifiers against the base
            # table only, so an expression label aliased e.g. `month` would
            # fail there while the expression form is standard everywhere
            # (same rationale as the ORDER BY aggregate-expression rule)
            parts.append("GROUP BY " + ", ".join(e for _, e in self.groups))
        if self.order:
            parts.append("ORDER BY " + ", ".join(self.order))
        if self.limit_n is not None:
            parts.append(f"LIMIT {self.limit_n}")
        if self.offset_n:
            parts.append(f"OFFSET {self.offset_n}")
        return "\n".join(parts)


class SqlCuttingBoard:
    """CuttingBoard over a registered SQL table: compiles the query to SQL
    text and executes with spark.sql (reference SqlCuttingBoard,
    /root/reference/bacon/sql.py:218-265)."""

    def __init__(
        self,
        cubedef: CubeDef,
        spark: SparkSession,
        table: str,
        dialect: str = "spark",
    ):
        self.cubedef = cubedef
        self.spark = spark
        self.table = table
        # target engine vocabulary for set-algebra/date forms; "spark"
        # (temp views, spark.sql) or "duckdb" (compile-only here — run
        # the text through a duckdb connection)
        self.dialect = dialect

    def compile(self, query: CubeQuery) -> str:
        sq = SqlQuery(table=self.table)
        for name, op, value in query.filters:
            label = self.cubedef.get_label(name)
            sq = sq.add_filter(
                sql_filter(self._label_sql(label), op, value, self.dialect)
            )
            extra = sargable_extra_sql(label, op, value)
            if extra is not None:
                sq = sq.add_filter(extra)
        for a in query.axes:
            label = self.cubedef.get_label(a)
            sq = sq.add_group(a, self._label_sql(label))
        for v in query.values:
            m = self.cubedef.get_value(v)
            sq = sq.add_aggregate(v, m.acc.sql(self._label_sql(m)))
        if query.order:
            sign, value_name, _ = query.order
            if value_name in query.values:
                # order by the full AGGREGATE expression, not the alias:
                # strict engines (Derby) resolve identifiers inside ORDER
                # BY expressions against the base table, so
                # coalesce(<alias>, 0) is a syntax error there while
                # coalesce(<aggregate>, 0) is standard everywhere — and
                # preserves the None-sorts-as-0 contract exactly
                m = self.cubedef.get_value(value_name)
                agg_sql = m.acc.sql(self._label_sql(m))
                sq = sq.add_order(
                    f"coalesce({agg_sql}, 0) {'DESC' if sign < 0 else 'ASC'}"
                )
        for a in query.axes:
            rev = self.cubedef.get_label(a).reverse
            sq = sq.add_order(f"{a} {'DESC NULLS LAST' if rev else 'ASC NULLS FIRST'}")
        return sq.to_sql()

    def _label_sql(self, label) -> str:
        return label.sql_expr(self.dialect)

    def df(self, query: CubeQuery) -> DataFrame:
        return self.spark.sql(self.compile(query))

    def slice(self, query: CubeQuery) -> Slice:
        return Slice(self.cubedef, query, self.df(query))


class JdbcCuttingBoard(SqlCuttingBoard):
    """SqlCuttingBoard executing against a LIVE database over JDBC: the
    compiled query ships whole as ``spark.read.jdbc``'s ``query`` option,
    so the ENTIRE filter+aggregate runs inside the database and Spark
    reads back only the (group-count-bounded) result rows — the
    reference's psycopg2 execution path
    (/root/reference/bacon/sql.py:218-265) re-expressed as a JDBC
    pushdown subquery.

    This is the right shape for a cube over an operational database: the
    DB's indexes serve the sargable filters (sql.sargable_extra_sql adds
    the raw-column bounds), aggregation happens where the data lives,
    and nothing data-proportional crosses the wire. For ANALYTICAL
    volumes, land the table in parquet and use the ordinary boards —
    JDBC is a row-at-a-time protocol, not a scan format.

    Executed end-to-end in tests/test_jdbc.py against embedded Derby
    (the one JDBC engine shipped with Spark), totals matched against the
    in-memory board on the same rows. The compiled SQL is the dialect-
    conservative subset (SUM/COUNT/MIN/MAX/AVG, CASE, COALESCE, NULLS
    FIRST/LAST) — dialect-specific accumulators would override
    ``Accumulator.sql`` per backend."""

    def __init__(
        self,
        cubedef: CubeDef,
        spark: SparkSession,
        table: str,
        url: str,
        properties: dict | None = None,
    ):
        super().__init__(cubedef, spark, table)
        self.url = url
        self.properties = dict(properties or {})

    def df(self, query: CubeQuery) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("query", self.compile(query))
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        return reader.load()

    def rows_df(
        self,
        query: CubeQuery,
        partition_column: str | None = None,
        lower_bound=None,
        upper_bound=None,
        num_partitions: int | None = None,
    ) -> DataFrame:
        """RAW matching rows (the de-aggregated row-detail surface), read
        over JDBC with optional PARTITIONED fetch.

        The aggregate path (:meth:`df`) is group-count-bounded, so one
        connection is the right shape there. Raw rows are not: a row
        detail over a broad filter can be table-sized, and one JDBC
        cursor would serialize the whole transfer through a single task.
        Passing ``partition_column`` (a numeric/date/timestamp column,
        ideally the primary key) with ``lower_bound``/``upper_bound``/
        ``num_partitions`` maps onto Spark's stride-partitioned JDBC
        scan: N concurrent cursors, each reading one
        ``partition_column`` range, with the cube's filters (plus the
        sargable rewrites) pushed into every cursor's WHERE. Bounds only
        shape the strides — rows outside them are still read, by the
        edge partitions, so a stale max(pk) underestimates parallelism,
        never correctness. Leave the partition args unset for small
        results (one cursor, exactly :meth:`df`'s behavior).

        The reference reads raw rows through one psycopg2 cursor
        (/root/reference/bacon/sql.py:218-265) — fine for a web page of
        rows, not for an extract; this is the extract path."""
        filters = []
        for name, op, value in query.filters:
            label = self.cubedef.get_label(name)
            filters.append(sql_filter(self._label_sql(label), op, value))
            extra = sargable_extra_sql(label, op, value)
            if extra is not None:
                filters.append(extra)
        where = " AND ".join(f"({p})" for p in filters)
        sql = f"SELECT * FROM {self.table}" + (f" WHERE {where}" if where else "")
        reader = self.spark.read.format("jdbc").option("url", self.url)
        if partition_column is not None:
            # partitioned reads need dbtable (a derived-table alias), not
            # the query option — Spark appends its stride predicates
            reader = (
                reader.option("dbtable", f"({sql}) AS bacon_rows")
                .option("partitionColumn", partition_column)
                .option("lowerBound", str(lower_bound))
                .option("upperBound", str(upper_bound))
                .option("numPartitions", str(num_partitions or 1))
            )
        else:
            reader = reader.option("query", sql)
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        return reader.load()
