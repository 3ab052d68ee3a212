"""Django-ORM queryset source: cube over an ORM queryset, filters pushed
into the database.

Reference surface being re-expressed (NOT copied — the reference executes
aggregation in Python over streamed model instances):

* ``DjangoCuttingBoard`` (/root/reference/bacon/sql.py:286-345): a cutting
  board over a Django queryset; query filters become ``.filter(Q)`` calls,
  labels contribute ``.only()/.select_related()/.prefetch_related()`` so the
  ORM fetches only what the cube needs.
* ``DjangoConnectionFactory`` (/root/reference/bacon/django/sql.py): SQL
  pushdown via the Django connection.

Spark-first design
------------------
The ORM boundary is a *source*, nothing more: we push the sargable subset
of the cube filters into the queryset (so the database scans and filters),
prune columns with ``.values()``, then hand a properly-typed DataFrame to
the ordinary CuttingBoard — aggregation, roll-up reuse, pivots etc. all run
on the Spark side exactly as for parquet sources. Two paths:

* ``queryset_frame``: materialize the (filtered, pruned) queryset through
  ``.iterator()`` into an Arrow-backed local DataFrame. Correct for
  dimension-sized tables (the only thing the reference ever cubed through
  Django: web-app ORM rows). Bounded by ``max_rows`` so a 100 TB fact table
  cannot be pulled through the driver by accident.
* ``jdbc_options``: for big tables, compile ``str(queryset.query)`` into a
  ``spark.read.jdbc`` pushdown subquery so executors read partitioned slices
  directly from the database — the scale path; env-gated (no DB in the test
  container), the option-builder itself is pure and tested.

Everything is duck-typed: no ``import django`` anywhere. Any object with
the queryset protocol (``.filter(**kw)``, ``.values(*cols)``,
``.iterator()``, optional ``.model._meta.concrete_fields`` and
``.query``) works, which is also what makes the source unit-testable in
this container.

Null-semantics note (why only SOME ops push down): the engine's filter ops
follow the reference's *Python* semantics (filters.py module docstring) —
``ne`` and ``ni`` PASS null rows, which SQL ``NOT (x = v)`` / ``NOT IN``
exclude. Only ops whose ORM lookup agrees with the engine's predicate are
pushed (eq, gt, ge, lt, le, null-free in, eq-None -> isnull); the rest stay
Spark-side as residual predicates. Pushdown is therefore a pure
optimization, never a semantics change.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..engine import CuttingBoard
from ..errors import QueryError

__all__ = [
    "push_filters",
    "queryset_frame",
    "jdbc_options",
    "QuerysetCuttingBoard",
]

# Django Field.get_internal_type() -> Spark type. Decimal handled apart
# (needs precision/scale from the field instance).
_INTERNAL_TYPES: dict[str, T.DataType] = {
    "AutoField": T.LongType(),
    "BigAutoField": T.LongType(),
    "SmallAutoField": T.LongType(),
    "IntegerField": T.LongType(),
    "BigIntegerField": T.LongType(),
    "SmallIntegerField": T.LongType(),
    "PositiveIntegerField": T.LongType(),
    "PositiveSmallIntegerField": T.LongType(),
    "PositiveBigIntegerField": T.LongType(),
    "FloatField": T.DoubleType(),
    "BooleanField": T.BooleanType(),
    "NullBooleanField": T.BooleanType(),
    "DateField": T.DateType(),
    "DateTimeField": T.TimestampType(),
    "CharField": T.StringType(),
    "TextField": T.StringType(),
    "SlugField": T.StringType(),
    "EmailField": T.StringType(),
    "URLField": T.StringType(),
    "UUIDField": T.StringType(),
    "ForeignKey": T.LongType(),
    "OneToOneField": T.LongType(),
}


def _field_spark_type(field) -> T.DataType:
    kind = field.get_internal_type()
    if kind == "DecimalField":
        p = getattr(field, "max_digits", None) or 38
        s = getattr(field, "decimal_places", None) or 0
        return T.DecimalType(p, s)
    return _INTERNAL_TYPES.get(kind, T.StringType())


def _model_schema(queryset, columns: list[str] | None) -> T.StructType | None:
    """Schema from model metadata when the queryset carries it; None when
    not (caller falls back to sampling)."""
    meta = getattr(getattr(queryset, "model", None), "_meta", None)
    fields = getattr(meta, "concrete_fields", None)
    if fields is None:
        return None
    by_name = {}
    for f in fields:
        # attname covers FK columns (author -> author_id), like .values()
        for name in {f.name, getattr(f, "attname", f.name)}:
            by_name[name] = f
    wanted = columns if columns is not None else list(by_name)
    out = []
    for name in wanted:
        f = by_name.get(name)
        if f is None:
            return None  # annotated/aliased column: metadata can't type it
        out.append(T.StructField(name, _field_spark_type(f), nullable=True))
    return T.StructType(out)


# op -> Django lookup suffix, for ops whose ORM/SQL behavior matches the
# engine's predicate exactly (see module docstring).
_PUSH_LOOKUPS = {"eq": "exact", "gt": "gt", "ge": "gte", "lt": "lt", "le": "lte"}


def push_filters(queryset, filters) -> tuple[Any, list[tuple[str, str, Any]]]:
    """Apply the pushdown-safe subset of CubeQuery filter triples to the
    queryset; return (filtered_queryset, residual_triples).

    The reference pushes every filter through ``label.add_q_filter``
    (/root/reference/bacon/sql.py:343-345); here the unsafe ops (ne, ni,
    match, set algebra) stay residual so null semantics never change.
    """
    residual: list[tuple[str, str, Any]] = []
    for name, op, value in filters:
        if op == "eq" and value is None:
            queryset = queryset.filter(**{f"{name}__isnull": True})
        elif op in _PUSH_LOOKUPS and value is not None:
            queryset = queryset.filter(**{f"{name}__{_PUSH_LOOKUPS[op]}": value})
        elif op == "in":
            vals = value if isinstance(value, (set, frozenset, list, tuple)) else {value}
            if any(v is None for v in vals):
                residual.append((name, op, value))  # null-in-set: engine-only
            else:
                queryset = queryset.filter(**{f"{name}__in": sorted(vals)})
        else:
            residual.append((name, op, value))
    return queryset, residual


def queryset_frame(
    spark: SparkSession,
    queryset,
    columns: list[str] | None = None,
    schema: T.StructType | None = None,
    max_rows: int = 1_000_000,
) -> DataFrame:
    """Materialize a queryset into a DataFrame (dimension-sized data only).

    Column pruning happens at the ORM (``.values(*columns)`` — the analogue
    of the reference's ``.only()`` accumulation, /root/reference/bacon/
    sql.py:308-320); typing comes from model metadata when available so
    empty querysets still yield a stable schema. Rows stream through
    ``.iterator()`` (server-side cursor in real Django) and are capped at
    *max_rows*: this path is for ORM-sized tables; larger tables must use
    the ``jdbc_options`` pushdown so the driver never holds the data.
    """
    if schema is None:
        schema = _model_schema(queryset, columns)
    values_qs = queryset.values(*columns) if columns else queryset.values()
    it = values_qs.iterator() if hasattr(values_qs, "iterator") else iter(values_qs)
    rows = []
    for i, rec in enumerate(it):
        if i >= max_rows:
            raise QueryError(
                f"queryset exceeds max_rows={max_rows}; use the JDBC pushdown "
                "path (jdbc_options) for tables this size"
            )
        rows.append(rec)
    if schema is None:
        if not rows:
            raise QueryError(
                "cannot infer a schema for an empty queryset without model "
                "metadata; pass schema="
            )
        cols = columns or sorted(rows[0])
        return spark.createDataFrame([tuple(r[c] for c in cols) for r in rows], cols)
    names = [f.name for f in schema.fields]
    return spark.createDataFrame([tuple(r.get(c) for c in names) for r in rows], schema)


def jdbc_options(queryset, url: str, partition_column: str | None = None,
                 num_partitions: int = 32, lower_bound=None, upper_bound=None) -> dict:
    """Compile a queryset into ``spark.read.format("jdbc")`` options: the
    scale path, executors read the database directly.

    ``str(queryset.query)`` is the ORM-compiled SQL (the same SQL the
    reference's DjangoConnectionFactory would execute); it becomes a
    pushdown subquery via dbtable. With a numeric *partition_column* +
    bounds the read is split into *num_partitions* parallel range scans.
    Env-gated: building the options is pure (tested); executing needs a
    live database + driver jar.
    """
    sql = str(queryset.query)
    opts = {"url": url, "dbtable": f"({sql}) bacon_src"}
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise QueryError("partitioned JDBC read needs lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            numPartitions=str(num_partitions),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
        )
    return opts


class QuerysetCuttingBoard(CuttingBoard):
    """CuttingBoard over a Django-style queryset.

    The reference subclass re-implements slicing against the ORM
    (/root/reference/bacon/sql.py:286-345); here only *sourcing* is
    ORM-specific: per query we push safe filters into the queryset, prune
    to the columns the query touches, materialize, apply residual filters
    through the normal engine path, and aggregate in Spark. Results cache
    / roll-up reuse behave exactly as for any other board.
    """

    def __init__(self, cubedef, queryset, spark: SparkSession, max_rows: int = 1_000_000):
        self.queryset = queryset
        self.spark = spark
        self.max_rows = max_rows
        # the base df is only a schema carrier; _frame_for re-sources per query
        base = queryset_frame(spark, queryset, max_rows=max_rows)
        super().__init__(cubedef, base, cache_results=False)

    def _source_columns(self, query) -> list[str] | None:
        """Columns the query touches — the analogue of the reference's
        ``.only()`` accumulation (/root/reference/bacon/sql.py:308-320).
        Only derivable when every touched label/measure is backed by a
        plain source column (``_expr`` is a str); any computed expression
        -> None -> fetch all columns (a safe, never-wrong fallback)."""
        cols: set[str] = set()
        touched = [self.cubedef.get_label(a) for a in query.axes]
        touched += [self.cubedef.get_value(v) for v in query.values]
        touched += [self.cubedef.get_label(n) for n, _op, _v in query.filters]
        for obj in touched:
            e = getattr(obj, "_expr", None)
            # str exprs can be full SQL expressions (F.expr); only a bare
            # identifier is a source column we can prune to
            if not (isinstance(e, str) and e.isidentifier()):
                return None
            cols.add(e)
        return sorted(cols) or None

    def slice(self, query):
        from dataclasses import replace as _dc_replace

        pushed_qs, residual = push_filters(self.queryset, query.filters)
        df = queryset_frame(
            self.spark, pushed_qs, columns=self._source_columns(query),
            max_rows=self.max_rows,
        )
        residual_query = _dc_replace(query, filters=tuple(residual))
        board = CuttingBoard(self.cubedef, df, cache_results=False)
        return board.slice(residual_query)
