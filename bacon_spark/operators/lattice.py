"""Cube-lattice precomputation: materialize rollup/cube/grouping-sets once,
serve any coarser slice from the lattice.

The Spark-idiomatic upgrade of the reference's roll-up reuse strategy
(ManipulateSlice, /root/reference/bacon/cutting.py:336-522): instead of
re-keying cached Python cells, precompute the whole aggregation lattice with
``cube()``/``rollup()`` + ``grouping_id()`` in ONE pass over the fact data
(partial aggregation makes the lattice barely more expensive than the
finest grain alone), then answer any axis subset with a grouping_id filter —
a metadata-only lookup that at scale turns into partition pruning when the
lattice is written partitioned by grouping_id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..cubedef import CubeDef
from ..errors import QueryError


class CubeLattice:
    """A materialized cube over a fixed axis list + measure set."""

    def __init__(
        self,
        cubedef: CubeDef,
        df: DataFrame,
        axes: tuple[str, ...],
        values: tuple[str, ...],
        mode: str = "cube",  # cube | rollup
        persist: bool = True,
    ):
        # the lattice stores FINISHED values per grouping set, so every
        # grain is exact with no read-time re-aggregation — any
        # accumulator is admissible at build time; only refresh() needs
        # the reaggregatable contract.
        from ..accumulators import SketchDistinct

        for v in values:
            if isinstance(cubedef.get_value(v).acc, SketchDistinct):
                # a lattice of finished HLL ESTIMATES would be unmergeable
                # and unservable; materializing register frames per grain
                # is a different structure (future work) — refuse loudly
                # rather than failing inside grouping-set codegen
                raise ValueError(
                    f"SketchDistinct measure {v!r} cannot be materialized "
                    "in a lattice; query it directly (the engine plans it "
                    "as a register aggregation per slice)"
                )
        self.cubedef = cubedef
        self.axes = tuple(axes)
        self.values = tuple(values)
        self.mode = mode
        self._persist = persist
        self.lattice = self._build(df)
        if persist:
            self.lattice = self.lattice.persist()

    def _build(self, df: DataFrame) -> DataFrame:
        axis_cols = [self.cubedef.get_label(a).column().alias(a) for a in self.axes]
        agg_cols = [self.cubedef.get_value(v).agg_column().alias(v) for v in self.values]
        passthrough = [c for c in df.columns if c not in set(self.axes)]
        projected = df.select(*axis_cols, *passthrough)
        grouped = (
            projected.cube(*[F.col(a) for a in self.axes])
            if self.mode == "cube"
            else projected.rollup(*[F.col(a) for a in self.axes])
        )
        return grouped.agg(
            F.grouping_id(*[F.col(a) for a in self.axes]).alias("_gid"), *agg_cols
        )

    @property
    def reaggregatable(self) -> bool:
        return all(
            self.cubedef.get_value(v).acc.reaggregatable for v in self.values
        )

    def refresh(self, delta_df: DataFrame) -> None:
        """Fold newly-arrived rows into the materialized lattice: aggregate
        ONLY the delta into its own (tiny) lattice, then merge finished
        values per (axes, _gid) group — grouping on _gid keeps the
        aggregated-away nulls of each grouping set separate from genuine
        null axis values. One pass over the delta + a shuffle of
        lattice-sized (aggregate-cardinality) rows; the base is never
        re-scanned — the same IVM contract as CuttingBoard.refresh.
        localCheckpoint pins the merge so repeated refreshes don't grow
        the plan (and can't silently recompute over a micro-batch source
        that is no longer readable)."""
        if not self.reaggregatable:
            raise QueryError(
                "lattice refresh needs reaggregatable accumulators; "
                "rebuild the lattice instead"
            )
        delta = self._build(delta_df)
        merges = [
            self.cubedef.get_value(v).acc.merge(F.col(v)).alias(v)
            for v in self.values
        ]
        merged = (
            self.lattice.unionByName(delta)
            .groupBy(*[F.col(a) for a in self.axes], F.col("_gid"))
            .agg(*merges)
            .localCheckpoint(eager=True)
        )
        old = self.lattice
        self.lattice = merged
        if self._persist:
            old.unpersist()

    def _gid_for(self, wanted: tuple[str, ...]) -> int:
        """grouping_id with bit=1 for each AGGREGATED-AWAY axis."""
        gid = 0
        for i, a in enumerate(self.axes):
            if a not in wanted:
                gid |= 1 << (len(self.axes) - 1 - i)
        return gid

    def slice_df(self, wanted_axes: tuple[str, ...]) -> DataFrame:
        """The pre-aggregated result for any subset of the lattice axes."""
        missing = set(wanted_axes) - set(self.axes)
        if missing:
            raise QueryError(f"axes not in lattice: {sorted(missing)}")
        gid = self._gid_for(tuple(wanted_axes))
        out = self.lattice.filter(F.col("_gid") == gid)
        return out.select(*wanted_axes, *self.values)

    def grand_total(self) -> DataFrame:
        return self.slice_df(())

    def unpersist(self) -> None:
        self.lattice.unpersist()


def grouping_sets_df(
    cubedef: CubeDef,
    df: DataFrame,
    sets: list[tuple[str, ...]],
    values: tuple[str, ...],
) -> DataFrame:
    """Explicit GROUPING SETS via SQL (free in Spark, absent in the
    reference — SURVEY §2.3 'grouping sets / cube')."""
    all_axes = sorted({a for s in sets for a in s})
    axis_cols = [cubedef.get_label(a).column().alias(a) for a in all_axes]
    agg_sqls = []
    for v in values:
        m = cubedef.get_value(v)
        agg_sqls.append(f"{m.acc.sql(m.sql_expr())} AS {v}")
    passthrough = [c for c in df.columns if c not in set(all_axes)]
    proj = df.select(*axis_cols, *passthrough)
    proj.createOrReplaceTempView("_gs_input")
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    sql = (
        f"SELECT {', '.join(all_axes)}, grouping_id() AS _gid, "
        f"{', '.join(agg_sqls)} FROM _gs_input GROUP BY GROUPING SETS ({sets_sql})"
    )
    return df.sparkSession.sql(sql)
