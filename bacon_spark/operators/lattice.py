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
        from ..accumulators import SketchDistinct, SketchPercentile

        for v in values:
            if isinstance(cubedef.get_value(v).acc, (SketchDistinct, SketchPercentile)):
                # a lattice of finished sketch ESTIMATES would be
                # unmergeable and unservable; the mergeable structures are
                # the sketch STATES (HLL registers: SketchLattice;
                # histogram bucket counts merge by addition the same way)
                # — refuse loudly rather than failing inside
                # grouping-set codegen
                raise ValueError(
                    f"{type(cubedef.get_value(v).acc).__name__} measure {v!r} "
                    "cannot be materialized in a CubeLattice (finished "
                    "estimates don't merge); materialize the sketch STATE "
                    "instead (SketchLattice for HLL registers)"
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


class SketchLattice:
    """Sketch-STATE materialization for SketchDistinct and
    SketchPercentile measures — the structure that makes approximate
    distinct (and approximate percentiles) full rollup citizens.

    A CubeLattice of finished HLL ESTIMATES would be a dead end:
    estimates don't merge, so no coarser grain could ever be served from
    a finer one. HLL REGISTERS do merge — exactly, by max per bucket
    (max is associative/commutative/idempotent; operators/sketch.py
    hll_merge) — so materializing ONE register frame at the finest grain
    (at most |finest groups|·2^p tiny rows) serves EVERY coarser axis
    subset, every filter drill, and the grand total by re-maxing
    registers and estimating, with results BIT-identical to computing
    the sketch directly over the (filtered) base table. The base is
    never rescanned; every served plan aggregates result-sized register
    rows.

    Registered on a CuttingBoard like a CubeLattice; the planner routes
    covered SketchDistinct queries through :meth:`serve_query`
    (register-level filter → re-max → estimate), which also makes
    arbitrary non-eq filter drills sound — the finished-value lattice
    path has to gate those on ``reaggregatable``. Incremental
    maintenance is exact for the same reason: a delta's registers fold
    in by max (:meth:`refresh`), the IVM property finished estimates
    lack."""

    def __init__(
        self,
        cubedef: CubeDef,
        df: DataFrame,
        axes: tuple[str, ...],
        values: tuple[str, ...],
        persist: bool = True,
    ):
        from ..accumulators import SketchDistinct, SketchPercentile

        for v in values:
            if not isinstance(
                cubedef.get_value(v).acc, (SketchDistinct, SketchPercentile)
            ):
                raise ValueError(
                    f"SketchLattice holds SketchDistinct/SketchPercentile "
                    f"measures only; {v!r} is "
                    f"{type(cubedef.get_value(v).acc).__name__} "
                    "(materialize ordinary measures in a CubeLattice)"
                )
        self.cubedef = cubedef
        self.axes = tuple(axes)
        self.values = tuple(values)
        self._persist = persist
        axis_cols = [cubedef.get_label(a).column().alias(a) for a in self.axes]
        # distinct finest-grain axis combinations: groups whose sketch
        # input is all-NULL still exist (estimate 0.0), matching the
        # engine's direct-compute semantics
        self._groups = df.select(*axis_cols).distinct()
        self._regs: dict[str, DataFrame] = {
            v: self._build_regs(df, v) for v in self.values
        }
        if persist:
            self._groups = self._groups.persist()
            self._regs = {v: r.persist() for v, r in self._regs.items()}

    def _build_regs(self, df: DataFrame, v: str) -> DataFrame:
        from ..operators.sketch import hist_sketch, hll_registers

        meas = self.cubedef.get_value(v)
        axis_cols = [
            self.cubedef.get_label(a).column().alias(a) for a in self.axes
        ]
        base = df.select(*axis_cols, meas.column().alias("__sketch_in__"))
        if self._is_hist(v):
            return hist_sketch(base, "__sketch_in__", list(self.axes))
        return hll_registers(base, "__sketch_in__", list(self.axes), p=meas.acc.p)

    def _is_hist(self, v: str) -> bool:
        from ..accumulators import SketchPercentile

        return isinstance(self.cubedef.get_value(v).acc, SketchPercentile)

    def _merge_state(self, frame: DataFrame, v: str, keys: list) -> DataFrame:
        """Merge sketch STATE down to *keys* grain: HLL registers by MAX,
        histogram bucket counts by SUM — both lossless, which is the
        whole reason the lattice stores state instead of estimates."""
        if self._is_hist(v):
            return frame.groupBy(*keys, F.col("bucket")).agg(
                F.sum("cnt").alias("cnt")
            )
        return frame.groupBy(*keys, F.col("bucket")).agg(
            F.max("reg").alias("reg")
        )

    def _estimate(self, state: DataFrame, v: str, axes: list) -> DataFrame:
        """Finish a merged state frame to (axes..., v). The histogram
        estimate is cast to double to match the engine's direct-compute
        output type (and the 0.0 all-null-group coalesce)."""
        from ..operators.sketch import hist_quantiles, hll_estimate

        acc = self.cubedef.get_value(v).acc
        if self._is_hist(v):
            return hist_quantiles(state, (acc.pct,), axes).select(
                *axes, F.col("q_est").cast("double").alias(v)
            )
        return hll_estimate(state, axes, p=acc.p).select(
            *axes, F.coalesce(F.col("hll_estimate"), F.lit(0.0)).alias(v)
        )

    @property
    def reaggregatable(self) -> bool:
        # registers merge exactly; the lattice survives board.refresh
        return True

    def serve_query(
        self,
        out_axes: tuple[str, ...],
        out_values: tuple[str, ...],
        filters=(),
        filter_ops=None,
    ) -> DataFrame:
        """(axes..., values...) at any grain ⊆ the lattice axes, after
        applying *filters* ((name, op, value) over axis label values,
        semantics from *filter_ops*) AT THE REGISTER LEVEL — filter
        rows of the register frame, re-max down to *out_axes*, estimate.
        Exact vs direct computation for every filter shape, eq or not,
        because registers (unlike estimates) merge losslessly."""
        import functools

        from pyspark.sql import Column

        if filter_ops is None:
            from ..filters import FILTER_OPS as filter_ops
        missing = (set(out_axes) | {n for n, _, _ in filters}) - set(self.axes)
        if missing:
            raise QueryError(f"axes not in sketch lattice: {sorted(missing)}")

        def filtered(frame: DataFrame) -> DataFrame:
            for n, op, val in filters:
                frame = frame.filter(filter_ops[op](F.col(n), val))
            return frame

        if not out_axes:  # dim-0: grand total per value, one row
            out = None
            for v in out_values:
                reg = self._merge_state(filtered(self._regs[v]), v, [])
                est = self._estimate(reg, v, [])
                out = est if out is None else out.crossJoin(est)
            return out

        out = filtered(self._groups).select(*out_axes).distinct()
        for v in out_values:
            reg = self._merge_state(
                filtered(self._regs[v]), v, [F.col(a) for a in out_axes]
            )
            est = self._estimate(reg, v, list(out_axes)).select(
                *[F.col(a).alias(f"__est_{a}__") for a in out_axes],
                F.col(v).alias(v),
            )
            # NULL axis values are real groups: null-safe attach + 0.0
            # for groups whose sketch input was all-NULL (engine parity)
            cond = functools.reduce(
                Column.__and__,
                [F.col(a).eqNullSafe(F.col(f"__est_{a}__")) for a in out_axes],
            )
            out = (
                out.join(est, cond, "left")
                .drop(*[f"__est_{a}__" for a in out_axes])
                .withColumn(v, F.coalesce(F.col(v), F.lit(0.0)))
            )
        return out.select(*out_axes, *out_values)

    def slice_df(self, wanted_axes: tuple[str, ...]) -> DataFrame:
        return self.serve_query(tuple(wanted_axes), self.values)

    def grand_total(self) -> DataFrame:
        return self.serve_query((), self.values)

    def refresh(self, delta_df: DataFrame) -> None:
        """Fold a delta in EXACTLY: the delta's register frame merges by
        max per (axes, bucket) — the resulting lattice is bit-identical
        to a rebuild over base ∪ delta (no decay, no approximation on
        top of the sketch's own). One pass over the delta + a shuffle of
        register-frame-sized rows; localCheckpoint pins the merge so
        repeated refreshes don't grow the plan."""
        new_groups = (
            self._groups.unionByName(
                delta_df.select(
                    *[
                        self.cubedef.get_label(a).column().alias(a)
                        for a in self.axes
                    ]
                )
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        new_regs = {}
        for v in self.values:
            merged = self._merge_state(
                self._regs[v].unionByName(self._build_regs(delta_df, v)),
                v,
                [F.col(a) for a in self.axes],
            ).localCheckpoint(eager=True)
            new_regs[v] = merged
        old_groups, old_regs = self._groups, self._regs
        self._groups, self._regs = new_groups, new_regs
        if self._persist:
            old_groups.unpersist()
            for r in old_regs.values():
                r.unpersist()

    def unpersist(self) -> None:
        if self._persist:
            self._groups.unpersist()
            for r in self._regs.values():
                r.unpersist()


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
