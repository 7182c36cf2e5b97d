"""As-of and range lookups (SURVEY.md §2.2 B19) — the only non-equi plans.

``asof_join`` uses the union-sort trick rather than a range join: tag
left/right rows, sort once per key by (ts, tag), and carry the latest
right-side values forward with ``last(ignorenulls)``. One shuffle on the
key, zero row explosion — this is the formulation that survives 100 TB,
unlike ``join(l.ts >= r.ts)`` + windowed dedup, which materializes every
(left, earlier-right) pair before pruning.

Tie semantics match DuckDB's ``ASOF JOIN`` (and the usual definition):
a right row with ts equal to the left ts IS visible (>=), implemented by
sorting right rows (tag 0) before left rows (tag 1) at equal ts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    value_fields: list[str],
    suffix: str = "",
) -> DataFrame:
    """left LEFT ASOF JOIN right: for each left row, the right row with
    the greatest right_ts <= left_ts within the same key group.

    Returns all left columns + ``value_fields`` (renamed with ``suffix``),
    nullable (no earlier right row → null, left-outer semantics).
    """
    keys = [on] if isinstance(on, str) else list(on)
    out_names = [v + suffix for v in value_fields]

    left_tagged = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__tag__"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{o}__")
          for v, o in zip(value_fields, out_names)],
    )
    right_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in keys else F.col(c)
          for c in left.columns],
        F.col(right_ts).alias("__ts__"),
        F.lit(0).alias("__tag__"),
        *[F.col(v).alias(f"__v_{o}__") for v, o in zip(value_fields, out_names)],
    )

    unioned = left_tagged.unionByName(right_tagged)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts__").asc(), F.col("__tag__").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__tag__"),
        *[
            F.last(F.col(f"__v_{o}__"), ignorenulls=True).over(w).alias(o)
            for o in out_names
        ],
    )
    return carried.filter(F.col("__tag__") == 1).drop("__tag__")


def range_join(
    input_df: DataFrame,
    bands: "DataFrame | list[dict]",
    value_col: str,
    lo_col: str,
    hi_col: str,
    band_fields: list[str],
    how: str = "left",
    strategy: str = "case",
) -> DataFrame:
    """Half-open range lookup: input.value ∈ [band.lo, band.hi).

    ``bands`` may be a DataFrame or a plain list of dicts (keys
    ``lo_col``/``hi_col``/each band field) — the literal form compiles
    with zero Spark jobs, which matters when the banding is defined in
    application code rather than stored as a table.

    strategy="case" (default): collect the band table (a dimension by
    construction — if it doesn't fit on the driver it isn't a banding)
    and compile it into a chained CASE expression — a pure projection,
    whole-stage codegen, zero join. First matching band wins, so bands
    must be disjoint (asserted).

    strategy="bnlj": broadcast nested-loop join — keeps multiplicity on
    overlapping bands, at interpreted-predicate cost (DataFrame bands
    only).
    """
    if strategy == "case":
        if isinstance(bands, list):
            rows = list(bands)
        else:
            rows = [r.asDict() for r in
                    bands.select(lo_col, hi_col, *band_fields).collect()]
        rows.sort(key=lambda r: r[lo_col])
        for prev, cur in zip(rows, rows[1:]):
            if cur[lo_col] < prev[hi_col]:
                raise ValueError(
                    "case strategy requires disjoint bands; use strategy='bnlj'"
                )
        v = input_df[value_col]
        outs = []
        for b in band_fields:
            expr = None
            for r in rows:
                clause = (v >= F.lit(r[lo_col])) & (v < F.lit(r[hi_col]))
                expr = (
                    F.when(clause, F.lit(r[b]))
                    if expr is None
                    else expr.when(clause, F.lit(r[b]))
                )
            outs.append(expr.alias(b))
        result = input_df.select(*[input_df[c] for c in input_df.columns], *outs)
        if how == "inner":
            result = result.filter(F.col(band_fields[0]).isNotNull())
        return result
    pruned = bands.select(
        F.col(lo_col).alias("__lo__"),
        F.col(hi_col).alias("__hi__"),
        *[F.col(b) for b in band_fields],
    )
    cond = (input_df[value_col] >= F.col("__lo__")) & (
        input_df[value_col] < F.col("__hi__")
    )
    joined = input_df.join(F.broadcast(pruned), cond, how)
    return joined.select(
        *[input_df[c] for c in input_df.columns],
        *[F.col(b) for b in band_fields],
    )
