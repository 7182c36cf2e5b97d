"""DuckDB oracle for the log-bucketed quantile sketch (VERDICT r8 #5).

The sketch pipeline is deterministic end-to-end except for TWO float
primitives: ``log`` in the bucket index and ``pow`` in the bucket
midpoint. The old rows-only rationale ("libm ulp differences could
flip a boundary") over-counted the exposure:

- the DIVISOR ``log(base)`` is a Python ``math.log`` literal baked
  into the Spark plan — so the oracle embeds the *same 17-digit
  float literal* instead of calling ``ln(base)`` in DuckDB, removing
  that divergence entirely;
- what remains is ``ln(|v|/lo)`` (JVM ``Math.log`` vs DuckDB libm)
  flipping ``floor`` only when the ratio sits within ~1 ulp of an
  exact bucket boundary, and ``pow(base, k-0.5)`` differing in the
  last ulp of an OUTPUT value. The first is measure-zero per fixture
  (and the comparison is deterministic — a hit would fail loudly);
  the second is squashed by rounding the emitted quantiles to 6 dp on
  BOTH sides (the sketch's own error bound is ±2%, nine orders of
  magnitude coarser).

Merge-transparency makes the oracle single-level: the registry query
builds per-(group, shard) leaves and merges — pinned bit-equal to
bucketing the raw union directly (``tests/test_sketches.py``), so the
SQL groups straight by the final key.
"""

from __future__ import annotations

import math


def qsketch_oracle_sql(
    table: str,
    group_col: str,
    value_col: str,
    probs: list[float],
    base: float = 1.04,
    lo: float = 0.01,
) -> str:
    """Quantiles of ``value_col`` per ``group_col`` under the sketch's
    lower-exact-quantile convention: the midpoint of the first bucket
    whose running count reaches ``ceil(p · n)``."""
    logbase = repr(math.log(base))  # the Spark plan's literal, verbatim
    bucket = f"""CASE
      WHEN isnan({value_col}) OR isinf({value_col}) THEN NULL
      WHEN abs({value_col}) <= {lo!r} THEN 0
      WHEN {value_col} < 0 THEN
        -((floor(ln(abs({value_col}) / {lo!r}) / {logbase})::INT) + 1)
      ELSE (floor(ln(abs({value_col}) / {lo!r}) / {logbase})::INT) + 1
    END"""
    picks = []
    for p in probs:
        name = "p" + ("%g" % (p * 100)).replace(".", "_").replace("-", "m")
        # midpoint sign·lo·base^(|k|−0.5), 0 for bucket 0; 6-dp rounded
        # to absorb pow's last-ulp cross-engine freedom
        picks.append(f"""round((
      SELECT CASE WHEN c.bk = 0 THEN 0.0
                  WHEN c.bk < 0 THEN -({lo!r} * pow({base!r}, (-c.bk)::DOUBLE - 0.5))
                  ELSE {lo!r} * pow({base!r}, c.bk::DOUBLE - 0.5) END
      FROM cum c
      WHERE c.{group_col} = n.{group_col}
        AND c.cum >= ceil({p!r} * n.n_rows)::BIGINT
      ORDER BY c.bk ASC LIMIT 1
    ), 6) AS {name}""")
    sel = ",\n    ".join(picks)
    return f"""
WITH b AS (
  SELECT {group_col}, ({bucket}) AS bk
  FROM {table}
),
pb AS (
  SELECT {group_col}, bk, COUNT(*) AS c
  FROM b WHERE bk IS NOT NULL
  GROUP BY {group_col}, bk
),
cum AS (
  SELECT {group_col}, bk, c,
         SUM(c) OVER (PARTITION BY {group_col} ORDER BY bk
                      ROWS UNBOUNDED PRECEDING) AS cum
  FROM pb
),
n AS (
  SELECT g.{group_col}, COALESCE(t.n_rows, 0) AS n_rows
  FROM (SELECT DISTINCT {group_col} FROM b) g
  LEFT JOIN (SELECT {group_col}, SUM(c) AS n_rows FROM pb
             GROUP BY {group_col}) t USING ({group_col})
)
SELECT n.{group_col}, n.n_rows,
    {sel}
FROM n
ORDER BY n.{group_col}
"""
