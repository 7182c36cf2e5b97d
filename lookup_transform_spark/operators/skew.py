"""Skew-mitigation joins (SURVEY.md §4 custom-physics item (b)).

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles sort-merge skew automatically; ``salted_join`` is
the explicit fallback for pathological hot keys — e.g. a null-heavy or
power-law foreign key — where even a single key exceeds one task's
capacity.

Salting must be result-invariant: the left side gets a deterministic
salt in [0, S), the right side is exploded ×S, and the join key becomes
(key, salt). Every left row still meets exactly the right rows it would
have met; the hot key's rows now spread across S tasks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    salt: int = 16,
    how: str = "left",
    salt_source: str | None = None,
) -> DataFrame:
    """Equi-join with an S-way salted key.

    ``salt_source``: a left column whose hash spreads rows (default: the
    whole row via a deterministic hash of the join key + a per-row
    column is not available generically, so callers pass a unique-ish
    column like a primary key; falling back to the join key itself
    would NOT spread the hot key).
    """
    if salt_source is None:
        raise ValueError(
            "salt_source must name a left column (ideally unique per row) "
            "whose hash distributes the hot key's rows"
        )
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left"):
        # the right side is exploded ×salt, so right-preserving joins
        # are NOT result-invariant: every exploded copy whose salt no
        # left row hashes to would surface as a spurious null-padded
        # row (up to salt duplicates per unmatched right row)
        raise ValueError(
            "salted_join is result-invariant only for how='inner'/'left' "
            f"(right side is exploded x{salt}); got how={how!r}"
        )
    lft = left.withColumn(
        "__salt__", F.pmod(F.xxhash64(F.col(salt_source)), F.lit(salt))
    )
    rgt = right.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i).cast("long") for i in range(salt)]))
    )
    joined = lft.join(
        rgt,
        (lft[left_on] == rgt[right_on]) & (lft["__salt__"] == rgt["__salt__"]),
        how,
    )
    return joined.select(
        *[lft[c] for c in left.columns],
        *[rgt[c] for c in right.columns if c != right_on],
    )
