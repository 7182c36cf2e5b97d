"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship lookup query at sf0.001;
``queries()``/``oracle_sql()`` expose the full SURVEY.md §2 registry
(implemented in lookup_transform_spark/registry.py). Queries without an
oracle entry are approximate/hash-seeded operators (LSH, IVF, rolling
fingerprints) — the driver records rows-only checks for those.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from lookup_transform_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return registry.QUERIES["lookup"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted → rows-only check)."""
    return dict(registry.ORACLES)
