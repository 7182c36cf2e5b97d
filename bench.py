"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced with the noop sink (full plan runs, nothing
collected to the driver). First query is preceded by a warmup so JVM
startup/codegen doesn't pollute the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lookup_transform_spark import registry  # noqa: E402
from lookup_transform_spark.session import get_spark  # noqa: E402


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _oracle_timings(sf_dir: str) -> dict[str, float]:
    """Time each DuckDB oracle on the same parquet — the per-query
    baseline the ≤2× target in BASELINE.md refers to."""
    import duckdb

    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    out: dict[str, float] = {}
    for name, sql in sorted(registry.ORACLES.items()):
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[name] = round(samples[len(samples) // 2], 4)
    con.close()
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # BASELINE.md protocol: warm session, median of 3 per query
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    with_oracle = os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0"
    spark = get_spark("lookup_transform_spark-bench")

    # warmup: spin up executors / codegen paths once
    _run(registry.QUERIES["lookup"](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            _run(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        timings[name] = round(samples[len(samples) // 2], 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    payload = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    if with_oracle:
        oracle = _oracle_timings(sf_dir)
        payload["oracle_duckdb_sec"] = oracle
        payload["oracle_total_sec"] = round(sum(oracle.values()), 4)
    print(json.dumps(payload))
    spark.stop()


if __name__ == "__main__":
    main()
