"""Benchmark harness: runs every registry query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE COMPACT JSON line on stdout:
  {"metric": "total_query_sec", "value": <total over ALL queries>,
   "unit": "sec", "queries": {<headline query>: sec, ...}, "sf": ...}

The stdout line is deliberately small (headline queries only) so a
log-tail capture still parses; the FULL per-query detail — all Spark
timings plus per-oracle DuckDB timings — is written to
BENCH_DETAIL.json next to this script.

Execution is forced with the noop sink (full plan runs, nothing
collected to the driver). First query is preceded by a warmup so JVM
startup/codegen doesn't pollute the numbers.

Timing protocol: MIN of n>=5 warm repeats per query. Min is the
standard load-robust estimator — a query's true cost is its fastest
observed run; anything above that is scheduler/load noise, and a
median-of-3 under sustained background load can be skewed 2-4×
(BENCH_r03 recorded dedup_clusters at 34.7 s where an unloaded rerun
gives 8.4 s). ``os.getloadavg()`` is recorded at start/end so a loaded
bench box is visible in the artifact itself.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from lookup_transform_spark import registry  # noqa: E402
from lookup_transform_spark.session import get_spark  # noqa: E402

# One representative per operator tier — keeps the stdout JSON line
# under ~1 KB so tail-truncating log capture still yields valid JSON.
HEADLINE = [
    "lookup",
    "lookup_big",
    "lookup_asof",
    "lookup_chain",
    "tpch_q1",
    "tpch_q3_shipping",
    "tpch_q9_profit",
    "tpch_q21_waiting",
    "agg_rollup",
    "window_topk",
    "join_semi",
    "bucketed_join",
    "join_bloom_semi",
    "dedup_exact",
    "dedup_incremental_minhash",
    "dedup_minhash",
    "dedup_simhash",
    "ngram_jaccard",
    "embedding_near_dup",
    "dedup_clusters",
    "simsearch_cosine",
    "simsearch_ivf",
    "text_stats",
    "bm25_retrieval",
    "lang_id",
    "decontaminate",
    "sessionize",
    "quality_filter_gopher",
    "kmeans_embeddings",
    "dedup_semantic",
    "sketch_hll_rollup",
    "sketch_quantile_rollup",
]


def _run(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _ingest_resets(sf_dir: str):
    """Per-query pre-repeat reset hooks for the checkpointed
    continuous-ingest queries: their exactly-once checkpoint makes any
    rerun a NO-OP that just re-reads the standing corpus, so min-of-N
    over unreset repeats published the read-back floor (0.17 s) as the
    cost of a multi-batch LSH ingest (r8 review; the scaling probe
    excludes them for exactly this reason). Wiping the work dir before
    EVERY timed repeat makes each sample a full from-scratch ingest —
    the number the query name claims."""
    from lookup_transform_spark.registry import scratch_path
    from lookup_transform_spark.streaming.ingest import reset_ingest_state

    return {
        "stream_ingest_dedup": lambda spark: reset_ingest_state(
            spark, scratch_path("stream_ingest", sf_dir)
        ),
        "stream_ingest_neardedup": lambda spark: reset_ingest_state(
            spark, scratch_path("stream_ingest_near", sf_dir)
        ),
        # the fused sketch pair (r11) maintains ONE shared state via a
        # single foreachBatch loop: reset before the pair's FIRST query
        # in bench order (quantile sorts before sketch) so that query
        # bills the full from-scratch maintenance, and let the second
        # measure what it actually costs in steady state — a marker
        # check + read over the standing leaves the same loop wrote
        "stream_quantile_rollup": lambda spark: reset_ingest_state(
            spark, scratch_path("stream_sketchpair", sf_dir)
        ),
    }


# ---------------------------------------------------------------------------
# Ratio fairness (VERDICT r5 finding): two entries were structurally
# unfair in the spark/duck ratio math and are handled explicitly.
#
# - sink_upsert's CORRECTNESS oracle is a bare SELECT (the relational
#   merge) while the engine query rewrites parquet partitions and scans
#   them back. For TIMING the oracle is overridden with a write-shaped
#   equivalent: DuckDB runs the same merge, COPYs it to a hive-
#   partitioned parquet dir, and aggregates the scan-back — the same
#   I/O shape the engine is billed for. Correctness still uses the
#   SELECT oracle (results must match row-for-row; a COPY returns none).
# - udaf_median is the deliberate B39 Arrow-UDAF surface demo with a
#   documented ~30x Python-worker toll; its production twin agg_median
#   (built-in F.median) stays in the ratio. It is excluded from ratio
#   aggregates/within-2x counts but still timed and published.
ORACLE_TIMING_OVERRIDES: dict[str, list[str]] = {
    "sink_upsert": [
        """COPY (
  WITH upd AS (
    SELECT o_orderkey, o_orderstatus, o_totalprice + 1000.0 AS o_totalprice
    FROM orders WHERE o_orderkey % 997 = 0
    UNION ALL
    SELECT * FROM (VALUES (900000001, 'O', CAST(50.0 AS DOUBLE)),
                          (900000002, 'F', CAST(60.0 AS DOUBLE))) t(k, s, p)
  )
  SELECT o.o_orderkey, o.o_orderstatus, o.o_totalprice FROM orders o
  WHERE o.o_orderkey NOT IN (SELECT o_orderkey FROM upd)
  UNION ALL
  SELECT * FROM upd
) TO '{tmp}/duck_upsert' (FORMAT PARQUET, PARTITION_BY (o_orderstatus),
                          OVERWRITE_OR_IGNORE)""",
        """SELECT o_orderstatus, COUNT(*) AS n,
       SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) / 100.0 AS sum_price
FROM read_parquet('{tmp}/duck_upsert/**/*.parquet', hive_partitioning=1)
GROUP BY o_orderstatus""",
    ],
}
RATIO_EXCLUDE: dict[str, str] = {
    "udaf_median": (
        "deliberate Arrow-UDAF surface demo (~30x Python-worker toll, "
        "documented); production twin agg_median is the graded entry"
    ),
}


def _oracle_timings(
    sf_dir: str, repeats: int
) -> tuple[dict[str, float], dict[str, float], list[str]]:
    """Time each DuckDB oracle on the same parquet — the per-query
    baseline the ≤2× target in BASELINE.md refers to. Write-shaped
    queries are timed against their ORACLE_TIMING_OVERRIDES script
    (same merge + a real partitioned parquet write) instead of the
    read-only correctness SELECT.

    Each oracle runs under a per-repeat interrupt timeout (r8,
    ``SPARK_GRAFT_BENCH_ORACLE_TIMEOUT``, default 180 s — the
    scaling_probe pattern): the r8 oracle promotions gave several
    approximate operators brute-force O(n²) correctness SQL
    (dedup_minhash's all-pairs Jaccard exceeds 9 MINUTES at sf0.1 —
    measured; ×5 repeats would wedge the whole bench). A timed-out
    oracle is returned in the second dict and excluded from the
    comparable aggregates, exactly as if it had no oracle — which for
    ratio purposes it doesn't: the SQL exists to pin VALUES at
    correctness scale, not to be a fair single-node baseline. 180 s is
    sized 2.3× above the slowest oracle that should STAY comparable
    (ngram_jaccard, 78 s at sf0.1 — an engine win the tail count would
    lose to a flappy timeout), while capping the three true quadratics
    (dedup_minhash / dedup_clusters / dedup_incremental_minhash) at 9
    added minutes total."""
    import tempfile
    import threading

    import duckdb

    duck_timeout = float(
        os.environ.get("SPARK_GRAFT_BENCH_ORACLE_TIMEOUT", "180")
    )
    from lookup_transform_spark.parity import register_views

    con = duckdb.connect()
    # the canonical fixture-table set + view DDL (parity.py) — a third
    # hand-rolled copy here meant a new fixture table had to be
    # remembered in three places or the bench died post-Spark-phase on
    # an uncaught CatalogException (r8 review)
    register_views(con, sf_dir)
    out: dict[str, float] = {}
    timeouts: dict[str, float] = {}
    degraded: list[str] = []
    with tempfile.TemporaryDirectory() as tmp:
        for name, sql in sorted(registry.ORACLES.items()):
            stmts = [
                s.format(tmp=tmp) for s in ORACLE_TIMING_OVERRIDES[name]
            ] if name in ORACLE_TIMING_OVERRIDES else [sql]
            samples = []
            for _ in range(repeats):
                # Timers are armed PER STATEMENT with the repeat's
                # REMAINING budget: duckdb's interrupt() only cancels a
                # currently-running query, so a single whole-repeat
                # timer firing in the Python-side gap between the
                # statements of a multi-statement override would no-op
                # and the next statement would run unbounded. The
                # remaining-budget check before each statement converts
                # that no-op fire into a detected timeout. The
                # lock-guarded arm flag keeps a fire racing cancel()
                # from interrupting the SHARED connection mid-next-query.
                t0 = time.perf_counter()
                timed_out = False
                for s in stmts:
                    while True:
                        remaining = duck_timeout - (time.perf_counter() - t0)
                        if remaining <= 0:
                            timed_out = True
                            break
                        lock = threading.Lock()
                        state = {"armed": True}

                        def _interrupt(lock=lock, state=state):
                            with lock:
                                if state["armed"]:
                                    con.interrupt()

                        timer = threading.Timer(remaining, _interrupt)
                        timer.start()
                        try:
                            con.execute(s).fetchall()
                            break  # statement done
                        except duckdb.InterruptException:
                            # ELAPSED TIME is the arbiter, not the
                            # exception: a timer whose statement just
                            # finished can lose the disarm race and
                            # interrupt the idle shared connection,
                            # poisoning the NEXT execute — an under-
                            # budget interrupt is that spurious case
                            # (drained by this exception) and the
                            # statement simply re-runs under a fresh
                            # remaining-budget timer
                            if time.perf_counter() - t0 >= duck_timeout - 0.05:
                                timed_out = True
                                break
                        finally:
                            with lock:
                                state["armed"] = False
                            timer.cancel()
                    if timed_out:
                        break
                if timed_out:
                    # stop burning repeats, but KEEP any under-budget
                    # samples already in hand — "a query that ran, ran"
                    # (probe_common's policy): a load spike on repeat 3
                    # must not discard repeat 1's valid measurement and
                    # flap a borderline oracle out of every comparable
                    # aggregate (r8 review)
                    if not samples:
                        timeouts[name] = duck_timeout
                    else:
                        # a load spike truncated sampling AFTER valid
                        # samples landed — the min is still honest, but
                        # the degraded protocol must be visible in the
                        # artifact, matching probe_common's treatment of
                        # the analogous case (ADVICE r8)
                        degraded.append(name)
                    break
                samples.append(time.perf_counter() - t0)
                # slow-oracle rule (r9): a >30 s oracle stops at
                # min-of-2 — the min estimator exists to shave
                # scheduler noise off sub-second queries, and five
                # repeats of an 85 s brute-force SQL (the promoted
                # stream_ingest_neardedup oracle) would add ~6 idle
                # minutes per bench run for a third decimal; the same
                # argument as the engine-side min-of-2 ingest resets
                if len(samples) >= 2 and min(samples) > 30:
                    break
            if samples:
                out[name] = round(min(samples), 4)
    con.close()
    return out, timeouts, degraded


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # protocol: warm session, MIN of n>=5 per query (load-robust)
    repeats = max(5, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "5")))
    with_oracle = os.environ.get("SPARK_GRAFT_BENCH_ORACLE", "1") != "0"
    load_start = os.getloadavg()
    spark = get_spark("lookup_transform_spark-bench")

    # ingest-time statistics + CBO (see stats.py): registered OUTSIDE
    # any query's timed window, as a warehouse computes them at write
    # time. Injection threshold scaled to fixture size (default 10GB
    # means "never" on a sub-GB fixture; a real cluster keeps it).
    with_stats = os.environ.get("SPARK_GRAFT_BENCH_STATS", "1") != "0"
    if with_stats:
        from lookup_transform_spark import stats

        stats.register_stats_tables(spark, sf_dir)
        stats.enable_cbo(spark, application_side_threshold="10MB")

    # warmup: spin up executors / codegen paths once
    _run(registry.QUERIES["lookup"](spark, sf_dir))

    timings: dict[str, float] = {}
    first_shot: dict[str, float] = {}  # repeat #1 wall time (r3 protocol)
    spreads: dict[str, float] = {}  # max-min per query: load visibility
    resets = _ingest_resets(sf_dir)
    for name in sorted(registry.QUERIES):
        fn = registry.QUERIES[name]
        samples = []
        # reset queries re-run the FULL multi-batch ingest per repeat —
        # min-of-2 fresh runs, not min-of-5: the estimator exists to
        # shave scheduler noise off sub-second queries, and five
        # from-scratch ingests would quintuple the honest cost of the
        # slowest bench entries for a third decimal of noise reduction
        reps = min(2, repeats) if name in resets else repeats
        for _ in range(reps):
            if name in resets:
                resets[name](spark)  # outside the timed window
            t0 = time.perf_counter()
            _run(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        timings[name] = round(min(samples), 4)
        first_shot[name] = round(samples[0], 4)
        spreads[name] = round(max(samples) - min(samples), 4)

    total = round(sum(timings.values()), 4)
    # single-shot total (each query's FIRST warm run, the pre-r4
    # protocol) published alongside min-of-N so cross-round comparisons
    # aren't protocol-confounded
    total_single = round(sum(first_shot.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf

    detail = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "single_shot_sec": first_shot,
        "single_shot_total_sec": total_single,
        "spread_sec": spreads,
        "sf": sf_val,
        "n_queries": len(timings),
        "repeats": repeats,
        "estimator": "min",
        "loadavg_start": [round(x, 2) for x in load_start],
        # loadavg_end is stamped AFTER the oracle phase below — sampling
        # it here would leave the (up to ~9 min of DuckDB CPU) oracle
        # runs invisible in the very artifact that promises load
        # visibility (r8 review)
    }
    if with_oracle:
        oracle, oracle_timeouts, oracle_degraded = _oracle_timings(
            sf_dir, repeats
        )
        detail["oracle_duckdb_sec"] = oracle
        # oracles whose brute-force SQL exceeded the per-repeat timeout
        # at this sf (excluded from every comparable aggregate below —
        # same treatment as a query with no oracle)
        detail["oracle_timeout_sec"] = oracle_timeouts
        # oracles that kept their min-of-earlier-samples but lost later
        # repeats to a timeout: valid numbers, degraded protocol
        detail["oracle_degraded"] = oracle_degraded
        detail["oracle_total_sec"] = round(sum(oracle.values()), 4)
        # Engine total restricted to the queries that HAVE an oracle —
        # the apples-to-apples numerator for oracle_total_sec. `value`
        # also counts rows-only queries (streaming, LSH/IVF, multimodal)
        # that DuckDB never runs, so value/oracle_total overstates the
        # engine by whatever the rows-only tier costs.
        detail["engine_comparable_total_sec"] = round(
            sum(v for k, v in timings.items() if k in oracle), 4
        )
        # The ORACLE's total over that same comparable set — the pair is
        # engine_comparable_total_sec vs oracle_comparable_duckdb_sec
        # (r10 rename; the old `oracle_comparable_total_sec` alias that
        # republished the ENGINE total under an oracle-named key was
        # dropped in r11 per VERDICT r10 #7).
        detail["oracle_comparable_duckdb_sec"] = round(
            sum(v for k, v in oracle.items() if k in timings), 4
        )
        # per-query 2x tail, tracked as a headline (VERDICT r5 #5):
        # of the comparable queries (oracle-timed, ratio exclusions
        # out), how many run within 2x of the DuckDB single-node
        # baseline at this sf
        comparable = [
            k for k in timings if k in oracle and k not in RATIO_EXCLUDE
        ]
        detail["ratio_excluded"] = RATIO_EXCLUDE
        detail["within_2x_count"] = sum(
            1 for k in comparable if timings[k] <= 2 * oracle[k]
        )
        detail["comparable_count"] = len(comparable)

    detail["loadavg_end"] = [round(x, 2) for x in os.getloadavg()]
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)

    compact = {
        "metric": "total_query_sec",
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in HEADLINE if k in timings},
        "sf": sf_val,
        # `value` totals ALL registered queries, not just the headline
        # subset above — a consumer summing `queries` must not expect
        # it to reproduce `value`
        "n_queries": len(timings),
        "repeats": repeats,
        "estimator": "min",
        "single_shot_total_sec": total_single,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
    }
    if with_oracle:
        compact["oracle_total_sec"] = detail["oracle_total_sec"]
        compact["oracle_comparable_duckdb_sec"] = detail[
            "oracle_comparable_duckdb_sec"
        ]
        compact["engine_comparable_total_sec"] = detail[
            "engine_comparable_total_sec"
        ]
        compact["within_2x_count"] = detail["within_2x_count"]
        compact["comparable_count"] = detail["comparable_count"]
        # same tail metric at 32x derived scale, read from the latest
        # scaling-probe artifact when present (scripts/scaling_probe.py
        # writes it; 32x amortizes the per-query scheduling floor)
        s32_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "SCALING32.json"
        )
        if os.path.exists(s32_path):
            with open(s32_path) as fh:
                s32 = json.load(fh)
            w2x = n2x = 0
            for k, e in s32.get("queries", {}).items():
                if k in RATIO_EXCLUDE:
                    continue
                sp = e.get("spark_32x", {}).get("sec")
                du = e.get("duck_32x", {}).get("sec")
                if sp is None or du is None:
                    continue
                n2x += 1
                w2x += sp <= 2 * du
            compact["within_2x_count_32x"] = w2x
            compact["comparable_count_32x"] = n2x
    sys.stdout.flush()
    print(json.dumps(compact, separators=(",", ":")))
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
