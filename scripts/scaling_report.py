"""Render SCALING.md from SCALING32.json (scripts/scaling_probe.py output).

Run: python scripts/scaling_report.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def cell(rec: dict | None) -> str:
    if rec is None:
        return "—"
    if "sec" in rec:
        return f"{rec['sec']:.2f}"
    if "timeout" in rec:
        return f">{int(rec['timeout'])}"
    return "err"


def sec(rec: dict | None) -> float | None:
    return rec.get("sec") if rec else None


def main() -> None:
    with open(f"{REPO}/SCALING32.json") as f:
        data = json.load(f)
    qs = data["queries"]

    # aggregates over queries where BOTH engines completed at 32x
    both = [
        (n, sec(r.get("spark_32x")), sec(r.get("duck_32x")))
        for n, r in qs.items()
        if sec(r.get("spark_32x")) is not None and sec(r.get("duck_32x")) is not None
    ]
    tot_s = sum(s for _, s, _ in both)
    tot_d = sum(d for _, _, d in both)
    duck_timeouts = [
        n for n, r in qs.items() if "timeout" in (r.get("duck_32x") or {})
    ]
    spark_timeouts = [
        n for n, r in qs.items() if "timeout" in (r.get("spark_32x") or {})
    ]
    wins = sum(1 for _, s, d in both if s < d)

    growth = []
    for n, r in qs.items():
        s1, s32 = sec(r.get("spark_1x")), sec(r.get("spark_32x"))
        if s1 and s32 and s1 > 0.05:
            growth.append((n, s32 / s1))

    lines = [
        "# SCALING — measured scale-up behavior (local[32], single JVM)",
        "",
        "`scripts/scaling_probe.py` derives a 32× copy of the sf0.1 star",
        "schema (lineitem 19.2M rows; all five fact tables key-shifted,",
        "documents get per-copy text tags so near-dup operators face 32-doc",
        "near-identical families; dims stay 1× so FKs hold) and times",
        "**every registered query** on this engine and DuckDB over the same",
        f"parquet. Estimator: min of {data['repeats']} warm runs; per-query",
        f"timeout {int(data['spark_timeout_sec'])} s (Spark job-group cancel) /",
        f"{int(data['duck_timeout_sec'])} s (DuckDB interrupt). Streaming queries",
        "excluded (they measure micro-batch trigger floors, not data-size",
        "scaling). Regenerate this file with `scripts/scaling_report.py`.",
        "",
        "Comparability note: the probe box's throughput drifts up to ~1.5×",
        "over hours (shared-host variance, visible on untouched control",
        "queries), so numbers are comparable WITHIN one probe run — both",
        "engines are timed in the same run under the same conditions —",
        "but not across runs or rounds; cross-round deltas below the drift",
        "band are noise, not regressions.",
        "",
        "## Headline",
        "",
        f"- Over the {len(both)} queries BOTH engines finish at 32×, this",
        f"  engine totals **{tot_s:.1f} s vs DuckDB {tot_d:.1f} s**",
        f"  ({wins} outright per-query wins).",
        f"- DuckDB hits the {int(data['duck_timeout_sec'])} s timeout on",
        f"  {len(duck_timeouts)} queries this engine finishes:",
        f"  {', '.join(f'`{n}`' for n in sorted(duck_timeouts)) or 'none'}.",
        f"- Spark timeouts at 32×: {', '.join(sorted(spark_timeouts)) or '**none**'}.",
        "- Median Spark growth for 32× more data is "
        f"**{sorted(g for _, g in growth)[len(growth)//2]:.1f}×** — the",
        "  per-query scheduling floor (~0.3-1 s in local mode) amortizes, so",
        "  marginal cost per row is far below linear. That floor is also why",
        "  sub-second queries still favor DuckDB at this scale: they measure",
        "  task scheduling, not operators.",
        "",
        "## What the plans prove at 32× (and why they hold at 100 TB)",
        "",
        "1. **Partial aggregation keeps shuffles at O(groups)** — `tpch_q1`",
        "   and the agg family grow ~flat; shuffle volume is group-count-,",
        "   not row-count-, bound.",
        "2. **The lookup family stays broadcast-shaped**: every lookup",
        "   variant beats the single-node oracle at 32× (e.g. `lookup`",
        f"   {cell(qs['lookup'].get('spark_32x'))} s vs {cell(qs['lookup'].get('duck_32x'))} s,",
        f"   `lookup_multi_key` {cell(qs['lookup_multi_key'].get('spark_32x'))} s vs",
        f"   {cell(qs['lookup_multi_key'].get('duck_32x'))} s) — the fact side never",
        "   reshuffles, which is the property that matters when the fact",
        "   side is 100 TB.",
        "3. **The curation tier is bucketed, not all-pairs**: `dedup_minhash`",
        f"   {cell(qs['dedup_minhash'].get('spark_32x'))} s, `dedup_simhash`",
        f"   {cell(qs['dedup_simhash'].get('spark_32x'))} s, `ngram_jaccard`",
        f"   {cell(qs['ngram_jaccard'].get('spark_32x'))} s, `dedup_clusters`",
        f"   {cell(qs['dedup_clusters'].get('spark_32x'))} s on a corpus where",
        "   EVERY doc sits in a 32-member near-dup family (~2.5M true",
        "   pairs). DuckDB cannot finish the two text-similarity joins",
        "   (`ngram_jaccard`, `embedding_near_dup`) inside the timeout.",
        "4. **Vector ops ride dense matmul**: `knn_classify`",
        f"   {cell(qs['knn_classify'].get('spark_32x'))} s vs DuckDB",
        f"   {cell(qs['knn_classify'].get('duck_32x'))} s; `simsearch_cosine`",
        f"   {cell(qs['simsearch_cosine'].get('spark_32x'))} s vs",
        f"   {cell(qs['simsearch_cosine'].get('duck_32x'))} s; `simsearch_ivf`",
        f"   {cell(qs['simsearch_ivf'].get('spark_32x'))} s with per-cell salted",
        "   tiles (corpus shuffles once; only top-k rows leave a task).",
        "",
        "## Known inherent costs (documented, not defects)",
        "",
        f"- `udaf_median` ({cell(qs['udaf_median'].get('spark_32x'))} s): the",
        "  deliberate Arrow grouped-agg UDAF surface — every row crosses",
        "  into Python by design. The production path for plain medians is",
        "  the built-in exact `percentile` (see `percentiles`,",
        f"  {cell(qs['percentiles'].get('spark_32x'))} s).",
        f"- `embedding_near_dup` ({cell(qs['embedding_near_dup'].get('spark_32x'))} s):",
        "  exact all-pairs by contract — O(n²/blocks) tiles; the documented",
        "  scale path for larger corpora is the LSH/IVF approximate tier.",
        f"- `simsearch_lsh` ({cell(qs['simsearch_lsh'].get('spark_32x'))} s): the",
        "  32× fixture grows BOTH sides (queries are corpus % 100), so the",
        "  exact re-score of banding candidates — the price of recall@10",
        "  0.84 on this weakly-clustered fixture — grows with",
        "  queries × corpus. Growth is still ~19× against a 1024×",
        "  pair-potential increase; real workloads probe a fixed query set.",
        "- Parquet row-group counts bound scan parallelism at fixture scale",
        "  (sf0.1 lineitem is ~3 row groups); at 100 TB inputs are thousands",
        "  of ≥128 MB row groups and the default `maxPartitionBytes`",
        "  saturates every executor, so we deliberately do not tune split",
        "  size down for the fixture.",
        "",
    ]
    p128 = f"{REPO}/SCALING128.json"
    if os.path.exists(p128):
        with open(p128) as f:
            d128 = json.load(f)
        lines += [
            "## Heavy-tier growth at 128× (scripts/scaling128_probe.py)",
            "",
            "The volume-dominated dedup/ANN/clustering family probed at 4×",
            "the 32× corpus (76.8M-doc-scale relative to sf0.1). The 128×",
            "fixture holds near-dup FAMILY SIZE constant while quadrupling",
            "the number of families — the regime a real 4×-bigger crawl",
            "presents — so growth measures volume scaling, not O(family²)",
            "pair verification (see the probe's module docstring for the",
            "token-suffix / signed-rotation construction that keeps each",
            "copy's internal near-dup structure bit-identical while making",
            "copies mutually disjoint). Growth < 4 for 4× rows = sublinear",
            "per-row cost.",
            "",
            "| query | spark 32× | spark 128× | growth (4× rows) | expected |",
            "|---|---|---|---|---|",
        ]
        for n, r in d128["queries"].items():
            exp = (
                "quadratic by design"
                if r["expected"].startswith("quadratic")
                else "sublinear"
            )
            g = r.get("growth_128_over_32")
            lines.append(
                f"| `{n}` | {cell(r.get('spark_32x'))} | "
                f"{cell(r.get('spark_128x'))} | "
                f"{f'{g:.2f}×' if g else '—'} | {exp} |"
            )
        lines += [
            "",
            "Every operator with a sublinear contract holds it; the one",
            "quadratic entry (`embedding_near_dup`, exact all-pairs cosine",
            "by contract) grows ~16-19× for 4× rows exactly as O(n²)",
            "predicts — its at-scale substitutes are the LSH/IVF/semantic",
            "tiers above it in the table.",
            "",
        ]
    lines += [
        "## Per-query results (seconds; min of "
        f"{data['repeats']} warm runs)",
        "",
        "| query | spark 1× | duck 1× | spark 32× | duck 32× | spark growth |",
        "|---|---|---|---|---|---|",
    ]
    for n in sorted(qs):
        r = qs[n]
        s1, s32 = sec(r.get("spark_1x")), sec(r.get("spark_32x"))
        g = f"{s32 / s1:.1f}×" if (s1 and s32 and s1 > 0.05) else "—"
        lines.append(
            f"| `{n}` | {cell(r.get('spark_1x'))} | {cell(r.get('duck_1x'))} | "
            f"{cell(r.get('spark_32x'))} | {cell(r.get('duck_32x'))} | {g} |"
        )
    lines += [
        "",
        f"Excluded from the probe: {', '.join(f'`{n}`' for n in data['excluded'])}.",
        "",
        "DuckDB columns are absent for rows-only queries (no SQL oracle by",
        "design). `>N` = hit the N-second timeout.",
    ]
    with open(f"{REPO}/SCALING.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote SCALING.md ({len(qs)} queries)")


if __name__ == "__main__":
    sys.exit(main())
