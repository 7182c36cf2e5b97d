"""Regenerate the per-query floor-pin table in PLANS.md (r7, VERDICT
r6 #1 acceptance path B): every query that is >=1 s AND >2x the DuckDB
oracle at 32x gets a row naming the constant that dominates it, plus
the 1x->32x engine growth as evidence the term IS a constant (flat or
sublinear growth on 32x the data = fixed cost, not a scale defect).

Classes are maintained here, next to the numbers they explain; a
residual query with no class is printed as UNCLASSIFIED so a new
entrant can't silently ride the table.

Usage: python scripts/floor_pins.py   (prints the markdown table;
paste into PLANS.md at the marked section)
"""

from __future__ import annotations

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: class -> (short label, one-line decomposition)
CLASSES = {
    "scan-cpu": (
        "single-scan CPU",
        "one pruned scan + map-side partial aggregate; the cost is "
        "codegen arithmetic over 19.2M rows vs a fused vectorized "
        "in-process engine. Flat growth = the plan is already minimal.",
    ),
    "join-waves": (
        "join stage waves",
        "2-4 AQE-materialized stages (scan, build, probe, agg) at "
        "~0.1-0.3 s scheduling each, broadcast dims + CBO order + "
        "runtime bloom filters already applied (r6); the residual is "
        "the per-stage constant, amortized at real scale.",
    ),
    "exact-distinct": (
        "Expand-based exact distinct",
        "two COUNT(DISTINCT x) compile to Expand(x3 rows) + two-phase "
        "agg — the exact-answer plan; sketch_hll_rollup is the at-scale "
        "substitute and is pinned mergeable.",
    ),
    "exact-percentile": (
        "single-reducer exact percentile",
        "exact interpolated percentiles buffer each group's values in "
        "one task by definition; sketch_quantile_rollup is the pinned "
        "mergeable scale path (±2% bound).",
    ),
    "write-pipeline": (
        "write-pipeline waves",
        "one staged write wave (DPP-pruned read-back + merge + encode "
        "into staging) + rename commit + the verify scan-back (r8, was "
        "five waves) — see the sink_upsert section.",
    ),
    "span-explode-cpu": (
        "span-explode CPU",
        "len/stride-factor explode + substring + md5 per window is the "
        "exact Lee-et-al shape; one pass, map-side combined — the cost "
        "is string materialization DuckDB fuses.",
    ),
    "expand-rollup": (
        "Expand grouping-sets scan",
        "ROLLUP compiles to Expand (one duplicated row stream per "
        "grouping set) + two-phase agg — the exact-answer plan, same "
        "family as Expand-based distinct. r10 idle spot-check: "
        "0.77 s min-of-5 (the committed 1.07 s carries probe load), "
        "growth 2.3x for 32x rows = constant-dominated.",
    ),
    "asof-window": (
        "as-of union+window",
        "union of tagged scans + ONE key-partitioned sorted window "
        "(the linear as-of plan); cost = the per-key sort constant, "
        "vs DuckDB's native ASOF operator.",
    ),
}

#: query -> class key
PINS = {
    "tpch_q1": "scan-cpu",
    "agg_corr": "scan-cpu",
    "embedding_centroids": "scan-cpu",
    "agg_having": "scan-cpu",
    "agg_distinct": "exact-distinct",
    "agg_rollup": "expand-rollup",
    "agg_cube": "expand-rollup",
    "percentiles": "exact-percentile",
    "sink_upsert": "write-pipeline",
    "dedup_substring": "span-explode-cpu",
    "substring_dup_rate": "span-explode-cpu",
    "lookup_asof_tolerance": "asof-window",
    "lookup_asof_forward": "asof-window",
    "lookup_asof_nearest": "asof-window",
    "lookup_asof": "asof-window",
    # the TPC-H multi-join tail (q5/q8/q9 already decomposed in the
    # r5 floor experiments; the rest share the same stage-wave shape)
    "tpch_q3_shipping": "join-waves",
    "tpch_q4_priority": "join-waves",
    "tpch_q5_local_supplier": "join-waves",
    "tpch_q7_volume": "join-waves",
    "tpch_q8_market_share": "join-waves",
    "tpch_q9_profit": "join-waves",
    "tpch_q10_returned": "join-waves",
    "tpch_q12_late_priority": "join-waves",
    "tpch_q16_supplier_cnt": "join-waves",
    "tpch_q18_large_volume": "join-waves",
    "tpch_q20_promotion": "join-waves",
    "tpch_q21_waiting": "join-waves",
    "q7_volume_shipping": "join-waves",
    "q10_returned": "join-waves",
    "q13_custdist": "join-waves",
    "q18_volume": "join-waves",
    "tpch_q13_custdist": "join-waves",
    "join_anti": "join-waves",
    "join_semi": "join-waves",
    "join_bloom_semi": "join-waves",
    "tpch_q2_min_cost": "join-waves",
    "tpch_q22_dormant": "join-waves",
    "tpch_q6_forecast": "scan-cpu",
    "tpch_q14_promo": "join-waves",
    "tpch_q19_disjunctive": "join-waves",
    "tpch_q11_value_conc": "scan-cpu",
    "tpch_q15_top_supplier": "scan-cpu",
    "tpch_q17_small_qty": "join-waves",
}


def main() -> None:
    d = json.load(open(f"{REPO}/SCALING32.json"))
    q = d["queries"]
    rows = []
    for name, v in sorted(q.items()):
        s32 = v.get("spark_32x", {}).get("sec")
        du32 = v.get("duck_32x", {}).get("sec")
        s1 = v.get("spark_1x", {}).get("sec")
        if not (s32 and du32):
            continue
        if s32 < 1.0 or s32 <= 2 * du32:
            continue
        growth = s32 / s1 if s1 else None
        cls = PINS.get(name)
        label = CLASSES[cls][0] if cls else "UNCLASSIFIED"
        rows.append((s32 / du32, name, s32, du32, growth, label))
    rows.sort(reverse=True)
    print(f"residuals (>=1 s and >2x at 32x): {len(rows)}\n")
    print("| query | eng 32× | duck 32× | ratio | eng growth 1×→32× | floor class |")
    print("|---|---|---|---|---|---|")
    for r, name, s32, du32, g, label in rows:
        gtxt = f"{g:.1f}×" if g else "—"
        print(f"| `{name}` | {s32:.2f} s | {du32:.2f} s | {r:.1f}× | {gtxt} | {label} |")
    print()
    used = {PINS.get(name) for _, name, *_ in rows if PINS.get(name)}
    for key, (label, desc) in CLASSES.items():
        if key in used:
            print(f"- **{label}** — {desc}")


if __name__ == "__main__":
    main()
