"""r12 VERDICT #1 tie-break: interleaved A/B of the small-input profile
(ON: shuffle=8 + AQE off, the r11 regime) vs OFF (full width + AQE) on
the Python/CPU-heavy tier the driver's PERF_r11 flagged as regressed
beyond host drift (dedup_clusters 0.67x, dedup_incremental_minhash
0.65x, simsearch_cosine 0.49x).

Protocol: ONE warm session, alternating profile regimes per round
(A,B,A,B,...) so load drift hits both arms equally; min-of-N per arm;
noop sink; loadavg recorded. Usage:
    python scripts/r12_profile_ab.py [rounds] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lookup_transform_spark import registry, scale_profile  # noqa: E402
from lookup_transform_spark.session import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_QUERIES = [
    "dedup_clusters",
    "dedup_incremental_minhash",
    "simsearch_cosine",
    "dedup_minhash",
    "lang_id",
    "quality_filter_gopher",
]


def _run(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    queries = sys.argv[2:] or DEFAULT_QUERIES
    spark = get_spark("r12-profile-ab")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    def set_regime(on: bool) -> None:
        # mirror scale_profile.apply_scale_profile's two arms directly;
        # clear its idempotency cache so the registry wrapper (which
        # runs with SPARK_GRAFT_SCALE_PROFILE=0 here) never overrides
        scale_profile._applied.clear()
        if on:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        else:
            spark.conf.set("spark.sql.shuffle.partitions", cpus)
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    os.environ["SPARK_GRAFT_SCALE_PROFILE"] = "0"  # manual control
    # warmup
    _run(registry.QUERIES["lookup"](spark, SF))

    samples: dict[str, dict[str, list[float]]] = {
        q: {"on": [], "off": []} for q in queries
    }
    for r in range(rounds):
        for arm in ("on", "off") if r % 2 == 0 else ("off", "on"):
            set_regime(arm == "on")
            for q in queries:
                t0 = time.perf_counter()
                _run(registry.QUERIES[q](spark, SF))
                samples[q][arm].append(time.perf_counter() - t0)
    out = {
        "sf": SF,
        "rounds": rounds,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "per_query": {
            q: {
                "on_min": round(min(s["on"]), 4),
                "off_min": round(min(s["off"]), 4),
                "on_all": [round(x, 3) for x in s["on"]],
                "off_all": [round(x, 3) for x in s["off"]],
            }
            for q, s in samples.items()
        },
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
