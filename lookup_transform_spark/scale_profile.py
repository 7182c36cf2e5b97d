"""Input-size-gated session profile: small fixtures drop the AQE/shuffle
machinery they cannot amortize; at-scale inputs keep it.

Why (FLOOR_PROFILE.json, r10): at bench scale (sf0.1 = 17 MB on disk)
the per-query floor is dominated by stage scheduling, not data — a noop
round-trip is ~50 ms and one scan stage ~120 ms. AQE adds a stage
boundary + re-planning pass per shuffle, and 32 shuffle partitions mean
32 near-empty tasks per exchange. The measured A/B over the 10-query
floor sample (7 repeats, min): base 6.58 s, ``aqe_off_shuffle8``
5.63 s (−14%), the best of every profile tried. At 32×+ scale the same
settings would be wrong — AQE's coalescing/skew-splitting and a
CPU-matched partition count are the scale story (ULTRASCALE.json shows
AQE skew-join engaging at 512×).

So the knob is gated on INPUT SIZE, the same way a warehouse picks a
plan regime from table statistics, not on "bench mode": callers (the
registry's query wrapper) pass the fixture dir; below
``SMALL_INPUT_MAX_BYTES`` (default 64 MB — sf0.1 is 17 MB, the 32×
derived fixture is 486 MB, so the gate cleanly separates correctness/
bench scale from every scaling probe) the session gets the small-input
profile, above it the standard one. On a real cluster no input ever
sits under the gate and this module is a no-op.

Runtime-settable confs only (``spark.conf.set``), so the profile works
on ANY session — including the driver's plain correctness session —
and flips back when the same session later touches an at-scale dir.

``SPARK_GRAFT_SCALE_PROFILE=0`` disables the gate entirely (A/B runs).
"""

from __future__ import annotations

import os

SMALL_INPUT_MAX_BYTES = int(
    os.environ.get("SPARK_GRAFT_SMALL_INPUT_MAX_BYTES", str(64 << 20))
)

# fixture dirs are generated once per round and never mutate mid-process
# (the registry's staleness gates handle the regenerated-fixture case by
# mtime, which doesn't change a dir's size class) — cache the walk
_dir_bytes: dict[str, int] = {}

# applicationId -> profile name last applied, so the per-query fast path
# is two dict lookups; keyed by app id (not session object) so a
# stopped-and-recreated session re-applies
_applied: dict[str, str] = {}


def fixture_bytes(sf_dir: str) -> int:
    """Total on-disk bytes under ``sf_dir`` (recursive), cached."""
    norm = os.path.abspath(sf_dir)
    total = _dir_bytes.get(norm)
    if total is None:
        total = 0
        for root, _dirs, files in os.walk(norm):
            for f in files:
                try:
                    total += os.path.getsize(os.path.join(root, f))
                except OSError:
                    pass
        _dir_bytes[norm] = total
    return total


def profile_for(sf_dir: str) -> str:
    return (
        "small" if fixture_bytes(sf_dir) < SMALL_INPUT_MAX_BYTES else "full"
    )


def apply_scale_profile(spark, sf_dir: str) -> str:
    """Apply the size-matched conf profile to ``spark`` for queries over
    ``sf_dir``; returns the profile name. Idempotent and cheap when the
    session is already on the right profile."""
    if os.environ.get("SPARK_GRAFT_SCALE_PROFILE", "1") == "0":
        return "disabled"
    prof = profile_for(sf_dir)
    app = spark.sparkContext.applicationId
    if _applied.get(app) == prof:
        return prof
    if prof == "small":
        # the measured floor winner: one wave of 8 shuffle tasks, no
        # adaptive re-planning stage boundaries
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
    else:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        shuffle = os.environ.get("SPARK_GRAFT_SHUFFLE", cpus)
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle))
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    _applied[app] = prof
    return prof
