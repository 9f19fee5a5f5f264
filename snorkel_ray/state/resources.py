"""Actor-pool sizing against the live Ray session.

A pooled ``map_batches`` stage that reserves every CPU starves the
task-based stages (reads, stateless maps) — on a 4-CPU test session two
pools at min=2 deadlock the whole pipeline (observed; the streaming
executor does not reclaim pre-started pool actors).  Rule: each pool
gets at most ``frac`` of session CPUs, min 1, and pools always leave
≥1 CPU free for task operators.
"""

from __future__ import annotations


def pool_concurrency(frac: float = 0.25) -> tuple[int, int]:
    """(min, max) actor-pool size for one stage: max = frac × session
    CPUs clamped to [1, cpus - 1]; min = half of max so pools ramp
    immediately on big sessions (autoscale-from-1 wastes seconds of a
    short job) while a 4-CPU session still floors at 1."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    except Exception:
        cpus = 4
    hi = max(1, min(int(cpus * frac), cpus - 1))
    return (max(1, hi // 2), hi)
