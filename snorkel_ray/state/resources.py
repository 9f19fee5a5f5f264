"""Actor-pool sizing against the live Ray session.

A pooled ``map_batches`` stage that reserves every CPU starves the
task-based stages (reads, stateless maps) — on a 4-CPU test session two
pools at min=2 deadlock the whole pipeline (observed; the streaming
executor does not reclaim pre-started pool actors).  Rule: each pool
gets at most ``frac`` of session CPUs, min 1, and pools always leave
≥1 CPU free for task operators.
"""

from __future__ import annotations

_CACHE_CAP = 4


def broadcast_key(obj) -> str:
    """Stable cache key for a broadcast object held in a worker-process
    instance cache.  ObjectRefs key by their (globally unique) hex; bare
    objects key by a CONTENT fingerprint — ``id()`` values are reused
    after GC, so two different alias tables could collide on a
    long-lived worker and serve a stale compiled state (round-1 ADVICE).
    Broadcast payloads here are small (alias dicts, KB fact lists), so
    hashing them is cheap relative to the state build they gate."""
    import hashlib

    if obj is None:
        return "none"
    if hasattr(obj, "hex"):  # ray.ObjectRef
        return obj.hex()
    h = hashlib.blake2b(digest_size=16)
    try:
        import pyarrow as pa

        if isinstance(obj, pa.Table):
            h.update(str(obj.schema).encode())
            # combine_chunks first: Array.buffers() returns the PARENT
            # buffers and ignores slice offset/length, so two different
            # slices of one table would otherwise hash identically and
            # cross-serve cached state (round-4 review); after combine
            # the arrays are re-materialized with offset 0
            for batch in obj.combine_chunks().to_batches():
                for col in batch.columns:
                    h.update(f"{col.offset}:{len(col)}".encode())
                    for buf in col.buffers():
                        if buf is not None:
                            h.update(buf)
            return "pa:" + h.hexdigest()
    except ImportError:
        pass
    h.update(repr(obj).encode())
    return "py:" + h.hexdigest()


def cache_get_or_build(cache: dict, key, build):
    """Bounded per-worker-process instance cache: evict everything when
    a new key would exceed the cap (pipelines reuse one broadcast per
    stage, so the working set is tiny; unbounded growth across many
    pipelines on a long-lived worker is the failure mode)."""
    inst = cache.get(key)
    if inst is None:
        if len(cache) >= _CACHE_CAP:
            cache.clear()
        inst = cache[key] = build()
    return inst


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
    # NOTE: a 1-CPU session necessarily gets (1, 1) — the pool takes
    # the only CPU, so mixing a pooled stage with task stages there
    # can starve; library defaults use as_tasks=True precisely so a
    # pool is always an explicit caller choice
    return (max(1, hi // 2), hi)
