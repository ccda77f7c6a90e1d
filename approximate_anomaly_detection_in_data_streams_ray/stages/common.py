"""Shared stage-sizing helpers.

A fixed actor pool larger than the session's CPUs waits for its minimum
size forever, and an autoscaling ``(1, N)`` pool ramps up too slowly for
short stages — so every actor-pool stage sizes itself against the cluster's
schedulable CPU count (see PERF_NOTES.md, Ray 2.49 pitfalls).

Sizing uses :func:`cluster_cpus` (``ray.cluster_resources()`` — the total
schedulable CPUs, stable for the life of the session), NOT the
instantaneous free count: ``ray.available_resources()`` drops to ~0 while
another stage holds CPUs, which would nondeterministically serialize any
stage sized while an upstream stage is still running.
"""

from __future__ import annotations


def cluster_cpus(default: float = 4.0) -> float:
    """Total schedulable CPUs in the cluster (stable; use for sizing)."""
    import ray

    if not ray.is_initialized():
        return default
    return float(ray.cluster_resources().get("CPU", default))


def auto_pool(requested: int | None = None, num_cpus_per_actor: float = 1.0) -> int:
    """Actor-pool size: the cluster's CPU budget (minus one for the driver
    and upstream reads) unless a smaller explicit size is requested."""
    total = cluster_cpus()
    cap = max(1, int(total / num_cpus_per_actor) - 1)
    if requested is None:
        return cap
    if isinstance(requested, tuple):
        requested = requested[1]
    return max(1, min(int(requested), cap))
