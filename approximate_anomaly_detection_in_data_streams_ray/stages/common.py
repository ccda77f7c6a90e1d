"""Shared stage-sizing helpers.

A fixed actor pool larger than the session's CPUs waits for its minimum
size forever, and an autoscaling ``(1, N)`` pool ramps up too slowly for
short stages — so every actor-pool stage sizes itself against what the
session can actually schedule (see PERF_NOTES.md, Ray 2.49 pitfalls).
"""

from __future__ import annotations


def available_cpus(default: float = 4.0) -> float:
    import ray

    if not ray.is_initialized():
        return default
    return float(ray.available_resources().get("CPU", default))


def auto_pool(requested: int | None = None, num_cpus_per_actor: float = 1.0) -> int:
    """Actor-pool size: the session's CPU budget (minus one for the driver
    and upstream reads) unless a smaller explicit size is requested."""
    avail = available_cpus()
    cap = max(1, int(avail / num_cpus_per_actor) - 1)
    if requested is None:
        return cap
    if isinstance(requested, tuple):
        requested = requested[1]
    return max(1, min(int(requested), cap))
