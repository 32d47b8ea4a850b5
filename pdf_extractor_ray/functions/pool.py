"""Actor-pool sizing from live cluster resources.

A hard-coded ``concurrency=(1, 8)`` cap is a scaling bug: on a
256-node cluster the stage would run on 8 actors while everything
else waits (measured here: the MinHash band stage capped at 8 actors
held shuffle-job scaling efficiency to ~0.42 between 8 and 32 CPUs).
``pool_size`` reads the cluster's CPU count at PLAN TIME so autoscaling
actor pools can grow to the hardware, wherever the plan runs.
"""
from __future__ import annotations

from typing import Tuple


def pool_size(frac: float = 1.0, min_actors: int = 1,
              floor: int = 8) -> Tuple[int, int]:
    """(min, max) for ``map_batches(..., concurrency=...)`` actor
    pools: max scales with cluster CPUs (``frac`` of them, at least
    ``floor``), min stays small so short jobs don't pay actor spin-up
    for workers they never feed."""
    try:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return (min_actors, max(floor, int(cpus * frac)))
