"""Opt-in per-worker CPU pinning (scaling experiment, VERDICT r3 Next #2).

The affinity-envelope control (bench.py --envelope-affinity) measured that
pinning each raw-multiprocessing worker to its own core raises this host's
32-proc extraction throughput ~25% at the median and removes most of its
downside variance — scheduler migration, not only memory bandwidth, taxes
string/alloc workloads here. This module lets Ray worker processes apply
the same discipline: the first time a hot-stage UDF runs in a worker, the
worker asks a tiny detached counter actor for a slot and pins itself to
``slot % os.cpu_count()``.

OFF by default (``AARHUS_PIN_CPUS=1`` enables): pinning is a single-host
tuning knob, not a semantic feature — results are byte-identical either
way, and on a real multi-node cluster the OS scheduler owns placement.
Round-robin slots mean a wrapped assignment (more workers than cores over
the pipeline's life) stays balanced; Ray's CPU slots already cap
CONCURRENT workers at num_cpus, so two live workers rarely share a core.
The raylet/driver stay unpinned and float.
"""

from __future__ import annotations

import os

_PINNED = False  # per-process latch


def _enabled() -> bool:
    return os.environ.get("AARHUS_PIN_CPUS", "0") == "1"


def pin_worker() -> None:
    """Pin the calling worker process to one core (once; no-op unless
    AARHUS_PIN_CPUS=1). Safe to call from every batch — the module-global
    latch makes repeat calls free, the same amortization contract as the
    per-worker scorer caches."""
    global _PINNED
    if _PINNED or not _enabled():
        return
    _PINNED = True  # latch even on failure paths below: try once per process
    try:
        import ray

        if not ray.is_initialized():
            return

        counter = _get_counter()
        slot = ray.get(counter.next.remote())
        os.sched_setaffinity(0, {slot % os.cpu_count()})
    except Exception:
        # pinning is best-effort tuning; never fail a pipeline over it
        pass


def _get_counter():
    import ray

    @ray.remote(num_cpus=0)
    class _CoreCounter:
        def __init__(self) -> None:
            self._n = 0

        def next(self) -> int:
            n = self._n
            self._n += 1
            return n

    return _CoreCounter.options(
        name="aarhus_core_counter",
        namespace="aarhus_affinity",
        lifetime="detached",
        get_if_exists=True,
    ).remote()
