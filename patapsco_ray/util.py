"""Small shared helpers."""

from __future__ import annotations

import contextlib


def auto_join_partitions(cap: int = 64) -> int:
    """Partition count for ``Dataset.join`` sized to the cluster.

    The hash-join operator spawns aggregator actors per partition;
    oversubscribing a small cluster (e.g. 64 partitions at 8 CPUs)
    DEADLOCKS the join (see functions/cluster.py:_star_round_vec,
    where this was first measured). Half the cluster's CPUs, capped,
    leaves slots for the producer stages feeding the join."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if (
        ray.is_initialized()) else 4
    return max(2, min(cap, cpus // 2))


@contextlib.contextmanager
def tasks_in_flight(n: int):
    """Scope ``DataContext.max_tasks_in_flight_per_actor`` to ``n``.

    Ray Data pre-queues 4 tasks per actor by default, which pipelines
    short tasks but strands queued work behind slow actors: on the
    segment build (1 s tasks, co-tenant stragglers up to 5 s) the last
    wave measured a 4+ s idle tail. For stages whose tasks are long
    relative to dispatch latency, ``n=1`` keeps assignment dynamic so
    the tail is bounded by one task, not one task times queue depth.
    The context must wrap pipeline EXECUTION (e.g. ``take_all``), not
    just its definition — the value is read when execution starts.
    """
    import ray.data

    ctx = ray.data.DataContext.get_current()
    old = ctx.max_tasks_in_flight_per_actor
    ctx.max_tasks_in_flight_per_actor = n
    try:
        yield
    finally:
        ctx.max_tasks_in_flight_per_actor = old


def tune_malloc(threshold_bytes: int = 1 << 30) -> bool:
    """Raise glibc's mmap threshold so large numpy buffers come from
    the (reused) heap arena instead of fresh ``mmap``/``munmap`` pairs.

    glibc services allocations above M_MMAP_THRESHOLD (default 128 KB,
    so EVERY posting-sized numpy array) with a private mmap and
    returns it to the kernel on free. On this sandbox's kernel,
    first-touching newly mapped pages under memory pressure measured
    18 s for a 144 MB cumsum that takes 0.13 s against warm pages —
    a 100x stall that hit every segment's encode. With the threshold
    raised, freed arena pages are reused across segments and only the
    first segment pays the fault-in. Call once per worker process
    (actor ``__init__``); returns False on non-glibc platforms.
    """
    import ctypes

    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        M_MMAP_THRESHOLD = -3
        return bool(libc.mallopt(M_MMAP_THRESHOLD, threshold_bytes))
    except OSError:  # pragma: no cover - non-glibc
        return False


def fixed_pool(concurrency: int | tuple[int, int] | None
               ) -> tuple[int, int] | None:
    """Normalize a ``map_batches`` class-UDF concurrency to a FIXED
    actor pool ``(N, N)``.

    A scalar ``concurrency=N`` is an autoscaling pool; its actor
    create/destroy churn re-pays imports and processor setup mid-run
    and measured 2x slower end-to-end on the index build (168k vs 77k
    docs/s at 16 cpus, 3M docs). Every stateful stage in this repo
    wants the fixed pool; pass a tuple explicitly to opt into
    autoscaling.
    """
    if isinstance(concurrency, int):
        return (concurrency, concurrency)
    return concurrency
