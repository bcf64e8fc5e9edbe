"""Small shared helpers."""

from __future__ import annotations

import contextlib


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
