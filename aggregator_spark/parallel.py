"""Driver-side overlap of INDEPENDENT Spark jobs (optimization guide
§2.6): Spark's scheduler happily runs several jobs at once inside one
application — actions are only sequential because driver code calls
them sequentially. A store fold that writes seven independent
relations, or a serve that materializes three independent modality
views, pays one fixed job latency instead of seven/three when the
actions are submitted from a small thread pool; on a cluster the same
submission shape lets the next job's tasks back-fill executors freed
by the current job's tail. FIFO scheduling (the default) is exactly
the back-fill behaviour wanted here.

Correctness: the callables must be INDEPENDENT (no thunk reads state
another thunk writes) — every call site below this module's docstring
documents why its batch is. Results come back in submission order and
the first raised exception propagates after all threads are joined
(the ``with`` block shuts the pool down), so failure semantics match
the serial form: the caller sees an exception iff some action failed.
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from typing import Callable, Sequence, TypeVar

T = TypeVar("T")


def run_jobs(fns: Sequence[Callable[[], T]]) -> list[T]:
    """Run independent Spark actions concurrently from driver threads;
    return their results in submission order. A single callable runs
    inline (no pool, identical stack traces for the common case)."""
    fns = list(fns)
    if len(fns) <= 1:
        return [f() for f in fns]
    with ThreadPoolExecutor(max_workers=len(fns)) as pool:
        futures = [pool.submit(f) for f in fns]
        return [f.result() for f in futures]
