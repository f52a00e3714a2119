"""Driver-pool helpers for overlapped independent Spark jobs (guide §2.6).

The engine overlaps independent write/agg jobs from small
``ThreadPoolExecutor`` pools. Collecting their results with plain
``f.result()`` calls in submission order has two failure-reporting flaws:
a failure in a late-submitted job surfaces only after every earlier job
finishes, and when an early ``result()`` raises, the exceptions of the
sibling futures are silently dropped on pool shutdown. ``await_all``
waits with ``FIRST_EXCEPTION`` and re-raises the first failure promptly;
on success it returns the results in submission order.
"""

from __future__ import annotations

from concurrent.futures import FIRST_EXCEPTION, Future, wait


def await_all(*futures: Future) -> list:
    """Wait on driver-pool futures; raise the first failure promptly.

    Returns the futures' results in the order they were passed. Siblings
    still running when one fails are left to drain on pool shutdown —
    their results are unused and an in-flight Spark job is not
    interruptible from here anyway.
    """
    done, _ = wait(futures, return_when=FIRST_EXCEPTION)
    for f in done:
        exc = f.exception()
        if exc is not None:
            raise exc
    return [f.result() for f in futures]
