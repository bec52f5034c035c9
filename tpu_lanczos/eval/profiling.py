"""Timing and profiling helpers.

The TPU analog of the reference's cudaEvent timer pairs
(``cuda_start_timer``/``cuda_end_timer``, parallel-final/lib/helpers.cu:
14-29) and its gettimeofday stage table (main.cu:134-166): device work is
bracketed with ``block_until_ready`` fences, stages accumulate into a
printable table, and ``trace`` captures a ``jax.profiler`` trace for
xprof/tensorboard (the NVVP analog, writeup Table 3).
"""

from __future__ import annotations

import contextlib
import time

import jax


class StageTimer:
    """Accumulates wall time per named stage with device fencing."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str, *fence):
        """Times the block; ``fence`` arrays (if given) are waited on
        before and after so only this stage's device work is counted."""
        for f in fence:
            jax.block_until_ready(f)
        t0 = time.time()
        yield
        for f in fence:
            jax.block_until_ready(f)
        self.stages[name] = self.stages.get(name, 0.0) + time.time() - t0

    def table(self) -> str:
        width = max((len(k) for k in self.stages), default=5)
        total = sum(self.stages.values())
        lines = [f"{k:{width}}  {v:9.4f}s  {100*v/total:5.1f}%"
                 for k, v in self.stages.items()]
        lines.append(f"{'total':{width}}  {total:9.4f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace context (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn, *args, reps: int = 3, **kw):
    """Median wall time of ``fn`` with full result materialization."""
    import numpy as np

    out = jax.block_until_ready(fn(*args, **kw))
    times = []
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(fn(*args, **kw))
        times.append(time.time() - t0)
    return out, float(np.median(times))
