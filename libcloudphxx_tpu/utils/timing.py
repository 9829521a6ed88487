"""StepTimer — the per-phase wall-clock profiler SURVEY section 5 asks for.

Usage::

    timer = StepTimer()
    with timer("cond"):
        prtcls.step_sync(opts, th, rv)
    with timer("async"):
        prtcls.step_async(opts)
    print(timer.report())

Timings synchronise the device on exit (jax dispatch is async), so only use
it when profiling.
"""

import time
from collections import defaultdict
from contextlib import contextmanager


class StepTimer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextmanager
    def __call__(self, phase: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                import jax
                jax.block_until_ready(sync)
            self.totals[phase] += time.perf_counter() - t0
            self.counts[phase] += 1

    def report(self) -> str:
        tot = sum(self.totals.values()) or 1.0
        lines = []
        for phase, t in sorted(self.totals.items(), key=lambda kv: -kv[1]):
            n = self.counts[phase]
            lines.append(
                f"{phase:>20}: {t:8.3f} s  ({t / n * 1e3:8.2f} ms x {n:4d})"
                f"  {100 * t / tot:5.1f}%"
            )
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()
