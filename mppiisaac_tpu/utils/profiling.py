"""Tracing / profiling — the reference has only per-step FPS/RT prints
(SURVEY §5 'Tracing'); here per-phase wall-clock timers + JAX profiler trace
capture are first-class.

Usage:
    prof = PhaseProfiler()
    with prof.phase("sample"): ...
    with prof.phase("rollout"): ...
    print(prof.report())

    with trace("/tmp/jax-trace"):      # open in Perfetto / TensorBoard
        planner.compute_action_from_state(state)
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, List


class PhaseProfiler:
    def __init__(self):
        self.times: Dict[str, List[float]] = defaultdict(list)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name].append(time.perf_counter() - t0)

    def report(self) -> str:
        import numpy as np

        lines = []
        for name, ts in self.times.items():
            a = np.asarray(ts) * 1e3
            lines.append(
                f"{name:>12}: n={len(a):4d}  mean {a.mean():8.2f} ms  "
                f"p50 {np.percentile(a, 50):8.2f}  p95 {np.percentile(a, 95):8.2f}"
            )
        return "\n".join(lines)

    def summary(self) -> dict:
        import numpy as np

        return {
            name: {"mean_ms": float(np.mean(ts) * 1e3), "n": len(ts)}
            for name, ts in self.times.items()
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """JAX profiler trace context (XLA ops, TPU timelines)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
