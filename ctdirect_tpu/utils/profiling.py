"""Lightweight timing/profiling helpers (≙ the reference's @btime harness and
show_time hooks — SURVEY.md §5 tracing/profiling row). Wraps wall-clock timing
with proper device synchronization, and exposes jax.profiler tracing for
deep dives (tensorboard-compatible)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional

import jax


@dataclass
class Timings:
    records: Dict[str, List[float]] = field(default_factory=dict)

    def add(self, name: str, seconds: float):
        self.records.setdefault(name, []).append(seconds)

    def summary(self) -> str:
        lines = []
        for name, vals in self.records.items():
            v = sorted(vals)
            p50 = v[len(v) // 2]
            lines.append(
                f"{name}: n={len(v)} p50={p50*1e3:.2f}ms "
                f"min={v[0]*1e3:.2f}ms max={v[-1]*1e3:.2f}ms"
            )
        return "\n".join(lines)


GLOBAL_TIMINGS = Timings()


@contextlib.contextmanager
def timed(name: str, timings: Optional[Timings] = None, sync=None):
    """Context manager timing a block; `sync` is an array (or pytree) to
    block_until_ready on before stopping the clock."""
    t0 = time.perf_counter()
    yield
    if sync is not None:
        jax.block_until_ready(sync)
    (timings or GLOBAL_TIMINGS).add(name, time.perf_counter() - t0)


def benchmark(fn: Callable, *args, warmup: int = 1, reps: int = 5) -> dict:
    """Time a jitted callable: compile (first call) + steady-state p50."""
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    for _ in range(max(warmup - 1, 0)):
        jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return {
        "compile_s": compile_s,
        "p50_s": ts[len(ts) // 2],
        "min_s": ts[0],
        "max_s": ts[-1],
        "reps": reps,
    }


@contextlib.contextmanager
def trace(logdir: str):
    """jax.profiler trace (view with tensorboard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
