"""Tracing / profiling utilities.

The reference instruments with POSIX clock_gettime + printf around the
embedded-Python call (DLPoissonFoam.C:74-76,106-111) and ad-hoc
time.time() pairs in python_module.py:262-499. TPU-native equivalent:
`StageTimer` wraps host-visible stages (blocking on device results so the
numbers mean something), and `trace` wraps a region in a jax.profiler
trace that can be opened in TensorBoard/XProf.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulating per-stage wall-clock timer.

    >>> timer = StageTimer()
    >>> with timer("pressure_solve"):
    ...     p = backend(...)            # device work
    >>> print(timer.report())
    """

    def __init__(self, sync: bool = True):
        self.sync = sync
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)

    @contextlib.contextmanager
    def __call__(self, stage: str, block_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if block_on is not None and self.sync:
                jax.block_until_ready(block_on)
            dt = time.perf_counter() - t0
            self.totals[stage] += dt
            self.counts[stage] += 1

    def report(self) -> str:
        lines = []
        for stage in sorted(self.totals, key=self.totals.get, reverse=True):
            tot = self.totals[stage]
            n = self.counts[stage]
            lines.append(f"{stage:<28s} {tot * 1e3:10.2f} ms total"
                         f"  {tot / n * 1e3:8.2f} ms/call  x{n}")
        return "\n".join(lines)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace of the enclosed region (open with XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region visible in profiler timelines (TraceAnnotation)."""
    return jax.profiler.TraceAnnotation(name)


def memory_report() -> dict:
    """Host + device memory snapshot (the reference probes /proc/meminfo,
    python_module.py:136-151; we add per-device HBM stats)."""
    out = {}
    try:
        with open("/proc/meminfo") as f:
            info = dict(line.split(":")[0:1] + [line.split()[1]]
                        for line in f if ":" in line)
        out["host_total_kb"] = int(info.get("MemTotal", 0))
        out["host_available_kb"] = int(info.get("MemAvailable", 0))
    except OSError:
        pass
    for d in jax.devices():
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[f"device_{d.id}"] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
                "peak_bytes_in_use": stats.get("peak_bytes_in_use"),
            }
    return out
