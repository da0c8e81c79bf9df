"""Profiling / tracing helpers (SURVEY §5.1).

The reference has only `@time` + a codegen progress bar; on TPU the
first-class tools are jax.profiler traces (viewable in TensorBoard /
Perfetto) and phase timers around compile vs execute.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/petlion_tpu_trace"):
    """Capture a device profile: `with profiling.trace(): sol = simulate(...)`.

    Open the result with TensorBoard's profile plugin or ui.perfetto.dev.
    """
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock phase timer distinguishing compile (first call) from steady
    state, with device sync."""

    def __init__(self):
        self.phases = {}

    @contextlib.contextmanager
    def phase(self, name: str, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            self.phases.setdefault(name, []).append(time.perf_counter() - t0)

    def report(self) -> str:
        lines = []
        for name, ts in self.phases.items():
            best = min(ts)
            lines.append(f"{name}: best {best * 1e3:.2f} ms over {len(ts)} "
                         f"calls (first {ts[0] * 1e3:.2f} ms)")
        return "\n".join(lines)
