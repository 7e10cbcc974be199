"""Profiling: jax.profiler traces, step timing, MFU accounting.

New work in this framework — the reference has no tracing/profiling at all
(SURVEY.md §5: only tqdm bars and an unused GPU keep-alive spin). Provides:

- :func:`trace_context` — ``jax.profiler.trace`` wrapper (view in
  TensorBoard / xprof);
- :class:`StepTimer` — wall-clock step timing with warmup exclusion;
- :class:`MFUTracker` — model-FLOPs-utilization from XLA's own cost
  analysis of the compiled step (no hand-counted FLOPs).
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

# peak dense matmul throughput per chip, FLOP/s
CHIP_PEAK_FLOPS = {
    "tpu v5 lite": 197e12,      # v5e bf16
    "tpu v5e": 197e12,
    "tpu v4": 275e12,
    "tpu v6 lite": 918e12,      # v6e (trillium) bf16
    "cpu": 1e11,                # nominal, keeps MFU finite in tests
}


def chip_peak_flops(device=None) -> float:
    import jax

    device = device or jax.devices()[0]
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, peak in CHIP_PEAK_FLOPS.items():
        if key in kind:
            return peak
    return CHIP_PEAK_FLOPS["cpu"]


@contextlib.contextmanager
def trace_context(log_dir: str):
    """``with trace_context('/tmp/trace'): ...`` -> xprof trace in log_dir."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulates per-step wall times; first ``warmup`` steps excluded."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self.times = []
        self._t0: Optional[float] = None
        self._count = 0

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        dt = time.perf_counter() - self._t0
        self._count += 1
        if self._count > self.warmup:
            self.times.append(dt)
        return False

    @property
    def mean_step_s(self) -> float:
        return sum(self.times) / max(len(self.times), 1)

    def steps_per_sec(self) -> float:
        m = self.mean_step_s
        return 1.0 / m if m else 0.0


class MFUTracker:
    """MFU = (flops of the compiled step) / (step time x chip peak).

    FLOPs come from XLA's cost analysis of the lowered+compiled function —
    exact for the program actually executed, including the backward pass.
    """

    def __init__(self, compiled_or_flops, n_devices: int = 1,
                 peak_flops: Optional[float] = None):
        if hasattr(compiled_or_flops, "cost_analysis"):
            cost = compiled_or_flops.cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            self.flops_per_step = float(cost.get("flops", 0.0))
        else:
            self.flops_per_step = float(compiled_or_flops)
        self.n_devices = n_devices
        self.peak = peak_flops if peak_flops is not None else chip_peak_flops()

    def mfu(self, step_time_s: float) -> float:
        if step_time_s <= 0:
            return 0.0
        return self.flops_per_step / (step_time_s * self.peak
                                      * self.n_devices)

    @staticmethod
    def flops_of(fn, *args) -> float:
        """FLOPs of ``jit(fn)(*args)`` via lowering cost analysis."""
        import jax

        lowered = jax.jit(fn).lower(*args)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))
