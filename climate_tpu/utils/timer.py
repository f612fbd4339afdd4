"""Step timing + throughput (samples/sec/chip is the north-star metric,
BASELINE.json). The reference has no profiling at all (SURVEY.md section 5);
here a step timer is mandatory and jax.profiler tracing is one flag away."""

from __future__ import annotations

import contextlib
import time

import jax


class StepTimer:
    """Tracks wall-time per step and running samples/sec."""

    def __init__(self, warmup_steps: int = 2):
        self.warmup_steps = warmup_steps
        self.reset()

    def reset(self) -> None:
        self._steps = 0
        self._samples = 0
        self._elapsed = 0.0
        self._samples_all = 0
        self._elapsed_all = 0.0
        self._t0: float | None = None

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, n_samples: int) -> float:
        dt = time.perf_counter() - self._t0
        self._steps += 1
        self._samples_all += n_samples
        self._elapsed_all += dt
        if self._steps > self.warmup_steps:  # skip compile steps
            self._samples += n_samples
            self._elapsed += dt
        return dt

    @property
    def samples_per_sec(self) -> float:
        if self._elapsed > 0:
            return self._samples / self._elapsed
        # fewer measurements than warmup (e.g. one fused-epoch dispatch):
        # fall back to the all-inclusive rate rather than reporting 0
        return self._samples_all / self._elapsed_all if self._elapsed_all > 0 else 0.0

    @property
    def mean_step_ms(self) -> float:
        n = self._steps - self.warmup_steps
        return 1000.0 * self._elapsed / n if n > 0 else 0.0


@contextlib.contextmanager
def profile_trace(log_dir: str, enabled: bool = True):
    """jax.profiler trace context (view with TensorBoard/xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
