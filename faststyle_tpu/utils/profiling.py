"""Profiling / tracing helpers (SURVEY.md §5 tracing row).

Thin wrappers over jax.profiler plus wall-clock step timers that are robust
to runtimes where `block_until_ready` returns early (remote-tunnel TPU
attachments): synchronization is forced through a scalar *value fetch*,
which cannot be elided.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax
import jax.numpy as jnp


def hard_sync(x) -> None:
    """Force completion of everything ordered before `x` on its device.

    `jax.block_until_ready` can return early on tunneled runtimes; fetching a
    reduced scalar value cannot.
    """
    leaves = jax.tree.leaves(x)
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)))


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/faststyle-trace") -> Iterator[None]:
    """Capture a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Steady-state steps/sec with a sync only at measurement boundaries."""

    def __init__(self):
        self._t0: Optional[float] = None
        self._steps = 0

    def start(self, sync_on=None) -> None:
        if sync_on is not None:
            hard_sync(sync_on)
        self._t0 = time.perf_counter()
        self._steps = 0

    def step(self) -> None:
        self._steps += 1

    def rate(self, sync_on=None) -> float:
        if sync_on is not None:
            hard_sync(sync_on)
        dt = time.perf_counter() - (self._t0 or time.perf_counter())
        return self._steps / dt if dt > 0 else float("nan")


def enable_compilation_cache(path: str = "/tmp/faststyle-xla-cache") -> None:
    """Persist compiled executables across processes — first-compile at 1080p
    costs minutes on a tunneled chip; cached reloads are seconds."""
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs
