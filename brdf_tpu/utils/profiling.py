"""Timing and throughput instrumentation.

Replaces the reference's fps ring buffer (``glutcallbacks.cpp:607-619``) and
levmar's nfev/njev counters with: wall timers that are correct on async
backends, rays/s-style throughput math, and a ``jax.profiler`` trace helper
for Perfetto/XProf dumps (SURVEY.md §5).
"""

from __future__ import annotations

import contextlib
import time

import numpy as np

import jax
import jax.numpy as jnp


class Timer:
    """Wall-clock timer that forces device completion at exit.

    On tunneled/async backends ``block_until_ready`` may not actually block
    (see bench.py), so ``sync_via`` optionally takes arrays whose scalar
    readback bounds the timed region.
    """

    def __init__(self, sync_via=None):
        self._sync = sync_via
        self.seconds = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            for a in jax.tree.leaves(self._sync):
                np.asarray(jax.tree.leaves(jnp.sum(jnp.ravel(a)[:1]))[0])
        else:
            pass
        self.seconds = time.perf_counter() - self._t0
        return False


def rays_per_sec(texels: int, views: int, seconds: float, passes: int = 1) -> float:
    """Shading throughput: one 'ray' = one (texel, view) shading evaluation;
    ``passes`` = 2 counts forward+backward (the BASELINE Mrays/s metric)."""
    return texels * views * passes / seconds


@contextlib.contextmanager
def profiler_trace(logdir: str | None):
    """jax.profiler trace if a logdir is given, else a no-op."""
    if logdir:
        with jax.profiler.trace(logdir):
            yield
    else:
        yield
