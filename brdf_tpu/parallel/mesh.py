"""Device-mesh construction and multi-host helpers.

The reference has no distributed execution of any kind (single thread, single
process — SURVEY.md §2.3); this layer is designed fresh for TPU. The honest
parallel decomposition of BRDF fitting is:

- ``data`` axis — texels. Per-texel LM problems are embarrassingly parallel
  (the reference solved W×H×3 of them serially, ``brdfdata.cpp:1195-1221``).
- ``view`` axis — calibrated views / measurements. The Gauss-Newton normal
  equations are sums over measurements, so sharding views turns ``JᵀJ``/``Jᵀe``
  into psum reductions over this axis (the workload's analogue of sequence
  parallelism).

There is deliberately no TP/PP/EP here: no giant weight matrices, no deep
sequential stack, no experts (SURVEY.md §2.3).
"""

from __future__ import annotations

import os

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


DATA_AXIS = "data"
VIEW_AXIS = "view"


def make_mesh(
    data: int | None = None, view: int = 1, devices=None
) -> Mesh:
    """A 2-D ``(data, view)`` mesh. By default all devices go to the texel
    (``data``) axis; pass ``view > 1`` to split the measurement reduction."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % view:
            raise ValueError(f"{n} devices not divisible by view={view}")
        data = n // view
    if data * view != n:
        raise ValueError(f"mesh {data}x{view} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, view)
    return Mesh(dev_array, (DATA_AXIS, VIEW_AXIS))


def texel_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for per-texel arrays: leading dim over ``data``."""
    return NamedSharding(mesh, P(DATA_AXIS))


def texel_view_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (texel, view) arrays."""
    return NamedSharding(mesh, P(DATA_AXIS, VIEW_AXIS))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0, value=0.0):
    """Pad ``x`` along ``axis`` so its size divides evenly across a mesh axis.

    Returns ``(padded, original_size)``; solvers mask padded texels out via
    the target weights (padded rows fit a zero-residual problem and converge
    immediately, so the cost is negligible).
    """
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x, size
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, rem)
    return np.pad(x, widths, constant_values=value), size


def initialize_multihost(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host bring-up: one process per host on a pod slice
    (``python -m brdf_tpu --multihost ...``; no reference equivalent —
    SURVEY.md §2.3). Returns True when a distributed runtime is active.

    With explicit arguments this calls ``jax.distributed.initialize`` with
    them; with none, it auto-initializes from the standard cluster
    environment (``JAX_COORDINATOR_ADDRESS``/TPU metadata) when present and
    stays a single-process no-op otherwise — so the same CLI invocation
    works on a laptop and on every host of a slice.
    """
    if jax.process_count() > 1:
        return True  # already initialized
    if coordinator is not None:
        jax.distributed.initialize(coordinator, num_processes, process_id)
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()   # env/cluster auto-detection
        return True
    return False
