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


def local_block(arr) -> np.ndarray:
    """This process's block of a globally-sharded ``jax.Array`` as host NumPy.

    The readback twin of the ``make_array_from_process_local_data`` entry in
    ``parallel/fit.py::_to_global``: on a multi-process runtime each process
    only holds its addressable shards, so results come back per process and
    assemble across processes through the sharded-checkpoint protocol
    (``utils/checkpoint.py``) — not through a host-global gather.

    Assembles the addressable shards into the contiguous block they cover
    (shards are placed by their global index offset within the block).
    Single-process arrays round-trip unchanged.
    """
    shards = sorted(arr.addressable_shards, key=lambda s: s.index)
    if not shards:
        return np.zeros((0,) + arr.shape[1:], arr.dtype)
    # block origin = elementwise-min start of the addressable shard indices
    starts = [
        tuple(sl.start or 0 for sl in s.index) for s in shards
    ]
    origin = tuple(min(st[d] for st in starts) for d in range(arr.ndim))
    stops = [
        tuple(
            (sl.stop if sl.stop is not None else arr.shape[d])
            for d, sl in enumerate(s.index)
        )
        for s in shards
    ]
    extent = tuple(
        max(st[d] for st in stops) - origin[d] for d in range(arr.ndim)
    )
    out = np.zeros(extent, arr.dtype)
    for s, st in zip(shards, starts):
        idx = tuple(
            slice(st[d] - origin[d], st[d] - origin[d] + s.data.shape[d])
            for d in range(arr.ndim)
        )
        out[idx] = np.asarray(s.data)
    return out


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
