"""Checkpoint / resume for fitting runs.

The reference kept fit results only in memory (``brdf_surfaces``,
``brdfdata.h:49``) — closing the window lost everything (SURVEY.md §5). Here
fitted parameter maps and solver state are first-class arrays, saved as
compressed ``.npz`` shards per host process plus a JSON manifest, so a
long multi-scene fit can resume mid-run (p, μ, ν, convergence masks) and the
serve path can load parameter maps without refitting.

Format: ``<dir>/step_<n>/shard_<p>.npz`` + ``<dir>/step_<n>/manifest.json``.
Single-host runs produce one shard; multi-host runs save per-process shards
of their addressable data (assembly happens at load).
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np

import jax


def _step_dir(path: str, step: int) -> str:
    return os.path.join(path, f"step_{step:08d}")


def save_fit_state(
    path: str,
    step: int,
    arrays: dict[str, np.ndarray],
    metadata: dict | None = None,
) -> str:
    """Save named arrays + metadata for ``step``. Returns the step directory."""
    d = _step_dir(path, step)
    tmp = d + ".tmp"
    os.makedirs(tmp, exist_ok=True)
    proc = jax.process_index()
    np.savez_compressed(
        os.path.join(tmp, f"shard_{proc:04d}.npz"),
        **{k: np.asarray(v) for k, v in arrays.items()},
    )
    if proc == 0:
        manifest = {
            "step": step,
            "num_shards": jax.process_count(),
            "keys": sorted(arrays.keys()),
            "metadata": metadata or {},
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as fh:
            json.dump(manifest, fh, indent=2)
    # atomic-ish publish
    if os.path.exists(d):
        shutil.rmtree(d)
    os.replace(tmp, d)
    return d


def latest_step(path: str) -> int | None:
    if not os.path.isdir(path):
        return None
    steps = [
        int(n.split("_")[1])
        for n in os.listdir(path)
        if n.startswith("step_") and not n.endswith(".tmp")
    ]
    return max(steps) if steps else None


def load_fit_state(path: str, step: int | None = None) -> tuple[dict, dict]:
    """Load ``(arrays, metadata)`` for a step (default: latest). Shards are
    concatenated on axis 0 in process order."""
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path!r}")
    d = _step_dir(path, step)
    with open(os.path.join(d, "manifest.json")) as fh:
        manifest = json.load(fh)
    shards = sorted(
        os.path.join(d, n) for n in os.listdir(d) if n.startswith("shard_")
    )
    loaded = [np.load(s) for s in shards]
    arrays = {}
    for key in manifest["keys"]:
        parts = [l[key] for l in loaded]
        arrays[key] = parts[0] if len(parts) == 1 else np.concatenate(parts, 0)
    return arrays, manifest["metadata"]


class FitCheckpointer:
    """Periodic checkpointing with latest-k retention."""

    def __init__(self, path: str, every: int = 1, keep: int = 3):
        self.path = path
        self.every = max(every, 1)
        self.keep = max(keep, 1)

    def maybe_save(self, step: int, arrays: dict, metadata: dict | None = None):
        if step % self.every:
            return None
        out = save_fit_state(self.path, step, arrays, metadata)
        self._prune()
        return out

    def restore(self, step: int | None = None):
        return load_fit_state(self.path, step)

    def _prune(self):
        if not os.path.isdir(self.path):
            return
        steps = sorted(
            int(n.split("_")[1])
            for n in os.listdir(self.path)
            if n.startswith("step_") and not n.endswith(".tmp")
        )
        for s in steps[: -self.keep]:
            shutil.rmtree(_step_dir(self.path, s), ignore_errors=True)
