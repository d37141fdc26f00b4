"""Worker process for the 2-process sharded-fit tests (``test_multihost.py``).

Each of two ``jax.distributed`` CPU processes (4 virtual devices each) builds
the SAME deterministic global problem, carves out its process-local block,
and calls :func:`brdf_tpu.parallel.fit.fit_texels_sharded` over a mesh that
spans both processes — the multi-host execution path SURVEY.md §2.3 specifies
(global arrays via ``jax.make_array_from_process_local_data``; the reference
has nothing distributed, ``main.cpp:92``). Results are published through the
sharded-checkpoint protocol for the parent test to assemble and verify.

Layouts:
- ``data`` — the 8 mesh devices all on the texel axis; each process owns half
  the texels (pure data parallelism across hosts).
- ``view`` — a (4, 2) mesh whose view axis PAIRS DEVICES ACROSS THE TWO
  PROCESSES, so every JᵀJ/Jᵀe psum is a real cross-process collective (the
  DCN analogue of the pod recipe in docs/SCALING.md).
"""

import os
import sys

# Set before any backend initializes (the parent also passes it in the env;
# sitecustomize imports jax at startup, but CPU client init is lazy).
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")


def main():
    pid, nproc = int(sys.argv[1]), int(sys.argv[2])
    port, path, layout = sys.argv[3], sys.argv[4], sys.argv[5]
    jax.distributed.initialize(f"localhost:{port}", nproc, pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh

    from brdf_tpu.models.brdf import MODELS, ShadingAngles
    from brdf_tpu.parallel.fit import fit_texels_sharded
    from brdf_tpu.parallel.mesh import DATA_AXIS, VIEW_AXIS, local_block
    from brdf_tpu.solver.lm import LMOptions
    from brdf_tpu.utils.checkpoint import save_fit_state

    t, v = 64, 16
    rng = np.random.default_rng(0)
    ang = ShadingAngles(
        cos_ln=rng.uniform(0, 1, (t, v)).astype(np.float32),
        cos_nh=rng.uniform(0, 1, (t, v)).astype(np.float32),
        cos_rv=rng.uniform(-1, 1, (t, v)).astype(np.float32),
        cos_vn=rng.uniform(0.1, 1, (t, v)).astype(np.float32),
    )
    true_p = np.stack(
        [rng.uniform(0.1, 0.9, t), rng.uniform(0.2, 1.0, t),
         rng.uniform(2.0, 25.0, t)], -1,
    ).astype(np.float32)
    target = np.asarray(
        MODELS["blinn_phong"].fn(
            jnp.asarray(true_p), jax.tree.map(jnp.asarray, ang)
        )
    )

    devs = jax.devices()
    assert len(devs) == 4 * nproc, f"expected {4 * nproc} devices, got {len(devs)}"
    engine = "xla"
    opts = LMOptions(eps1=1e-7, eps2=1e-8, eps3=1e-14, itmax=60)
    if layout == "data":
        mesh = Mesh(
            np.asarray(devs).reshape(len(devs), 1), (DATA_AXIS, VIEW_AXIS)
        )
        lo, hi = pid * t // nproc, (pid + 1) * t // nproc
        tv = lambda a: a[lo:hi]          # this process's texel rows
    else:
        # view axis spans the processes: column p = process p's devices
        cols = [[d for d in devs if d.process_index == p] for p in range(nproc)]
        arr = np.empty((len(cols[0]), nproc), object)
        for i in range(len(cols[0])):
            for p in range(nproc):
                arr[i, p] = cols[p][i]
        mesh = Mesh(arr, (DATA_AXIS, VIEW_AXIS))
        vlo, vhi = pid * v // nproc, (pid + 1) * v // nproc
        tv = lambda a: a[:, vlo:vhi]     # this process's view columns
        if layout == "view_pallas":
            # the chunked Pallas NE engine (interpret mode on CPU) with its
            # per-shard normal equations psum'd ACROSS PROCESSES — the
            # production TPU engine's collective path, for real
            engine = "pallas"
            opts = opts._replace(itmax=8)   # interpret mode is slow

    res = fit_texels_sharded(
        "blinn_phong", jax.tree.map(tv, ang), tv(target), mesh,
        opts=opts, engine=engine,
    )
    out = {
        "p": local_block(res.p),
        "stop": local_block(res.stop),
        "chi2": local_block(res.chi2),
    }
    save_fit_state(path, 1, out, metadata={"layout": layout, "t": t, "v": v})
    jax.distributed.shutdown()
    print("worker", pid, "done")


if __name__ == "__main__":
    main()
