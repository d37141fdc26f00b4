"""brdf_tpu — a TPU-native differentiable BRDF-fitting framework.

A from-scratch JAX/XLA/Pallas re-imagination of the capabilities of the
reference C++/OpenGL application (``ccalantzis/BRDF``): fit per-texel BRDF
parameters (Blinn-Phong / Phong ``kd, ks, n``; Cook-Torrance roughness/Fresnel;
optional normal offsets) to multi-view photographs of 3D-scanned objects
captured under a calibrated LED rig, then re-render/relight the object from the
fitted parameters.

Layer map (bottom-up), mirroring SURVEY.md §1 but TPU-first:

- ``brdf_tpu.solver``   — batched box-constrained Levenberg-Marquardt in pure
  JAX (``lax.while_loop`` + ``vmap``), the levmar (L0) replacement.
- ``brdf_tpu.io``       — scene data: .obj meshes, Tsai .cal cameras, PNG image
  stacks, LED-rig geometry (L1 replacement).
- ``brdf_tpu.geometry`` — mesh/camera/rasterization math (L1/A6 replacement).
- ``brdf_tpu.models``   — differentiable shading models (A7/A8 replacement,
  with the reference's math bugs *fixed*, see SURVEY.md §2.1).
- ``brdf_tpu.ops``      — Pallas TPU kernels for the hot shading/normal-equation
  path.
- ``brdf_tpu.parallel`` — device-mesh sharding: texels on the ``data`` axis,
  views on the ``view`` axis, psum'd J^T J / J^T r reductions.
- ``brdf_tpu.pipeline`` — end-to-end fit and render/relight drivers (A1/A9
  replacement: batched image synthesis instead of a GLUT preview).
"""

__version__ = "0.1.0"

from brdf_tpu.solver.lm import (  # noqa: F401
    LMOptions,
    LMResult,
    StopReason,
    levmar,
    levmar_bc,
)
from brdf_tpu.models.brdf import (  # noqa: F401
    ShadingAngles,
    shading_angles,
    brdf_eval,
    MODELS,
)
