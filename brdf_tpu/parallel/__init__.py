from brdf_tpu.parallel.mesh import make_mesh, pad_to_multiple  # noqa: F401
from brdf_tpu.parallel.fit import fit_texels_sharded  # noqa: F401
