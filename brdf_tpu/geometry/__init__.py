from brdf_tpu.geometry.mesh import TriangleMesh  # noqa: F401
from brdf_tpu.geometry.camera import Camera  # noqa: F401
