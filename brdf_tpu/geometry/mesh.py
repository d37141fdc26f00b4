"""Triangle-mesh container (JAX pytree).

Replaces the mesh side of ``CBRDFdata`` (Eigen ``m_vertices``/``m_faces`` plus
``CalcFaceNormals``/``CalcVertexNormals``, ``/root/reference/brdfdata.cpp:289-366``)
with an immutable NamedTuple of device arrays, so mesh quantities flow straight
into jitted shading code.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from brdf_tpu.io import obj as obj_io


class TriangleMesh(NamedTuple):
    """An indexed triangle mesh with precomputed shading geometry.

    All arrays are device arrays; ``faces`` is integer and is never
    differentiated through.
    """

    vertices: jnp.ndarray        # (V, 3)
    faces: jnp.ndarray           # (F, 3) int32
    face_normals: jnp.ndarray    # (F, 3) unit
    vertex_normals: jnp.ndarray  # (V, 3) unit
    centroids: jnp.ndarray       # (F, 3) triangle centers

    @property
    def num_faces(self) -> int:
        return self.faces.shape[0]

    @property
    def num_vertices(self) -> int:
        return self.vertices.shape[0]

    @classmethod
    def from_arrays(cls, vertices, faces, dtype=jnp.float32) -> "TriangleMesh":
        vertices = np.asarray(vertices, dtype=np.float64)
        faces = np.asarray(faces, dtype=np.int32)
        fn = obj_io.face_normals(vertices, faces)
        vn = obj_io.vertex_normals(vertices, faces, fn)
        centroids = vertices[faces].mean(axis=1)
        return cls(
            vertices=jnp.asarray(vertices, dtype=dtype),
            faces=jnp.asarray(faces),
            face_normals=jnp.asarray(fn, dtype=dtype),
            vertex_normals=jnp.asarray(vn, dtype=dtype),
            centroids=jnp.asarray(centroids, dtype=dtype),
        )

    @classmethod
    def from_obj(cls, path: str, dtype=jnp.float32) -> "TriangleMesh":
        vertices, faces = obj_io.load_obj(path)
        return cls.from_arrays(vertices, faces, dtype=dtype)

    def scaled(self, factor: float) -> "TriangleMesh":
        """Uniformly rescale positions (normals unchanged). The reference had a
        (disabled) ``ScaleMesh``, ``brdfdata.cpp:273-287``."""
        return self._replace(
            vertices=self.vertices * factor, centroids=self.centroids * factor
        )

    def centered(self) -> "TriangleMesh":
        offset = (self.vertices.max(axis=0) + self.vertices.min(axis=0)) / 2.0
        return self._replace(
            vertices=self.vertices - offset, centroids=self.centroids - offset
        )
