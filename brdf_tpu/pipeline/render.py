"""Batched image synthesis from fitted BRDF parameters ("serve" path).

Replaces the reference's interactive GLUT preview (``DrawMesh``'s per-triangle
CPU shading, ``/root/reference/glutcallbacks.cpp:344-446``) with jitted,
batched rendering: all covered pixels are shaded in one fused XLA program —
usable both as the product output (relighting from arbitrary lights/cameras)
and as the round-trip test generator (SURVEY.md §7 step 6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from brdf_tpu.models.brdf import MODELS, shading_angles
from brdf_tpu.pipeline.scene import Scene


import functools


@functools.partial(jax.jit, static_argnames=("model",))
def render_pixels(
    model: str,
    params: jnp.ndarray,    # (N, C, m) per-pixel per-channel parameters
    points: jnp.ndarray,    # (N, 3) surface points
    normals: jnp.ndarray,   # (N, 3) unit normals
    eye: jnp.ndarray,       # (3,) camera position
    lights: jnp.ndarray,    # (L, 3) active point lights
) -> jnp.ndarray:
    """Shade N surface samples under L lights; returns (N, C) with light
    contributions summed. Pure and jittable — the hot serve function."""
    ang = shading_angles(points, normals, eye, lights)   # cosines (N, L)
    fn = MODELS[model].fn
    # params (N, C, m) × angles (N, 1, L) broadcast to (N, C, L); sum lights
    vals = fn(params, jax.tree.map(lambda a: a[:, None, :], ang))
    return jnp.sum(vals, axis=-1)


def render_image(
    model: str,
    scene: Scene,
    params: np.ndarray,          # (T, C, m) per-texel parameters
    face_ids: np.ndarray,        # (T,) faces backing the texels
    view: int = 0,
    lights: np.ndarray | None = None,
    background: float = 0.0,
    use_vertex_normals: bool = True,
    normal_offsets: np.ndarray | None = None,  # (T, 2) fitted (nu, nv)
) -> np.ndarray:
    """Render the scene's mesh with fitted parameters from a view's camera.

    ``lights`` defaults to the view's own LED (reproducing the measurement
    condition — the round-trip case); pass any (L, 3) array to relight.
    ``normal_offsets`` applies joint-fit tangent-space normal perturbations
    (forces flat shading, since the offsets refine per-texel face normals).
    """
    if normal_offsets is not None:
        use_vertex_normals = False
    cam = scene.cameras[view]
    rm = scene.raster_map(view)
    if lights is None:
        lights = scene.lights[view : view + 1]

    cov = rm.coverage
    fids = rm.face_id[cov]                            # faces per covered pixel
    bary = rm.bary[cov]                               # (N, 3)

    mesh = scene.mesh
    tri = np.asarray(mesh.vertices)[np.asarray(mesh.faces)[fids]]   # (N, 3, 3)
    pts = np.einsum("nk,nkd->nd", bary, tri)
    if use_vertex_normals:
        vn = np.asarray(mesh.vertex_normals)[np.asarray(mesh.faces)[fids]]
        nrm = np.einsum("nk,nkd->nd", bary, vn)
        nrm /= np.maximum(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    else:
        nrm = np.asarray(mesh.face_normals)[fids]

    # texel lookup: map face id → texel row (faces without a texel render black)
    t = len(face_ids)
    lut = np.full(mesh.num_faces, -1, np.int64)
    lut[face_ids] = np.arange(t)
    rows = lut[fids]
    valid = rows >= 0
    p_px = np.zeros((len(fids),) + params.shape[1:], params.dtype)
    p_px[valid] = params[rows[valid]]

    if normal_offsets is not None:
        from brdf_tpu.models.normalmap import tangent_basis

        tb, bb = tangent_basis(jnp.asarray(nrm, jnp.float32))
        off = np.zeros((len(fids), 2), np.float32)
        off[valid] = normal_offsets[rows[valid]]
        n_new = (
            nrm
            + off[:, 0:1] * np.asarray(tb)
            + off[:, 1:2] * np.asarray(bb)
        )
        nrm = n_new / np.maximum(np.linalg.norm(n_new, axis=-1, keepdims=True), 1e-12)

    shaded = render_pixels(
        model,
        jnp.asarray(p_px),
        jnp.asarray(pts, jnp.float32),
        jnp.asarray(nrm, jnp.float32),
        cam.position,
        jnp.asarray(lights, jnp.float32),
    )
    img = np.full((cam.height, cam.width, params.shape[1]), background, np.float32)
    img[cov] = np.asarray(shaded) * valid[:, None]
    return img


def render_pixel_fit(
    model: str,
    scene: Scene,
    params: np.ndarray,          # (T, C, m) per-pixel-texel parameters
    pixels: np.ndarray,          # (T, 2) [x, y] reference-view pixels
    points: np.ndarray,          # (T, 3)
    normals: np.ndarray,         # (T, 3)
    view: int = 0,
    lights: np.ndarray | None = None,
    background: float = 0.0,
) -> np.ndarray:
    """Render a pixel-granularity fit: each texel shades its own pixel of the
    reference view (use :func:`render_image` for face-granularity maps)."""
    cam = scene.cameras[view]
    if lights is None:
        lights = scene.lights[view : view + 1]
    shaded = render_pixels(
        model,
        jnp.asarray(params),
        jnp.asarray(points, jnp.float32),
        jnp.asarray(normals, jnp.float32),
        cam.position,
        jnp.asarray(lights, jnp.float32),
    )
    img = np.full((cam.height, cam.width, params.shape[1]), background, np.float32)
    img[pixels[:, 1], pixels[:, 0]] = np.asarray(shaded)
    return img


def relight(
    model: str,
    scene: Scene,
    params: np.ndarray,
    face_ids: np.ndarray,
    lights: np.ndarray,
    view: int = 0,
) -> np.ndarray:
    """Re-render under novel lighting — the capability the reference's `m`
    keypress preview approximated with a headlight at the eye
    (``glutcallbacks.cpp:346-445``)."""
    return render_image(model, scene, params, face_ids, view=view, lights=lights)
