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


@functools.partial(jax.jit, static_argnames=("model", "engine"))
def render_pixels(
    model: str,
    params: jnp.ndarray,    # (N, C, m) per-pixel per-channel parameters
    points: jnp.ndarray,    # (N, 3) surface points
    normals: jnp.ndarray,   # (N, 3) unit normals
    eye: jnp.ndarray,       # (3,) camera position
    lights: jnp.ndarray,    # (L, 3) active point lights
    engine: str = "xla",    # "xla" (fused jnp lobe) | "pallas" (hand kernel)
) -> jnp.ndarray:
    """Shade N surface samples under L lights; returns (N, C) with light
    contributions summed. Pure and jittable — the hot serve function.

    ``engine="pallas"`` routes through the hand-written VMEM shading kernel
    (``ops/shading_pallas.py``, analytic fwd+bwd); the default XLA path lets
    the compiler fuse the jnp lobe. Both are bitwise-close (tests assert it).
    """
    ang = shading_angles(
        points, normals, eye, lights, tangent_frame=MODELS[model].tangent
    )   # cosines (N, L)
    if engine == "pallas":
        from brdf_tpu.ops.shading_pallas import shade_pallas

        n, c, m = params.shape
        l = ang.cos_ln.shape[-1]
        ang_flat = jax.tree.map(lambda a: jnp.repeat(a, c, axis=0), ang)
        vals = shade_pallas(model, params.reshape(n * c, m), ang_flat)
        return jnp.sum(vals.reshape(n, c, l), axis=-1)
    if engine != "xla":
        raise ValueError(f"unknown shading engine {engine!r} (xla | pallas)")
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
    if lights is None:
        lights = scene.lights[view : view + 1]
    return shade_raster_map(
        model, scene.mesh, scene.raster_map(view), scene.cameras[view],
        params, face_ids, lights, background=background,
        use_vertex_normals=use_vertex_normals, normal_offsets=normal_offsets,
    )


def gather_covered_pixels(
    mesh,
    rm,
    params: np.ndarray,
    face_ids: np.ndarray,
    use_vertex_normals: bool = True,
    normal_offsets: np.ndarray | None = None,
):
    """Host-side gather of the per-covered-pixel shading inputs of a raster
    map: returns ``(cov (H, W) bool, pts (N, 3), nrm (N, 3), p_px (N, ...),
    valid (N,))``. Shared by point-light and environment relighting."""
    if normal_offsets is not None:
        use_vertex_normals = False

    cov = rm.coverage
    fids = rm.face_id[cov]                            # faces per covered pixel
    bary = rm.bary[cov]                               # (N, 3)

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
    return cov, pts, nrm, p_px, valid


def shade_raster_map(
    model: str,
    mesh,
    rm,
    cam,
    params: np.ndarray,
    face_ids: np.ndarray,
    lights: np.ndarray,
    background: float = 0.0,
    use_vertex_normals: bool = True,
    normal_offsets: np.ndarray | None = None,
) -> np.ndarray:
    """Shade one rasterized camera view of ``mesh`` with per-texel parameters
    — the core of :func:`render_image`, usable with any camera/raster map
    (novel viewpoints included, see :func:`render_turntable`)."""
    cov, pts, nrm, p_px, valid = gather_covered_pixels(
        mesh, rm, params, face_ids,
        use_vertex_normals=use_vertex_normals, normal_offsets=normal_offsets,
    )
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


def orbit_cameras(
    mesh,
    frames: int = 12,
    elevation_deg: float = 20.0,
    distance: float | None = None,
    size: tuple[int, int] = (512, 512),
    f: float | None = None,
    up=(0.0, 1.0, 0.0),
):
    """Synthetic cameras orbiting the mesh — the batch replacement for the
    reference's interactive mouse-orbit camera (``glutcallbacks.cpp:764-879``,
    ``ResetCamera``)."""
    from brdf_tpu.geometry.camera import Camera

    verts = np.asarray(mesh.vertices, np.float64)
    center = verts.mean(axis=0)
    radius = float(np.linalg.norm(verts - center, axis=-1).max())
    if distance is None:
        distance = 2.5 * max(radius, 1e-6)
    if f is None:
        # fit the bounding sphere comfortably in frame
        f = 0.45 * min(size) * distance / max(radius, 1e-6)
    el = np.deg2rad(elevation_deg)
    up = np.asarray(up, np.float64)
    up = up / np.linalg.norm(up)
    # orthonormal frame around `up` for the orbit plane
    ref = np.array([1.0, 0.0, 0.0]) if abs(up[0]) < 0.9 else np.array([0.0, 0.0, 1.0])
    e1 = np.cross(up, ref); e1 /= np.linalg.norm(e1)
    e2 = np.cross(up, e1)
    cams = []
    for k in range(frames):
        az = 2.0 * np.pi * k / frames
        d = (np.cos(el) * (np.cos(az) * e1 + np.sin(az) * e2) + np.sin(el) * up)
        eye = center + distance * d
        cams.append(
            Camera.look_at(eye, center, up=up, f=f, width=size[0], height=size[1])
        )
    return cams


def render_turntable(
    model: str,
    scene: Scene,
    params: np.ndarray,
    face_ids: np.ndarray,
    frames: int = 12,
    elevation_deg: float = 20.0,
    distance: float | None = None,
    size: tuple[int, int] = (512, 512),
    lights: np.ndarray | None = None,
    headlight: bool = True,
    normal_offsets: np.ndarray | None = None,
    up=(0.0, 1.0, 0.0),
) -> np.ndarray:
    """Render an orbit around the fitted object — the offline equivalent of
    the reference's interactive preview loop (``Display_`` + mouse orbit +
    ``m``-key BRDF shading, ``glutcallbacks.cpp:344-446``, ``:764-879``).

    ``headlight=True`` places the light at the eye each frame, exactly the
    preview's GL_LIGHT1-at-eye setup (``glutcallbacks.cpp:460-478``);
    otherwise ``lights`` (default: the scene's LEDs) stays fixed while the
    camera orbits. Returns (frames, H, W, C) in [0, 1]-ish linear intensity.
    """
    from brdf_tpu.geometry.rasterize import rasterize_mesh

    mesh = scene.mesh
    cams = orbit_cameras(
        mesh, frames=frames, elevation_deg=elevation_deg, distance=distance,
        size=size, up=up,
    )
    if lights is None and not headlight:
        lights = scene.lights
    out = []
    for cam in cams:
        rm = rasterize_mesh(cam, mesh.vertices, mesh.faces)
        l_frame = (
            np.asarray(cam.position, np.float32)[None] if headlight else lights
        )
        out.append(
            shade_raster_map(
                model, mesh, rm, cam, params, face_ids, l_frame,
                normal_offsets=normal_offsets,
            )
        )
    return np.stack(out)


def splat_points(
    camera,
    points: np.ndarray,     # (N, 3)
    values: np.ndarray,     # (N, C)
    background: float = 0.0,
) -> np.ndarray:
    """Painter's-algorithm point splat: project shaded surface samples into a
    camera and keep the nearest per pixel. Used to preview pixel-granularity
    fits from novel viewpoints (their texels are reference-view pixels, so
    there is no raster map to look up)."""
    from brdf_tpu.geometry.camera import project_np

    uv, z = project_np(camera, np.asarray(points, np.float64))
    h, w = camera.height, camera.width
    px = np.round(uv[:, 0]).astype(np.int64)
    py = np.round(uv[:, 1]).astype(np.int64)
    ok = (z > 0) & (px >= 0) & (px < w) & (py >= 0) & (py < h)
    idx = np.nonzero(ok)[0]
    order = idx[np.argsort(-z[idx])]         # far → near; near painted last
    img = np.full((h, w, values.shape[-1]), background, np.float32)
    img[py[order], px[order]] = values[order]
    return img
