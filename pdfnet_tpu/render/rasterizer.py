"""Differentiable-enough JAX triangle rasterizer (pytorch3d replacement).

Covers the reference's rendering needs (mano_utils.py:44-207
mano_two_hands_renderer, RenderDepthRgbMask.py): z-buffered RGB / mask /
depth of the two-hand mesh under a pinhole camera, with per-vertex colors
and diffuse shading.  Used for demo overlays, eval visualization, and the
optional photometric-loss path.

Design: edge-function coverage over pixel tiles with a ``lax.scan`` over
face chunks — fixed shapes, fits VMEM, fuses on TPU.  Gradients flow
through barycentric z/color interpolation (coverage is hard, like the
reference's rasterizer).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _face_attrs(verts2d, z, faces):
    """Gather per-face vertex data: (F, 3, 2) xy, (F, 3) z."""
    return verts2d[faces], z[faces]


@partial(jax.jit, static_argnames=("height", "width", "face_chunk"))
def rasterize_mesh(
    verts2d: jax.Array,          # (V, 2) pixel coords
    z: jax.Array,                # (V,) camera-space depth (>0)
    faces: jax.Array,            # (F, 3) int32
    height: int = 384,
    width: int = 384,
    face_chunk: int = 128,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (zbuf (H, W), face_id (H, W) int32 [-1 = miss], bary (H, W, 3))."""
    F = faces.shape[0]
    pad = (-F) % face_chunk
    faces_p = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    fxy, fz = _face_attrs(verts2d, z, faces_p)     # (Fp,3,2), (Fp,3)
    valid_face = jnp.concatenate(
        [jnp.ones((F,), bool), jnp.zeros((pad,), bool)])

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    px, py = jnp.meshgrid(xs, ys)                  # (H, W)
    pix = jnp.stack([px, py], -1).reshape(-1, 2)   # (P, 2)

    n_chunks = faces_p.shape[0] // face_chunk
    fxy_c = fxy.reshape(n_chunks, face_chunk, 3, 2)
    fz_c = fz.reshape(n_chunks, face_chunk, 3)
    vf_c = valid_face.reshape(n_chunks, face_chunk)
    fid_c = jnp.arange(faces_p.shape[0]).reshape(n_chunks, face_chunk)

    def edge(a, b, p):
        # signed area of (a, b, p); (C, 1, 2) x (P, 2) broadcasting
        return ((b[..., 0] - a[..., 0]) * (p[..., 1] - a[..., 1]) -
                (b[..., 1] - a[..., 1]) * (p[..., 0] - a[..., 0]))

    def scan_body(carry, chunk):
        zbuf, fid_buf, bary_buf = carry
        cxy, cz, cvalid, cfid = chunk
        a = cxy[:, None, 0]                        # (C, 1, 2)
        b = cxy[:, None, 1]
        c = cxy[:, None, 2]
        p = pix[None]                              # (1, P, 2)
        w0 = edge(b, c, p)                         # (C, P)
        w1 = edge(c, a, p)
        w2 = edge(a, b, p)
        area = edge(cxy[:, None, 0], cxy[:, None, 1],
                    cxy[:, None, 2, :])            # (C, 1)
        inside = (((w0 >= 0) & (w1 >= 0) & (w2 >= 0)) |
                  ((w0 <= 0) & (w1 <= 0) & (w2 <= 0)))
        denom = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
        b0, b1, b2 = w0 / denom, w1 / denom, w2 / denom
        zi = (b0 * cz[:, None, 0] + b1 * cz[:, None, 1] +
              b2 * cz[:, None, 2])                 # (C, P)
        ok = (inside & cvalid[:, None] & (jnp.abs(area) > 1e-9) & (zi > 0))
        zi = jnp.where(ok, zi, jnp.inf)
        best = jnp.argmin(zi, axis=0)              # (P,)
        best_z = jnp.take_along_axis(zi, best[None], axis=0)[0]
        sel = lambda arr: jnp.take_along_axis(arr, best[None], axis=0)[0]
        hit = best_z < zbuf
        zbuf = jnp.where(hit, best_z, zbuf)
        fid_buf = jnp.where(hit, sel(jnp.broadcast_to(
            cfid[:, None], zi.shape)), fid_buf)
        new_bary = jnp.stack([sel(b0), sel(b1), sel(b2)], -1)
        bary_buf = jnp.where(hit[:, None], new_bary, bary_buf)
        return (zbuf, fid_buf, bary_buf), None

    P = pix.shape[0]
    init = (jnp.full((P,), jnp.inf), jnp.full((P,), -1, jnp.int32),
            jnp.zeros((P, 3)))
    (zbuf, fid, bary), _ = jax.lax.scan(
        scan_body, init, (fxy_c, fz_c, vf_c, fid_c.astype(jnp.int32)))
    zbuf = jnp.where(jnp.isinf(zbuf), 0.0, zbuf)
    return (zbuf.reshape(height, width), fid.reshape(height, width),
            bary.reshape(height, width, 3))


def shade_vertex_colors(fid, bary, faces, vert_colors, background=0.0):
    """Interpolate per-vertex colors at rasterized pixels."""
    safe_fid = jnp.maximum(fid, 0)
    tri = faces[safe_fid]                        # (H, W, 3)
    cols = vert_colors[tri]                      # (H, W, 3, C)
    rgb = jnp.einsum("hwk,hwkc->hwc", bary, cols)
    hit = (fid >= 0)[..., None]
    return jnp.where(hit, rgb, background)


SKIN_COLOR = np.array([0.85, 0.68, 0.58], np.float32)


def render_two_hands(
    verts_left: jax.Array,       # (778, 3) camera space
    verts_right: jax.Array,
    K: jax.Array,                # (3, 3)
    faces_left: np.ndarray,
    faces_right: np.ndarray,
    height: int = 384,
    width: int = 384,
    vert_colors: Optional[jax.Array] = None,
    light_dir=(0.0, 0.0, 1.0),
):
    """Render both hands: returns (rgb (H,W,3), mask (H,W), depth (H,W)).

    Equivalent of mano_two_hands_renderer.render_rgb: meshes concatenated
    with the right-hand face indices offset by 778 and the left-hand faces
    re-wound so both meshes are front-facing.
    """
    verts = jnp.concatenate([verts_left, verts_right], axis=0)   # (1556, 3)
    faces = np.concatenate(
        [faces_left[:, ::-1], faces_right + 778], axis=0).astype(np.int32)

    proj = verts @ K.T
    v2d = proj[:, :2] / (proj[:, 2:] + 1e-8)
    zbuf, fid, bary = rasterize_mesh(v2d, verts[:, 2], jnp.asarray(faces),
                                     height, width)

    # Per-vertex normals for diffuse shading.
    fn = jnp.cross(verts[faces[:, 1]] - verts[faces[:, 0]],
                   verts[faces[:, 2]] - verts[faces[:, 1]])
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[faces[:, k]].add(fn)
    vn = vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-8)
    light = jnp.asarray(light_dir)
    light = light / jnp.linalg.norm(light)
    diffuse = jnp.clip(jnp.abs(vn @ light), 0.2, 1.0)[:, None]

    if vert_colors is None:
        vert_colors = jnp.broadcast_to(jnp.asarray(SKIN_COLOR), verts.shape)
    shaded = vert_colors * diffuse
    rgb = shade_vertex_colors(fid, bary, jnp.asarray(faces), shaded)
    mask = (fid >= 0).astype(jnp.float32)
    return rgb, mask, zbuf
