"""Differentiable MANO hand model as pure jittable JAX functions.

Behavioral equivalent of the reference ManoLayer
(/root/reference/lib/models/networks/manolayer.py:100-334): shape blend
shapes -> pose blend shapes -> 16-joint SE(3) kinematic chain -> linear blend
skinning -> fingertip extraction -> 21-joint reorder.

TPU-first design notes:
- All constants live in a :class:`ManoConsts` pytree; the forward is a pure
  function of (consts, inputs), so it jits/vmaps/shards freely.
- The kinematic chain is unrolled at trace time (16 joints, static parents);
  XLA fuses the 3x3/4x4 batched matmuls.  LBS is a single (778,16) x
  (B,16,16) matmul that maps onto the MXU.
- Everything is float32: the downstream accuracy budget is 0.1 mm, so the
  mesh path does not use bf16.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdfnet_tpu import assets

# The mesh path has a 0.1 mm accuracy budget: force true-f32 MXU matmuls
# (3-pass bf16 is not enough at hand scale ~1e-1 m).
_HI = jax.lax.Precision.HIGHEST


class ManoConsts(NamedTuple):
    v_template: jax.Array       # (778, 3)
    shapedirs: jax.Array        # (778, 3, 10)
    posedirs: jax.Array         # (778, 3, 135)
    J_regressor: jax.Array      # (16, 778)
    weights: jax.Array          # (778, 16)
    hands_components: jax.Array  # (45, 45)
    hands_mean: jax.Array       # (45,)
    parent: tuple               # static python tuple of 16 ints
    tip_verts: tuple            # static python tuple of 5 ints
    new_order: tuple            # static python tuple of 21 ints


def load_mano_consts(side: str, fix_shape: bool = True) -> ManoConsts:
    m = assets.load_mano(side, fix_shape=fix_shape)
    return ManoConsts(
        v_template=jnp.asarray(m.v_template),
        shapedirs=jnp.asarray(m.shapedirs),
        posedirs=jnp.asarray(m.posedirs),
        J_regressor=jnp.asarray(m.J_regressor),
        weights=jnp.asarray(m.weights),
        hands_components=jnp.asarray(m.hands_components),
        hands_mean=jnp.asarray(m.hands_mean),
        parent=tuple(int(p) for p in m.parent),
        tip_verts=tuple(int(v) for v in m.tip_verts),
        new_order=tuple(assets.NEW_ORDER),
    )


def rodrigues(axis: jax.Array) -> jax.Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Matches manolayer.rodrigues_batch numerics (eps inside the norm).
    """
    batch_shape = axis.shape[:-1]
    a = axis.reshape(-1, 3)
    angle = jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-8   # (N, 1)
    axes = a / angle
    sin = jnp.sin(angle)[..., None]                              # (N, 1, 1)
    cos = jnp.cos(angle)[..., None]
    ax, ay, az = axes[:, 0], axes[:, 1], axes[:, 2]
    zeros = jnp.zeros_like(ax)
    # Skew-symmetric cross-product matrix L with L @ v = axes x v.
    L = jnp.stack([
        jnp.stack([zeros, -az, ay], axis=-1),
        jnp.stack([az, zeros, -ax], axis=-1),
        jnp.stack([-ay, ax, zeros], axis=-1),
    ], axis=-2)
    eye = jnp.eye(3, dtype=a.dtype)
    R = eye + sin * L + (1.0 - cos) * jnp.matmul(L, L, precision=_HI)
    return R.reshape(*batch_shape, 3, 3)


def axis_to_rmat(axis: jax.Array) -> jax.Array:
    """(B, 3k) axis-angle stack -> (B, k, 3, 3) rotation matrices."""
    B = axis.shape[0]
    return rodrigues(axis.reshape(B, -1, 3))


def pca_to_axis(consts: ManoConsts, pca: jax.Array) -> jax.Array:
    """PCA pose coefficients (B, n<=45) -> 45-dim axis-angle."""
    n = pca.shape[1]
    return jnp.matmul(pca, consts.hands_components[:n], precision=_HI) + consts.hands_mean


def axis_to_pca(consts: ManoConsts, axis: jax.Array) -> jax.Array:
    inv = jnp.linalg.inv(consts.hands_components)
    return jnp.matmul(axis - consts.hands_mean, inv, precision=_HI)


def mano_forward(
    consts: ManoConsts,
    root_rot: jax.Array,
    pose: jax.Array,
    shape: jax.Array,
    trans: Optional[jax.Array] = None,
    scale: Optional[jax.Array] = None,
    center_idx: Optional[int] = None,
    use_pca: bool = False,
):
    """MANO forward kinematics + LBS.

    Args:
      root_rot: (B, 3) axis-angle (default) or (B, 3, 3) rotation matrix.
      pose: (B, 45) axis-angle, (B, n) PCA coeffs if use_pca, or
        (B, 15, 3, 3) rotation matrices.
      shape: (B, 10) betas.
      trans: optional (B, 3) translation added last.
      scale: optional (B,) scale applied before translation.
      center_idx: optional joint index to subtract (reference default 9).

    Returns:
      (verts (B, 778, 3), joints (B, 21, 3))
    """
    B = root_rot.shape[0]
    f32 = jnp.float32

    if use_pca:
        rot_mats = rodrigues(pca_to_axis(consts, pose).reshape(B, 15, 3))
    elif pose.ndim == 4:
        rot_mats = pose
    else:
        rot_mats = rodrigues(pose.reshape(B, 15, 3))
    if root_rot.ndim == 2:
        root_R = rodrigues(root_rot)
    else:
        root_R = root_rot

    # Shape blend shapes: (778, 3, 10) x (B, 10) -> (B, 778, 3)
    v_shaped = consts.v_template + jnp.einsum(
        "vct,bt->bvc", consts.shapedirs, shape.astype(f32), precision=_HI)
    j_tpose = jnp.einsum("jv,bvc->bjc", consts.J_regressor, v_shaped, precision=_HI)  # (B,16,3)

    # Pose blend shapes from (R - I) of the 15 finger joints.
    eye = jnp.eye(3, dtype=f32)
    pose_feat = (rot_mats - eye).reshape(B, 135)
    v_tpose = v_shaped + jnp.einsum("vcp,bp->bvc", consts.posedirs, pose_feat, precision=_HI)

    # Kinematic chain: per-joint world SE(3).  Unrolled (static 16 joints).
    def make_se3(R, j):
        # Rotation about joint location j: [R | (I - R) j]
        t = jnp.einsum("bij,bj->bi", eye - R, j, precision=_HI)
        return R, t

    Rs = [None] * 16
    ts = [None] * 16
    Rs[0], ts[0] = make_se3(root_R, j_tpose[:, 0])
    joints_wo_tips = [j_tpose[:, 0]]
    for i in range(1, 16):
        Ri, ti = make_se3(rot_mats[:, i - 1], j_tpose[:, i])
        p = consts.parent[i]
        # world = parent_world @ local
        Rs[i] = jnp.einsum("bij,bjk->bik", Rs[p], Ri, precision=_HI)
        ts[i] = jnp.einsum("bij,bj->bi", Rs[p], ti, precision=_HI) + ts[p]
        joints_wo_tips.append(
            jnp.einsum("bij,bj->bi", Rs[p], j_tpose[:, i], precision=_HI) + ts[p])

    R_j = jnp.stack(Rs, axis=1)                     # (B, 16, 3, 3)
    t_j = jnp.stack(ts, axis=1)                     # (B, 16, 3)

    # LBS: blend SE(3)s with skinning weights, then transform vertices.
    # (778, 16) x (B, 16, 12) -> (B, 778, 12)
    se3_flat = jnp.concatenate(
        [R_j.reshape(B, 16, 9), t_j.reshape(B, 16, 3)], axis=-1)
    blended = jnp.einsum("vj,bjk->bvk", consts.weights, se3_flat, precision=_HI)
    R_v = blended[..., :9].reshape(B, 778, 3, 3)
    t_v = blended[..., 9:]
    v_out = jnp.einsum("bvij,bvj->bvi", R_v, v_tpose, precision=_HI) + t_v  # (B, 778, 3)

    tips = [v_out[:, tv] for tv in consts.tip_verts]
    j_out = jnp.stack(joints_wo_tips + tips, axis=1)          # (B, 21, 3)
    j_out = j_out[:, list(consts.new_order)]

    if center_idx is not None:
        center = j_out[:, center_idx:center_idx + 1]
        v_out = v_out - center
        j_out = j_out - center
    if scale is not None:
        s = scale[:, None, None]
        v_out = v_out * s
        j_out = j_out * s
    if trans is not None:
        t = trans[:, None, :]
        v_out = v_out + t
        j_out = j_out + t
    return v_out, j_out


def vertex_normals(verts: jax.Array, faces: np.ndarray) -> jax.Array:
    """Area-weighted vertex normals.  verts (B, V, 3), faces (F, 3) int.

    Equivalent to ManoRender.Compute_norm's one-ring accumulation
    (Mano_render.py:265-284) but uses a scatter-add over faces instead of a
    fixed 8-neighbor table (numerically equal up to f32 summation order).
    """
    v0 = verts[:, faces[:, 0]]
    v1 = verts[:, faces[:, 1]]
    v2 = verts[:, faces[:, 2]]
    fn = jnp.cross(v0 - v1, v1 - v2)                     # (B, F, 3)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[:, faces[:, k]].add(fn)
    return vn / (jnp.linalg.norm(vn, axis=-1, keepdims=True) + 1e-8)
