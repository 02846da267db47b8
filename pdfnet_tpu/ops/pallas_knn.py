"""Pallas TPU kernel: fused pairwise-distance + k-nearest selection.

The set-abstraction grouping needs, per sampling center, the k=64 nearest of
N=1024 candidate points.  XLA's ``lax.top_k`` sorts each 1024-row — far more
work than needed for k<<N.  This kernel keeps a center-tile's distance row
resident in VMEM and runs k iterative masked argmin passes on the VPU
(k*N element ops per row, no sort, no HBM round-trips).

Two variants share one selection loop:
- ``knn_pallas``: distances + indices (generic, any downstream gather).
- ``knn_gather_xyz_pallas``: additionally emits the selected neighbors'
  center-relative xyz straight from the distance components in VMEM — the
  complete level-1 grouping with zero extra HBM traffic.

Layout: coordinates arrive transposed (3, N) / (3, S) so the lane dimension
is the point axis (128-aligned); outputs are written transposed (k, TILE_S)
because Mosaic forbids single-lane dynamic writes, and untransposed on the
way out.

Exactness: identical selection set to ``lax.top_k(-d², k)`` (ascending
distance, first-index tie-break), so the ball-query semantics downstream are
unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_S = 128


def _select_loop(d, k, n_points, emit):
    """k iterative masked-argmin passes over d (TILE_S, N).

    ``emit(j, arg, min_dist, sel_mask)`` stores iteration j's outputs.
    (A fused ``jnp.argmin`` reduce was tried here: it exceeds Mosaic's 16MB
    scoped-VMEM stack at k=64/N=1024, so the explicit min/compare/index-min
    sequence stays.)
    """
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    dcur = d
    for j in range(k):
        m = jnp.min(dcur, axis=1)                              # (TILE_S,)
        # first index attaining the minimum (top_k tie-break)
        is_min = dcur == m[:, None]
        arg = jnp.min(jnp.where(is_min, col, n_points), axis=1)
        sel = col == arg[:, None]
        emit(j, arg, m, sel)
        dcur = jnp.where(sel, jnp.inf, dcur)                   # mask selected


def _coords(points_ref, centers_ref):
    px = points_ref[0, 0, :]                   # (N,)
    py = points_ref[0, 1, :]
    pz = points_ref[0, 2, :]
    cx = centers_ref[0, 0, :]                  # (TILE_S,)
    cy = centers_ref[0, 1, :]
    cz = centers_ref[0, 2, :]
    dx = px[None, :] - cx[:, None]             # centered x: p - c
    dy = py[None, :] - cy[:, None]
    dz = pz[None, :] - cz[:, None]
    return dx, dy, dz


def _knn_kernel(points_ref, centers_ref, idx_ref, dist_ref, *, k: int,
                n_points: int):
    dx, dy, dz = _coords(points_ref, centers_ref)
    d = dx * dx + dy * dy + dz * dz

    def emit(j, arg, m, sel):
        idx_ref[0, j, :] = arg
        dist_ref[0, j, :] = m

    _select_loop(d, k, n_points, emit)


def _knn_gather_kernel(points_ref, centers_ref, pts_nx3_ref, idx_ref,
                       dist_ref, nx_ref, ny_ref, nz_ref, *, k: int,
                       n_points: int):
    dx, dy, dz = _coords(points_ref, centers_ref)
    d = dx * dx + dy * dy + dz * dz
    cx = centers_ref[0, 0, :]
    cy = centers_ref[0, 1, :]
    cz = centers_ref[0, 2, :]
    pts = pts_nx3_ref[0]                       # (N, 3) f32, shared by rows

    def emit(j, arg, m, sel):
        idx_ref[0, j, :] = arg
        dist_ref[0, j, :] = m
        # One MXU dot replaces three masked (TILE_S, N) sum-reductions:
        # sel is one-hot per row, so dot(sel, pts) = pts[arg] exactly, and
        # pts[arg] - c is bit-identical to the masked sum of (pts - c).
        g = jnp.dot(sel.astype(jnp.float32), pts,
                    preferred_element_type=jnp.float32)   # (TILE_S, 3)
        nx_ref[0, j, :] = g[:, 0] - cx
        ny_ref[0, j, :] = g[:, 1] - cy
        nz_ref[0, j, :] = g[:, 2] - cz

    _select_loop(d, k, n_points, emit)


def _knn_gather_feat_kernel(xyz_ref, cxyz_ref, feat_ref, centers_ref,
                            out_ref, idx_ref, dist_ref, *, k: int,
                            n_points: int, radius2: float):
    """Level-2 grouping in one kernel: exact f32 kNN selection over xyz,
    full-feature-row gather via an in-VMEM one-hot matmul (MXU), xyz
    center-subtraction, and ball-query substitution (out-of-ball neighbors
    become the center's own features with zeroed centered-xyz).

    Features may arrive in bf16 (the model's compute dtype) to halve the
    output VMEM footprint; distances always use the separate f32 xyz
    operands so the selection is exact.
    """
    px = xyz_ref[0, 0, :]                       # (N,) f32
    py = xyz_ref[0, 1, :]
    pz = xyz_ref[0, 2, :]
    cx = cxyz_ref[0, 0, :]                      # (TILE_S,) f32
    cy = cxyz_ref[0, 1, :]
    cz = cxyz_ref[0, 2, :]
    dx = px[None, :] - cx[:, None]
    dy = py[None, :] - cy[:, None]
    dz = pz[None, :] - cz[:, None]
    d = dx * dx + dy * dy + dz * dz

    feat = feat_ref[0]                          # (N, C) feat dtype
    ctr = centers_ref[0]                        # (TILE_S, C)
    lane = jax.lax.broadcasted_iota(jnp.int32, ctr.shape, 1)
    sub_xyz = (jnp.where(lane == 0, cx[:, None], 0.0) +
               jnp.where(lane == 1, cy[:, None], 0.0) +
               jnp.where(lane == 2, cz[:, None], 0.0)).astype(feat.dtype)
    ctr_zero_xyz = jnp.where(lane < 3, 0, ctr)

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    dcur = d
    for j in range(k):
        m = jnp.min(dcur, axis=1)
        is_min = dcur == m[:, None]
        arg = jnp.min(jnp.where(is_min, col, n_points), axis=1)
        sel = col == arg[:, None]
        # f32 accumulator (Mosaic requirement); exactly one nonzero term per
        # row, so the cast back to the feature dtype is exact.
        g = jnp.dot(sel.astype(feat.dtype), feat,
                    preferred_element_type=jnp.float32
                    ).astype(feat.dtype)                    # (TILE_S, C)
        valid = (m <= radius2)[:, None]
        out_ref[0, j, :, :] = jnp.where(valid, g - sub_xyz, ctr_zero_xyz)
        idx_ref[0, j, :] = arg
        dist_ref[0, j, :] = m
        dcur = jnp.where(sel, jnp.inf, dcur)


def _mlp_folded(h, weights, biases, compute_dtype):
    """(M, C_in) -> (M, C_out): (dot -> +bias -> relu) per layer.

    ``weights``/``biases`` are the BN-folded Dense parameters (BatchNorm in
    running-average mode is a per-channel affine, absorbed into the matmul).
    Matmuls run in ``compute_dtype`` (bf16 on TPU, mirroring the unfused
    PointMLP's Dense dtype); bias-add + relu stay f32 like the unfused BN.
    """
    for wr, br in zip(weights, biases):
        h = jnp.dot(h.astype(compute_dtype), wr[...].astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        h = jnp.maximum(h + br[0], 0.0)
    return h


def _knn_gather_block_kernel(points_ref, centers_ref, pts_nx3_ref, out_ref,
                             *, k: int, n_points: int, radius2: float):
    """Level-1 grouping emitted as one (k, TILE_S, 3) block: selection,
    centered-xyz gather, and ball-query zeroing (out-of-ball neighbors are
    the center itself, so their centered coordinates are exactly zero)."""
    dx, dy, dz = _coords(points_ref, centers_ref)
    d = dx * dx + dy * dy + dz * dz
    cx = centers_ref[0, 0, :]
    cy = centers_ref[0, 1, :]
    cz = centers_ref[0, 2, :]
    pts = pts_nx3_ref[0]                       # (N, 3) f32

    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    dcur = d
    for j in range(k):
        m = jnp.min(dcur, axis=1)
        is_min = dcur == m[:, None]
        arg = jnp.min(jnp.where(is_min, col, n_points), axis=1)
        sel = col == arg[:, None]
        g = jnp.dot(sel.astype(jnp.float32), pts,
                    preferred_element_type=jnp.float32)   # (TILE_S, 3)
        lane3 = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        sub = (jnp.where(lane3 == 0, cx[:, None], 0.0) +
               jnp.where(lane3 == 1, cy[:, None], 0.0) +
               jnp.where(lane3 == 2, cz[:, None], 0.0))
        out_ref[0, j] = jnp.where((m <= radius2)[:, None], g - sub, 0.0)
        dcur = jnp.where(sel, jnp.inf, dcur)


def _mlpmax_feat_kernel(g_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
                        out_ref, *, compute_dtype, mlp_chunk: int):
    """(k, TILE_S, C) gathered neighborhoods (ball-query substitution already
    applied by the gather kernel) -> (TILE_S, F) pooled features."""
    k, tile_s, C = g_ref.shape[1:]
    weights = (w1_ref, w2_ref, w3_ref)
    biases = (b1_ref, b2_ref, b3_ref)
    acc = None
    for c0 in range(0, k, mlp_chunk):
        Gc = g_ref[0, c0:c0 + mlp_chunk].reshape(mlp_chunk * tile_s, C)
        h = _mlp_folded(Gc, weights, biases, compute_dtype)
        m = jnp.max(h.reshape(mlp_chunk, tile_s, -1), axis=0)
        acc = m if acc is None else jnp.maximum(acc, m)
    out_ref[0] = acc


def _weight_specs(ws, bs):
    specs, ops = [], []
    for w, b in zip(ws, bs):
        specs.append(pl.BlockSpec(w.shape, lambda b_, s_: (0, 0),
                                  memory_space=pltpu.VMEM))
        specs.append(pl.BlockSpec((1, b.shape[0]), lambda b_, s_: (0, 0),
                                  memory_space=pltpu.VMEM))
        ops.extend([w, b[None, :]])
    # interleave (w, b) pairs in call order w1 b1 w2 b2 w3 b3
    return specs, ops


@functools.partial(jax.jit, static_argnames=("k", "num_centers", "radius2",
                                             "interpret"))
def sa_level1_pallas(points: jax.Array, folded, k: int, num_centers: int,
                     radius2: float, interpret: bool = False) -> jax.Array:
    """Fused level-1 set abstraction over raw (possibly SFT-conditioned) xyz.

    Args:
      points: (B, N, 3) f32; the first ``num_centers`` rows are the centers.
      folded: ((W1, b1), (W2, b2), (W3, b3)) BN-folded MLP parameters.

    Returns:
      (B, num_centers, F3) f32 max-pooled neighborhood features (the
      ``jnp.max(PointMLP(grouped), axis=2)`` of the unfused path).
    """
    B, N, _ = points.shape
    S = num_centers
    assert S % TILE_S == 0, f"num_centers={S} must be a multiple of {TILE_S}"
    ws = [w for w, _ in folded]
    bs = [b for _, b in folded]
    F = ws[-1].shape[-1]
    cdt = jnp.float32 if interpret else jnp.bfloat16
    centers = points[:, :S, :]
    # Stage 1: selection + centered-xyz gather + ball-query zeroing, in the
    # kernel's native (B, k, S, 3) layout (no transposes).
    grouped = pl.pallas_call(
        functools.partial(_knn_gather_block_kernel, k=k, n_points=N,
                          radius2=radius2),
        grid=(B, S // TILE_S),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_S), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, 3), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k, TILE_S, 3), lambda b, s: (b, 0, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, k, S, 3), jnp.float32),
        interpret=interpret,
    )(points.transpose(0, 2, 1), centers.transpose(0, 2, 1), points)
    wspecs, wops = _weight_specs(ws, bs)
    mlp_chunk = min(16, k)
    assert k % mlp_chunk == 0
    # Stage 2: folded MLP + max-pool; the (S, K, F) MLP intermediates never
    # touch HBM.
    return pl.pallas_call(
        functools.partial(_mlpmax_feat_kernel, compute_dtype=cdt,
                          mlp_chunk=mlp_chunk),
        grid=(B, S // TILE_S),
        in_specs=[pl.BlockSpec((1, k, TILE_S, 3), lambda b, s: (b, 0, s, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((1, TILE_S, F), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, F), jnp.float32),
        interpret=interpret,
    )(grouped, *wops)


@functools.partial(jax.jit, static_argnames=("k", "num_centers", "radius2",
                                             "interpret"))
def sa_level2_pallas(feat: jax.Array, folded, k: int, num_centers: int,
                     radius2: float, interpret: bool = False) -> jax.Array:
    """Fused level-2 set abstraction over abstracted points.

    Args:
      feat: (B, N, C) with xyz in the first 3 channels (f32 recommended).
      folded: BN-folded MLP parameters as in :func:`sa_level1_pallas`.

    Returns:
      (B, num_centers, F3) f32 pooled features.
    """
    B, N, C = feat.shape
    S = num_centers
    assert S % TILE_S == 0, f"num_centers={S} must be a multiple of {TILE_S}"
    ws = [w for w, _ in folded]
    bs = [b for _, b in folded]
    F = ws[-1].shape[-1]
    cdt = jnp.float32 if interpret else jnp.bfloat16
    fin = feat if interpret else feat.astype(jnp.bfloat16)
    # Stage 1: selection + full-row gather + ball-query substitution, kept
    # in the kernel's native (B, k, S, C) layout (no transpose copy).
    grouped, _, _ = _group_feat_raw(fin, k, S, radius2, interpret)
    wspecs, wops = _weight_specs(ws, bs)
    mlp_chunk = min(16, k)
    assert k % mlp_chunk == 0
    # Stage 2: folded MLP + max-pool over the k neighbors.
    return pl.pallas_call(
        functools.partial(_mlpmax_feat_kernel, compute_dtype=cdt,
                          mlp_chunk=mlp_chunk),
        grid=(B, S // TILE_S),
        in_specs=[pl.BlockSpec((1, k, TILE_S, C), lambda b, s: (b, 0, s, 0),
                               memory_space=pltpu.VMEM)] + wspecs,
        out_specs=pl.BlockSpec((1, TILE_S, F), lambda b, s: (b, s, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, S, F), jnp.float32),
        interpret=interpret,
    )(grouped, *wops)


@functools.partial(jax.jit, static_argnames=("k", "radius2", "num_centers",
                                             "interpret"))
def group_feat_pallas(feat: jax.Array, k: int, num_centers: int,
                      radius2: float, interpret: bool = False):
    """Fused level-2 grouping.  feat: (B, N, C) with xyz leading; gather and
    outputs run in feat's dtype (bf16 halves VMEM), selection in f32.

    Returns (grouped (B, S, K, C) ball-query-substituted center-relative
    neighborhoods, idx (B, S, K) raw knn indices, valid (B, S, K)).
    """
    grouped, idx, dist = _group_feat_raw(feat, k, num_centers, radius2,
                                         interpret)
    valid = dist <= radius2
    return (grouped.transpose(0, 2, 1, 3), idx.transpose(0, 2, 1),
            valid.transpose(0, 2, 1))


def _group_feat_raw(feat: jax.Array, k: int, num_centers: int,
                    radius2: float, interpret: bool = False):
    """Level-2 grouping kernel in its native layout: returns
    (grouped (B, k, S, C), idx (B, k, S), dist (B, k, S))."""
    B, N, C = feat.shape
    S = num_centers
    assert S % TILE_S == 0, f"num_centers={S} must be a multiple of {TILE_S}"
    xyz_t = feat[..., :3].astype(jnp.float32).transpose(0, 2, 1)  # (B, 3, N)
    out_spec2 = pl.BlockSpec((1, k, TILE_S), lambda b, s: (b, 0, s),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_knn_gather_feat_kernel, k=k, n_points=N,
                          radius2=radius2),
        grid=(B, S // TILE_S),
        in_specs=[
            pl.BlockSpec((1, 3, N), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, TILE_S), lambda b, s: (b, 0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, s: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_S, C), lambda b, s: (b, s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, k, TILE_S, C), lambda b, s: (b, 0, s, 0),
                         memory_space=pltpu.VMEM),
            out_spec2, out_spec2,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, k, S, C), feat.dtype),
            jax.ShapeDtypeStruct((B, k, S), jnp.int32),
            jax.ShapeDtypeStruct((B, k, S), jnp.float32),
        ],
        interpret=interpret,
    )(xyz_t, xyz_t[:, :, :S], feat, feat[:, :S])


def _call(kernel, n_outputs, centers, points, k, interpret,
          pass_pts_nx3: bool = False):
    B, S, _ = centers.shape
    N = points.shape[1]
    assert S % TILE_S == 0, f"S={S} must be a multiple of {TILE_S}"
    pts_t = points.transpose(0, 2, 1)          # (B, 3, N)
    ctr_t = centers.transpose(0, 2, 1)         # (B, 3, S)
    out_spec = pl.BlockSpec((1, k, TILE_S), lambda b, s: (b, 0, s),
                            memory_space=pltpu.VMEM)
    dtypes = [jnp.int32] + [jnp.float32] * (n_outputs - 1)
    in_specs = [
        pl.BlockSpec((1, 3, N), lambda b, s: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 3, TILE_S), lambda b, s: (b, 0, s),
                     memory_space=pltpu.VMEM),
    ]
    operands = [pts_t, ctr_t]
    if pass_pts_nx3:
        # untransposed points for the in-kernel one-hot MXU gather
        in_specs.append(pl.BlockSpec((1, N, 3), lambda b, s: (b, 0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(points)
    return pl.pallas_call(
        functools.partial(kernel, k=k, n_points=N),
        grid=(B, S // TILE_S),
        in_specs=in_specs,
        out_specs=[out_spec] * n_outputs,
        out_shape=[jax.ShapeDtypeStruct((B, k, S), dt) for dt in dtypes],
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_pallas(centers: jax.Array, points: jax.Array, k: int = 64,
               interpret: bool = False):
    """k nearest points per center.

    Args:
      centers: (B, S, 3) query centers (S a multiple of 128).
      points: (B, N, 3) candidate points.
      k: neighbor count.

    Returns:
      (dist (B, S, k) squared distances ascending, idx (B, S, k) int32).
    """
    idx, dist = _call(_knn_kernel, 2, centers, points, k, interpret)
    return dist.transpose(0, 2, 1), idx.transpose(0, 2, 1)


@functools.partial(jax.jit, static_argnames=("k", "interpret"))
def knn_gather_xyz_pallas(centers: jax.Array, points: jax.Array, k: int = 64,
                          interpret: bool = False):
    """Fused kNN + centered-neighborhood extraction.

    Returns (dist (B, S, k), idx (B, S, k) int32,
    neighbors_xyz (B, S, k, 3) center-relative) — the complete level-1
    grouping (before ball-query substitution) in one kernel.
    """
    idx, dist, nx, ny, nz = _call(_knn_gather_kernel, 5, centers, points, k,
                                  interpret, pass_pts_nx3=True)
    nbr = jnp.stack([nx, ny, nz], axis=-1)         # (B, k, S, 3)
    return (dist.transpose(0, 2, 1), idx.transpose(0, 2, 1),
            nbr.transpose(0, 2, 1, 3))
