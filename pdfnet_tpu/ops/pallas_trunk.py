"""Fused eval-time ResNet bottleneck blocks (Pallas TPU).

At inference the ResNet-50 trunk is HBM-streaming bound: TPU XLA lowers
each conv as its own HBM pass and the BatchNorm / relu / residual-add
elementwise work as separate fusion passes (convolutions get no output
epilogue fusion), so every feature map crosses HBM ~5 times per block.
This module runs one whole bottleneck block

    relu(BN3(conv1x1(relu(BN2(conv3x3(relu(BN1(conv1x1(x)))))))) + sc(x))

as a single Pallas program: BatchNorm (running statistics — eval mode) is
folded into the conv weights, the map is read from HBM once and written
once, and every intermediate lives in VMEM.  The 3x3 conv is expressed as
nine shifted (T*W, Cw) x (Cw, Cw) MXU matmuls over a column-padded VMEM
tile; row halos arrive via two extra 1-row BlockSpecs of the same input
with clamped index maps (zero-masked at the map edges).

Behavioral spec: torchvision Bottleneck as used by the reference encoder
(/root/reference/lib/models/networks/resnet.py:40-80,125-230 and
intaghand_encoder.py:712-729).  The fusion/layout strategy is TPU-native
and has no reference counterpart.  Training keeps the flax path (live
BatchNorm statistics + XLA autodiff); this kernel is forward/eval only.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# test hook: run the fused kernels in interpreter mode off-TPU
_TRUNK_INTERPRET = False

_BN_EPS = 1e-5
_VMEM_BUDGET = 11 * 1024 * 1024     # conservative: leave room for Mosaic


def fold_conv_bn(params: Dict, stats: Dict, conv: str, bn: str,
                 eps: float = _BN_EPS) -> Tuple[jax.Array, jax.Array]:
    """Fold eval-mode BatchNorm into the preceding (bias-free) conv.

    BN at eval is the per-channel affine (y - mean) * g/sqrt(var+eps) + b,
    so conv+BN collapses to conv(W * inv) + (b - mean * inv) exactly (up
    to f32 rounding of the fold itself).
    """
    w = params[conv]["kernel"].astype(jnp.float32)       # (kh, kw, Cin, Cout)
    inv = (params[bn]["scale"].astype(jnp.float32) *
           jax.lax.rsqrt(stats[bn]["var"].astype(jnp.float32) + eps))
    b = (params[bn]["bias"].astype(jnp.float32) -
         stats[bn]["mean"].astype(jnp.float32) * inv)
    return w * inv, b


def fold_bottleneck(params: Dict, stats: Dict) -> Dict[str, jax.Array]:
    """BN-folded weights of one flax Bottleneck (models/resnet.py)."""
    w1, b1 = fold_conv_bn(params, stats, "conv1", "bn1")
    w2, b2 = fold_conv_bn(params, stats, "conv2", "bn2")
    w3, b3 = fold_conv_bn(params, stats, "conv3", "bn3")
    out = {"w1": w1[0, 0], "b1": b1, "w2": w2, "b2": b2,
           "w3": w3[0, 0], "b3": b3}
    if "proj_conv" in params:
        wp, bp = fold_conv_bn(params, stats, "proj_conv", "proj_bn")
        out["wp"] = wp[0, 0]
        out["bp"] = bp
    return out


def _conv2_flat(y1: jax.Array, w2, b2, n_out_rows: int, W: int,
                r, R, top_edge: bool, bot_edge: bool,
                im2col_ref=None) -> jax.Array:
    """3x3 conv over a flat (rows*W, Cw) y1 tile as nine MXU matmuls on
    CONTIGUOUS row-range slices.

    In row-major flat layout, tap (dy, dx) of output pixel base = i*W + j
    lives at flat position base + dy*W + (dx - 1): a fixed offset, so each
    tap is one contiguous slice + one matmul — no strided slicing, no 3-D
    reshapes, no relayouts inside the tap loop (measured ~3x faster than a
    pad + 9x slice/reshape formulation, whose per-tap relayouts dominate).

    Column wrap-around (j=0 at dx=0 reads the previous row's last pixel;
    j=W-1 at dx=2 reads the next row's first) is fixed by two masked
    column-variants of y1, built once: vL zeroes col W-1 (feeds all dx=0
    taps), vR zeroes col 0 (all dx=2 taps).  Row padding at the map edges
    (top_edge/bot_edge tiles) is a flat row-range mask in y1-space.
    """
    N2, Cw = y1.shape
    N = n_out_rows * W
    cdt = y1.dtype
    fr = jax.lax.broadcasted_iota(jnp.int32, (N2, 1), 0)
    # zero the clamped halo rows in y1-space at the map edges (the 3x3's
    # padding is conv2-INPUT zeros — after conv1+BN+relu, so relu(b1) != 0)
    keep = ((fr >= W) | (r != 0)) if top_edge else (fr >= 0)
    if bot_edge:
        keep = keep & ((fr < N2 - W) | (r != R - 1))
    col = fr % W
    y1 = y1 * keep.astype(cdt)
    zrow = jnp.zeros((1, Cw), cdt)
    vl = jnp.concatenate([zrow, y1 * (col != W - 1).astype(cdt)], axis=0)
    vr = jnp.concatenate([y1 * (col != 0).astype(cdt), zrow], axis=0)
    def tap(dy, dx):
        o = dy * W
        if dx == 0:
            return vl[o:o + N]
        if dx == 1:
            return y1[o:o + N]
        return vr[o + 1:o + 1 + N]

    if im2col_ref is not None:
        # narrow widths (layer1): nine (N, 64) x (64, 64) dots run the MXU
        # at ~25% (K and N both half-width) and pay nine fixed dot
        # overheads.  Staging the taps into a VMEM im2col scratch turns
        # them into ONE full-K dot (Mosaic rejects a direct lane-concat of
        # offset-mismatched slices; ref stores normalize the layout).
        # w2 arrives pre-flattened (9*Cw, Cw) in (dy, dx) major order.
        for dy in range(3):
            for dx in range(3):
                t = dy * 3 + dx
                im2col_ref[:, t * Cw:(t + 1) * Cw] = tap(dy, dx)
        acc = jnp.dot(im2col_ref[:], w2[:],
                      preferred_element_type=jnp.float32) + b2[:]
    else:
        acc = jnp.broadcast_to(b2[:], (N, Cw))
        for dy in range(3):
            for dx in range(3):
                acc = acc + jnp.dot(tap(dy, dx), w2[dy, dx],
                                    preferred_element_type=jnp.float32)
    return acc


def _y1_pieces(pieces, w1, b1, cdt):
    """conv1 (1x1) + relu per input piece, concatenated in y1-space (Cw <=
    Cin in a bottleneck, so concatenating outputs moves less VMEM than
    concatenating inputs).  The dot emits the compute dtype directly (f32
    MXU accumulation internally — same as an XLA bf16 conv), so no f32
    copy of y1 is ever materialized."""
    outs = []
    for p in pieces:
        h = p.reshape(-1, p.shape[-1])
        y = jnp.dot(h, w1[:], preferred_element_type=jnp.float32)
        outs.append(jnp.maximum(y + b1[:], 0.0).astype(cdt))
    return jnp.concatenate(outs, axis=0) if len(outs) > 1 else outs[0]


def _block_kernel_s1(T: int, W: int, project: bool, im2col: bool, *refs):
    """Stride-1 bottleneck tile: out rows [rT, rT+T) need in rows
    [rT-1, rT+T] — main tile plus one clamped halo row on each side."""
    im2col_ref = refs[-1] if im2col else None
    if im2col:
        refs = refs[:-1]
    if project:
        (x_ref, top_ref, bot_ref, w1, b1, w2, b2, w3, b3, wp, bp,
         out_ref) = refs
    else:
        x_ref, top_ref, bot_ref, w1, b1, w2, b2, w3, b3, out_ref = refs
    r = pl.program_id(1)
    R = pl.num_programs(1)
    x_main = x_ref[0]                                      # (T, W, Cin)
    cdt = x_main.dtype
    Cin = x_main.shape[-1]
    Cw = w1.shape[1]
    Cout = w3.shape[1]

    y1 = _y1_pieces([top_ref[0], x_main, bot_ref[0]], w1, b1, cdt)
    acc = _conv2_flat(y1, w2, b2, T, W, r, R, True, True, im2col_ref)
    y2 = jnp.maximum(acc, 0.0).astype(cdt)

    # conv3 (1x1) + residual + relu (f32 dot accumulators — Mosaic
    # requires 32-bit matmul acc — cast to the bf16 residual stream).
    y3 = (jnp.dot(y2, w3[:], preferred_element_type=jnp.float32)
          + b3[:]).astype(cdt)
    if project:
        sc = (jnp.dot(x_main.reshape(T * W, Cin), wp[:],
                      preferred_element_type=jnp.float32) + bp[:]).astype(cdt)
    else:
        sc = x_main.reshape(T * W, Cout)
    out_ref[0] = jnp.maximum(y3 + sc, 0.0).reshape(T, W, Cout)


def _subsample2(t: jax.Array, T: int, W: int) -> jax.Array:
    """(2T, W, C) -> (T*W//2, C): keep even rows and even columns.

    Mosaic has no stride-2 vector slices, so both subsamples are
    rank-split reshapes followed by stride-1 slices: even rows slice whole
    (W, C) chunks (minor-two-dim tiling untouched); even columns pay one
    relayout through a (2, C)-minor intermediate — once per tile, not per
    tap.
    """
    C = t.shape[-1]
    rows = t.reshape(T, 2, W, C)[:, 0]              # (T, W, C) even rows
    cols = rows.reshape(T, W // 2, 2, C)[:, :, 0]   # (T, Wo, C) even cols
    return cols.reshape(T * (W // 2), C)


def _block_kernel_s2(T: int, W: int, *refs):
    """Stride-2 bottleneck tile (always projected in ResNet-50).

    Out rows [rT, rT+T) need in rows [2rT-1, 2rT+2T-1]: the 2T-row main
    tile plus one clamped halo row above (no bottom halo — kernel 3 <
    stride skip).  The strided 3x3 runs at FULL resolution with the same
    contiguous taps as the stride-1 kernel and the output is subsampled
    once: 4x the (cheap, MXU) conv2 FLOPs in exchange for zero strided
    slicing inside the tap loop — measured ~10x faster than a
    parity-reshape formulation whose 5-D tiny-minor-dim slices Mosaic
    lowers to relayout storms.
    """
    x_ref, top_ref, w1, b1, w2, b2, w3, b3, wp, bp, out_ref = refs
    r = pl.program_id(1)
    R = pl.num_programs(1)
    x_main = x_ref[0]                                      # (2T, W, Cin)
    cdt = x_main.dtype
    Cin = x_main.shape[-1]
    Cw = w1.shape[1]
    Cout = w3.shape[1]
    Wo = W // 2

    # full-resolution 3x3 (out rows 0..2T-1) on flat contiguous taps; the
    # odd outputs are discarded by the subsample.  One zero row-of-W below
    # (full-res out row 2T-1 at dy=2 taps past the window; garbage-but-in-
    # bounds would also do, zeros keep it simple).
    y1 = _y1_pieces([top_ref[0], x_main], w1, b1, cdt)     # ((2T+1)*W, Cw)
    y1 = jnp.concatenate([y1, jnp.zeros((W, Cw), cdt)], axis=0)
    acc = _conv2_flat(y1, w2, b2, 2 * T, W, r, R, True, False)
    y2 = jnp.maximum(acc, 0.0).astype(cdt).reshape(2 * T, W, Cw)
    y2 = _subsample2(y2, T, W)                             # (T*Wo, Cw)

    y3 = (jnp.dot(y2, w3[:], preferred_element_type=jnp.float32)
          + b3[:]).astype(cdt)
    # projection shortcut: x at even global rows/cols == x_main[2i, 2j]
    xs = _subsample2(x_main, T, W)                         # (T*Wo, Cin)
    sc = (jnp.dot(xs, wp[:], preferred_element_type=jnp.float32)
          + bp[:]).astype(cdt)
    out_ref[0] = jnp.maximum(y3 + sc, 0.0).reshape(T, Wo, Cout)


def _pick_tile(H_out: int, W: int, Cin: int, Cw: int, Cout: int,
               stride: int, itemsize: int) -> int:
    """Largest row tile whose VMEM footprint (double-buffered in/out blocks
    + weights + f32 temps) stays under budget."""
    w_bytes = (Cin * Cw + 9 * Cw * Cw + Cw * Cout +
               (Cin * Cout if (stride == 2 or Cin != Cout) else 0)) * itemsize
    for T in [t for t in (96, 48, 32, 24, 16, 12, 8, 6, 4, 3)
              if H_out % t == 0 and t <= H_out]:
        Wo = W // stride
        n = (T * stride + 2) * W
        No = T * stride * W                         # conv2 rows (full at s2)
        est = (2 * n * Cin * itemsize               # x main+halos, 2 buffers
               + 2 * T * Wo * Cout * itemsize       # out, 2 buffers
               + 3 * n * Cw * itemsize              # y1 + vl + vr variants
               + (9 * No * Cw * itemsize if Cw <= 64 else 0)   # im2col
               + No * Cw * 4                        # 3x3 f32 accumulator
               + 2 * T * Wo * Cout * itemsize       # y3 + shortcut
               + 2 * w_bytes)
        if est <= _VMEM_BUDGET:
            return T
    # Nothing fit the budget: tile of 1 always divides H_out.  A
    # non-divisor fallback would make the grid R = H_out // T skip the
    # last H_out % T output rows — silent corruption, never acceptable.
    return 1


@functools.partial(jax.jit,
                   static_argnames=("stride", "project", "interpret"))
def fused_bottleneck(x: jax.Array, weights: Dict[str, jax.Array], *,
                     stride: int = 1, project: bool = False,
                     interpret: bool = False) -> jax.Array:
    """One bottleneck block as a single Pallas program.

    Args:
      x: (B, H, W, Cin) feature map (bf16 on TPU; any float in interpret).
      weights: BN-folded weights from :func:`fold_bottleneck` (f32).
      stride: 1 or 2 (stride sits on the 3x3, torchvision-style).
      project: use a 1x1-conv projection shortcut (always True at stride 2).
    """
    assert stride in (1, 2)
    B, H, W, Cin = x.shape
    cdt = x.dtype
    Cw = weights["w1"].shape[1]
    Cout = weights["w3"].shape[1]
    H_out, W_out = H // stride, W // stride
    T = _pick_tile(H_out, W, Cin, Cw, Cout, stride, jnp.dtype(cdt).itemsize)
    T_in = T * stride
    R = H_out // T

    # narrow-width (layer1) blocks get a VMEM im2col stage: one full-K dot
    # instead of nine quarter-utilization (N,64)x(64,64) dots; w2 is then
    # passed pre-flattened to (9*Cw, Cw) in (dy, dx) major order.
    use_im2col = stride == 1 and Cw <= 64
    wf = lambda k: weights[k].astype(cdt)
    b2d = lambda k: weights[k].astype(jnp.float32).reshape(1, -1)
    w2_arg = wf("w2").reshape(9 * Cw, Cw) if use_im2col else wf("w2")
    if project or stride == 2:
        w_args = (wf("w1"), b2d("b1"), w2_arg, b2d("b2"), wf("w3"),
                  b2d("b3"), wf("wp"), b2d("bp"))
    else:
        w_args = (wf("w1"), b2d("b1"), w2_arg, b2d("b2"), wf("w3"),
                  b2d("b3"))
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in w_args]

    main_spec = pl.BlockSpec((1, T_in, W, Cin), lambda b, r: (b, r, 0, 0),
                             memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec(
        (1, 1, W, Cin),
        lambda b, r: (b, jnp.maximum(r * T_in - 1, 0), 0, 0),
        memory_space=pltpu.VMEM)
    if stride == 1:
        bot_spec = pl.BlockSpec(
            (1, 1, W, Cin),
            lambda b, r: (b, jnp.minimum(r * T_in + T_in, H - 1), 0, 0),
            memory_space=pltpu.VMEM)
        kernel = functools.partial(_block_kernel_s1, T, W, project,
                                   use_im2col)
        in_specs = [main_spec, top_spec, bot_spec] + w_specs
        args = (x, x, x) + w_args
    else:
        kernel = functools.partial(_block_kernel_s2, T, W)
        in_specs = [main_spec, top_spec] + w_specs
        args = (x, x) + w_args
    scratch = ([pltpu.VMEM((T * W, 9 * Cw), cdt)] if use_im2col else [])

    flops = 2 * B * H_out * W_out * (Cin * Cw + 9 * Cw * Cw + Cw * Cout +
                                     (Cin * Cout if project else 0))
    bytesrw = (B * H * W * Cin + B * H_out * W_out * Cout) * x.dtype.itemsize
    return pl.pallas_call(
        kernel,
        grid=(B, R),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, W_out, Cout),
                               lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H_out, W_out, Cout), cdt),
        scratch_shapes=scratch,
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=bytesrw,
                                      transcendentals=0),
        interpret=interpret,
    )(*args)


# NOTE: an all-stages driver (fused_bottleneck_stages) was removed: the
# measured integration policy keeps layer1 and all stride-2 blocks on the
# flax path (slower fused — see resnet.py and PARITY.md), so a helper that
# fuses whole stages contradicted the shipped configuration and had no
# callers.  models/resnet.py owns the per-block fused/flax routing.
