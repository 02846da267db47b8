"""Shared building blocks: SFT conditioning, L2Norm, conv blocks, decoders.

References:
- SFTLayer:               intaghand_encoder.py:205-219
- L2Norm:                 intaghand_encoder.py:318-334
- conv1x1 (conv-act-bn):  intaghand_encoder.py:192-198
- ResNetSimple_decoder:   intaghand_encoder.py:270-316
"""

from __future__ import annotations

from typing import Any, List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdfnet_tpu.ops.resize import resize_bilinear_align_corners

Dtype = Any


class SFTLayer(nn.Module):
    """Spatial feature transform: fea * (scale(cond) + 1) + shift(cond).

    Operates on (B, N, C) token layout (the reference's 1x1 convs over a
    singleton spatial dim are plain per-token Dense layers).
    """

    cond_dim: int
    fea_dim: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, fea: jax.Array, cond: jax.Array) -> jax.Array:
        d = lambda f, name: nn.Dense(f, dtype=self.dtype, name=name)
        scale = d(self.fea_dim, "scale1")(
            nn.leaky_relu(d(self.cond_dim, "scale0")(cond), 0.1))
        shift = d(self.fea_dim, "shift1")(
            nn.leaky_relu(d(self.cond_dim, "shift0")(cond), 0.1))
        return fea * (scale + 1.0) + shift


class L2Norm(nn.Module):
    """Per-pixel channel L2 normalization with a learned per-channel gain.

    ``groups=G`` normalizes each of G contiguous channel chunks
    independently with the same (C/G)-sized gain.  Used to commute the
    norm BEFORE a depth-to-space: each output pixel's channel vector IS
    one chunk of the pre-d2s tensor, so grouped-norm-then-d2s is exactly
    d2s-then-norm (same values, same reduction order) while the heavy
    reduce runs on the clean matmul-output layout instead of the 5-D
    d2s-bitcast layout XLA otherwise fuses it into.
    """

    scale_init: float = 10.0
    groups: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        C = x.shape[-1] // self.groups
        gamma = self.param("weight", nn.initializers.constant(self.scale_init),
                           (C,))
        # The reduction runs in f32 for stability, but the elementwise
        # normalize/gain stays in the input dtype: the f32 gamma would
        # otherwise promote the whole output to f32, and at batch 96 the
        # four promoted 96x96x96x256 pyramid levels cost ~5.5 ms/step of
        # f32 HBM traffic just to be cast straight back to bf16 at the
        # feat-conv input (values are bf16-quantized there either way).
        f32 = jnp.float32
        g = gamma.astype(x.dtype)
        if self.groups == 1:
            xf = x.astype(f32)
            norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + 1e-10
            return x / norm.astype(x.dtype) * g
        xg = x.reshape(*x.shape[:-1], self.groups, C)
        xf = xg.astype(f32)
        norm = jnp.sqrt(jnp.sum(xf * xf, axis=-1, keepdims=True)) + 1e-10
        return (xg / norm.astype(x.dtype) * g).reshape(x.shape)


def depth_to_space(y: jax.Array, f: int, features: int) -> jax.Array:
    """(B, H, W, f*f*C) -> (B, H*f, W*f, C), channel chunk (a*f+b) landing
    at output pixel (h*f+a, w*f+b)."""
    B, H, W, _ = y.shape
    y = y.reshape(B, H, W, f, f, features)
    return (y.transpose(0, 1, 3, 2, 4, 5)
            .reshape(B, H * f, W * f, features))


class StridedUpConv(nn.Module):
    """ConvTranspose with kernel == stride, computed as one big matmul +
    depth-to-space.

    Exactly equivalent to ``nn.ConvTranspose(features, (f, f), strides=(f, f),
    padding="VALID")`` — same parameter names/shapes (checkpoints are
    interchangeable) and bit-identical math (flax flips the kernel spatially;
    we bake the flip into the einsum).  The motivation is MXU shape: XLA
    lowers a small-spatial conv-transpose (e.g. 12x12 input, k=s=8) to a
    ~17 TFLOP/s kernel, while the equivalent (B*H*W, Cin) x (Cin, f*f*Cout)
    matmul runs at ~190 TFLOP/s on v5e — a ~10x speedup on the FPN p5 path.

    ``pre_d2s=True`` returns the (B, H, W, f*f*features) tensor BEFORE the
    depth-to-space (bias already added per chunk) so a grouped L2Norm can
    run on the clean matmul layout; finish with :func:`depth_to_space`.
    """

    features: int
    factor: int
    pre_d2s: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        f = self.factor
        B, H, W, cin = x.shape
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (f, f, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        k = kernel[::-1, ::-1].astype(self.dtype)        # flax CT kernel flip
        # (f,f,cin,out) -> (cin, f*f*out); dot; then depth-to-space
        k = k.transpose(2, 0, 1, 3).reshape(cin, f * f * self.features)
        y = x.reshape(B * H * W, cin).astype(self.dtype) @ k
        if self.pre_d2s:
            y = y.reshape(B, H, W, f * f * self.features)
            return y + jnp.tile(bias.astype(y.dtype), f * f)
        y = y.reshape(B, H, W, f, f, self.features)
        y = y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * f, W * f,
                                                  self.features)
        return y + bias.astype(y.dtype)


class ConvActBN(nn.Module):
    """conv -> activation -> batchnorm (reference's conv1x1 block order)."""

    features: int
    kernel: int = 1
    stride: int = 1
    bn_frozen: bool = False           # frozen-BN fine-tuning: running stats
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        train = train and not self.bn_frozen
        k = self.kernel
        y = nn.Conv(self.features, (k, k), strides=(self.stride,) * 2,
                    padding=[(k // 2, k // 2)] * 2, use_bias=False,
                    dtype=self.dtype, name="conv")(x)
        y = nn.relu(y)
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, dtype=jnp.float32, name="bn")(y)


class PyramidDecoder(nn.Module):
    """Upsampling decoder from the 12x12 trunk feature.

    Four stages (flat, up, up, up) each conv->relu->bn, collecting the
    intermediate feature maps; final 1x1 head, optionally with an extra
    2x-up / head / 2x-up to reach full input resolution (the mask path).
    """

    fdim: int = 128
    out_dim: int = 42
    up_scale: bool = False
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jax.Array, List[jax.Array]]:
        train = train and not self.bn_frozen
        fmaps = []
        directions = ("flat", "up", "up", "up")
        for i, d in enumerate(directions):
            if d == "up":
                B, H, W, C = x.shape
                x = resize_bilinear_align_corners(x, H * 2, W * 2)
            k = 1 if d == "flat" else 3
            x = nn.Conv(self.fdim, (k, k), padding=[(k // 2, k // 2)] * 2,
                        use_bias=False, dtype=self.dtype, name=f"stage{i}")(x)
            x = nn.relu(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name=f"bn{i}")(x)
            fmaps.append(x)
        if self.up_scale:
            # Reference order is resize -> 1x1 conv -> resize; the per-pixel
            # 1x1 conv commutes exactly with the spatial resizes, so apply
            # the channel reduction first (128ch -> out_dim) and run both
            # chained 2x resizes on the small tensor: ~64x less resize
            # bandwidth, identical output.
            B, H, W, C = x.shape
            y = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="head")(x)
            y = resize_bilinear_align_corners(y, H * 2, W * 2)
            y = resize_bilinear_align_corners(y, H * 4, W * 4)
        else:
            y = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="head")(x)
        return y, fmaps


class CenterHead(nn.Module):
    """Per-task head over the fused FPN feature: 3x3 conv + relu + 1x1 conv.

    ``bias_init_value`` seeds the final bias (-4.59 for heatmap heads).

    ``patch=True`` applies the same weights to pre-gathered 3x3 input
    patches with VALID padding — mathematically identical to evaluating the
    SAME-padded full-map head at the patch centers (away from borders), at a
    tiny fraction of the FLOPs.  Parameter shapes/names are unchanged, so a
    checkpoint works in both modes.
    """

    out_dim: int
    mid_dim: int = 256
    bias_init_value: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, patch: bool = False):
        pad = "VALID" if patch else [(1, 1), (1, 1)]
        y = nn.Conv(self.mid_dim, (3, 3), padding=pad,
                    use_bias=True, dtype=self.dtype, name="conv0")(x)
        y = nn.relu(y)
        y = nn.Conv(self.out_dim, (1, 1), use_bias=True, dtype=self.dtype,
                    bias_init=nn.initializers.constant(self.bias_init_value),
                    name="conv1")(y)
        return y


class MLPResBlock(nn.Module):
    """LayerNorm -> fc -> relu -> fc residual block (self_attn.py:18-34)."""

    hid_dim: int
    dropout: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        in_dim = x.shape[-1]
        y = nn.LayerNorm(epsilon=1e-6, name="ln")(x)
        y = nn.relu(nn.Dense(self.hid_dim, dtype=self.dtype, name="fc1")(y))
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        y = nn.Dense(in_dim, dtype=self.dtype, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return x + y
