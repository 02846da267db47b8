"""ResNet backbone (flax linen, NHWC).

Functional equivalent of the torchvision ResNet-50 trunk the reference
encoder taps (intaghand_encoder.py:712-729): returns the post-stem feature
(before maxpool) plus the four stage outputs.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class Bottleneck(nn.Module):
    width: int
    stride: int = 1
    project: bool = False
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        train = train and not self.bn_frozen
        # BN in the compute dtype: flax computes the statistics in f32
        # internally, and a f32 BN output would force the whole residual
        # stream (adds/relu between bf16 convs) to f32 -- 2x the HBM
        # traffic on the biggest maps.  Exactly equal when compute=f32.
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name)

        out_ch = self.width * 4
        shortcut = x
        if self.project:
            shortcut = conv(out_ch, 1, self.stride, "proj_conv")(x)
            shortcut = norm("proj_bn")(shortcut)
        y = nn.relu(norm("bn1")(conv(self.width, 1, 1, "conv1")(x)))
        y = nn.relu(norm("bn2")(conv(self.width, 3, self.stride, "conv2")(y)))
        y = norm("bn3")(conv(out_ch, 1, 1, "conv3")(y))
        return nn.relu(y + shortcut)


class BasicBlock(nn.Module):
    """Two-3x3-conv residual block (ResNet-18/34)."""

    width: int
    stride: int = 1
    project: bool = False
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        train = train and not self.bn_frozen
        # BN in the compute dtype: flax computes the statistics in f32
        # internally, and a f32 BN output would force the whole residual
        # stream (adds/relu between bf16 convs) to f32 -- 2x the HBM
        # traffic on the biggest maps.  Exactly equal when compute=f32.
        norm = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, name=name)
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), padding=[(k // 2, k // 2)] * 2,
            use_bias=False, dtype=self.dtype, name=name)

        shortcut = x
        if self.project:
            shortcut = conv(self.width, 1, self.stride, "proj_conv")(x)
            shortcut = norm("proj_bn")(shortcut)
        y = nn.relu(norm("bn1")(conv(self.width, 3, self.stride, "conv1")(x)))
        y = norm("bn2")(conv(self.width, 3, 1, "conv2")(y))
        return nn.relu(y + shortcut)


def _s2d_stem_conv(img: jax.Array, k7: jax.Array, dtype) -> jax.Array:
    """The 7x7/stride-2 stem conv as a 4x4/stride-1 conv over a 2x2
    space-to-depth input — exact (same sums, PyTorch/flax cross-correlation
    semantics), same (7,7,3,64) parameter.

    Cin=3 convs run the MXU at <10% (K=3 contractions); packing the 2x2
    pixel phases into 12 channels quadruples the contraction depth at
    identical FLOPs.  Derivation: pad K7 to K8 with a zero row/col at
    index 0, split output-tap dy'=2u+a — out(i,j) taps s2d rows i+u-2,
    u in [0,4), phases a — i.e. a 4x4 conv with padding (2,1).
    """
    B, H, W, C = img.shape
    k8 = jnp.pad(k7, ((1, 0), (1, 0), (0, 0), (0, 0)))      # (8,8,3,64)
    k12 = (k8.reshape(4, 2, 4, 2, 3, -1).transpose(0, 2, 1, 3, 4, 5)
           .reshape(4, 4, 12, -1))
    s = (img.reshape(B, H // 2, 2, W // 2, 2, C)
         .transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C))
    return jax.lax.conv_general_dilated(
        s.astype(dtype), k12.astype(dtype), (1, 1), [(2, 1), (2, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


class ResNet(nn.Module):
    """ResNet-v1; bottleneck (50/101/152) or basic (18/34) blocks.

    ``skip_stem=True`` treats the input as an already-stem-shaped feature
    (64ch at /2) and runs only maxpool + the four stages — used by the CSP
    uv-prior branch, which replaces the 7x7 stem with its own fusion
    (resnet_csp.py:456-462).

    ``fused_eval=True`` runs the first three bottleneck stages through the
    Pallas fused-block kernel at inference (ops/pallas_trunk.py): BN folded
    into the convs, one HBM read + one write per residual block instead of
    ~5 conv/elementwise passes.  Training, init, basic blocks, and non-TPU
    backends keep the flax path; the parameter tree is identical either
    way (the fused path reads the same variables).
    """

    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    block: str = "bottleneck"         # bottleneck | basic
    skip_stem: bool = False
    bn_frozen: bool = False           # frozen-BN fine-tuning: running stats
    fused_eval: bool = False          # Pallas fused blocks at inference
    s2d_stem: bool = False            # stem conv via space-to-depth (exact)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool) -> Tuple[jax.Array, ...]:
        from pdfnet_tpu.ops import pallas_trunk

        bn_train = train and not self.bn_frozen
        if self.skip_stem:
            stem = x
        else:
            if self.s2d_stem and not self.is_initializing():
                k7 = self.variables["params"]["conv1"]["kernel"]
                stem = _s2d_stem_conv(x, k7, self.dtype)
            else:
                stem = nn.Conv(64, (7, 7), strides=(2, 2),
                               padding=[(3, 3), (3, 3)], use_bias=False,
                               dtype=self.dtype, name="conv1")(x)
            stem = nn.BatchNorm(use_running_average=not bn_train,
                                momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                name="bn1")(stem)
            stem = nn.relu(stem)                          # (B, H/2, W/2, 64)

        y = nn.max_pool(stem, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        outs = []
        widths = (64, 128, 256, 512)
        basic = self.block == "basic"
        interp = pallas_trunk._TRUNK_INTERPRET
        fuse_trunk = (self.fused_eval and not train and not basic
                      and not self.is_initializing()
                      and (jax.default_backend() == "tpu" or interp))
        for i, (n_blocks, w) in enumerate(zip(self.stage_sizes, widths)):
            for b in range(n_blocks):
                stride = 2 if (b == 0 and i > 0) else 1
                project = (b == 0) if not basic else (b == 0 and i > 0)
                # Fuse only where the Pallas block beats XLA on-chip
                # (profiled, round 3): stride-1 bottlenecks at width>=128
                # run ~2x faster fused (one HBM read+write, full-K MXU
                # dots); layer1's 64-wide dots and the stride-2 blocks'
                # subsample relayouts lose to XLA — keep those on flax.
                if (fuse_trunk and stride == 1 and w >= 128
                        and i < 3):
                    v = self.variables
                    name = f"layer{i + 1}_{b}"
                    folded = pallas_trunk.fold_bottleneck(
                        v["params"][name], v["batch_stats"][name])
                    y = pallas_trunk.fused_bottleneck(
                        y, folded, stride=1, project=project,
                        interpret=interp)
                else:
                    cls = BasicBlock if basic else Bottleneck
                    y = cls(width=w, stride=stride, project=project,
                            bn_frozen=self.bn_frozen, dtype=self.dtype,
                            name=f"layer{i + 1}_{b}")(y, train)
            outs.append(y)
        # stem (pre-maxpool), layer1..layer4
        return (stem, *outs)


def resnet18(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(2, 2, 2, 2), block="basic", dtype=dtype)


def resnet50(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), dtype=dtype)


def resnet101(dtype=jnp.float32) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), dtype=dtype)
