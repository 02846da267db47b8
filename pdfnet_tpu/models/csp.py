"""CSP alternate detector: the ``create_model('csp_50')`` path.

TPU-native rebuild of the reference's legacy RGBD CenterNet regressor
(lib/models/networks/resnet_csp.py:229-557 ``PoseResNet``/``get_pose_net``,
EncodeUV ``:181-227``), the alternate architecture reachable via
``--arch csp_50`` that regresses 122-d MANO parameters directly from center
features (consumed by the ``origforward`` loss — here
``train/mano_branch.py``).

Structure:
- 4-channel RGB-D input stem (``:241-243``) — or, with ``use_heatmaps``,
  a ResNet-18 ``EncodeUV`` multi-scale encoder + UV-heatmap prior decoder
  whose 21 joint channels (+15 relation-sum channels, ``:259``) are fused
  with the stem feature and reduced back to 64 channels (``:281-284``);
- ResNet trunk (50 or 18), FPN p3/p4/p5 transposed-convs to 256ch at /4
  with L2Norm (``:294-317``), concat -> 3x3 ``feat`` conv + BN + ReLU;
- per-task heads (3x3 conv + ReLU + 1x1, hm bias -4.59, ``:326-348``); the
  ``params`` head refines iteratively from a zero initial theta, feeding
  the running estimate back as extra input channels (``:509-521``).

TPU notes: p4/p5 use the matmul-form StridedUpConv (identical math, MXU
shapes); the iterative params-head loop is unrolled (3 static iterations).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdfnet_tpu.models.layers import CenterHead, L2Norm, StridedUpConv
from pdfnet_tpu.models.resnet import ResNet
from pdfnet_tpu.ops.heatmap import clamped_sigmoid

Dtype = Any

# Joint-group relations whose uv-prior channels are summed into extra
# conditioning channels (resnet_csp.py:259).
RELATIONS = [[4, 8], [4, 12], [4, 16], [4, 20], [8, 12], [8, 16], [8, 20],
             [12, 16], [12, 20], [16, 20], [1, 2, 3, 4], [5, 6, 7, 8],
             [9, 10, 11, 12], [13, 14, 15, 16], [17, 18, 19, 20]]


class ConvBNBlock(nn.Module):
    """conv -> [bn] -> [relu] (reference networks.py:56-81 ConvBlock)."""

    features: int
    kernel: int = 3
    use_relu: bool = True
    use_bn: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        k = self.kernel
        y = nn.Conv(self.features, (k, k), padding=[(k // 2, k // 2)] * 2,
                    dtype=self.dtype, name="conv")(x)
        if self.use_bn:
            y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=jnp.float32, name="bn")(y)
        if self.use_relu:
            y = nn.relu(y)
        return y


class UVDecoder(nn.Module):
    """CMR-style uv-heatmap prior decoder (resnet_csp.py:264-270, 382-391):
    four 2x-bilinear-upsample + skip-concat + conv stages from the deepest
    feature, then a 3x3 head with sigmoid over 21 joint channels."""

    latent: Tuple[int, ...]           # channel sizes of z[1:]: e.g. resnet18
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: List[jax.Array], train: bool) -> jax.Array:
        # z = [x4, x3, x2, x1] (deep -> shallow)
        x = z[0]
        widths = (self.latent[1], self.latent[2], self.latent[3],
                  self.latent[3])
        for i in range(4):
            B, H, W, C = x.shape
            x = jax.image.resize(x, (B, H * 2, W * 2, C), "bilinear")
            if i < 3:
                x = jnp.concatenate([x, z[i + 1]], axis=-1)
            x = ConvBNBlock(widths[i], dtype=self.dtype,
                            name=f"delayer{i}")(x, train)
        uv = nn.Conv(21, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                     name="uv_head")(x)
        return clamped_sigmoid(uv)


class CSPNet(nn.Module):
    """The alternate RGBD CenterNet + iterative MANO-theta regressor."""

    heads: Dict[str, int]             # e.g. {"hm": 2, "wh": 2, "params": 122}
    arch: str = "csp_50"              # csp_50 | csp_18
    use_depth: bool = True
    use_heatmaps: bool = False        # EncodeUV uv-prior branch
    iterations: int = 3               # params-head refinement steps
    global_feature_dim: int = 256
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img: jax.Array, depth: Optional[jax.Array],
                 train: bool) -> Dict[str, Any]:
        gd = self.global_feature_dim
        x = img
        if self.use_depth and depth is not None:
            if depth.ndim == 3:
                depth = depth[..., None]
            x = jnp.concatenate([x, depth], axis=-1)

        basic = "50" not in self.arch
        stage_sizes = (2, 2, 2, 2) if basic else (3, 4, 6, 3)
        block = "basic" if basic else "bottleneck"

        ret: Dict[str, Any] = {}
        if self.use_heatmaps:
            # ResNet-18 EncodeUV multi-scale features (resnet_csp.py:181-199)
            z0, z1, z2, z3, z4 = ResNet(stage_sizes=(2, 2, 2, 2),
                                        block="basic", dtype=self.dtype,
                                        name="backbone")(x, train)
            uv_prior = UVDecoder(latent=(512, 256, 128, 64),
                                 dtype=self.dtype, name="uv_decoder")(
                [z4, z3, z2, z1], train)
            ret["uv_prior"] = uv_prior
            rel = jnp.stack([uv_prior[..., r].sum(-1) for r in RELATIONS],
                            axis=-1)
            x0 = jnp.concatenate([z0, uv_prior, rel], axis=-1)  # 64+21+15
            y = ConvBNBlock(x0.shape[-1], dtype=self.dtype,
                            name="reduce0")(x0, train)
            y = ConvBNBlock(128, dtype=self.dtype, name="reduce1")(y, train)
            y = ConvBNBlock(64, kernel=1, use_relu=False, dtype=self.dtype,
                            name="reduce2")(y, train)
            # trunk stages only (the 7x7 stem is replaced by the uv branch,
            # resnet_csp.py:456-462); ResNet(skip_stem) does maxpool+stages
            _, x1, x2, x3, x4 = ResNet(
                stage_sizes=stage_sizes, block=block, skip_stem=True,
                dtype=self.dtype, name="trunk")(y, train)
        else:
            _, x1, x2, x3, x4 = ResNet(
                stage_sizes=stage_sizes, block=block,
                dtype=self.dtype, name="trunk")(x, train)

        # FPN to /4 (96x96 for 384 input; p3 k4s2 doubles the /8 stage),
        # L2Norm, concat, feat conv.
        p3 = nn.ConvTranspose(gd, (4, 4), strides=(2, 2), padding="SAME",
                              dtype=self.dtype, name="p3")(x2)
        p4 = StridedUpConv(gd, 4, dtype=self.dtype, name="p4")(x3)
        p5 = StridedUpConv(gd, 8, dtype=self.dtype, name="p5")(x4)
        p3 = L2Norm(name="p3_l2")(p3)
        p4 = L2Norm(name="p4_l2")(p4)
        p5 = L2Norm(name="p5_l2")(p5)
        cat = jnp.concatenate([p3, p4, p5], axis=-1)
        feat = nn.Conv(gd, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                       dtype=self.dtype, name="feat")(cat)
        feat = nn.BatchNorm(use_running_average=not train, momentum=0.99,
                            epsilon=1e-5, dtype=jnp.float32,
                            name="feat_bn")(feat)
        feat = nn.relu(feat)                        # (B, 48, 48, 256)

        is_hm = lambda h: ("hm" in h or "heatmap" in h or "handmap" in h)
        for head, out_dim in sorted(self.heads.items()):
            if head == "params":
                # iterative refinement from a zero initial theta
                # (resnet_csp.py:509-521 mean_theta buffer is never written)
                B, H, W, _ = feat.shape
                theta = jnp.zeros((B, H, W, out_dim), feat.dtype)
                mod = CenterHead(out_dim, dtype=self.dtype,
                                 name="head_params")
                thetas = []
                for _ in range(self.iterations):
                    theta = theta + mod(
                        jnp.concatenate([feat, theta], axis=-1))
                    thetas.append(theta)
                ret[head] = thetas
                continue
            bias = -4.59 if is_hm(head) else 0.0
            ret[head] = CenterHead(out_dim, bias_init_value=bias,
                                   dtype=self.dtype,
                                   name=f"head_{head}")(feat)
        return ret


def build_csp_model(cfg) -> CSPNet:
    """Factory mirroring get_pose_net (resnet_csp.py:567-572)."""
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[
        cfg.compute_dtype]
    return CSPNet(heads=dict(cfg.heads), arch=cfg.arch,
                  use_depth=True, use_heatmaps=cfg.use_uv_prior,
                  iterations=3 if cfg.iterations else 1,
                  dtype=dtype)
