"""Image encoder: ResNet-50 FPN + CenterNet heads + hms/mask decoders +
center-feature conditioning + PointNet++ fusion.

Reference: ResNetSimple (intaghand_encoder.py:567-819) and resnet_mid
(:822-882).  Channel-last / NHWC throughout.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdfnet_tpu.models.layers import (CenterHead, ConvActBN, L2Norm,
                                      PyramidDecoder, SFTLayer, StridedUpConv,
                                      depth_to_space)
from pdfnet_tpu.models.pointnet import PointNetPlus
from pdfnet_tpu.models.resnet import ResNet
from pdfnet_tpu.ops.gather import gather_patches
from pdfnet_tpu.ops.heatmap import clamped_sigmoid, decode_centers
from pdfnet_tpu.ops.resize import resize_bilinear_align_corners

Dtype = Any


class FPNEncoder(nn.Module):
    """Trunk + FPN + heads.  See class docstring for the tensor flow."""

    heads: Dict[str, int]             # e.g. {"hm": 2, "wh": 2, "params": 122}
    fmap_dim: int = 128               # hms/mask decoder width
    global_feature_dim: int = 256     # fused FPN width
    heatmap_dim: int = 21
    hand_num: int = 2
    resolution: int = 384
    knn_k: int = 64
    num_level1: int = 512
    num_level2: int = 128
    ball_radius: float = 0.015
    ball_radius2: float = 0.04
    input_feature_num: int = 3
    knn_method: str = "topk"
    gather_method: str = "take"
    patch_heads: bool = False         # non-hm heads only at the 2 centers
    bn_frozen: bool = False           # frozen-BN fine-tuning: running stats
    fused_trunk: bool = False         # Pallas fused resnet blocks at eval
    s2d_stem: bool = False            # stem conv via space-to-depth (exact)
    # reference quirk: the encoder's test-time decode NMSes the RAW hm
    # logits (intaghand_encoder.py:750-758), so suppressed pixels (exactly 0
    # after heat*keep) outrank any peak whose logit is negative (p < 0.5) —
    # weak-confidence frames decode to pixel 0.  Default decodes the
    # sigmoided map instead (always returns the true peak); enable for
    # strict parity replays.
    raw_center_decode: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        img: Optional[jax.Array],           # (B, H, W, 3) normalized
        cloud: Optional[jax.Array],         # (B, 2, N, F)
        choose: Optional[jax.Array],        # (B, 2, N) flat pixel idx
        ind: Optional[jax.Array],           # (B, 2) center idx or None (test)
        train: bool,
        mode: str = "full",                 # full | image | point
        cached: Optional[Dict[str, Any]] = None,
    ):
        """``mode`` splits the encoder for the self-contained RGB-D path:
        'image' runs trunk+FPN+heads+decoders and returns the intermediates,
        'point' resumes from them with a (mid-graph constructed) cloud.  All
        submodules carry explicit names, so conditional execution leaves the
        parameter tree identical to 'full' (which init uses)."""
        if mode == "point":
            x0, pw_emb = cached["x0"], cached["pw_emb"]
            B = x0.shape[0]
            return self._point_phase(x0, pw_emb, cloud, choose, ind, train)

        gd = self.global_feature_dim
        B = img.shape[0]
        bn_train = train and not self.bn_frozen
        norm = lambda name: nn.BatchNorm(use_running_average=not bn_train,
                                         momentum=0.9, epsilon=1e-5,
                                         dtype=jnp.float32, name=name)

        # Point-wise embedding level 0: full-res 3-ch conv.
        pw_l0 = nn.relu(nn.Conv(3, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                                dtype=self.dtype, name="e_conv1")(img))

        stem, x4, x3, x2, x1 = ResNet(bn_frozen=self.bn_frozen,
                                      fused_eval=self.fused_trunk,
                                      s2d_stem=self.s2d_stem,
                                      dtype=self.dtype,
                                      name="resnet")(img, train)
        pw_l1 = stem                       # (B, H/2, W/2, 64)

        # FPN: project each stage to gd channels at H/4 (96 for 384 input).
        h4 = x4.shape[1]
        p2 = nn.Conv(gd, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                     name="p2")(x4)
        p3 = nn.ConvTranspose(gd, (4, 4), strides=(2, 2), padding="SAME",
                              dtype=self.dtype, name="p3")(x3)
        # p4/p5 have kernel == stride: StridedUpConv computes the identical
        # conv-transpose as a matmul + depth-to-space (~10x faster on MXU
        # for the 12x12-input p5; same params, checkpoint-compatible).
        # (Tried and reverted, round 3: commuting the L2Norms BEFORE the
        # depth-to-space — exact, grouped — measures ~20 fps SLOWER e2e:
        # XLA's matmul+d2s+norm fusion beats the clean-layout norm + a
        # separate d2s copy.  L2Norm(groups=...) remains available.)
        p4 = StridedUpConv(gd, 4, dtype=self.dtype, name="p4")(x2)
        p5 = StridedUpConv(gd, 8, dtype=self.dtype, name="p5")(x1)
        p2 = L2Norm(name="p2_l2")(p2)
        p3 = L2Norm(name="p3_l2")(p3)
        p4 = L2Norm(name="p4_l2")(p4)
        p5 = L2Norm(name="p5_l2")(p5)

        cat = jnp.concatenate([p2, p3, p4, p5], axis=-1)
        feat = nn.Conv(gd, (3, 3), padding=[(1, 1)] * 2, use_bias=False,
                       dtype=self.dtype, name="feat")(cat)
        x0 = nn.relu(norm("feat_bn")(feat))                  # (B, 96, 96, 256)
        pw_l2 = x0
        pw_emb = [pw_l0, pw_l1, pw_l2]

        # CenterNet heads over x0.  The hm head always needs the full map
        # (focal loss + test-time center decode); every other head is only
        # ever read at the 2 hand centers (reference CtdetLoss / simplified.py
        # gather via _transpose_and_gather_feat), so with ``patch_heads`` they
        # run on 3x3 gathered patches instead of the 96² map — identical
        # values at the centers (same weights, zero-ring padding), ~1/4600
        # the head FLOPs (e.g. the 2334-ch texture head drops ~55 GFLOP/img).
        ret = {}
        is_hm = lambda h: ("hm" in h or "heatmap" in h or "handmap" in h)
        for head, out_dim in sorted(self.heads.items()):
            if self.patch_heads and not is_hm(head):
                continue
            bias = -4.59 if is_hm(head) else 0.0
            ret[head] = CenterHead(out_dim, bias_init_value=bias,
                                   dtype=self.dtype, name=f"head_{head}")(x0)

        # Test-time center decode from the predicted heatmap.
        if ind is None:
            hm_pred = jax.lax.stop_gradient(ret["hm"])
            if not self.raw_center_decode:
                hm_pred = clamped_sigmoid(hm_pred)
            ind = decode_centers(hm_pred)

        if self.patch_heads:
            p3 = gather_patches(x0, ind, 3).reshape(B * 2, 3, 3, gd)
            for head, out_dim in sorted(self.heads.items()):
                if is_hm(head):
                    continue
                y = CenterHead(out_dim, bias_init_value=0.0, dtype=self.dtype,
                               name=f"head_{head}")(p3, patch=True)
                ret[head] = y.reshape(B, 2, out_dim)     # values at centers

        # Keypoint-heatmap and mask decoders from the 12x12 trunk feature.
        hms, hms_fmaps = PyramidDecoder(
            self.fmap_dim, self.heatmap_dim * self.hand_num, up_scale=False,
            bn_frozen=self.bn_frozen, dtype=self.dtype,
            name="hms_decoder")(x1, train)
        mask_out, dp_fmaps = PyramidDecoder(
            self.fmap_dim, self.hand_num, up_scale=True,
            bn_frozen=self.bn_frozen, dtype=self.dtype,
            name="dp_decoder")(x1, train)
        mask = mask_out                                      # (B, 384, 384, 2)

        if mode == "image":
            cached = dict(x0=x0, pw_emb=pw_emb, x2=x2, x3=x3, x4=x4,
                          hms_fmaps=hms_fmaps, dp_fmaps=dp_fmaps)
            return hms, mask, ret, ind, cached

        fuse = self._point_phase(x0, pw_emb, cloud, choose, ind, train)
        img_fmaps = [fuse, x2, x3, x4]
        return hms, mask, ret, ind, img_fmaps, hms_fmaps, dp_fmaps, pw_emb

    def _point_phase(self, x0, pw_emb, cloud, choose, ind, train):
        """Center-feature conditioning + PointNet++ fusion (called inside the
        compact __call__ scope; all submodules explicitly named)."""
        gd = self.global_feature_dim
        B = x0.shape[0]
        # Center features: x0 -> 512 -> 1024 at the two hand centers.
        # The reference computes both 3x3 convs over the full 96² map and
        # gathers 2 pixels (~54 GFLOP/img); convolving only the 5x5 input
        # patches around each center is mathematically identical (same
        # weights, VALID padding on the zero-padded map) at ~1/1800 the cost.
        # gather_patches slices the unpadded map (no 113 MB padded copy).
        p = gather_patches(x0, ind, 5).reshape(B * 2, 5, 5, gd)
        up0 = nn.Conv(512, (3, 3), padding="VALID", use_bias=False,
                      dtype=self.dtype, name="center_up0")(p)
        # Border exactness: the reference runs BOTH convs over the full
        # zero-padded map, so the second conv's out-of-map inputs are its own
        # padding zeros — NOT values computed from the zero-extended input
        # patch.  Zero the 3x3 intermediate wherever its absolute map
        # coordinate falls outside the map (only differs for centers within
        # 1 px of the border, e.g. the raw-logit decode's pixel-0 quirk).
        H0, W0 = x0.shape[1], x0.shape[2]
        yc = (ind // W0).reshape(B * 2).astype(jnp.int32)
        xc = (ind % W0).reshape(B * 2).astype(jnp.int32)
        off = jnp.arange(-1, 2, dtype=jnp.int32)
        rows_ok = ((yc[:, None] + off) >= 0) & ((yc[:, None] + off) < H0)
        cols_ok = ((xc[:, None] + off) >= 0) & ((xc[:, None] + off) < W0)
        inmap = (rows_ok[:, :, None] & cols_ok[:, None, :])[..., None]
        up0 = up0 * inmap.astype(up0.dtype)
        up1 = nn.Conv(1024, (3, 3), padding="VALID", use_bias=False,
                      dtype=self.dtype, name="center_up1")(up0)
        center_feat = up1.reshape(B, 2, 1024)                # (B, 2, 1024)

        # PointNet++ with pyramid SFT fusion; both hands in one batched call.
        pointnet = PointNetPlus(
            knn_k=self.knn_k, num_level1=self.num_level1,
            num_level2=self.num_level2, ball_radius=self.ball_radius,
            ball_radius2=self.ball_radius2,
            input_feature_num=self.input_feature_num,
            resolution=self.resolution, knn_method=self.knn_method,
            gather_method=self.gather_method, bn_frozen=self.bn_frozen,
            dtype=self.dtype, name="pointnet")
        fuse = pointnet(cloud, pw_emb, choose, train)            # (B, 2, 1024)

        # SFT-condition the per-hand global point features on center features.
        return SFTLayer(1024, 1024, self.dtype, name="sft")(fuse, center_feat)


class MidFusion(nn.Module):
    """Fuse hms/mask decoder pyramids (+ trunk stages) into decoder fmaps and
    split the fused point feature into per-hand global features."""

    out_dims: Tuple[int, ...] = (256, 256, 256, 256)
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, img_fmaps: List[jax.Array], hms_fmaps: List[jax.Array],
                 dp_fmaps: List[jax.Array], train: bool):
        gf_left = img_fmaps[0][:, 0, :]                      # (B, 1024)
        gf_right = img_fmaps[0][:, 1, :]
        fmaps = []
        for i, out_dim in enumerate(self.out_dims):
            x = jnp.concatenate([hms_fmaps[i], dp_fmaps[i]], axis=-1)
            if i > 0:
                x = jnp.concatenate([x, img_fmaps[i]], axis=-1)
            fmaps.append(ConvActBN(out_dim, kernel=1,
                                   bn_frozen=self.bn_frozen,
                                   dtype=self.dtype,
                                   name=f"conv{i}")(x, train))
        return gf_left, gf_right, fmaps
