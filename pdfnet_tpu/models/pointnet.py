"""PointNet++ set-abstraction stack with pyramid SFT image fusion.

Reference: PointNet_Plus (intaghand_encoder.py:32-159).  Three abstraction
levels over 1024 points/hand; at each level the point features are
SFT-conditioned on RGB features gathered at the points' pixel locations in
the matching pyramid level (the "pyramid deep fusion").

Channel-last throughout; the per-point MLPs are Dense layers fused by XLA,
the K/S reductions are max-pools on the VPU, and the grouping op is the
fused kNN+ball-query kernel from ``pdfnet_tpu.ops``.
"""

from __future__ import annotations

from typing import Any, List, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdfnet_tpu.models.layers import SFTLayer
from pdfnet_tpu.ops.gather import gather_pixels_2d
from pdfnet_tpu.ops import grouping
from pdfnet_tpu.ops.grouping import group_points, group_points_level2

Dtype = Any

LEVEL1_MLP = (64, 64, 128)
LEVEL2_MLP = (128, 128, 256)
LEVEL3_MLP = (512, 512, 1024)

_BN_EPS = 1e-5


class PointMLP(nn.Module):
    """Per-point MLP: (Dense -> BatchNorm -> relu) x len(features)."""

    features: Sequence[int]
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        train = train and not self.bn_frozen
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"fc{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=_BN_EPS, dtype=jnp.float32,
                             name=f"bn{i}")(x)
            x = nn.relu(x)
        return x


def _fold_point_mlp(mlp: PointMLP):
    """BN-folded (W, b) pairs of a PointMLP in running-average mode.

    BatchNorm at eval is the per-channel affine (x - mean) * g/sigma + beta,
    so each Dense+BN collapses to Dense(W * g/sigma, (b - mean) * g/sigma
    + beta) exactly (up to f32 rounding of the fold itself)."""
    v = mlp.variables
    p, s = v["params"], v["batch_stats"]
    folded = []
    for i in range(len(mlp.features)):
        w = p[f"fc{i}"]["kernel"].astype(jnp.float32)
        b = p[f"fc{i}"]["bias"].astype(jnp.float32)
        inv = (p[f"bn{i}"]["scale"] *
               jax.lax.rsqrt(s[f"bn{i}"]["var"] + _BN_EPS)).astype(jnp.float32)
        folded.append((w * inv[None, :],
                       (b - s[f"bn{i}"]["mean"]) * inv + p[f"bn{i}"]["bias"]))
    return folded


class PointNetPlus(nn.Module):
    """Two-hand set abstraction: points (B, 2, N, F_in), pyramid emb,
    choose (B, 2, N) -> (B, 2, 1024).

    Both hands fold into the batch axis so every matmul/pool runs once at
    2x batch (better MXU utilization than two sequential per-hand calls).
    """

    knn_k: int = 64
    num_level1: int = 512
    num_level2: int = 128
    ball_radius: float = 0.015
    ball_radius2: float = 0.04
    input_feature_num: int = 3
    resolution: int = 384
    knn_method: str = "topk"
    gather_method: str = "take"
    bn_frozen: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, points: jax.Array, emb: List[jax.Array],
                 choose: jax.Array, train: bool) -> jax.Array:
        res = self.resolution
        B, H, N = choose.shape
        fold = lambda t: t.reshape(B * H, *t.shape[2:])

        # Level 0 fusion: condition raw xyz on full-res RGB features.
        # gather_pixels_2d indexes the NHWC maps by (row, col) directly —
        # the flat-index variant forces a relayout copy of each full map
        # (measured 4.6 ms/step at batch 96 for the l1/l2 maps).
        pw_l0 = gather_pixels_2d(emb[0], choose.reshape(B, H * N))
        pw_l0 = fold(pw_l0.reshape(B, H, N, -1))                    # (BH, N, 3)
        pts = SFTLayer(emb[0].shape[-1], self.input_feature_num, self.dtype,
                       name="sft0")(fold(points), pw_l0)

        # Pyramid pixel indices at 1/2 and 1/4 resolution (integer row/col
        # halving of the flat index; intaghand_encoder.py:125-128).
        c_half = (choose // res // 2) * (res // 2) + choose % res // 2
        c_quart = (choose // res // 4) * (res // 4) + choose % res // 4
        pw_l1 = gather_pixels_2d(
            emb[1], c_half[:, :, :self.num_level1].reshape(B, -1))
        pw_l1 = fold(pw_l1.reshape(B, H, self.num_level1, -1))      # (BH,512,64)
        pw_l2 = gather_pixels_2d(
            emb[2], c_quart[:, :, :self.num_level2].reshape(B, -1))
        pw_l2 = fold(pw_l2.reshape(B, H, self.num_level2, -1))      # (BH,128,256)

        mlp1 = PointMLP(LEVEL1_MLP, self.bn_frozen, self.dtype, name="mlp1")
        mlp2 = PointMLP(LEVEL2_MLP, self.bn_frozen, self.dtype, name="mlp2")

        from pdfnet_tpu.ops.pallas_knn import TILE_S
        # Fully-fused eval path: selection + gather + BN-folded MLP +
        # max-pool in one Pallas program per level (no (S, K, C) blobs or
        # MLP intermediates in HBM).  Training keeps the generic path (live
        # BatchNorm statistics + custom-VJP grouping).
        use_sa = (not train and self.knn_method == "pallas_sa"
                  and pts.shape[-1] == 3
                  and self.num_level1 % TILE_S == 0
                  and self.num_level2 % TILE_S == 0
                  and (jax.default_backend() == "tpu"
                       or grouping._FUSED_INTERPRET))
        if use_sa:
            from pdfnet_tpu.ops.pallas_knn import (sa_level1_pallas,
                                                   sa_level2_pallas)
            # materialize the (identical) parameter trees without running
            # the per-neighbor MLPs; XLA drops the dummy results
            _ = mlp1(jnp.zeros((1, 1, pts.shape[-1]), jnp.float32), False)
            interp = grouping._FUSED_INTERPRET
            x = sa_level1_pallas(
                pts.astype(jnp.float32), _fold_point_mlp(mlp1),
                k=self.knn_k, num_centers=self.num_level1,
                radius2=self.ball_radius, interpret=interp)   # (BH,512,128)
            centers = pts[:, :self.num_level1, :3]
        else:
            grouped, centers = group_points(
                pts, k=self.knn_k, num_centers=self.num_level1,
                radius2=self.ball_radius, knn_method=self.knn_method,
                gather_method=self.gather_method)
            x = mlp1(grouped, train)
            x = jnp.max(x, axis=2)                              # (BH,512,128)
        x = jnp.concatenate([centers, x], axis=-1)              # (BH,512,131)
        x = SFTLayer(emb[1].shape[-1], x.shape[-1], self.dtype,
                     name="sft1")(x, pw_l1)

        if use_sa:
            _ = mlp2(jnp.zeros((1, 1, x.shape[-1]), jnp.float32), False)
            x2 = sa_level2_pallas(
                x.astype(jnp.float32), _fold_point_mlp(mlp2),
                k=self.knn_k, num_centers=self.num_level2,
                radius2=self.ball_radius2, interpret=interp)   # (BH,128,256)
            centers2 = x[:, :self.num_level2, :3]
            x = x2
        else:
            grouped2, centers2 = group_points_level2(
                x, num_centers=self.num_level2, k=self.knn_k,
                radius2=self.ball_radius2, knn_method=self.knn_method,
                gather_method=self.gather_method)
            x = mlp2(grouped2, train)
            x = jnp.max(x, axis=2)                              # (BH,128,256)
        x = jnp.concatenate([centers2, x], axis=-1)             # (BH,128,259)
        x = SFTLayer(emb[2].shape[-1], x.shape[-1], self.dtype,
                     name="sft2")(x, pw_l2)

        x = PointMLP(LEVEL3_MLP, self.bn_frozen, self.dtype,
                     name="mlp3")(x, train)
        x = jnp.max(x, axis=1)                                      # (BH, 1024)
        return x.reshape(B, H, -1)
