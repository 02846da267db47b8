"""Top-level model: encoder -> mid fusion -> dual-hand GCN mesh decoder.

Reference: HandNET_GCN (intaghand_model.py:14-47) + load_model_intag (:49-67).

Inputs mirror the reference signature (img, choose, cloud, depth, ind, K,
valid); at test time (``ind=None`` + zero ``choose``) the hand centers are
decoded from the predicted center heatmap and the point clouds are rebuilt
from the predicted masks + depth, all inside jit.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pdfnet_tpu.config import Config
from pdfnet_tpu.models.encoder import FPNEncoder, MidFusion
from pdfnet_tpu.models.gcn_decoder import MeshDecoder
from pdfnet_tpu.ops.pointcloud import depth_to_hand_clouds
from pdfnet_tpu.ops.resize import resize_bilinear_align_corners

Dtype = Any


class HandNet(nn.Module):
    cfg: Config

    @nn.compact
    def __call__(
        self,
        img: jax.Array,                       # (B, H, W, 3) normalized RGB
        choose: Optional[jax.Array],          # (B, 2, N) or None (test)
        cloud: Optional[jax.Array],           # (B, 2, N, F) or None (test)
        depth: Optional[jax.Array],           # (B, H, W) metric
        ind: Optional[jax.Array],             # (B, 2) GT center idx or None
        K: jax.Array,                         # (B, 3, 3)
        valid: jax.Array,                     # (B, 2)
        train: bool = False,
    ):
        cfg = self.cfg
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32

        encoder = FPNEncoder(
            heads=cfg.heads, fmap_dim=cfg.fmap_dim,
            global_feature_dim=cfg.global_feature_dim,
            heatmap_dim=cfg.heatmap_dim, hand_num=cfg.hand_num,
            resolution=cfg.default_resolution, knn_k=cfg.knn_k,
            num_level1=cfg.sample_num_level1, num_level2=cfg.sample_num_level2,
            ball_radius=cfg.ball_radius, ball_radius2=cfg.ball_radius2,
            input_feature_num=cfg.input_feature_num,
            knn_method=cfg.knn_method, gather_method=cfg.gather_method,
            patch_heads=cfg.patch_heads, dtype=dtype, name="encoder")

        if choose is None or cloud is None:
            # Test-time: need the predicted mask first.  Run the encoder in
            # two phases is wasteful; instead precompute mask via a light
            # first pass?  The reference reuses the same forward: masks come
            # from the dp decoder before the pointnet stage.  We mirror that
            # by first computing with a zero cloud (pointnet contributes
            # nothing), extracting the mask, rebuilding the cloud, and
            # re-running.  Cleaner: callers that have depth but no cloud
            # should use `infer_rgbd` below, which does exactly this.
            raise ValueError(
                "choose/cloud are required; use HandNet.apply with "
                "method='infer_rgbd' for the self-contained RGB-D path")

        (hms, mask, ret, ind_used, img_fmaps, hms_fmaps, dp_fmaps,
         _pw) = encoder(img, cloud.astype(jnp.float32), choose, ind, train)

        mid = MidFusion(out_dims=tuple(cfg.deconv_dims), dtype=dtype,
                        name="mid")
        gf_left, gf_right, fmaps = mid(img_fmaps, hms_fmaps, dp_fmaps, train)

        decoder = MeshDecoder(
            global_feature_dim=1024,
            gcn_in_dim=tuple(cfg.gcn_in_dim), gcn_out_dim=tuple(cfg.gcn_out_dim),
            img_f_dims=tuple(cfg.deconv_dims[:3]),
            grid_f_dims=tuple(cfg.img_dims),
            img_sizes=(cfg.default_resolution // 32,
                       cfg.default_resolution // 16,
                       cfg.default_resolution // 8),
            graph_k=cfg.graph_k, num_blocks=cfg.graph_layer_num,
            n_heads=cfg.num_attn_heads, dropout=cfg.dropout,
            use_img_attn=cfg.use_img_attn, img_size_px=cfg.default_resolution,
            name="decoder")
        result, params, hand_dicts, other = decoder(
            gf_left.astype(jnp.float32), gf_right.astype(jnp.float32),
            [f.astype(jnp.float32) for f in fmaps], train)

        other["hms"] = hms.astype(jnp.float32)
        other["mask"] = mask.astype(jnp.float32)
        other["ret"] = {k: v.astype(jnp.float32) for k, v in ret.items()}
        other["ind"] = ind_used
        return result, params, hand_dicts, other


def build_model(cfg: Config) -> HandNet:
    if cfg.arch.startswith("csp"):
        raise ValueError(
            f"arch={cfg.arch!r} is the CSP alternate detector — use "
            "models.build_csp_model (the Trainer dispatches on arch "
            "automatically)")
    return HandNet(cfg=cfg)


def infer_rgbd(model: HandNet, variables, img, depth, K, valid, rng,
               num_points: int = 1024):
    """Self-contained RGB-D inference: centers + masks + point clouds are all
    derived from the network's own predictions (demo.py semantics).

    Two encoder passes, mirroring the reference's test path where depth2pcl
    consumes the predicted mask: pass 1 with a zero cloud yields mask + hm;
    pass 2 with the rebuilt cloud yields the final mesh.
    """
    cfg = model.cfg
    B = img.shape[0]
    zero_choose = jnp.zeros((B, 2, num_points), jnp.int32)
    zero_cloud = jnp.zeros((B, 2, num_points, cfg.input_feature_num))
    _, _, _, other = model.apply(
        variables, img, zero_choose, zero_cloud, depth, None, K, valid,
        train=False)
    # The mask head is trained with smooth-L1 against {0,1} targets with
    # channel order [right, left] (dataset convention); the cloud builder
    # wants [left, right] to match cloud[:, 0] == left.
    mask_lr = other["mask"][..., ::-1]
    choose, cloud, ok = depth_to_hand_clouds(
        depth, mask_lr, K, valid, rng, num_points,
        with_normals=cfg.input_feature_num == 6,
        fps_levels=((cfg.sample_num_level1, cfg.sample_num_level2)
                    if cfg.sample_strategy == "FPS" else None))
    return model.apply(variables, img, choose, cloud, depth, None, K, valid,
                       train=False)
