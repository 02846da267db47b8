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
            patch_heads=cfg.patch_heads, bn_frozen=cfg.freeze_bn_stats,
            fused_trunk=cfg.fused_trunk, s2d_stem=cfg.s2d_stem,
            raw_center_decode=cfg.replicate_reference_quirks,
            dtype=dtype, name="encoder")

        if choose is None or cloud is None:
            # Self-contained RGB-D path (the reference's in-forward depth2pcl
            # from the PREDICTED mask, intaghand_encoder.py:369-491,779-784):
            # one trunk pass; the point cloud is constructed mid-graph from
            # the predicted mask + depth, then only the point phase runs.
            hms, mask, ret, ind_used, cached = encoder(
                img, None, None, ind, train, mode="image")
            # mask channels are [right, left] (dataset convention); the
            # cloud builder wants [left, right] to match cloud[:, 0] == left
            mask_lr = jax.lax.stop_gradient(mask)[..., ::-1]
            rng = (self.make_rng("points") if self.has_rng("points")
                   else jax.random.PRNGKey(0))
            choose, cloud, _ok = depth_to_hand_clouds(
                depth, mask_lr, K, valid, rng, cfg.sample_num,
                with_normals=cfg.input_feature_num == 6,
                fps_levels=((cfg.sample_num_level1, cfg.sample_num_level2)
                            if cfg.sample_strategy == "FPS" else None),
                deterministic=cfg.sample_deterministic,
                recall_target=cfg.sample_recall_target)
            fuse = encoder(None, cloud.astype(jnp.float32), choose, ind_used,
                           train, mode="point", cached=cached)
            img_fmaps = [fuse, cached["x2"], cached["x3"], cached["x4"]]
            hms_fmaps, dp_fmaps = cached["hms_fmaps"], cached["dp_fmaps"]
        else:
            (hms, mask, ret, ind_used, img_fmaps, hms_fmaps, dp_fmaps,
             _pw) = encoder(img, cloud.astype(jnp.float32), choose, ind, train)

        mid = MidFusion(out_dims=tuple(cfg.deconv_dims),
                        bn_frozen=cfg.freeze_bn_stats, dtype=dtype,
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
            use_img_attn=cfg.use_img_attn,
            stack_hands=cfg.stacked_decoder,
            img_size_px=cfg.default_resolution,
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

    Single trunk pass: __call__ with choose=None builds the cloud mid-graph
    from the predicted mask (the reference's depth2pcl-inside-forward,
    intaghand_encoder.py:779-784) and resumes with the point phase only —
    half the FLOPs and compile time of the old two-pass formulation.

    ``num_points`` must equal cfg.sample_num (the model's static cloud size).
    """
    del num_points
    return model.apply(variables, img, None, None, depth, None, K, valid,
                       train=False, rngs={"points": rng})
