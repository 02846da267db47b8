"""Alternate MANO-parameter regression path ("origforward" branch).

The reference keeps a second supervision mode where the network regresses
122-d MANO parameters per pixel (the ``params`` CenterNet head), decoded at
the hand-center cells into per-hand (orient, pose, shape, trans) and pushed
through the differentiable MANO layer; losses are then 2D reprojection +
bone direction + pose/shape priors (+ optional photometric).

References: Split_coeff (Mano_render.py:145-194), origforward
(simplified.py:657-1048).  Enabled via ``Config.use_mano_branch`` by the
trainer; also usable standalone for parameter-space inference.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pdfnet_tpu.config import Config
from pdfnet_tpu.mano import layer as mano
from pdfnet_tpu.ops.gather import gather_pixels
from pdfnet_tpu.ops.geometry import perspective_project
from pdfnet_tpu.ops.heatmap import clamped_sigmoid
from pdfnet_tpu.train.loss import (bone_direction_loss, focal_loss,
                                   l1_per_sample, mse_per_sample,
                                   reg_l1_loss)
from pdfnet_tpu.train.priors import pose_shape_prior_loss


class ManoBranchConsts(NamedTuple):
    left: mano.ManoConsts
    right: mano.ManoConsts


def load_mano_branch_consts() -> ManoBranchConsts:
    return ManoBranchConsts(left=mano.load_mano_consts("left"),
                            right=mano.load_mano_consts("right"))


def split_coeff(theta: jax.Array, ind: jax.Array, K: jax.Array,
                input_res: int = 384, down_ratio: int = 4,
                num_pca: int = 0) -> Dict[str, Dict[str, jax.Array]]:
    """Decode a (B, 122) parameter vector into per-hand MANO inputs.

    Layout per hand (61): orient 3, pose 45 (or PCA), shape 10, trans 3.
    The translation xy is an offset from the hand-center cell, lifted
    through the intrinsics with z biased by +0.6 m.
    """
    out = {}
    fx, fy = K[:, 0, 0], K[:, 1, 1]
    cw, ch = K[:, 0, 2], K[:, 1, 2]
    grid = input_res // down_ratio
    for h, side in enumerate(("left", "right")):
        o = 61 * h
        if num_pca:
            orient = theta[:, o:o + 3]
            pose = theta[:, o + 3:o + 3 + num_pca]
            shape = theta[:, o + 3 + num_pca:o + 13 + num_pca]
            trans = theta[:, o + 13 + num_pca:o + 16 + num_pca] / 10.0
        else:
            orient = theta[:, o:o + 3]
            pose = theta[:, o + 3:o + 48]
            shape = theta[:, o + 48:o + 58] * 0.0   # shape fixed to zero
            trans = theta[:, o + 58:o + 61]
        tz = trans[:, 2] + 0.6
        idx = ind[:, h].astype(jnp.int32)
        cx = ((idx % grid) * down_ratio).astype(jnp.float32)
        cy = ((idx // grid) * down_ratio).astype(jnp.float32)
        tx = tz * (trans[:, 0] + cx - cw) / fx
        ty = tz * (trans[:, 1] + cy - ch) / fy
        out[side] = {"orient": orient, "pose": pose, "shape": shape,
                     "trans": jnp.stack([tx, ty, tz], axis=1)}
    return out


def mano_branch_forward(consts: ManoBranchConsts, coeffs, use_pca: bool = False):
    """Per-hand MANO forward from decoded coefficients.

    Returns {'left'/'right': (verts (B,778,3), joints (B,21,3))} in camera
    space (wrist-rotation semantics).
    """
    out = {}
    for side, c in (("left", consts.left), ("right", consts.right)):
        p = coeffs[side]
        v, j = mano.mano_forward(c, p["orient"], p["pose"], p["shape"],
                                 trans=p["trans"], use_pca=use_pca)
        out[side] = (v, j)
    return out


def mano_branch_loss(
    cfg: Config,
    consts: ManoBranchConsts,
    params_map: jax.Array,        # (B, H/4, W/4, 122) from the params head
    ind: jax.Array,               # (B, 2) center cells
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Reprojection + bone + prior losses for the regression branch."""
    if params_map.ndim == 3:        # patch_heads: already (B, 2, 122)
        theta_l, theta_r = params_map[:, 0], params_map[:, 1]
    else:
        theta_l = gather_pixels(params_map, ind[:, :1])[:, 0]   # (B, 122)
        theta_r = gather_pixels(params_map, ind[:, 1:])[:, 0]
    K = batch["K_new"]
    valid = batch["valid"]
    res = cfg.default_resolution

    coeff_l = split_coeff(theta_l, ind, K, res, cfg.down_ratio)
    coeff_r = split_coeff(theta_r, ind, K, res, cfg.down_ratio)
    coeffs = {"left": coeff_l["left"], "right": coeff_r["right"]}
    hands = mano_branch_forward(consts, coeffs)

    norm01 = lambda x: x / res * 2.0 - 1.0
    losses = {}
    total = 0.0
    for h, side in enumerate(("left", "right")):
        v, j = hands[side]
        lms = perspective_project(j, K)
        gt = batch[f"lms_{side}_gt"]
        reproj = mse_per_sample(norm01(lms), norm01(gt)) * valid[:, h]
        bone = bone_direction_loss(lms, gt) * valid[:, h]
        losses[f"reproj_{side}"] = reproj.mean()
        losses[f"bone_{side}"] = bone.mean()
        total = total + cfg.reproj_weight * reproj * 1000.0 \
            + cfg.bone_dir_weight * bone
        if f"joints_{side}_gt" in batch:
            j3d = l1_per_sample(j, batch[f"joints_{side}_gt"]) * valid[:, h]
            losses[f"joints3d_{side}"] = j3d.mean()
            total = total + cfg.joints_weight * j3d * 100.0

    prior = pose_shape_prior_loss(coeffs["left"]["pose"],
                                  coeffs["right"]["pose"],
                                  coeffs["left"]["shape"],
                                  coeffs["right"]["shape"], cfg.dataset)
    losses["prior"] = prior.mean()
    total = total + prior
    losses["mano_branch_loss"] = total.mean()
    return total.mean(), losses


def csp_loss(
    cfg: Config,
    consts: ManoBranchConsts,
    ret: Dict[str, jax.Array],    # CSPNet outputs (params = list of thetas)
    batch: Dict[str, jax.Array],
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Training loss for the CSP alternate detector: center focal loss +
    the MANO-theta regression terms on the last refinement iteration
    (reference origforward, simplified.py:657-760; hm/wh handling
    :695-717).  The CSP head grid is /4 (like the flagship model), so the
    default ``Config(down_ratio=4)`` dataset targets match directly."""
    losses = {}
    hm = clamped_sigmoid(ret["hm"])
    hm_loss = focal_loss(hm, batch["hm"]).mean()   # focal is per-sample (B,)
    losses["hm_loss"] = hm_loss
    total_scalar = cfg.center_weight * hm_loss

    if cfg.use_wh_loss and "wh" in ret and "wh" in batch:
        wh_loss = reg_l1_loss(ret["wh"], batch["valid"], batch["ind"],
                              batch["wh"])
        losses["wh_loss"] = wh_loss
        total_scalar = total_scalar + cfg.wh_weight * wh_loss

    theta_map = ret["params"][-1]     # last refinement iteration
    mano_total, mano_losses = mano_branch_loss(cfg, consts, theta_map,
                                               batch["ind"], batch)
    losses.update(mano_losses)
    total = total_scalar + mano_total
    losses["loss"] = total
    return total, losses
