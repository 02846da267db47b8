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


def mano_branch_forward(consts: ManoBranchConsts, coeffs,
                        use_pca: bool = False, apply_trans: bool = True):
    """Per-hand MANO forward from decoded coefficients.

    Returns {'left'/'right': (verts (B,778,3), joints (B,21,3))} in camera
    space (wrist-rotation semantics).  ``apply_trans=False`` reproduces the
    reference origforward exactly: it decodes the translation via
    Split_coeff but then calls the MANO layer WITHOUT it
    (simplified.py:735-736 — pred_trans_* is returned and dropped), so all
    its losses act on untranslated hands.
    """
    out = {}
    for side, c in (("left", consts.left), ("right", consts.right)):
        p = coeffs[side]
        v, j = mano.mano_forward(c, p["orient"], p["pose"], p["shape"],
                                 trans=p["trans"] if apply_trans else None,
                                 use_pca=use_pca)
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


# Per-joint landmark weighting of the origforward reprojection loss
# (ManoRender.weighted_lms, Mano_render.py:68-73): wrist + the 5 fingertips
# (new_order joints 0, 4, 8, 12, 16, 20) weigh 20x; identical for u and v.
WEIGHTED_LMS = (20.0, 1.0, 1.0, 1.0, 20.0, 1.0, 1.0, 1.0, 20.0, 1.0, 1.0,
                1.0, 20.0, 1.0, 1.0, 1.0, 20.0, 1.0, 1.0, 1.0, 20.0)


def _weighted_lms_reproj(lms: jax.Array, gt: jax.Array,
                         valid_h: jax.Array) -> jax.Array:
    """Reference origforward landmark MSE (simplified.py:793-797): per-joint
    weighted squared error summed over uv, normalized by the (masked) weight
    sum.  lms/gt (B, 21, 2), valid_h (B,) -> (B, 21)."""
    w = jnp.asarray(WEIGHTED_LMS, jnp.float32)[None, :, None]   # (1, 21, 1)
    m = valid_h[:, None, None].astype(jnp.float32)
    se = ((lms * m - gt * m) ** 2) * w * m                      # (B, 21, 2)
    den = (w * m * jnp.ones_like(se)).sum(axis=2) + 1e-8        # (B, 21)
    return se.sum(axis=2) / den


def origforward_loss(
    cfg: Config,
    consts: ManoBranchConsts,
    theta_l: jax.Array,           # (B, 122) decoded at the left center
    theta_r: jax.Array,           # (B, 122) decoded at the right center
    hm: jax.Array,                # (B, H/4, W/4, 2) center-heatmap logits
    batch: Dict[str, jax.Array],
    epoch: jax.Array,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """The reference origforward train loss, term for term
    (simplified.py:657-1048; composition :989-1037):

      alpha = [epoch >= 20]
      loss  = center_weight * hm_loss * 0              (zeroed, :992)
            + reproj_weight * reproj_loss_all          (:1011)
            + norm_weight * norm_loss                  (:1013)
            + bone_dir_weight * bone_direc_loss        (:1016)
            + reproj_weight * root_loss * 0            (:1027)
            + reproj_weight * abs_joints_loss * 0      (:1029)
            + joints_weight * joints_loss * 10         (:1031)
            + [H2O] joints_weight * verts_loss         (:1034)
            + [H2O] reproj_weight * abs_verts_loss * 0.01 * alpha  (:1036)

    MANO runs WITHOUT the decoded translation (:735-736) and with zeroed
    betas (Split_coeff :163-169), so every 3D term acts on untranslated
    zero-shape hands.  Returns (per-sample loss (B,), stats).
    """
    K, valid, ind = batch["K_new"], batch["valid"], batch["ind"]
    res = cfg.default_resolution
    losses: Dict[str, jax.Array] = {}

    hm_loss = focal_loss(clamped_sigmoid(hm), batch["hm"],
                         batch_global_guard=True).mean()
    losses["hm_loss"] = hm_loss
    loss = cfg.center_weight * hm_loss * 0.0

    cl = split_coeff(theta_l, ind, K, res, cfg.down_ratio)["left"]
    cr = split_coeff(theta_r, ind, K, res, cfg.down_ratio)["right"]
    hands = mano_branch_forward(consts, {"left": cl, "right": cr},
                                apply_trans=False)
    vl, jl = hands["left"]
    vr, jr = hands["right"]

    norm = pose_shape_prior_loss(cl["pose"], cr["pose"], cl["shape"],
                                 cr["shape"], cfg.dataset)          # (B,)
    losses["norm_loss"] = norm.mean()

    jl_gt, jr_gt = batch["joints_left_gt"], batch["joints_right_gt"]
    root_l_gt, root_r_gt = jl_gt[:, 9:10], jr_gt[:, 9:10]
    jl_gt_off, jr_gt_off = jl_gt - root_l_gt, jr_gt - root_r_gt
    root_l, root_r = jl[:, 9:10], jr[:, 9:10]
    jl_off, jr_off = jl - root_l, jr - root_r
    vl_off, vr_off = vl - root_l, vr - root_r

    # RHD projects root-aligned joints (simplified.py:774-776); that
    # reassignment also feeds abs_joints_loss downstream (:817)
    if cfg.dataset == "RHD":
        jl_p, jr_p = jl_off + root_l_gt, jr_off + root_r_gt
    else:
        jl_p, jr_p = jl, jr
    lms_l = perspective_project(jl_p, K)
    lms_r = perspective_project(jr_p, K)
    gt_l, gt_r = batch["lms_left_gt"], batch["lms_right_gt"]

    reproj_all = (_weighted_lms_reproj(lms_l, gt_l, valid[:, 0])
                  + _weighted_lms_reproj(lms_r, gt_r, valid[:, 1])
                  ).mean(axis=1) / cfg.num_stacks                   # (B,)
    losses["reproj_loss_all"] = reproj_all.mean()
    bone = (bone_direction_loss(lms_l, gt_l) * valid[:, 0]
            + bone_direction_loss(lms_r, gt_r) * valid[:, 1])
    losses["bone_direc_loss"] = bone.mean()
    joints_loss = (l1_per_sample(jl_off, jl_gt_off) * valid[:, 0]
                   + l1_per_sample(jr_off, jr_gt_off) * valid[:, 1]) * 1000.0
    losses["joints_loss"] = joints_loss.mean()
    root_loss = (l1_per_sample(root_l, root_l_gt) * valid[:, 0] * 1000.0
                 + l1_per_sample(root_r, root_r_gt) * valid[:, 1] * 1000.0)
    losses["root_loss"] = root_loss.mean()
    abs_joints = (l1_per_sample(jl_p, jl_gt) * valid[:, 0]
                  + l1_per_sample(jr_p, jr_gt) * valid[:, 1]) * 1000.0
    losses["abs_joints_loss"] = abs_joints.mean()

    alpha = (jnp.asarray(epoch) >= 20).astype(jnp.float32)
    loss = (loss
            + cfg.reproj_weight * reproj_all
            + cfg.norm_weight * norm
            + cfg.bone_dir_weight * bone
            + cfg.reproj_weight * root_loss * 0.0
            + cfg.reproj_weight * abs_joints * 0.0
            + cfg.joints_weight * joints_loss * 10.0)
    if cfg.dataset == "H2O" and "verts_left_gt" in batch:
        vl_gt, vr_gt = batch["verts_left_gt"], batch["verts_right_gt"]
        verts_loss = (l1_per_sample(vl_off, vl_gt - root_l_gt) * valid[:, 0]
                      + l1_per_sample(vr_off, vr_gt - root_r_gt)
                      * valid[:, 1]) * 1000.0
        abs_verts = (l1_per_sample(vl, vl_gt) * valid[:, 0]
                     + l1_per_sample(vr, vr_gt) * valid[:, 1]) * 1000.0
        losses["verts_loss"] = verts_loss.mean()
        losses["abs_verts_loss"] = abs_verts.mean()
        loss = (loss + cfg.joints_weight * verts_loss
                + cfg.reproj_weight * abs_verts * 0.01 * alpha)
    losses["loss"] = loss.mean()
    return loss, losses


def csp_loss(
    cfg: Config,
    consts: ManoBranchConsts,
    ret: Dict[str, jax.Array],    # CSPNet outputs (params = list of thetas)
    batch: Dict[str, jax.Array],
    epoch: jax.Array = 0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """Training loss for the CSP alternate detector: center focal loss +
    the MANO-theta regression terms on the last refinement iteration
    (reference origforward, simplified.py:657-760; hm/wh handling
    :695-717).  The CSP head grid is /4 (like the flagship model), so the
    default ``Config(down_ratio=4)`` dataset targets match directly.

    With ``replicate_reference_quirks`` the loss is the reference
    origforward composition verbatim (``origforward_loss`` above, per-term
    torch-parity-tested), including its hm*0 zeroing and trans-less MANO;
    the default schedule below keeps live center supervision and
    translated-hand reprojection instead."""
    if cfg.replicate_reference_quirks:
        theta_map = ret["params"][-1]
        if theta_map.ndim == 3:
            theta_l, theta_r = theta_map[:, 0], theta_map[:, 1]
        else:
            theta_l = gather_pixels(theta_map, batch["ind"][:, :1])[:, 0]
            theta_r = gather_pixels(theta_map, batch["ind"][:, 1:])[:, 0]
        total, losses = origforward_loss(cfg, consts, theta_l, theta_r,
                                         ret["hm"], batch, epoch)
        return total.mean(), losses
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
