"""Tests for alternate capability paths: photometric loss, MANO-regression
branch, priors, reg losses, pointcloud test-time op."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdfnet_tpu.config import Config
from pdfnet_tpu.data.synthetic import make_batch
from pdfnet_tpu.models import build_model
from pdfnet_tpu.train.loss import (compute_loss, load_loss_consts,
                                   reg_l1_loss)
from pdfnet_tpu.train.mano_branch import (load_mano_branch_consts,
                                          mano_branch_loss, split_coeff)
from pdfnet_tpu.train.priors import (hard_example_mining,
                                     pose_shape_prior_loss, psnr)


def tiny_cfg(**kw):
    base = dict(default_resolution=96, compute_dtype="float32",
                sample_num=128, sample_num_level1=64, sample_num_level2=16,
                knn_k=8, batch_size=2)
    base.update(kw)
    return Config(**base)


def test_photometric_path():
    cfg = tiny_cfg(photometric_loss=True)
    assert "texture" in cfg.heads and "light" in cfg.heads
    model = build_model(cfg)
    consts = load_loss_consts()
    batch = make_batch(cfg, 2, seed=3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jb["input"], jb["choose"], jb["cloud"], jb["depth"], jb["ind"],
        jb["K_new"], jb["valid"], train=False)
    outs = model.apply(variables, jb["input"], jb["choose"], jb["cloud"],
                       jb["depth"], jb["ind"], jb["K_new"], jb["valid"],
                       train=False)
    loss, stats = compute_loss(cfg, consts, *outs, jb, jnp.asarray(0),
                               "train")
    assert np.isfinite(float(loss))
    assert "photometric_loss" in stats and "seg_loss" in stats
    assert np.isfinite(float(stats["photometric_loss"]))


def test_mano_branch_loss():
    cfg = tiny_cfg()
    consts = load_mano_branch_consts()
    rng = np.random.RandomState(0)
    B, hw = 2, cfg.output_res
    params_map = jnp.asarray(rng.randn(B, hw, hw, 122).astype(np.float32) * 0.01)
    batch = make_batch(cfg, B, seed=4)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, stats = mano_branch_loss(cfg, consts, params_map, jb["ind"], jb)
    assert np.isfinite(float(loss))
    for k in ("reproj_left", "bone_right", "prior", "joints3d_left"):
        assert k in stats


def test_split_coeff_translation_decode():
    cfg = tiny_cfg()
    B = 2
    theta = jnp.zeros((B, 122))
    ind = jnp.asarray([[5, 10], [20, 30]], jnp.int32)
    K = jnp.tile(jnp.asarray([[[120.0, 0, 48], [0, 120.0, 48],
                               [0, 0, 1]]]), (B, 1, 1))
    c = split_coeff(theta, ind, K, cfg.default_resolution, cfg.down_ratio)
    # zero params decode to z=0.6 with xy determined by the center cell ray
    np.testing.assert_allclose(np.asarray(c["left"]["trans"][:, 2]), 0.6,
                               atol=1e-6)
    assert np.isfinite(np.asarray(c["right"]["trans"])).all()


def test_pose_prior_penalizes_extremes():
    z = jnp.zeros((2, 45))
    s = jnp.zeros((2, 10))
    base = pose_shape_prior_loss(z, z, s, s)
    wild = pose_shape_prior_loss(z + 10.0, z, s, s)
    assert float(wild.mean()) > float(base.mean())


def test_hard_example_mining():
    losses = jnp.asarray([1.0, 2.0, 3.0, 10.0])
    assert float(hard_example_mining(losses, 0.5)) == pytest.approx(6.5)


def test_psnr_identity():
    img = jnp.ones((8, 8)) * 128
    mask = jnp.ones((8, 8))
    assert float(psnr(img, img, mask)) > 100


def test_reg_l1_loss_gathers_at_ind():
    out_map = jnp.zeros((1, 4, 4, 2)).at[0, 1, 2].set(jnp.asarray([3.0, 4.0]))
    ind = jnp.asarray([[1 * 4 + 2]], jnp.int32)
    target = jnp.asarray([[[1.0, 2.0]]])
    mask = jnp.ones((1, 1))
    # |3-1| + |4-2| over 2 masked elements = 2.0
    assert float(reg_l1_loss(out_map, mask, ind, target)) == pytest.approx(2.0)


def test_testtime_pointcloud_op():
    from pdfnet_tpu.ops.pointcloud import depth_to_hand_clouds
    B, H, W = 1, 64, 64
    depth = np.zeros((B, H, W), np.float32)
    depth[:, 20:40, 10:30] = 0.5
    mask = np.zeros((B, H, W, 2), np.float32)
    mask[:, 20:40, 10:30, 0] = 1.0        # left hand only
    K = np.tile(np.asarray([[[100.0, 0, 32], [0, 100.0, 32],
                             [0, 0, 1]]], np.float32), (B, 1, 1))
    valid = np.ones((B, 2), np.float32)
    choose, cloud, ok = jax.jit(
        lambda d, m, k, v, key: depth_to_hand_clouds(d, m, k, v, key, 256)
    )(depth, mask, K, valid, jax.random.PRNGKey(0))
    ok = np.asarray(ok)
    assert ok[0, 0] and not ok[0, 1]      # right hand has no pixels
    cl = np.asarray(cloud)[0, 0]
    assert np.all(np.abs(cl[:, 2] - 0.5) < 1e-5)
    assert np.asarray(cloud)[0, 1].sum() == 0


def test_csp_model_forward_and_loss():
    """CSP alternate detector (resnet_csp.py PoseResNet): forward shapes,
    iterative params refinement, and a grad step through csp_loss."""
    from pdfnet_tpu.models.csp import build_csp_model
    from pdfnet_tpu.train.mano_branch import csp_loss

    cfg = tiny_cfg(arch="csp_18", batch_size=2)
    model = build_csp_model(cfg)
    batch = make_batch(cfg, 2, seed=5)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jb["input"], jb["depth"], True)
    ret, mutated = model.apply(variables, jb["input"], jb["depth"], True,
                               mutable=["batch_stats"])
    g = cfg.output_res            # 96/4 = 24 (CSP FPN lands at /4)
    assert ret["hm"].shape == (2, g, g, 2)
    assert ret["wh"].shape == (2, g, g, 2)
    assert isinstance(ret["params"], list) and len(ret["params"]) == 3
    assert ret["params"][-1].shape == (2, g, g, 122)

    consts = load_mano_branch_consts()

    def loss_fn(params):
        ret, _ = model.apply({"params": params,
                              "batch_stats": variables["batch_stats"]},
                             jb["input"], jb["depth"], True,
                             mutable=["batch_stats"])
        loss, stats = csp_loss(cfg, consts, ret, jb)
        return loss, stats

    (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"])
    assert np.isfinite(float(loss))
    assert "hm_loss" in stats and "reproj_left" in stats
    gmax = max(jax.tree.leaves(jax.tree.map(
        lambda g: float(jnp.abs(g).max()), grads)))
    assert np.isfinite(gmax) and gmax > 0


def test_csp_uv_prior_branch():
    """EncodeUV + uv-prior decoder branch (resnet_csp.py:259-284)."""
    from pdfnet_tpu.models.csp import CSPNet

    model = CSPNet(heads={"hm": 2, "params": 122}, arch="csp_18",
                   use_heatmaps=True, iterations=1)
    x = jnp.zeros((1, 96, 96, 3))
    d = jnp.zeros((1, 96, 96))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, d, True)
    ret, _ = model.apply(variables, x, d, True, mutable=["batch_stats"])
    assert ret["uv_prior"].shape == (1, 48, 48, 21)    # /2 grid
    assert ret["hm"].shape == (1, 24, 24, 2)           # /4 grid
    assert 0.0 < float(ret["uv_prior"].mean()) < 1.0


def test_csp_trainer_dispatch():
    """Trainer dispatches on arch: csp_* trains CSPNet via csp_loss."""
    from pdfnet_tpu.models.csp import CSPNet
    from pdfnet_tpu.parallel import mesh as mesh_lib
    from pdfnet_tpu.train.trainer import Trainer

    cfg = tiny_cfg(arch="csp_18", batch_size=2)
    tr = Trainer(cfg, mesh=mesh_lib.make_mesh(1, cfg.data_axis))
    assert isinstance(tr.model, CSPNet) and tr.eval_step is None
    batch = make_batch(cfg, 2, seed=6)
    tr.init_state(batch)
    means = tr.run_epoch(0, [batch, batch])
    assert np.isfinite(means["loss"]) and np.isfinite(means["hm_loss"])
    assert int(tr.state.step) == 2
    with pytest.raises(NotImplementedError):
        tr.evaluate([batch])
    # flagship factory refuses the csp arch instead of silently
    # building HandNet
    with pytest.raises(ValueError):
        build_model(cfg)
