"""Loss + train-step integration tests on synthetic data (tiny config)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pdfnet_tpu.config import Config
from pdfnet_tpu.data.synthetic import make_batch
from pdfnet_tpu.models import build_model
from pdfnet_tpu.train.loss import load_loss_consts, compute_loss, eval_outputs
from pdfnet_tpu.train.metrics import MetricAccumulator
from pdfnet_tpu.train.step import (create_train_state, lr_at_epoch,
                                   make_eval_step, make_train_step)


@pytest.fixture(scope="module")
def setup():
    cfg = Config(default_resolution=96, compute_dtype="float32",
                 sample_num=128, sample_num_level1=64, sample_num_level2=16,
                 knn_k=8, batch_size=2)
    model = build_model(cfg)
    consts = load_loss_consts()
    batch = make_batch(cfg, 2, seed=0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), jb)
    return cfg, model, consts, jb, state


def test_loss_finite_and_stats(setup):
    cfg, model, consts, jb, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    result, params, hand_dicts, other = model.apply(
        variables, jb["input"], jb["choose"], jb["cloud"], jb["depth"],
        jb["ind"], jb["K_new"], jb["valid"], train=False)
    loss, stats = compute_loss(cfg, consts, result, params, hand_dicts,
                               other, jb, jnp.asarray(30), mode="train")
    assert np.isfinite(float(loss))
    for k in ("hm_loss", "root_loss", "verts_loss", "joints_loss",
              "mask_loss", "hms_loss", "gcn_loss", "bone_direc_loss",
              "edge_loss", "norm_loss", "abs_joints_loss", "abs_verts_loss",
              "verts2d_loss", "gcn_2d_loss", "joints2d_loss"):
        assert k in stats and np.isfinite(float(stats[k])), k


def test_edge_loss_gated_by_epoch(setup):
    cfg, model, consts, jb, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outs = model.apply(variables, jb["input"], jb["choose"], jb["cloud"],
                       jb["depth"], jb["ind"], jb["K_new"], jb["valid"],
                       train=False)
    l_early, _ = compute_loss(cfg, consts, *outs, jb, jnp.asarray(0), "train")
    l_late, _ = compute_loss(cfg, consts, *outs, jb, jnp.asarray(30), "train")
    # edge + joints2d terms activate at epoch >= 20
    assert float(l_late) > float(l_early)


def test_train_step_updates_params(setup):
    cfg, model, consts, jb, state = setup
    step = make_train_step(cfg, model, consts, donate=False)
    lr = jnp.asarray(lr_at_epoch(cfg, 0), jnp.float32)
    s1, stats1 = step(state, jb, jnp.asarray(0), lr, jax.random.PRNGKey(1))
    s2, stats2 = step(s1, jb, jnp.asarray(0), lr, jax.random.PRNGKey(2))
    assert int(s2.step) == 2
    assert np.isfinite(float(stats1["loss"]))
    assert np.isfinite(float(stats2["loss"]))
    # params actually moved
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, s2.params)
    assert max(jax.tree.leaves(d)) > 0
    # batch_stats updated
    if jax.tree.leaves(state.batch_stats):
        db = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.batch_stats, s2.batch_stats)
        assert max(jax.tree.leaves(db)) > 0


def test_eval_step_and_metrics(setup):
    cfg, model, consts, jb, state = setup
    ev = make_eval_step(cfg, model, consts)
    out = ev(state.params, state.batch_stats, jb)
    acc = MetricAccumulator()
    acc.update(jax.tree.map(np.asarray, out),
               jax.tree.map(np.asarray, jb))
    r = acc.result()
    for k in MetricAccumulator.KEYS:
        assert np.isfinite(r[k]), k
    # untrained net: errors should be large but bounded
    assert r["abs_mpjpe_left"] > 1.0
    block = acc.format_block("test")
    assert "abs_left_joints_loss_all" in block   # reference H2O-val.txt names


def test_lr_schedule():
    cfg = Config(lr=1e-4, lr_step=(30,))
    assert lr_at_epoch(cfg, 0) == pytest.approx(1e-4)
    assert lr_at_epoch(cfg, 29) == pytest.approx(1e-4)
    assert lr_at_epoch(cfg, 30) == pytest.approx(1e-5)
    assert lr_at_epoch(cfg, 80) == pytest.approx(1e-5)


def test_loss_joints_only_batch(setup):
    """RHD-style batches (no vertex GT) must train: mesh terms drop to zero
    and joint terms use the joint GT directly (simplified.py H2O gating)."""
    cfg, model, consts, jb, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outs = model.apply(variables, jb["input"], jb["choose"], jb["cloud"],
                       jb["depth"], jb["ind"], jb["K_new"], jb["valid"],
                       train=False)
    rhd = {k: v for k, v in jb.items()
           if not k.startswith(("verts_", "verts2d_"))}
    assert "verts_left_gt" not in rhd
    loss, stats = compute_loss(cfg, consts, *outs, rhd, jnp.asarray(30),
                               "train")
    assert np.isfinite(float(loss))
    for k in ("verts_loss", "abs_verts_loss", "gcn_loss", "norm_loss",
              "edge_loss", "verts2d_loss", "gcn_2d_loss"):
        assert float(stats[k]) == 0.0, k
    for k in ("joints_loss", "abs_joints_loss", "joints2d_loss"):
        assert float(stats[k]) > 0.0, k


def test_focal_loss_zero_positive_sample():
    """A sample with no positives must not get the 1/eps amplification."""
    from pdfnet_tpu.train.loss import focal_loss
    rng = np.random.RandomState(0)
    gt = np.zeros((2, 8, 8, 2), np.float32)
    gt[0, 3, 3, 0] = 1.0          # sample 0 has a positive, sample 1 none
    pred = jnp.asarray(rng.uniform(0.05, 0.95, gt.shape).astype(np.float32))
    per = np.asarray(focal_loss(pred, jnp.asarray(gt)))
    assert per.shape == (2,)
    assert np.isfinite(per).all()
    # the zero-positive sample returns the raw (unnormalized) negative term,
    # same magnitude class as the normalized one — not ~1000x larger
    assert per[1] < per[0] * 100


def test_checkpoint_retention(tmp_path):
    from pdfnet_tpu.train import checkpoint as ckpt_lib

    class S:   # minimal TrainState stand-in
        params = {"w": np.zeros((2,), np.float32)}
        batch_stats = {}
        opt_state = ()
        step = np.asarray(0)

    for ep in range(5):
        ckpt_lib.save_checkpoint(str(tmp_path), S(), ep, keep=3)
    left = sorted(d for d in os.listdir(tmp_path) if d.startswith("model_"))
    assert left == ["model_2", "model_3", "model_4"]


def test_prefetch_close_releases_source():
    from pdfnet_tpu.data.prefetch import prefetch
    closed = []

    def gen():
        try:
            for i in range(1000):
                yield i
        finally:
            closed.append(True)

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()
    assert closed == [True]
    with pytest.raises(StopIteration):
        next(it)


def test_patch_heads_train_loss(setup):
    """Training losses that read the non-hm heads (wh) must accept the
    pre-gathered (B, 2, C) layout produced by patch_heads."""
    import dataclasses
    cfg, model, consts, jb, state = setup
    cfg_p = dataclasses.replace(cfg, patch_heads=True, use_wh_loss=True)
    model_p = build_model(cfg_p)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outs = model_p.apply(variables, jb["input"], jb["choose"], jb["cloud"],
                         jb["depth"], jb["ind"], jb["K_new"], jb["valid"],
                         train=False)
    assert outs[3]["ret"]["wh"].shape == (2, 2, 2)       # (B, hands, C)
    loss, stats = compute_loss(cfg_p, consts, *outs, jb, jnp.asarray(30),
                               "train")
    assert np.isfinite(float(loss))
    assert np.isfinite(float(stats["wh_loss"]))
    # same value as the full-map path (exact head equivalence at centers)
    cfg_f = dataclasses.replace(cfg, use_wh_loss=True)
    outs_f = build_model(cfg_f).apply(
        variables, jb["input"], jb["choose"], jb["cloud"], jb["depth"],
        jb["ind"], jb["K_new"], jb["valid"], train=False)
    _, stats_f = compute_loss(cfg_f, consts, *outs_f, jb, jnp.asarray(30),
                              "train")
    np.testing.assert_allclose(float(stats["wh_loss"]),
                               float(stats_f["wh_loss"]), rtol=1e-5,
                               atol=1e-6)


def test_image_summary_grid(setup, tmp_path):
    """Trainer.image_summary renders an input|pred|gt grid; Logger.image
    writes it (reference base_trainer.py:174-190 TB image path)."""
    from pdfnet_tpu.parallel import mesh as mesh_lib
    from pdfnet_tpu.train.trainer import Logger, Trainer

    cfg, model, consts, jb, state = setup
    tr = Trainer(cfg, model=model, mesh=mesh_lib.make_mesh(1, cfg.data_axis))
    tr.state = mesh_lib.replicate(state, tr.mesh)
    batch = jax.tree.map(np.asarray, jb)
    grid = tr.image_summary(batch, max_imgs=2)
    res = cfg.default_resolution
    assert grid.shape == (2 * res, 3 * res, 3)    # input | pred | gt rows
    assert grid.dtype == np.uint8
    logger = Logger(str(tmp_path), cfg)
    path = logger.image(7, "train", grid)
    assert os.path.exists(path)


def test_step_profiler_trace(tmp_path):
    """StepProfiler captures a device trace window + timing meters."""
    from pdfnet_tpu.utils.profiler import StepProfiler

    prof = StepProfiler(str(tmp_path), start_step=1, num_steps=2)
    x = jnp.ones((128, 128))
    f = jax.jit(lambda a: a @ a)
    for _ in range(4):
        prof.data_tick()
        with prof.step():
            x = f(x)
    jax.block_until_ready(x)
    prof.close()
    s = prof.summary()
    assert s["step_time_avg_s"] > 0 and s["data_time_avg_s"] >= 0
    assert prof.step_num == 4 and not prof.tracing
    # a profile dump exists under plugins/profile/<ts>/
    import glob
    dumps = glob.glob(str(tmp_path / "plugins" / "profile" / "*" / "*"))
    assert dumps, "no profiler trace written"


def test_eval_vis_dump(setup, tmp_path):
    """Eval-loop visual dumps: overlay + skeleton jpgs and pred/GT .obj
    meshes (reference simplified.py:285-330 every-500-sample spot checks)."""
    from pdfnet_tpu.parallel import mesh as mesh_lib
    from pdfnet_tpu.train.trainer import Trainer

    cfg, model, consts, jb, state = setup
    tr = Trainer(cfg, model=model, mesh=mesh_lib.make_mesh(1, cfg.data_axis))
    tr.state = mesh_lib.replicate(state, tr.mesh)
    batch = jax.tree.map(np.asarray, jb)
    tr.evaluate([batch], vis_every=1, vis_dir=str(tmp_path))
    for fn in ("image_proj_left_0.jpg", "kps_bone_pred_0.jpg",
               "lhands_0.obj", "rhands_0.obj",
               "gt_hands_l0.obj", "gt_hands_r0.obj"):
        assert os.path.exists(tmp_path / fn), fn
    head = open(tmp_path / "lhands_0.obj").readline().split()
    assert head[0] == "v" and len(head) == 4
    # 778 verts + 1538 faces
    lines = open(tmp_path / "lhands_0.obj").read().splitlines()
    assert sum(l.startswith("v ") for l in lines) == 778
    assert sum(l.startswith("f ") for l in lines) == 1538


def test_subtree_checkpoint(setup, tmp_path):
    """Decoder-only checkpoint (reference main.py:127-129) saves and merges
    back through the tolerant restore."""
    from pdfnet_tpu.train import checkpoint as ck

    cfg, model, consts, jb, state = setup
    top = sorted(state.params)
    sub = "decoder" if "decoder" in top else top[0]
    p = ck.save_subtree_checkpoint(str(tmp_path), jax.device_get(state), 3,
                                   subtree=sub)
    assert os.path.isdir(p)
    # tolerant restore: the subtree loads, everything else keeps init
    restored, epoch = ck.load_checkpoint(p, jax.device_get(state),
                                         resume_optimizer=False)
    assert epoch == 3
    same = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        restored.params[sub], state.params[sub])
    assert max(jax.tree.leaves(same)) == 0.0


def test_skip_nonfinite_updates(setup):
    """On-device non-finite guard: a NaN batch leaves params/opt/BN
    untouched and reports the skip; a clean batch updates normally."""
    cfg, model, consts, jb, state = setup
    cfg2 = cfg.replace(skip_nonfinite_updates=True)
    step = make_train_step(cfg2, model, consts, donate=False)
    lr = jnp.asarray(lr_at_epoch(cfg2, 0), jnp.float32)

    bad = dict(jb)
    bad["input"] = jb["input"].at[0, 0, 0, 0].set(jnp.nan)
    s1, stats = step(state, bad, jnp.asarray(0), lr, jax.random.PRNGKey(1))
    assert float(stats["skipped_nonfinite"]) == 1.0
    d = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                     state.params, s1.params)
    assert max(jax.tree.leaves(d)) == 0.0          # params untouched
    assert int(s1.step) == 1

    s2, stats2 = step(s1, jb, jnp.asarray(0), lr, jax.random.PRNGKey(2))
    assert float(stats2["skipped_nonfinite"]) == 0.0
    d2 = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                      s1.params, s2.params)
    assert max(jax.tree.leaves(d2)) > 0            # clean batch updates


def test_off_head_losses(setup):
    """--off heads get RegWeightedL1 supervision (origforward off branch,
    simplified.py:708-716, weights :998-1004)."""
    cfg, _, consts, jb, _ = setup
    cfg_off = cfg.replace(off=True)
    assert "off_hm" in cfg_off.heads and "off_lms" in cfg_off.heads
    model = build_model(cfg_off)
    batch = make_batch(cfg_off, 2, seed=0)
    jb2 = {k: jnp.asarray(v) for k, v in batch.items()}
    assert jb2["off_hm"].shape == (2, 2, 2)
    assert jb2["off_lms"].shape == (2, 2, 42)
    state = create_train_state(cfg_off, model, jax.random.PRNGKey(0), jb2)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    outs = model.apply(variables, jb2["input"], jb2["choose"], jb2["cloud"],
                       jb2["depth"], jb2["ind"], jb2["K_new"], jb2["valid"],
                       train=False)
    loss, stats = compute_loss(cfg_off, consts, *outs, jb2, jnp.asarray(30),
                               "train")
    assert np.isfinite(float(loss))
    for k in ("off_hm_loss", "off_lms_loss", "wh_loss"):
        assert k in stats and np.isfinite(float(stats[k])), k
    # the off terms actually contribute to the total
    base, _ = compute_loss(cfg_off.replace(off_weight=0.0, wh_weight=0.0),
                           consts, *outs, jb2, jnp.asarray(30), "train")
    expect = (float(base)
              + cfg_off.off_weight * (float(stats["off_hm_loss"])
                                      + float(stats["off_lms_loss"]))
              + cfg_off.wh_weight * float(stats["wh_loss"]))
    assert abs(float(loss) - expect) < 1e-3 * max(1.0, abs(expect))


def test_focal_loss_batch_global_quirk():
    """replicate_reference_quirks switches the focal guard to the exact
    reference _neg_loss (losses.py:137-164): per-sample
    -(pos + neg)/(num_pos + 1e-3), with only the zero-positive fallback
    batch-global — so a zero-positive sample in a mixed batch hits the
    1e-3 epsilon spike, which the per-sample default guards against."""
    from pdfnet_tpu.train.loss import focal_loss
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.uniform(0.01, 0.99, (3, 8, 8, 2)).astype(np.float32))
    gt = jnp.zeros((3, 8, 8, 2), np.float32)
    gt = gt.at[0, 2, 2, 0].set(1.0).at[1, 4, 4, 1].set(1.0)
    gt = gt.at[1, 5, 5, 0].set(1.0)  # sample 1 has 2 positives, sample 2 none
    per = focal_loss(pred, gt)
    glob = np.asarray(focal_loss(pred, gt, batch_global_guard=True))
    # numpy transcription of the reference _neg_loss
    pos = np.asarray(gt) == 1.0
    neg = ~pos
    p = np.asarray(pred)
    g = np.asarray(gt)
    pos_l = (np.log(p) * (1 - p) ** 2 * pos).sum(axis=(1, 2, 3))
    neg_l = (np.log(1 - p) * p ** 2 * (1 - g) ** 4 * neg).sum(axis=(1, 2, 3))
    num_pos = pos.sum(axis=(1, 2, 3))
    ref = -(pos_l + neg_l) / (num_pos + 1e-3)
    np.testing.assert_allclose(glob, ref, rtol=1e-5)
    # the zero-positive sample spikes ~1000x under the reference semantics
    assert glob[2] > 100 * float(per[2])
    # whole-batch-empty fallback: -neg only, identical in both modes
    zero_gt = jnp.zeros_like(gt) + 0.3
    np.testing.assert_allclose(
        np.asarray(focal_loss(pred, zero_gt, batch_global_guard=True)),
        np.asarray(focal_loss(pred, zero_gt)), rtol=1e-6)


def test_batched_eval_exact_with_tail_padding(setup):
    """--eval_batch_size N must equal bs=1 metrics on any split size: the
    loader pads the tail sub-batch and MetricAccumulator masks it out
    (exact replacement for the reference's bs=1 eval loop,
    base_trainer.py:207-491)."""
    from pdfnet_tpu.data.synthetic import SyntheticHandDataset

    cfg, model, consts, jb, state = setup
    eval_step = make_eval_step(cfg, model, consts)
    ds = SyntheticHandDataset(cfg, size=10, seed=7, train=False)

    def run(bs):
        acc = MetricAccumulator()
        for batch in ds.batches(bs):
            assert batch["input"].shape[0] == bs      # static shapes
            jb2 = {k: jnp.asarray(v) for k, v in batch.items()}
            out = eval_step(state.params, state.batch_stats, jb2)
            acc.update(jax.tree.map(np.asarray, out), batch)
        return acc

    acc1, acc4 = run(1), run(4)
    assert acc1.count == 10 and acc4.count == 10
    r1, r4 = acc1.result(), acc4.result()
    for k in r1:
        # same samples, same weights; residual diff is only XLA f32
        # accumulation-order noise across batch shapes
        assert abs(r1[k] - r4[k]) <= 5e-4 * max(1.0, abs(r1[k])), (k, r1[k],
                                                                   r4[k])


def test_pad_mask_accumulation_exact():
    """MetricAccumulator drops pad rows EXACTLY: accumulating 10 fake
    samples at bs=1 equals bs=4-with-padded-tail to float64 precision."""
    rng = np.random.RandomState(11)
    outs, batches = [], []
    for _ in range(10):
        out = {
            "joints_pred": rng.randn(1, 2, 21, 3),
            "verts_pred": rng.randn(1, 2, 778, 3),
            "joints_pred_off": rng.randn(1, 2, 21, 3),
            "verts_pred_off": rng.randn(1, 2, 778, 3),
            "joints_gt": rng.randn(1, 2, 21, 3),
            "verts_gt": rng.randn(1, 2, 778, 3),
            "joints_gt_off": rng.randn(1, 2, 21, 3),
            "verts_gt_off": rng.randn(1, 2, 778, 3),
            "lms21_pred": rng.randn(1, 2, 21, 2),
        }
        outs.append(out)
        batches.append({"lms_left_gt": rng.randn(1, 21, 2),
                        "lms_right_gt": rng.randn(1, 21, 2)})

    acc1 = MetricAccumulator()
    for o, b in zip(outs, batches):
        acc1.update(o, b)

    cat = lambda ds, k: np.concatenate([d[k] for d in ds])
    acc4 = MetricAccumulator()
    for i in range(0, 10, 4):
        sl_o, sl_b = outs[i:i + 4], batches[i:i + 4]
        pad = 4 - len(sl_o)
        sl_o, sl_b = sl_o + [sl_o[-1]] * pad, sl_b + [sl_b[-1]] * pad
        o = {k: cat(sl_o, k) for k in sl_o[0]}
        b = {k: cat(sl_b, k) for k in sl_b[0]}
        mask = np.ones(4, np.float32)
        if pad:
            mask[-pad:] = 0.0
        b["pad_mask"] = mask
        acc4.update(o, b)

    assert acc1.count == 10 and acc4.count == 10
    r1, r4 = acc1.result(), acc4.result()
    for k in r1:
        np.testing.assert_allclose(r1[k], r4[k], rtol=1e-12), k


def test_six_channel_cloud_train_step():
    """input_feature_num=6: the host pipeline emits xyz+normal clouds
    (reference interhand.py:817-838) and the full train step runs on them."""
    from pdfnet_tpu.data.synthetic import make_batch as mk

    cfg6 = Config(default_resolution=96, compute_dtype="float32",
                  sample_num=128, sample_num_level1=64, sample_num_level2=16,
                  knn_k=8, batch_size=2, input_feature_num=6)
    batch = mk(cfg6, 2, seed=0)
    assert batch["cloud"].shape == (2, 2, 128, 6)
    norms = np.linalg.norm(batch["cloud"][..., 3:], axis=-1)
    valid = batch["valid"] > 0
    assert np.all(np.abs(norms[valid] - 1.0) < 1e-3)   # unit normals

    model = build_model(cfg6)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(cfg6, model, jax.random.PRNGKey(0), jb)
    from pdfnet_tpu.train.loss import load_loss_consts as llc
    from pdfnet_tpu.train.step import make_train_step as mts
    step = mts(cfg6, model, llc(), donate=False)
    new_state, stats = step(state, jb, jnp.asarray(0),
                            jnp.asarray(1e-4, jnp.float32),
                            jax.random.PRNGKey(1))
    assert np.isfinite(float(stats["loss"]))


def test_bn_stat_groups_emulates_ddp_replicas(setup):
    """Config.bn_stat_groups=G reproduces the reference's multi-GPU DDP
    BatchNorm semantics (main.py:69-79): each of G groups computes BN
    statistics over only its batch/G slice, the objective is the mean of
    per-group mean losses (= DDP's all-reduce-averaged gradients), and the
    kept running stats are group 0's (the rank-0 checkpoint)."""
    cfg, model, consts, jb, state = setup
    cfg_g = cfg.replace(bn_stat_groups=2)
    step = make_train_step(cfg_g, model, consts, donate=False)
    lr = jnp.asarray(lr_at_epoch(cfg_g, 0), jnp.float32)
    rng = jax.random.PRNGKey(7)
    new_state, stats = step(state, jb, jnp.asarray(0), lr, rng)
    assert int(new_state.step) == 1

    # Replay the two groups by hand, structurally independent of the step
    # (a python loop over half-batch slices instead of the step's vmap),
    # but under jit so f32 reduction order matches the compiled step:
    # group 0's mutated batch_stats must equal the kept stats, and the
    # mean of the two per-half losses must equal the reported loss.
    def replay(params, batch_stats, batch, rng_, epoch):
        rngs = jax.random.split(rng_, 2)
        losses_, bs0 = [], None
        for g in range(2):
            bg = {k: v[g:g + 1] for k, v in batch.items()}
            variables = {"params": params, "batch_stats": batch_stats}
            outs, mutated = model.apply(
                variables, bg["input"], bg["choose"], bg["cloud"],
                bg["depth"], bg["ind"], bg["K_new"], bg["valid"],
                train=True, rngs={"dropout": rngs[g]},
                mutable=["batch_stats"])
            loss_g, _ = compute_loss(cfg_g, consts, *outs, bg, epoch,
                                     "train")
            losses_.append(loss_g)
            if g == 0:
                bs0 = mutated["batch_stats"]
        return jnp.stack(losses_).mean(), bs0

    mean_loss, halves0 = jax.jit(replay)(
        state.params, state.batch_stats, jb, rng, jnp.asarray(0))
    np.testing.assert_allclose(float(stats["loss"]),
                               float(mean_loss), rtol=1e-5)
    ref0 = jax.tree.leaves(halves0)
    got = jax.tree.leaves(new_state.batch_stats)
    assert len(ref0) == len(got) and len(got) > 0
    for a, b in zip(got, ref0):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
    # and differs from the global-batch stats a plain step would produce
    plain = make_train_step(cfg, model, consts, donate=False)
    ns_plain, _ = plain(state, jb, jnp.asarray(0), lr, rng)
    diff = max(jax.tree.leaves(jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()),
        new_state.batch_stats, ns_plain.batch_stats)))
    assert diff > 0


def test_load_variables_tolerant_overlay(tmp_path):
    """Inference-CLI checkpoint restore (demo/infer --ckpt): trainer-format
    payloads with opt_state/epoch extras load, matching leaves overlay,
    shape-mismatched and missing leaves keep their initialized values."""
    from pdfnet_tpu.train import checkpoint as ck

    class S:
        params = {"enc": {"w": np.ones((2, 2), np.float32) * 7,
                          "b": np.ones((3,), np.float32) * 5},
                  "extra_module": {"v": np.ones((4,), np.float32)}}
        batch_stats = {"enc": {"mean": np.full((3,), 2.5, np.float32)}}
        opt_state = {"count": np.asarray(9)}
        step = np.asarray(9)

    p = ck.save_checkpoint(str(tmp_path), S(), 4, keep=1)

    variables = {
        "params": {"enc": {"w": np.zeros((2, 2), np.float32),
                           "b": np.zeros((5,), np.float32)}},  # shape drift
        "batch_stats": {"enc": {"mean": np.zeros((3,), np.float32)}},
    }
    out = ck.load_variables(p, variables)
    np.testing.assert_array_equal(out["params"]["enc"]["w"],
                                  np.ones((2, 2)) * 7)      # overlaid
    np.testing.assert_array_equal(out["params"]["enc"]["b"],
                                  np.zeros((5,)))            # kept (mismatch)
    np.testing.assert_array_equal(out["batch_stats"]["enc"]["mean"],
                                  np.full((3,), 2.5))        # stats overlaid
    assert "extra_module" not in out["params"]               # template-shaped
