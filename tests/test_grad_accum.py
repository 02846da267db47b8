"""Gradient accumulation: chunk-scanned gradients == one-shot full batch.

Beyond the reference (no accumulation there): ``Config.grad_accum_steps=N``
makes the train step scan N equal batch chunks against fixed parameters and
apply one Adam update with the mean gradient, bounding peak activation
memory at batch/N rows.  Under frozen BN the accumulated gradient is
mathematically the full-batch gradient for per-sample-mean loss terms
(mean-of-chunk-means == full-batch mean); count-normalized terms (the
--off/wh RegL1 terms, off by default and off here) weight chunks by their
own valid counts — DDP-loss-averaging semantics, noted in config.py.

The gradient claim is asserted DIRECTLY on gradients (test 1) rather than
on post-Adam parameters: Adam's first-step update is ~lr*sign(g), so any
f32 reassociation noise on a near-zero gradient element flips its update to
the opposite +-lr extreme — a parameter comparison would test sign(noise).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _cfg(accum=1):
    from pdfnet_tpu.config import Config
    return Config(default_resolution=64, compute_dtype="float32",
                  sample_num=64, sample_num_level1=32, sample_num_level2=8,
                  knn_k=8, batch_size=8, dropout=0.0, freeze_bn_stats=True,
                  grad_accum_steps=accum)


def _setup():
    from pdfnet_tpu.data.synthetic import make_batch
    from pdfnet_tpu.models import build_model
    from pdfnet_tpu.train.loss import load_loss_consts
    from pdfnet_tpu.train.step import create_train_state

    cfg = _cfg()
    model = build_model(cfg)
    consts = load_loss_consts()
    batch = make_batch(cfg, 8, seed=0)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    state = create_train_state(cfg, model, jax.random.PRNGKey(0), jb)
    return cfg, model, consts, jb, state


def test_accum_gradient_equals_full_batch():
    from pdfnet_tpu.train.loss import compute_loss

    cfg, model, consts, jb, state = _setup()
    ep = jnp.asarray(30)
    rng = jax.random.PRNGKey(1)

    def mean_loss(params, b):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (result, p_dict, hd, other), _ = model.apply(
            variables, b["input"], b["choose"], b["cloud"], b["depth"],
            b["ind"], b["K_new"], b["valid"], train=True,
            rngs={"dropout": rng}, mutable=["batch_stats"])
        loss, _ = compute_loss(cfg, consts, result, p_dict, hd, other, b,
                               ep, mode="train")
        return loss

    grad = jax.jit(jax.grad(mean_loss))
    g_full = grad(state.params, jb)
    halves = [{k: v[:4] for k, v in jb.items()},
              {k: v[4:] for k, v in jb.items()}]
    g0 = grad(state.params, halves[0])
    g1 = grad(state.params, halves[1])
    g_acc = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)

    checked = 0
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(g_full)[0],
            jax.tree_util.tree_flatten_with_path(g_acc)[0]):
        assert pa == pb
        keys = [getattr(k, "key", str(k)) for k in pa]
        if len(keys) >= 2 and keys[-2] == "wk" and keys[-1] == "bias":
            # attention key biases cancel in softmax: the analytic gradient
            # is exactly zero, so the f32 value is pure cancellation noise
            # with batch-layout-dependent magnitude (same exclusion as
            # test_train_parity's drift check)
            continue
        a, b = np.asarray(a), np.asarray(b)
        scale = max(float(np.max(np.abs(a))), 1e-8)
        np.testing.assert_allclose(a, b, atol=1e-5 * scale, rtol=1e-4,
                                   err_msg=str(pa))
        checked += 1
    assert checked > 100


def test_accum_step_matches_one_shot_loss():
    from pdfnet_tpu.train.loss import load_loss_consts
    from pdfnet_tpu.train.step import make_train_step

    _, model, consts, jb, state = _setup()
    lr = jnp.asarray(1e-4, jnp.float32)
    ep = jnp.asarray(30)
    rng = jax.random.PRNGKey(1)

    step1 = make_train_step(_cfg(1), model, consts, donate=False)
    new1, stats1 = step1(state, jb, ep, lr, rng)

    step2 = make_train_step(_cfg(2), model, consts, donate=False)
    new2, stats2 = step2(state, jb, ep, lr, rng)

    # mean-of-chunk-means == full-batch mean (frozen BN, per-sample losses)
    np.testing.assert_allclose(float(stats2["loss"]), float(stats1["loss"]),
                               rtol=1e-6)
    # frozen BN: stats pass through unchanged on both paths
    for a, b in zip(jax.tree.leaves(new1.batch_stats),
                    jax.tree.leaves(new2.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(new2.step) == 1
    # parameters moved by ~+-lr on both paths (Adam step-1 magnitude); the
    # element-wise comparison is intentionally NOT asserted — see module
    # docstring (sign(g) flips under f32 noise for near-zero gradients)
    d = np.asarray(jax.tree.leaves(new2.params)[0]
                   - jax.tree.leaves(state.params)[0])
    assert float(np.max(np.abs(d))) <= 1.01e-4


def test_accum_rejects_bn_groups():
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.train.step import make_train_step

    cfg = Config(grad_accum_steps=2, bn_stat_groups=2)
    with pytest.raises(ValueError, match="mutually exclusive"):
        make_train_step(cfg, model=None, consts=None)
