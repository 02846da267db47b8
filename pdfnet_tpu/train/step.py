"""Jitted train / eval steps over a data-parallel mesh.

One compiled function is the whole per-batch hot path: forward, the full
multi-term loss, backward, Adam update, BatchNorm stat update.  Under GSPMD
the batch axis is sharded across the mesh and XLA inserts the gradient
all-reduce over ICI — the TPU-native replacement for DDP.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import optax

from pdfnet_tpu.config import Config
from pdfnet_tpu.models.handnet import HandNet
from pdfnet_tpu.parallel import mesh as mesh_lib
from pdfnet_tpu.train.loss import LossConsts, compute_loss, eval_outputs


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def lr_at_epoch(cfg: Config, epoch: int) -> float:
    """Step-decay schedule: x0.1 at each lr_step boundary (main.py:137-143)."""
    lr = cfg.lr
    for s in cfg.lr_step:
        if epoch >= s:
            lr *= 0.1
    return lr


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)


def create_train_state(cfg: Config, model: HandNet, rng: jax.Array,
                       sample_batch: Dict[str, Any]) -> TrainState:
    p_rng, d_rng = jax.random.split(rng)
    variables = model.init(
        {"params": p_rng, "dropout": d_rng},
        sample_batch["input"], sample_batch["choose"], sample_batch["cloud"],
        sample_batch["depth"], sample_batch["ind"], sample_batch["K_new"],
        sample_batch["valid"], train=False)
    tx = make_optimizer(cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(cfg: Config, model: HandNet, consts: LossConsts,
                    donate: bool = True, state_sharding=None):
    """``state_sharding`` (optional): a TrainState-shaped pytree of
    NamedShardings pinning the OUTPUT state's layout — e.g.
    ``parallel.mesh.zero1_state_shardings`` for ZeRO-1-style optimizer-state
    sharding over the data axis (Adam moments sharded, params/BN replicated;
    GSPMD inserts the update all-gathers).  Without it XLA is free to pick,
    which can silently re-replicate a sharded optimizer state after one
    step."""
    tx = make_optimizer(cfg)

    groups = max(int(getattr(cfg, "bn_stat_groups", 0) or 0), 0)

    accum = max(int(getattr(cfg, "grad_accum_steps", 1) or 1), 1)
    if accum > 1 and groups > 1:
        raise ValueError("grad_accum_steps and bn_stat_groups are mutually "
                         "exclusive (both re-slice the batch axis)")

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   epoch: jax.Array, lr: jax.Array, rng: jax.Array):
        def fwd_loss(params, bn_stats, batch_g, rng_g):
            variables = {"params": params, "batch_stats": bn_stats}
            (result, p_dict, hand_dicts, other), mutated = model.apply(
                variables, batch_g["input"], batch_g["choose"],
                batch_g["cloud"], batch_g["depth"], batch_g["ind"],
                batch_g["K_new"], batch_g["valid"],
                train=True, rngs={"dropout": rng_g}, mutable=["batch_stats"])
            loss, stats = compute_loss(cfg, consts, result, p_dict,
                                       hand_dicts, other, batch_g, epoch,
                                       mode="train")
            return loss, (stats, mutated["batch_stats"])

        def loss_fn(params):
            if groups <= 1:
                return fwd_loss(params, state.batch_stats, batch, rng)
            # Per-replica BN emulation (Config.bn_stat_groups): vmap the
            # forward+loss over G equal batch slices.  Each slice's
            # BatchNorms see only batch/G rows — exactly G DDP workers
            # (reference main.py:69-79) — params are broadcast, the G mean
            # losses average to DDP's all-reduced gradient objective, and
            # group 0's running stats are kept (the rank-0 checkpoint).
            B = batch["input"].shape[0]
            if B % groups:
                raise ValueError(f"batch {B} not divisible by "
                                 f"bn_stat_groups={groups}")
            per_sample = lambda x: getattr(x, "ndim", 0) >= 1 and x.shape[0] == B
            gb = {k: v.reshape((groups, B // groups) + v.shape[1:])
                  for k, v in batch.items() if per_sample(v)}
            fixed = {k: v for k, v in batch.items() if not per_sample(v)}
            losses, (stats, bs) = jax.vmap(
                lambda b, r: fwd_loss(params, state.batch_stats,
                                      {**b, **fixed}, r))(
                    gb, jax.random.split(rng, groups))
            stats = jax.tree.map(lambda x: x.mean(0), stats)
            new_bs = jax.tree.map(lambda x: x[0], bs)
            return losses.mean(), (stats, new_bs)

        def grads_with_accum(params):
            # Gradient accumulation (Config.grad_accum_steps, beyond the
            # reference): scan over equal batch chunks, summing gradients
            # against FIXED params — peak activation memory scales with
            # batch/accum while the optimizer sees the mean-of-chunk
            # gradients.  With frozen BN this equals the one-shot
            # full-batch gradient for per-sample-mean loss terms
            # (mean-of-chunk-means == full mean, tests/test_grad_accum.py);
            # count-normalized terms (reg_l1_loss's sum/valid_count on the
            # --off/wh heads) divide by each chunk's own count, so unequal
            # valid counts across chunks reweight those terms slightly —
            # the same semantics as loss-averaging DDP workers.  With live
            # BN each chunk normalizes with the running stats carried from
            # the previous chunk (sequential mini-forwards — accum momentum
            # applications per step, documented semantics).
            B = batch["input"].shape[0]
            if B % accum:
                raise ValueError(f"batch {B} not divisible by "
                                 f"grad_accum_steps={accum}")
            chunk = B // accum
            per_sample = lambda x: (getattr(x, "ndim", 0) >= 1
                                    and x.shape[0] == B)
            cb = {k: v.reshape((accum, chunk) + v.shape[1:])
                  for k, v in batch.items() if per_sample(v)}
            fixed = {k: v for k, v in batch.items() if not per_sample(v)}
            rngs = jax.random.split(rng, accum)

            def body(carry, inp):
                bn_stats, gacc = carry
                b_i, rng_i = inp
                g, (stats_i, new_bn) = jax.grad(
                    lambda p: fwd_loss(p, bn_stats, {**b_i, **fixed}, rng_i),
                    has_aux=True)(params)
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (new_bn, gacc), stats_i

            zero = jax.tree.map(jnp.zeros_like, params)
            (new_bn, gsum), stats_seq = jax.lax.scan(
                body, (state.batch_stats, zero), (cb, rngs))
            grads = jax.tree.map(lambda g: g / accum, gsum)
            stats = jax.tree.map(lambda x: x.mean(0), stats_seq)
            return grads, stats, new_bn

        if accum > 1:
            grads, stats, new_bs = grads_with_accum(state.params)
        else:
            grads, (stats, new_bs) = jax.grad(loss_fn,
                                              has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        if cfg.skip_nonfinite_updates:
            # guard evaluated on-device: a NaN/Inf batch leaves params,
            # optimizer state, and BN stats untouched (the step counter
            # still advances; stats report the skip)
            ok = jnp.isfinite(stats["loss"])
            keep = lambda new, old: jax.tree.map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            new_params = keep(new_params, state.params)
            new_opt = keep(new_opt, opt_state)
            new_bs = keep(new_bs, state.batch_stats)
            stats = dict(stats)
            stats["skipped_nonfinite"] = (~ok).astype(jnp.float32)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, stats

    donate_argnums = (0,) if donate else ()
    if state_sharding is not None:
        return jax.jit(train_step, donate_argnums=donate_argnums,
                       out_shardings=(state_sharding, None))
    return jax.jit(train_step, donate_argnums=donate_argnums)


def make_eval_step(cfg: Config, model: HandNet, consts: LossConsts):
    def eval_step(params, batch_stats, batch: Dict[str, jax.Array]):
        variables = {"params": params, "batch_stats": batch_stats}
        result, p_dict, hand_dicts, other = model.apply(
            variables, batch["input"], batch["choose"], batch["cloud"],
            batch["depth"], None, batch["K_new"], batch["valid"],
            train=False)
        return eval_outputs(cfg, consts, result, p_dict, hand_dicts, other,
                            batch)

    return jax.jit(eval_step)


def make_infer_step(cfg: Config, model: HandNet, consts: LossConsts):
    """Inference on RGB + cloud inputs: returns eval tensors without GT."""
    return make_eval_step(cfg, model, consts)


def create_csp_train_state(cfg: Config, model, rng: jax.Array,
                           sample_batch: Dict[str, Any]) -> TrainState:
    """Init state for the CSP alternate detector (img + depth inputs)."""
    variables = model.init({"params": rng}, sample_batch["input"],
                           sample_batch["depth"], True)
    tx = make_optimizer(cfg)
    return TrainState(
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
        step=jnp.zeros((), jnp.int32),
    )


def make_csp_train_step(cfg: Config, model, consts, donate: bool = True):
    """Jitted train step for the CSP path: forward + csp_loss (center focal
    + iterative MANO-theta regression terms) + backward + Adam + BN."""
    from pdfnet_tpu.train.mano_branch import csp_loss

    tx = make_optimizer(cfg)

    def train_step(state: TrainState, batch: Dict[str, jax.Array],
                   epoch: jax.Array, lr: jax.Array, rng: jax.Array):
        del rng                          # no dropout on csp

        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            ret, mutated = model.apply(variables, batch["input"],
                                       batch["depth"], True,
                                       mutable=["batch_stats"])
            # epoch drives the origforward alpha gate (quirks path only)
            loss, stats = csp_loss(cfg, consts, ret, batch, epoch)
            return loss, (stats, mutated["batch_stats"])

        grads, (stats, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, new_opt = tx.update(grads, opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params=new_params, batch_stats=new_bs,
                               opt_state=new_opt, step=state.step + 1)
        return new_state, stats

    donate_argnums = (0,) if donate else ()
    return jax.jit(train_step, donate_argnums=donate_argnums)
