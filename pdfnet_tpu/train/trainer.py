"""Epoch-driven trainer: the TPU-native counterpart of SimplifiedTrainer.

Reference: lib/trains/base_trainer.py:81-199 (run_epoch) + main.py:107-143
(epoch loop, LR steps, periodic eval/checkpoint).  Differences by design:
- one jitted step = forward+loss+backward+update (no Python-side loss math);
- data parallelism via GSPMD batch sharding instead of DDP;
- metrics stream through a small host-side logger.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pdfnet_tpu.config import Config
from pdfnet_tpu.models.handnet import HandNet, build_model
from pdfnet_tpu.parallel import mesh as mesh_lib
from pdfnet_tpu.train import checkpoint as ckpt_lib
from pdfnet_tpu.train.loss import load_loss_consts
from pdfnet_tpu.train.metrics import MetricAccumulator
from pdfnet_tpu.train.step import (TrainState, create_train_state, lr_at_epoch,
                                   make_eval_step, make_train_step)


class Logger:
    """Console + JSONL logger (replaces tensorboardX text/scalar logging)."""

    def __init__(self, log_dir: str, cfg: Config):
        os.makedirs(log_dir, exist_ok=True)
        self.dir = log_dir
        with open(os.path.join(log_dir, "opt.txt"), "w") as f:
            for k, v in sorted(vars(cfg).items()):
                f.write(f"{k}: {v}\n")
        self.f = open(os.path.join(log_dir, "log.jsonl"), "a")

    def scalars(self, step: int, scalars: Dict[str, float]):
        rec = {"step": step, "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self.f.write(json.dumps(rec) + "\n")
        self.f.flush()

    def write(self, msg: str):
        print(msg, flush=True)


class Trainer:
    def __init__(self, cfg: Config, model: Optional[HandNet] = None,
                 mesh=None):
        self.cfg = cfg
        self.model = model or build_model(cfg)
        self.consts = load_loss_consts()
        self.mesh = mesh if mesh is not None else mesh_lib.make_mesh(
            cfg.num_devices, cfg.data_axis)
        self.train_step = make_train_step(cfg, self.model, self.consts)
        self.eval_step = make_eval_step(cfg, self.model, self.consts)
        self.state: Optional[TrainState] = None

    def init_state(self, sample_batch: Dict[str, np.ndarray],
                   seed: int = 317) -> TrainState:
        batch = {k: jnp.asarray(v) for k, v in sample_batch.items()
                 if k in ("input", "choose", "cloud", "depth", "ind", "K_new",
                          "valid")}
        self.state = create_train_state(self.cfg, self.model,
                                        jax.random.PRNGKey(seed), batch)
        self.state = mesh_lib.replicate(self.state, self.mesh)
        return self.state

    def run_epoch(self, epoch: int, batches: Iterable[Dict[str, np.ndarray]],
                  logger: Optional[Logger] = None,
                  log_every: int = 10) -> Dict[str, float]:
        lr = jnp.asarray(lr_at_epoch(self.cfg, epoch), jnp.float32)
        ep = jnp.asarray(epoch, jnp.int32)
        # Accumulate stats as device arrays: float() forces a host-device
        # sync per batch and would serialize the async dispatch pipeline.
        # Host transfers happen only every ``log_every`` steps and once at
        # the end of the epoch.
        running = None
        n = 0
        try:
            for i, batch in enumerate(batches):
                batch = mesh_lib.shard_batch(
                    {k: v for k, v in batch.items()}, self.mesh,
                    self.cfg.data_axis)
                rng = jax.random.fold_in(jax.random.PRNGKey(epoch), i)
                self.state, stats = self.train_step(self.state, batch, ep, lr,
                                                    rng)
                n += 1
                running = (stats if running is None else
                           jax.tree.map(jnp.add, running, stats))
                if logger and (i % log_every == 0):
                    logger.scalars(int(self.state.step),
                                   {k: float(v) for k, v in stats.items()})
        finally:
            close = getattr(batches, "close", None)
            if close is not None:
                close()
        if running is None:
            return {}
        host = jax.device_get(running)
        return {k: float(v) / max(n, 1) for k, v in host.items()}

    def evaluate(self, batches: Iterable[Dict[str, np.ndarray]],
                 ) -> MetricAccumulator:
        acc = MetricAccumulator()
        for batch in batches:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            out = self.eval_step(self.state.params, self.state.batch_stats, jb)
            acc.update(jax.tree.map(np.asarray, out), batch)
        return acc

    def save(self, ckpt_dir: str, epoch: int) -> str:
        return ckpt_lib.save_checkpoint(ckpt_dir, jax.device_get(self.state),
                                        epoch)

    def load(self, path: str, resume_optimizer: bool = True) -> int:
        self.state, epoch = ckpt_lib.load_checkpoint(path, jax.device_get(self.state),
                                                     resume_optimizer)
        self.state = mesh_lib.replicate(self.state, self.mesh)
        return epoch


def fit(cfg: Config, train_data, eval_data=None, log_dir: str = "outputs/logs",
        ckpt_dir: str = "outputs/ckpt", eval_every: int = 5,
        save_every: int = 5, max_steps_per_epoch: Optional[int] = None):
    """Full training recipe (scripts/train.sh equivalent)."""
    trainer = Trainer(cfg)
    logger = Logger(log_dir, cfg)
    first = next(iter(train_data.batches(cfg.batch_size, 0)))
    trainer.init_state(first)
    start_epoch = cfg.start_epoch
    if cfg.load_model:
        # checkpoints record the epoch they were saved AFTER; resume at the
        # next one (reference main.py:107 range(start_epoch + 1, ...))
        start_epoch = trainer.load(cfg.load_model) + 1
        logger.write(f"resumed from {cfg.load_model}; "
                     f"continuing at epoch {start_epoch}")

    from pdfnet_tpu.data.prefetch import prefetch

    for epoch in range(start_epoch, cfg.num_epochs):
        t0 = time.time()
        gen = train_data.batches(cfg.batch_size, epoch)
        if max_steps_per_epoch:
            import itertools
            gen = itertools.islice(gen, max_steps_per_epoch)
        means = trainer.run_epoch(epoch, prefetch(gen, depth=2), logger)
        logger.write(f"epoch {epoch}: loss={means.get('loss', float('nan')):.3f} "
                     f"({time.time() - t0:.1f}s, lr={lr_at_epoch(cfg, epoch):.2e})")
        if eval_data is not None and (epoch + 1) % eval_every == 0:
            acc = trainer.evaluate(eval_data.batches(1, 0))
            block = acc.format_block(f"epoch {epoch}")
            logger.write(block)
            with open(os.path.join(log_dir, f"{cfg.dataset}-val.txt"), "a") as f:
                f.write(block)
        if (epoch + 1) % save_every == 0:
            path = trainer.save(ckpt_dir, epoch)
            logger.write(f"saved {path}")
    return trainer
