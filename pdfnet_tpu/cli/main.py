"""Train / val / test CLI (main.py + scripts/train.sh equivalent).

Usage:
  python -m pdfnet_tpu.cli.main --mode train --dataset H2O --batch_size 8 \
      --default_resolution 384 --num_epochs 80
  python -m pdfnet_tpu.cli.main --mode test --load_model outputs/ckpt/model_56
  python -m pdfnet_tpu.cli.main --mode train --synthetic --steps 5  # smoke

Data parallelism: runs over every visible TPU device automatically (GSPMD
batch sharding); no torch.distributed.launch equivalent is needed.
"""

from __future__ import annotations

import argparse
import os
import time


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="interact")
    ap.add_argument("--arch", default="resnet50",
                    choices=["resnet50", "csp_50", "csp_18"],
                    help="resnet50 = flagship HandNet; csp_* = the legacy "
                         "MANO-theta regression detector (train-only)")
    ap.add_argument("--mode", default="train", choices=["train", "val", "test"])
    ap.add_argument("--dataset", default="H2O")
    ap.add_argument("--exp_id", default="default")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--eval_batch_size", type=int, default=1,
                    help="eval loader batch (reference always uses 1; "
                         "larger batches the eval forward for a big "
                         "speedup; the H2O submission path needs 1)")
    ap.add_argument("--default_resolution", type=int, default=384)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--lr_step", default="30")
    ap.add_argument("--num_epochs", type=int, default=80)
    ap.add_argument("--start_epoch", type=int, default=0)
    ap.add_argument("--load_model", default="")
    ap.add_argument("--output_path", default="outputs")
    ap.add_argument("--seed", type=int, default=317)
    ap.add_argument("--depth", action="store_true", default=True)
    ap.add_argument("--reproj_loss", action="store_true", default=True)
    ap.add_argument("--bone_loss", action="store_true", default=True)
    ap.add_argument("--brightness", action="store_true", default=True)
    ap.add_argument("--avg_center", action="store_true", default=True)
    ap.add_argument("--sample_strategy", default="random",
                    choices=["random", "FPS"])
    ap.add_argument("--cache_path", default="data")
    ap.add_argument("--pre_fix", default="data")
    ap.add_argument("--synthetic", action="store_true",
                    help="use the synthetic dataset (no H2O caches needed)")
    ap.add_argument("--steps", type=int, default=0,
                    help="cap steps per epoch (smoke runs)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--coordinator", default="",
                    help="multi-host: coordinator host:port (auto-detected "
                         "on TPU pods; explicit for CPU simulation)")
    ap.add_argument("--num_processes", type=int, default=0)
    ap.add_argument("--process_id", type=int, default=-1)
    ap.add_argument("--replicate_reference_quirks", action="store_true")
    ap.add_argument("--bn_stat_groups", type=int, default=0,
                    help="G>1: emulate G DDP replicas exactly — each group "
                         "computes BatchNorm statistics over batch/G rows "
                         "(the reference's multi-GPU semantics); 0/1 = "
                         "global-batch (synced) BN")
    ap.add_argument("--patch_heads", action="store_true",
                    help="evaluate non-hm CenterNet heads only at the two "
                         "hand centers (exact, big FLOP cut for wh/params/"
                         "texture/light consumers)")
    ap.add_argument("--profile_dir", default="",
                    help="capture a jax.profiler device trace window here "
                         "(view in TensorBoard/Perfetto)")
    ap.add_argument("--image_summary", action="store_true",
                    help="write input|pred|gt render grids every 500 steps")
    ap.add_argument("--vis_every", type=int, default=0,
                    help="eval-loop visual dumps (overlay/skeleton/.obj) "
                         "every N samples, as the reference does every 500")
    return ap


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    cache = "/tmp/jax_cache_cpu" if args.cpu else "/tmp/jax_cache"
    jax.config.update("jax_compilation_cache_dir", cache)

    # multi-host rendezvous (the torch.distributed.launch + NCCL init role,
    # reference main.py:69-75); no-op on a single host
    from pdfnet_tpu.parallel import mesh as mesh_lib
    multihost = mesh_lib.maybe_initialize_distributed(
        coordinator=args.coordinator or None,
        num_processes=args.num_processes or None,
        process_id=args.process_id if args.process_id >= 0 else None)
    if multihost:
        print(f"multi-host: process {jax.process_index()} of "
              f"{jax.process_count()}, {jax.local_device_count()} local / "
              f"{jax.device_count()} global devices")

    from pdfnet_tpu.config import Config
    from pdfnet_tpu.train.trainer import Trainer, Logger, fit

    cfg = Config(
        task=args.task, arch=args.arch, mode=args.mode, dataset=args.dataset,
        exp_id=args.exp_id, batch_size=args.batch_size,
        eval_batch_size=args.eval_batch_size,
        default_resolution=args.default_resolution, lr=args.lr,
        lr_step=tuple(int(s) for s in args.lr_step.split(",")),
        num_epochs=args.num_epochs, start_epoch=args.start_epoch,
        load_model=args.load_model, output_path=args.output_path,
        seed=args.seed, sample_strategy=args.sample_strategy,
        cache_path=args.cache_path, pre_fix=args.pre_fix,
        replicate_reference_quirks=args.replicate_reference_quirks,
        bn_stat_groups=args.bn_stat_groups,
        patch_heads=args.patch_heads,
        profile_dir=args.profile_dir,
        image_summary=args.image_summary,
    )

    if args.synthetic:
        from pdfnet_tpu.data.synthetic import SyntheticHandDataset
        train_data = SyntheticHandDataset(cfg, size=max(64, cfg.batch_size * 8))
        eval_data = SyntheticHandDataset(cfg, size=8, seed=1)
    else:
        from pdfnet_tpu.data.h2o import H2ODataset
        split = "train" if args.mode == "train" else args.mode
        if args.mode == "train":
            train_data = H2ODataset(cfg, "train")
            eval_data = H2ODataset(cfg, "test")
        else:
            train_data = None
            eval_data = H2ODataset(cfg, split)

    log_dir = os.path.join(cfg.output_path, "logs", cfg.task, cfg.exp_id,
                           time.strftime("logs_%Y-%m-%d-%H-%M"))
    ckpt_dir = os.path.join(cfg.output_path, "ckpt", cfg.exp_id)

    if args.mode == "train":
        fit(cfg, train_data, eval_data, log_dir=log_dir, ckpt_dir=ckpt_dir,
            max_steps_per_epoch=args.steps or None)
    else:
        trainer = Trainer(cfg)
        first = next(iter(eval_data.batches(1, 0)))
        trainer.init_state(first)
        if cfg.load_model:
            trainer.load(cfg.load_model, resume_optimizer=False)
        # the H2O challenge submission needs every frame: force bs=1 there
        # (the reference also only writes it at bs=1, base_trainer.py:486)
        eb = 1 if args.mode == "test" else cfg.eval_batch_size
        acc = trainer.evaluate(
            eval_data.batches(eb, 0), vis_every=args.vis_every,
            vis_dir=os.path.join(cfg.output_path, "imgs"))
        block = acc.format_block(cfg.exp_id)
        print(block)
        os.makedirs(cfg.output_path, exist_ok=True)
        with open(os.path.join(cfg.output_path,
                               f"{cfg.dataset}-val.txt"), "a") as f:
            f.write(block)
        if args.mode == "test":
            acc.write_h2o_submission(
                os.path.join(cfg.output_path, "hand_poses.json"))


if __name__ == "__main__":
    main()
