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
import dataclasses
import os
import time

_CHOICES = {
    "arch": ["resnet50", "csp_50", "csp_18"],
    "mode": ["train", "val", "test"],
    "sample_strategy": ["random", "FPS"],
    "knn_method": ["topk", "approx", "pallas", "pallas_fused", "pallas_sa"],
    "gather_method": ["take", "onehot"],
    "compute_dtype": ["bfloat16", "float32"],
    "optimizer": ["Adam"],
}

_HELP = {
    "arch": "resnet50 = flagship HandNet; csp_* = the legacy MANO-theta "
            "regression detector (train-only)",
    "eval_batch_size": "eval loader batch (default batched: proven exact "
                       "via tail pad_mask and ~10x faster; set 1 for a "
                       "reference-identical loop)",
    "bn_stat_groups": "G>1: emulate G DDP replicas exactly — each group "
                      "computes BatchNorm statistics over batch/G rows (the "
                      "reference's multi-GPU semantics); 0/1 = global-batch "
                      "(synced) BN",
    "patch_heads": "evaluate non-hm CenterNet heads only at the two hand "
                   "centers (exact, big FLOP cut for wh/params/texture/light "
                   "consumers)",
    "profile_dir": "capture a jax.profiler device trace window here (view "
                   "in TensorBoard/Perfetto)",
    "image_summary": "write input|pred|gt render grids every "
                     "image_summary_every steps",
    "input_feature_num": "3 = xyz point clouds, 6 = xyz+surface normals",
    "photometric_loss": "differentiable-render photometric/silhouette loss "
                        "terms (+texture/light heads)",
    "off": "train the off_hm/off_lms sub-pixel offset heads",
    "freeze_bn_stats": "BatchNorm uses running statistics even in training "
                       "(frozen-BN fine-tuning)",
    "skip_nonfinite_updates": "skip parameter updates when the loss is "
                              "non-finite (in-graph guard)",
    "sample_deterministic": "self-contained RGB-D path samples the first N "
                            "in-band pixels instead of a random subset "
                            "(reproducible serving)",
}


def _tuple_arg(elem):
    def parse(s):
        s = s.strip()
        return tuple(elem(t) for t in s.split(",")) if s else ()
    return parse


def build_argparser() -> argparse.ArgumentParser:
    """Every behavior-bearing ``Config`` field is reachable here: the parser
    is generated from the dataclass (the reference exposes its full ~90-flag
    surface through lib/opts.py:241-282; booleans get --x/--no-x pairs so
    default-on flags like --reproj_loss can actually be disabled)."""
    from pdfnet_tpu.config import Config

    ap = argparse.ArgumentParser()
    for f in dataclasses.fields(Config):
        name, kw = f"--{f.name}", {"help": _HELP.get(f.name)}
        if f.name in _CHOICES:
            kw["choices"] = _CHOICES[f.name]
        ftype = str(f.type)
        if ftype == "bool":
            ap.add_argument(name, action=argparse.BooleanOptionalAction,
                            default=f.default, help=kw["help"])
        elif ftype == "int":
            ap.add_argument(name, type=int, default=f.default, **kw)
        elif ftype == "float":
            ap.add_argument(name, type=float, default=f.default, **kw)
        elif ftype == "str":
            ap.add_argument(name, default=f.default, **kw)
        elif "Tuple[int" in ftype:
            ap.add_argument(name, type=_tuple_arg(int), default=f.default,
                            metavar="N,N,...", **kw)
        elif "Tuple[float" in ftype:
            ap.add_argument(name, type=_tuple_arg(float), default=f.default,
                            metavar="X,X,...", **kw)
        else:                                  # pragma: no cover
            raise TypeError(f"unhandled Config field type {f.type!r} "
                            f"for {f.name}")

    # CLI-only flags (not Config fields)
    ap.add_argument("--depth", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="RGB-D input (the published PDFNet recipe; "
                         "--no-depth is rejected — RGB-only records are "
                         "handled per-dataset with zero-padded clouds)")
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
    ap.add_argument("--eval_every", type=int, default=5,
                    help="run eval every N epochs while training "
                         "(reference main.py:115)")
    ap.add_argument("--save_every", type=int, default=5,
                    help="checkpoint every N epochs (reference main.py:123)")
    ap.add_argument("--vis_every", type=int, default=0,
                    help="eval-loop visual dumps (overlay/skeleton/.obj) "
                         "every N samples, as the reference does every 500")
    return ap


def config_from_args(args):
    """Round-trip the parsed namespace into a ``Config`` (all fields)."""
    from pdfnet_tpu.config import Config
    return Config(**{f.name: getattr(args, f.name)
                     for f in dataclasses.fields(Config)})


def main(argv=None):
    args = build_argparser().parse_args(argv)
    if not args.depth:
        raise SystemExit(
            "--no-depth: the published PDFNet model is RGB-D; RGB-only "
            "records (FreiHAND) are handled per-dataset with zero-padded "
            "clouds instead of an RGB-only architecture")

    import jax

    from pdfnet_tpu.utils.cache import setup_cli_cache
    setup_cli_cache(args.cpu)

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

    from pdfnet_tpu.train.trainer import Trainer, Logger, fit

    cfg = config_from_args(args)

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
            eval_every=args.eval_every, save_every=args.save_every,
            max_steps_per_epoch=args.steps or None)
    else:
        trainer = Trainer(cfg)
        first = next(iter(eval_data.batches(1, 0)))
        trainer.init_state(first)
        if cfg.load_model:
            trainer.load(cfg.load_model, resume_optimizer=False)
        # the H2O submission is exact at ANY eval batch: id/frame_num ride
        # the padded batched loader and pad rows are masked out (the
        # reference forces bs=1 for it, base_trainer.py:486)
        eb = cfg.eval_batch_size
        # striped over processes (1/N of the split each), partial sums and
        # submission rows merged cross-process; process 0 writes the files
        acc = trainer.evaluate(
            eval_data.batches(eb, 0, process_index=jax.process_index(),
                              process_count=jax.process_count()),
            vis_every=args.vis_every if jax.process_index() == 0 else 0,
            vis_dir=os.path.join(cfg.output_path, "imgs"))
        acc.all_reduce()
        if jax.process_index() == 0:
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
