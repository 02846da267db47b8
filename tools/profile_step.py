"""Capture + summarize a device profile of the inference or train step.

Usage:
  python tools/profile_step.py --what eval --batch 48 --iters 8
  python tools/profile_step.py --what train --batch 8 --iters 8

Writes a jax.profiler trace under --out (TensorBoard/Perfetto compatible)
and prints an aggregate of device time by fused-op name so hot spots are
visible without a UI.
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def trace_summary(trace_dir: str, top: int = 35):
    """Aggregate complete events from the chrome trace by op name."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        print("no trace.json.gz found under", trace_dir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find TPU device track pids (exclude host python threads)
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "/device" in n.lower() or "XLA" in n}
    tot = defaultdict(float)
    cnt = defaultdict(int)
    total_dev = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))
        tot[name] += dur
        cnt[name] += 1
        total_dev += dur
    print(f"\n=== device op time (us) over the traced window "
          f"({len(paths)} dump(s)); total {total_dev:.0f} us ===")
    for name, dur in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
        print(f"{dur:12.0f}  {100 * dur / max(total_dev, 1e-9):5.1f}%  "
              f"x{cnt[name]:<5d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="eval",
                    choices=["eval", "train", "infer"])
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--out", default="/tmp/prof_tpu")
    ap.add_argument("--fused_trunk", default=None,
                    action=argparse.BooleanOptionalAction,
                    help="override Config.fused_trunk (--no-fused_trunk "
                         "forces it off; unset = Config default)")
    ap.add_argument("--summarize_only", action="store_true")
    args = ap.parse_args()

    if args.summarize_only:
        trace_summary(args.out)
        return
    if os.path.isdir(args.out):
        shutil.rmtree(args.out)

    import jax
    from pdfnet_tpu.utils.cache import host_cache_dir
    jax.config.update("jax_compilation_cache_dir", host_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.models import build_model
    from pdfnet_tpu.train.loss import load_loss_consts
    from pdfnet_tpu.train.step import (create_train_state, lr_at_epoch,
                                       make_eval_step, make_train_step)

    cfg = Config(default_resolution=args.res, batch_size=args.batch,
                 compute_dtype="bfloat16")
    if args.fused_trunk is not None:
        cfg = cfg.replace(fused_trunk=args.fused_trunk)
    model = build_model(cfg)
    consts = load_loss_consts()

    rng = np.random.RandomState(0)
    B, res, n = args.batch, args.res, cfg.sample_num
    batch = {
        "input": rng.randn(B, res, res, 3).astype(np.float32),
        "choose": rng.randint(0, res * res, (B, 2, n)).astype(np.int32),
        "cloud": rng.uniform(-0.1, 0.1, (B, 2, n, 3)).astype(np.float32),
        "depth": rng.uniform(0.3, 0.8, (B, res, res)).astype(np.float32),
        "K_new": np.tile(np.array([[[480.0, 0, res / 2], [0, 480.0, res / 2],
                                    [0, 0, 1]]], np.float32), (B, 1, 1)),
        "valid": np.ones((B, 2), np.float32),
        "lms_left_gt": np.zeros((B, 21, 2), np.float32),
        "lms_right_gt": np.zeros((B, 21, 2), np.float32),
    }
    if args.what == "train":
        from pdfnet_tpu.data.synthetic import make_batch
        batch = make_batch(cfg, B, seed=0)

    init_model = build_model(cfg.replace(knn_method="topk",
                                         gather_method="take"))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        ib = {k: v[:1] for k, v in batch.items()}
        variables = init_model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            ib["input"], ib["choose"], ib["cloud"], ib["depth"],
            ib.get("ind"), ib["K_new"], ib["valid"], train=False)
    dev = jax.devices()[0]

    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    if args.what == "infer":
        # self-contained RGB-D serving path (single trunk pass, predicted
        # centers/masks, clouds built in-graph — models/handnet.infer_rgbd)
        from pdfnet_tpu.models.handnet import infer_rgbd
        variables = jax.device_put(variables, dev)
        prng = jax.random.PRNGKey(0)

        @jax.jit
        def fn(v, inp, depth, K, val):
            result, params, hand_dicts, other = infer_rgbd(
                model, v, inp, depth, K, val, prng)
            return (result["verts3d"]["left"], result["verts3d"]["right"],
                    params["root"]["left"], params["root"]["right"],
                    other["ind"])

        run = lambda: fn(variables, jb["input"], jb["depth"], jb["K_new"],
                         jb["valid"])
    elif args.what == "eval":
        variables = jax.device_put(variables, dev)
        fn = make_eval_step(cfg, model, consts)
        run = lambda: fn(variables["params"],
                         variables.get("batch_stats", {}), jb)
    else:
        state = create_train_state(cfg, model, jax.random.PRNGKey(0),
                                   {k: jnp.asarray(v[:1]) for k, v in
                                    batch.items()})
        state = jax.device_put(state, dev)
        step = make_train_step(cfg, model, consts, donate=False)
        lr = jnp.asarray(lr_at_epoch(cfg, 0), jnp.float32)
        r = jax.random.PRNGKey(1)
        def run():
            nonlocal state
            state, stats = step(state, jb, jnp.asarray(0), lr, r)
            return stats

    for _ in range(3):
        out = run()
    jax.block_until_ready(out)

    with jax.profiler.trace(args.out):
        for _ in range(args.iters):
            out = run()
        jax.block_until_ready(out)
    print("trace written to", args.out)
    trace_summary(args.out)


if __name__ == "__main__":
    main()
