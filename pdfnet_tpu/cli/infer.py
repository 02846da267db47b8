"""Batched serving CLI: stream RGB-D pairs through the model at full chip
throughput.

The reference only ships a batch-1 demo (demo.py); this is the production
counterpart: directory of ``color/*.png`` + ``depth/*.png`` pairs ->
fixed-size batches -> the self-contained RGB-D inference path (predicted
centers/masks/clouds, demo.py semantics) -> per-frame predictions
(absolute + root-relative joints/verts, 2D landmarks) written as one
``predictions.npz`` (+ optional per-frame JSON in the H2O challenge 126-float
layout, base_trainer.py:328-335).

Host preprocessing (cv2 warps) overlaps device compute via a double-buffered
prefetch thread; the final partial batch is padded and the padding results
dropped.

Usage:
  python -m pdfnet_tpu.cli.infer --input assets/H2O --ckpt outputs/ckpt/model_X \
      --batch 48 --out outputs/preds
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import queue
import threading
import time

import cv2
import numpy as np

from pdfnet_tpu.cli.demo import demo_intrinsics, load_rgbd


def _preprocess(img_file: str, res: int, mean, std, K: np.ndarray):
    from pdfnet_tpu.data import augment as aug
    image, depth = load_rgbd(img_file)
    H, W = image.shape[:2]
    c = np.array([W / 2.0, H / 2.0], np.float32)
    trans, _ = aug.get_affine_transform(c, max(H, W) * 1.0, 0, (res, res))
    K_img = aug.update_intrinsics(K, trans)
    img_c = cv2.warpAffine(image, trans, (res, res), flags=cv2.INTER_LINEAR)
    depth_c = cv2.warpAffine(depth, trans, (res, res),
                             flags=cv2.INTER_NEAREST)
    inp = (img_c.astype(np.float32) / 255.0 - mean) / std
    return inp, depth_c.astype(np.float32), K_img


def _batches(files, batch, res, mean, std, K, workers: int = 8):
    """Double-buffered host pipeline: preprocess batch i+1 while the device
    runs batch i.  The tail batch is padded up to ``batch`` (``n`` marks the
    real sample count)."""
    from concurrent.futures import ThreadPoolExecutor

    pool = ThreadPoolExecutor(workers)
    q: "queue.Queue" = queue.Queue(maxsize=2)

    def produce():
        for i in range(0, len(files), batch):
            chunk = files[i:i + batch]
            outs = list(pool.map(
                lambda f: _preprocess(f, res, mean, std, K), chunk))
            n = len(outs)
            while len(outs) < batch:        # pad the tail batch
                outs.append(outs[-1])
            q.put((chunk, n,
                   np.stack([o[0] for o in outs]),
                   np.stack([o[1] for o in outs]),
                   np.stack([o[2] for o in outs])))
        q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
    pool.shutdown(wait=False)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/reference/assets/H2O")
    ap.add_argument("--ckpt", default="")
    ap.add_argument("--out", default="outputs/preds")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--json", action="store_true",
                    help="also write per-frame H2O challenge 126-float json")
    ap.add_argument("--sample_num", type=int, default=1024)
    ap.add_argument("--sample_num_level1", type=int, default=512)
    ap.add_argument("--sample_num_level2", type=int, default=128)
    ap.add_argument("--knn_k", type=int, default=64)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args(argv)

    import jax

    from pdfnet_tpu.utils.cache import setup_cli_cache
    setup_cli_cache(args.cpu)
    import jax.numpy as jnp

    from pdfnet_tpu.config import Config
    from pdfnet_tpu.models import build_model
    from pdfnet_tpu.models.handnet import infer_rgbd
    from pdfnet_tpu.train.loss import eval_outputs, load_loss_consts

    cfg = Config(default_resolution=args.res, batch_size=args.batch,
                 mode="test", sample_num=args.sample_num,
                 sample_num_level1=args.sample_num_level1,
                 sample_num_level2=args.sample_num_level2, knn_k=args.knn_k)
    model = build_model(cfg)
    consts = load_loss_consts()

    files = sorted(glob.glob(os.path.join(args.input, "color", "*.png")))
    if args.limit:
        files = files[:args.limit]
    if not files:
        raise SystemExit(f"no color/*.png under {args.input}")

    B, res = args.batch, args.res
    rng = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        np.zeros((1, res, res, 3), np.float32),
        np.zeros((1, 2, cfg.sample_num), np.int32),
        np.zeros((1, 2, cfg.sample_num, 3), np.float32),
        np.zeros((1, res, res), np.float32),
        np.zeros((1, 2), np.int32), np.eye(3, dtype=np.float32)[None],
        np.ones((1, 2), np.float32), train=False)
    if args.ckpt:
        from pdfnet_tpu.train.checkpoint import load_variables
        variables = load_variables(args.ckpt, variables)
        print(f"loaded checkpoint {args.ckpt}")

    # params must be jit ARGUMENTS, not closure constants: closed-over
    # arrays are inlined into the compile payload (huge / HTTP 413 on
    # remote-compile setups)
    @jax.jit
    def run(variables, inp, depth, K):
        result, params, hand_dicts, other = infer_rgbd(
            model, variables, inp, depth, K, jnp.ones((B, 2), jnp.float32),
            rng, num_points=cfg.sample_num)
        out = eval_outputs(cfg, consts, result, params, hand_dicts, other,
                           {"K_new": K})
        return {k: out[k] for k in ("verts_pred", "joints_pred",
                                    "joints_pred_off", "lms21_pred")}

    mean = np.asarray(cfg.mean, np.float32)
    std = np.asarray(cfg.std, np.float32)
    K = demo_intrinsics()

    names, joints, joints_off, verts, lms = [], [], [], [], []
    t0 = time.perf_counter()
    t_steady = None                   # set after batch 1 (excludes compile)
    done = done_steady = 0
    for chunk, n, inp, depth, K_img in _batches(files, B, res, mean, std, K):
        out = jax.tree.map(np.asarray,
                           run(variables, jnp.asarray(inp),
                               jnp.asarray(depth), jnp.asarray(K_img)))
        names += [os.path.basename(f)[:-4] for f in chunk]
        joints.append(out["joints_pred"][:n])
        joints_off.append(out["joints_pred_off"][:n])
        verts.append(out["verts_pred"][:n])
        lms.append(out["lms21_pred"][:n])
        done += n
        if t_steady is None:
            t_steady, done_steady = time.perf_counter(), done
        print(f"\r{done}/{len(files)}", end="", flush=True)
    dt = time.perf_counter() - t0
    print(f"\n{done} frames in {dt:.2f}s (incl. first-run compile)")
    if done > done_steady:
        ds = time.perf_counter() - t_steady
        print(f"steady-state: {(done - done_steady) / ds:.1f} fps "
              f"(host preprocessing included)")

    os.makedirs(args.out, exist_ok=True)
    joints = np.concatenate(joints)
    np.savez(os.path.join(args.out, "predictions.npz"),
             names=np.asarray(names), joints_abs=joints,
             joints_rel=np.concatenate(joints_off),
             verts_abs=np.concatenate(verts), lms2d=np.concatenate(lms))
    if args.json:
        # H2O challenge layout: 126 floats = (left 21x3, right 21x3) flat
        sub = {nm: joints[i].reshape(-1).tolist()
               for i, nm in enumerate(names)}
        with open(os.path.join(args.out, "hand_poses.json"), "w") as f:
            json.dump(sub, f)
    print(f"wrote {args.out}/predictions.npz"
          + (" + hand_poses.json" if args.json else ""))


if __name__ == "__main__":
    main()
