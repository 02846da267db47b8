"""Throughput benchmark: batched RGB-D inference frames/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the driver north-star of 500 RGB-D frames/sec/chip on v5e
(the reference publishes no throughput numbers).
"""

import argparse
import json
import time

import numpy as np

BASELINE_FPS = 500.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--res", type=int, default=384)
    ap.add_argument("--knn", default="pallas_sa",
                    choices=["topk", "approx", "pallas", "pallas_fused",
                             "pallas_sa"])
    ap.add_argument("--fused_trunk", default=False,
                    action=argparse.BooleanOptionalAction,
                    help="Pallas fused resnet blocks at eval")
    ap.add_argument("--s2d_stem", default=False,
                    action=argparse.BooleanOptionalAction,
                    help="stem conv via space-to-depth (exact)")
    ap.add_argument("--self_contained", action="store_true",
                    help="bench the single-pass RGB-D serving path "
                         "(infer_rgbd: no host clouds, mask->cloud in-graph)")
    ap.add_argument("--train", action="store_true",
                    help="bench the fused train step (samples/s)")
    ap.add_argument("--train_batch", type=int, default=8)
    args = ap.parse_args()

    import jax
    from pdfnet_tpu.utils.cache import host_cache_dir
    jax.config.update("jax_compilation_cache_dir", host_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.models import build_model
    from pdfnet_tpu.train.loss import load_loss_consts
    from pdfnet_tpu.train.step import make_eval_step

    cfg = Config(default_resolution=args.res, batch_size=args.batch,
                 compute_dtype="bfloat16", knn_method=args.knn,
                 fused_trunk=args.fused_trunk, s2d_stem=args.s2d_stem)
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

    # Initialize on CPU (fast local compile), then ship params to the chip.
    # The init model uses the top_k knn path (Pallas can't lower on CPU);
    # the parameter tree is identical.
    init_model = build_model(cfg.replace(knn_method="topk",
                                         gather_method="take"))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        init_b = {k: v[:1] for k, v in batch.items()}
        variables = init_model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            init_b["input"], init_b["choose"], init_b["cloud"],
            init_b["depth"], None, init_b["K_new"], init_b["valid"],
            train=False)
    dev = jax.devices()[0]
    variables = jax.device_put(variables, dev)

    if args.train:
        bench_train(args, cfg, jax, jnp, variables)
        return
    if args.self_contained:
        bench_self_contained(args, cfg, model, jax, jnp, batch, variables)
        return

    ev = make_eval_step(cfg, model, consts)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    bs = variables.get("batch_stats", {})

    # Async-dispatch loop: consecutive independent batches pipeline on the
    # device exactly as they would in a serving loop; the final
    # block_until_ready drains the queue.  (A serialized on-device fori_loop
    # measures ~14% lower because iterations cannot overlap.)
    for _ in range(args.warmup):
        out = ev(variables["params"], bs, jb)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = ev(variables["params"], bs, jb)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    fps = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "rgbd_inference_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


def bench_self_contained(args, cfg, model, jax, jnp, batch, variables):
    """End-to-end serving path: RGB+depth only; predicted centers, masks and
    (in-graph) point clouds — single trunk pass (models/handnet.infer_rgbd)."""
    from pdfnet_tpu.models.handnet import infer_rgbd

    rng = jax.random.PRNGKey(0)

    @jax.jit
    def run(variables, inp, depth, K, valid):
        result, params, hand_dicts, other = infer_rgbd(
            model, variables, inp, depth, K, valid, rng)
        return (result["verts3d"]["left"], result["verts3d"]["right"],
                params["root"]["left"], params["root"]["right"],
                other["ind"])

    inp = jnp.asarray(batch["input"])
    depth = jnp.asarray(batch["depth"])
    K = jnp.asarray(batch["K_new"])
    valid = jnp.asarray(batch["valid"])

    for _ in range(args.warmup):
        out = run(variables, inp, depth, K, valid)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = run(variables, inp, depth, K, valid)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    fps = args.batch * args.iters / dt
    print(json.dumps({
        "metric": "rgbd_selfcontained_frames_per_sec_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / BASELINE_FPS, 4),
    }))


def bench_train(args, cfg, jax, jnp, variables):
    """Fused train-step throughput (fwd + 14-term loss + bwd + Adam)."""
    from pdfnet_tpu.data.synthetic import make_batch
    from pdfnet_tpu.train.loss import load_loss_consts
    from pdfnet_tpu.train.step import TrainState, make_optimizer, \
        make_train_step

    B = args.train_batch
    cfg = cfg.replace(batch_size=B)
    from pdfnet_tpu.models import build_model
    model = build_model(cfg)
    consts = load_loss_consts()
    np_batch = make_batch(cfg.replace(default_resolution=args.res), B, seed=0)
    jb = {k: jnp.asarray(v) for k, v in np_batch.items()}

    tx = make_optimizer(cfg)
    state = TrainState(params=variables["params"],
                       batch_stats=variables.get("batch_stats", {}),
                       opt_state=tx.init(variables["params"]),
                       step=jnp.zeros((), jnp.int32))
    step = make_train_step(cfg, model, consts, donate=True)
    lr = jnp.asarray(cfg.lr, jnp.float32)
    ep = jnp.asarray(30)
    rng = jax.random.PRNGKey(0)

    for _ in range(args.warmup):
        state, stats = step(state, jb, ep, lr, rng)
    jax.block_until_ready(stats)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, stats = step(state, jb, ep, lr, rng)
    jax.block_until_ready(stats)
    dt = time.perf_counter() - t0
    sps = B * args.iters / dt
    print(json.dumps({
        "metric": "train_samples_per_sec_per_chip",
        "value": round(sps, 2),
        "unit": "samples/s",
        "vs_baseline": round(sps / 160.0, 4),   # 2-GPU ref recipe ~bs8 steps
    }))


if __name__ == "__main__":
    main()
