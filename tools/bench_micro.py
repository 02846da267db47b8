"""Micro-benchmarks for pixel-gather variants on the TPU.

The eval-step profile (PARITY.md) shows ~1.4 ms of "stem flatten copy" per
step: ``gather_pixels`` reshapes the (B, 192, 192, 64) stem map to
(B, H*W, C) before a row gather, and on TPU that collapse crosses the tiled
layout, forcing a physical relayout of the whole ~226 MB map to read 6 MB of
rows.  This tool times the flatten+take path against a direct 2-coordinate
gather on the NHWC operand (no relayout) for the three maps the PointNet
fusion gathers from.

Usage:  python tools/bench_micro.py [--batch 48]
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=50, warmup=5):
    import jax
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pdfnet_tpu.ops.gather import gather_pixels, gather_pixels_2d

    rng = np.random.RandomState(0)
    B = args.batch

    # (name, H, W, C, K, dtype): the three pyramid gathers + center feat
    cases = [
        ("emb0 384x384x3 K=2048", 384, 384, 3, 2048, jnp.float32),
        ("emb1 192x192x64 K=1024", 192, 192, 64, 1024, jnp.bfloat16),
        ("emb2 96x96x256 K=256", 96, 96, 256, 256, jnp.bfloat16),
        ("x0ctr 96x96x1024 K=2", 96, 96, 1024, 2, jnp.bfloat16),
    ]
    for name, H, W, C, K, dt in cases:
        fmap = jnp.asarray(rng.randn(B, H, W, C), dt)
        ind = jnp.asarray(rng.randint(0, H * W, (B, K)).astype(np.int32))
        t_flat = timeit(jax.jit(gather_pixels), fmap, ind, iters=args.iters)
        t_2d = timeit(jax.jit(gather_pixels_2d), fmap, ind, iters=args.iters)
        a = jax.jit(gather_pixels)(fmap, ind)
        b = jax.jit(gather_pixels_2d)(fmap, ind)
        ok = bool(jnp.all(a == b))
        print(f"{name:28s} flatten+take {t_flat:7.3f} ms   "
              f"2d-gather {t_2d:7.3f} ms   ({t_flat / t_2d:4.1f}x)  "
              f"exact={ok}")


if __name__ == "__main__":
    main()
