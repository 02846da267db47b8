"""Micro-benchmark: Pallas fused bottleneck blocks vs the flax/XLA path.

Times each ResNet-50 block shape at batch 48 / 384 input (trunk stages at
96/48/24 spatial), both paths, on the current default device.

Usage: python tools/bench_trunk.py [--batch 48]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pdfnet_tpu.utils.cache import host_cache_dir
    jax.config.update("jax_compilation_cache_dir", host_cache_dir())
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from pdfnet_tpu.models.resnet import Bottleneck
    from pdfnet_tpu.ops.pallas_trunk import fold_bottleneck, fused_bottleneck

    B = args.batch
    rng = np.random.RandomState(0)
    # (name, Cin, width, H, stride, project, repeat_count_in_resnet50)
    shapes = [
        ("l1b0", 64, 64, 96, 1, True, 1),
        ("l1bN", 256, 64, 96, 1, False, 2),
        ("l2b0", 256, 128, 96, 2, True, 1),
        ("l2bN", 512, 128, 48, 1, False, 3),
        ("l3b0", 512, 256, 48, 2, True, 1),
        ("l3bN", 1024, 256, 24, 1, False, 5),
    ]

    def timeit(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    tot_x, tot_p = 0.0, 0.0
    for name, cin, width, hw, stride, project, reps in shapes:
        blk = Bottleneck(width=width, stride=stride, project=project,
                         dtype=jnp.bfloat16)
        x32 = rng.randn(B, hw, hw, cin).astype(np.float32)
        variables = blk.init({"params": jax.random.PRNGKey(0)},
                             jnp.asarray(x32[:1]), train=False)
        x = jnp.asarray(x32).astype(jnp.bfloat16)
        folded = fold_bottleneck(variables["params"],
                                 variables["batch_stats"])
        folded = jax.tree.map(jnp.asarray, folded)

        xla = jax.jit(lambda v, t: blk.apply(v, t, train=False))
        pall = jax.jit(lambda t, f: fused_bottleneck(
            t, f, stride=stride, project=project))
        ms_x = timeit(xla, variables, x)
        ms_p = timeit(pall, x, folded)
        tot_x += ms_x * reps
        tot_p += ms_p * reps
        print(f"{name}: xla {ms_x:7.3f} ms   pallas {ms_p:7.3f} ms   "
              f"x{reps}")
    print(f"trunk L1-L3 weighted total: xla {tot_x:.2f} ms   "
          f"pallas {tot_p:.2f} ms")


if __name__ == "__main__":
    main()
