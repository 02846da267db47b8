"""Differential benchmark: which stage dominates TPU inference time.

Times the encoder (trunk+FPN+heads+pyramids+pointnet) and the decoder side
(mid fusion + GCN mesh decoder + eval outputs) separately, plus knn variants.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.models.encoder import FPNEncoder, MidFusion
    from pdfnet_tpu.models.gcn_decoder import MeshDecoder

    B, res, N = 32, 384, 1024
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(B, res, res, 3).astype(np.float32))
    cloud = jnp.asarray(
        (rng.normal(0, 0.03, (B, 2, N, 3))).astype(np.float32))
    choose = jnp.asarray(rng.randint(0, res * res, (B, 2, N)).astype(np.int32))
    ind = jnp.asarray(rng.randint(0, 96 * 96, (B, 2)).astype(np.int32))

    def bench(f, *a, iters=10, name=""):
        o = f(*a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = f(*a)
        jax.block_until_ready(o)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1000:.2f} ms  ({B / dt:.0f} fps)", flush=True)
        return dt

    cfg = Config(compute_dtype="bfloat16")
    dtype = jnp.bfloat16

    for label, method in (("pallas", "pallas"), ("approx", "approx")):
        enc = FPNEncoder(heads=cfg.heads, fmap_dim=cfg.fmap_dim,
                         knn_method=method, gather_method="onehot", dtype=dtype)
        v = enc.init({"params": jax.random.PRNGKey(0)}, img[:1], cloud[:1],
                     choose[:1], ind[:1], False)
        f = jax.jit(lambda vv, im, c, ch, i: enc.apply(vv, im, c, ch, i, False))
        bench(f, v, img, cloud, choose, ind, name=f"encoder ({label} knn)")

    # decoder side on fixed-shape dummy features
    hms_fmaps = [jnp.zeros((B, s, s, 128), dtype) for s in (12, 24, 48, 96)]
    dp_fmaps = [jnp.zeros((B, s, s, 128), dtype) for s in (12, 24, 48, 96)]
    img_fmaps = [jnp.zeros((B, 2, 1024), jnp.float32),
                 jnp.zeros((B, 24, 24, 1024), dtype),
                 jnp.zeros((B, 48, 48, 512), dtype),
                 jnp.zeros((B, 96, 96, 256), dtype)]
    mid = MidFusion(dtype=dtype)
    vm = mid.init({"params": jax.random.PRNGKey(0)},
                  [x[:1] for x in img_fmaps], [x[:1] for x in hms_fmaps],
                  [x[:1] for x in dp_fmaps], False)
    dec = MeshDecoder()
    gf = jnp.zeros((1, 1024), jnp.float32)
    fm = [jnp.zeros((1, s, s, 256), jnp.float32) for s in (12, 24, 48)]
    vd = dec.init({"params": jax.random.PRNGKey(0)}, gf, gf, fm, False)

    def dec_side(vm_, vd_, imf, hf, df):
        gl, gr, fmaps = mid.apply(vm_, imf, hf, df, False)
        return dec.apply(vd_, gl.astype(jnp.float32), gr.astype(jnp.float32),
                         [f.astype(jnp.float32) for f in fmaps[:3]], False)

    f2 = jax.jit(dec_side)
    bench(f2, vm, vd, img_fmaps, hms_fmaps, dp_fmaps, name="mid+gcn-decoder")


if __name__ == "__main__":
    main()
