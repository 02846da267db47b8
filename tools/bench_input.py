"""Host input-pipeline throughput: samples/sec of the full H2O sample
builder (cv2 IO + warps, MANO GT synthesis, cloud sampling, CenterNet
targets), with the thread pool the trainer uses.

Usage: python tools/bench_input.py [--tree DIR] [--workers N] [--seconds S]
With no --tree, generates a miniature H2O-format fixture first.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_tree(root: str, n: int = 8) -> str:
    """Reuse the test-suite fixture factory to build an H2O-format tree."""
    import pickle
    import cv2
    import numpy as np
    from pdfnet_tpu.mano import layer as mano

    img_dir = os.path.join(root, "H2O", "s1", "rgb")
    depth_dir = os.path.join(root, "H2O", "s1", "depth")
    mask_dir = os.path.join(root, "H2O", "s1", "mask")
    for d in (img_dir, depth_dir, mask_dir):
        os.makedirs(d, exist_ok=True)
    H, W = 480, 640
    K = np.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1]], np.float32)
    rng = np.random.RandomState(0)
    records = []
    for i in range(n):
        coeff = np.zeros(124, np.float32)
        joints_all, lms_all = [], []
        img = np.full((H, W, 3), 60, np.uint8)
        depth_mm = np.zeros((H, W), np.uint16)
        mask = np.zeros((H, W, 3), np.uint8)
        for h, (side, xo) in enumerate((("left", -0.09), ("right", 0.06))):
            o = 62 * h
            coeff[o] = 1.0
            coeff[o + 1:o + 4] = [xo, 0.0, 0.55]
            coeff[o + 4:o + 7] = rng.uniform(-0.3, 0.3, 3)
            coeff[o + 7:o + 52] = rng.uniform(-0.2, 0.2, 45)
            coeff[o + 52:o + 62] = rng.uniform(-0.5, 0.5, 10)
            c = mano.load_mano_consts(side)
            v, j = mano.mano_forward(
                c, coeff[None, o + 4:o + 7], coeff[None, o + 7:o + 52],
                coeff[None, o + 52:o + 62], trans=coeff[None, o + 1:o + 4])
            import numpy as _np
            v, j = _np.asarray(v[0]), _np.asarray(j[0])
            joints_all.append(j)
            pj = j @ K.T
            lms_all.append(pj[:, :2] / pj[:, 2:])
            pv = v @ K.T
            uv = (pv[:, :2] / pv[:, 2:]).astype(int)
            okm = ((uv[:, 0] >= 2) & (uv[:, 0] < W - 2) &
                   (uv[:, 1] >= 2) & (uv[:, 1] < H - 2))
            for (x, y), z in zip(uv[okm], v[okm, 2]):
                depth_mm[y - 2:y + 3, x - 2:x + 3] = int(z * 1000)
                mask[y - 2:y + 3, x - 2:x + 3,
                     1 if side == "right" else 2] = 255
                img[y - 2:y + 3, x - 2:x + 3] = (180, 140, 120)
        cv2.imwrite(os.path.join(img_dir, f"{i:06d}.png"), img)
        cv2.imwrite(os.path.join(depth_dir, f"{i:06d}.png"), depth_mm)
        cv2.imwrite(os.path.join(mask_dir, f"{i:06d}.png"), mask)
        records.append({
            "imgpath": f"s1/rgb/{i:06d}.png",
            "depthpath": f"s1/depth/{i:06d}.png",
            "mano_coeff": coeff,
            "lms": np.concatenate(lms_all).astype(np.float32),
            "joints": np.concatenate(joints_all).astype(np.float32),
            "K": K,
            "id": 1 + i // 4,      # H2O action id (submission grouping)
        })
    with open(os.path.join(root, "H2O_train.pkl"), "wb") as f:
        pickle.dump(records, f)
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default="")
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")

    tree = args.tree or make_tree("/tmp/bench_input_tree")
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.data.h2o import H2ODataset

    cfg = Config(cache_path=tree, pre_fix=tree, num_workers=args.workers)
    ds = H2ODataset(cfg, "train")
    print(f"{len(ds)} records, workers={args.workers}, batch={args.batch}")

    # warm (compiles the CPU MANO forward once)
    ds.__getitem__(0, epoch=0)
    t0 = time.perf_counter()
    n = 0
    epoch = 0
    while time.perf_counter() - t0 < args.seconds:
        for b in ds.batches(args.batch, epoch):
            n += b["input"].shape[0]
            if time.perf_counter() - t0 > args.seconds:
                break
        epoch += 1
    dt = time.perf_counter() - t0
    print(f"host pipeline: {n / dt:.1f} samples/s "
          f"({1000 * dt / max(n, 1):.1f} ms/sample)")


if __name__ == "__main__":
    main()
