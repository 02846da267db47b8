"""Record one reference InterHandDataset sample for host-builder parity.

Runs the reference dataset's ``__getitem__`` (torch-cpu, with the shims from
make_model_golden) on an H2O-format tree with ``np.random.shuffle`` disabled
— the deterministic first-N / wrap-pad cloud sampling that
``pdfnet_tpu.data.cloud.sample_hand_cloud(deterministic=True)`` reproduces —
and saves every returned key to an npz.

Reference path exercised: lib/datasets/interhand.py:459-1023 (H2O branch of
__getitem__ + augment_centernet) and lib/datasets/joint_dataset.py (cache
loading / split slicing).  The hardcoded ManoLayer pickle paths
(interhand.py:189-190 point at the author's home directory) are redirected
to the reference checkout's mano_core assets.

Usage: python tools/record_h2o_builder.py --tree TREE --index 0 \
           --split test --out /tmp/ref_sample.npz
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_model_golden import _install_chumpy_stub, install_shims  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--tree", required=True,
                    help="H2O-format root: {tree}/H2O_{split}.pkl + images")
    ap.add_argument("--index", type=int, default=0)
    ap.add_argument("--split", default="test")
    ap.add_argument("--sample_num", type=int, default=1024)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    install_shims(args.ref)
    _install_chumpy_stub()
    import lib.datasets.interhand as ih
    from lib.datasets.joint_dataset import JointDataset

    # the getitem hardcodes /home/zijinxuxu/... pickle paths; keep the
    # basename, point at the reference checkout
    real_layer = ih.ManoLayer
    core = os.path.join(args.ref, "lib", "models", "hand3d", "mano_core")
    ih.ManoLayer = lambda path, **kw: real_layer(
        os.path.join(core, os.path.basename(path)), **kw)

    from types import SimpleNamespace
    opt = SimpleNamespace(
        dataset="H2O", cache_path=args.tree, pre_fix=args.tree, batch_size=1,
        depth=True, brightness=False, down_ratio=4,
        SAMPLE_NUM=args.sample_num, INPUT_FEATURE_NUM=3, off=True,
        heatmaps=True, photometric_loss=False, sample_strategy="random",
        sample_num_level1=512, sample_num_level2=128)
    DS = type("DS", (JointDataset, ih.InterHandDataset),
              {"default_resolution": [384, 384]})
    ds = DS(opt, args.split)

    # numpy>=1.24 compat: the reference's `wh[0] = 1.*w, 1.*h`
    # (interhand.py:939,949) assigns a tuple of (1,)-shaped arrays — a
    # (2,1) RHS into a (2,) row, which old numpy squeezed and modern numpy
    # rejects.  Give arrays the reference allocates via np.zeros a setitem
    # that retries with a squeeze ONLY after the strict assignment raised,
    # so no successful reference semantics can change.
    class _CompatArray(np.ndarray):
        def __setitem__(self, k, v):
            try:
                super().__setitem__(k, v)
            except ValueError:
                super().__setitem__(
                    k, np.squeeze(np.asarray(v, dtype=self.dtype)))

    orig_shuffle, orig_zeros = np.random.shuffle, np.zeros
    np.random.shuffle = lambda x: None      # determinism (see module doc)
    np.zeros = lambda *a, **kw: orig_zeros(*a, **kw).view(_CompatArray)
    try:
        ret = ds[args.index]
    finally:
        np.random.shuffle = orig_shuffle
        np.zeros = orig_zeros

    np.savez(args.out, **{k: np.asarray(v) for k, v in ret.items()})
    print(f"recorded reference sample {args.index} ({args.split}) "
          f"with keys {sorted(ret)} to {args.out}")


if __name__ == "__main__":
    main()
