"""Record golden outputs from the reference PyTorch implementation.

Runs selected pure functions of /root/reference (torch-cpu) on fixed random
inputs and stores inputs+outputs as .npz fixtures under tests/goldens/.  Our
JAX implementations are parity-tested against these recordings; no reference
code is imported at framework runtime.

Usage: python tools/make_goldens.py [--ref /root/reference]
"""

import argparse
import os
import sys

import types

import numpy as np
import torch

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def _install_chumpy_stub():
    """Make the reference's chumpy-laden pickles loadable without chumpy.

    The stub classes reconstruct the dense `.r` array the same way chumpy's
    Select/Ch expression graph would.
    """

    class _Ch:
        @property
        def r(self):
            d = vars(self)
            if "x" in d:
                return np.asarray(d["x"])
            if "a" in d and "idxs" in d:
                src = _Ch.r.fget(d["a"]) if not isinstance(d["a"], np.ndarray) else d["a"]
                out = np.asarray(src).ravel()[np.asarray(d["idxs"])]
                shape = d.get("preferred_shape")
                return out.reshape(shape) if shape else out.reshape(778, 3, -1)
            raise AttributeError("cannot densify stub chumpy object")

    for modname in ("chumpy", "chumpy.ch", "chumpy.reordering"):
        mod = types.ModuleType(modname)
        sys.modules[modname] = mod
    sys.modules["chumpy"].Ch = _Ch
    sys.modules["chumpy.ch"].Ch = _Ch
    sys.modules["chumpy.reordering"].Select = type("Select", (_Ch,), {})


def record_mano(ref_root):
    sys.path.insert(0, os.path.join(ref_root, "lib/models/networks"))
    import manolayer  # reference module, torch-cpu

    rng = np.random.RandomState(0)
    out = {}
    for side in ("left", "right"):
        pkl = os.path.join(ref_root, "lib/models/hand3d/mano_core",
                           f"MANO_{side.upper()}.pkl")
        layer = manolayer.ManoLayer(pkl, center_idx=None, use_pca=False)
        if side == "left":
            # fix_shape (interhand.py:120-123)
            layer.shapedirs[:, 0, :] *= -1
        B = 4
        root = rng.uniform(-1, 1, (B, 3)).astype(np.float32)
        pose = (rng.uniform(-0.5, 0.5, (B, 45)) ).astype(np.float32)
        shape = rng.uniform(-2, 2, (B, 10)).astype(np.float32)
        trans = rng.uniform(-0.2, 0.2, (B, 3)).astype(np.float32)
        with torch.no_grad():
            v, j = layer(torch.from_numpy(root), torch.from_numpy(pose),
                         torch.from_numpy(shape), trans=torch.from_numpy(trans),
                         side=side)
        out[f"{side}_root"] = root
        out[f"{side}_pose"] = pose
        out[f"{side}_shape"] = shape
        out[f"{side}_trans"] = trans
        out[f"{side}_verts"] = v.numpy()
        out[f"{side}_joints"] = j.numpy()

        # PCA path (use_pca=True) with rotation-matrix root input
        layer_pca = manolayer.ManoLayer(pkl, center_idx=9, use_pca=True)
        if side == "left":
            layer_pca.shapedirs[:, 0, :] *= -1
        pca = rng.uniform(-1, 1, (B, 30)).astype(np.float32)
        rootmat = manolayer.rodrigues_batch(torch.from_numpy(root))
        scale = rng.uniform(0.5, 1.5, (B,)).astype(np.float32)
        with torch.no_grad():
            v2, j2 = layer_pca(rootmat, torch.from_numpy(pca),
                               torch.from_numpy(shape),
                               trans=torch.from_numpy(trans),
                               scale=torch.from_numpy(scale), side=side)
        out[f"{side}_pca"] = pca
        out[f"{side}_rootmat"] = rootmat.numpy()
        out[f"{side}_scale"] = scale
        out[f"{side}_verts_pca"] = v2.numpy()
        out[f"{side}_joints_pca"] = j2.numpy()
    np.savez_compressed(os.path.join(GOLDEN_DIR, "mano.npz"), **out)
    print("wrote mano.npz")


def record_grouping(ref_root):
    """Golden for group_points / group_points_2 (lib/utils/utils.py:134-188)."""
    sys.path.insert(0, ref_root)
    from types import SimpleNamespace

    # Import just the functions (utils.py has heavy imports but all available)
    from lib.utils.utils import group_points, group_points_2

    rng = np.random.RandomState(1)
    B, N = 2, 1024
    pts = rng.uniform(-0.1, 0.1, (B, N, 3)).astype(np.float32)
    # sort? reference uses first 512 points as centers directly
    opt = SimpleNamespace(INPUT_FEATURE_NUM=3, SAMPLE_NUM=N, knn_K=64,
                          sample_num_level1=512, sample_num_level2=128,
                          ball_radius=0.015, ball_radius2=0.04)
    with torch.no_grad():
        lvl1, lvl1_center = group_points(torch.from_numpy(pts), opt)
    out = {"points": pts, "level1": lvl1.numpy(), "level1_center": lvl1_center.numpy()}

    # level-2 grouping on synthetic 131-dim features
    feat = rng.uniform(-1, 1, (B, 131, 512)).astype(np.float32)
    feat[:, :3] = np.transpose(pts[:, :512, :], (0, 2, 1))
    with torch.no_grad():
        lvl2, lvl2_center = group_points_2(torch.from_numpy(feat), 512, 128, 64, 0.04)
    out["feat2"] = feat
    out["level2"] = lvl2.numpy()
    out["level2_center"] = lvl2_center.numpy()
    np.savez_compressed(os.path.join(GOLDEN_DIR, "grouping.npz"), **out)
    print("wrote grouping.npz")


def record_cheb(ref_root):
    """Golden for graph_conv_cheby (model_attn/gcn.py:34-69)."""
    sys.path.insert(0, ref_root)
    from lib.models.networks.model_attn.gcn import graph_conv_cheby
    import pickle

    with open(os.path.join(ref_root, "lib/models/networks/gcn_core/graph_left.pkl"), "rb") as f:
        g = pickle.load(f)
    L = np.asarray(g["coarsen_graphs_L"][-1].todense(), np.float32)  # 63x63
    rng = np.random.RandomState(2)
    B, V, Fin, Fout = 3, 63, 16, 8
    x = rng.uniform(-1, 1, (B, V, Fin)).astype(np.float32)
    W = rng.uniform(-0.3, 0.3, (Fin * 2, Fout)).astype(np.float32)
    b = rng.uniform(-0.1, 0.1, (Fout,)).astype(np.float32)
    lin = torch.nn.Linear(Fin * 2, Fout)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(W.T))
        lin.bias.copy_(torch.from_numpy(b))
        y = graph_conv_cheby(torch.from_numpy(x), lin, torch.from_numpy(L), K=2)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "cheb.npz"),
                        x=x, L=L, W=W, b=b, y=y.numpy())
    print("wrote cheb.npz")


def record_geometry(ref_root):
    """Goldens for depth backprojection + orthographic projection."""
    sys.path.insert(0, ref_root)
    from lib.utils.utils import get_normal, projection_batch

    rng = np.random.RandomState(3)
    H = W = 64
    depth = (rng.uniform(0.3, 0.8, (H, W)) *
             (rng.uniform(size=(H, W)) > 0.3)).astype(np.float32)
    K = np.array([[240.0, 0, 32.0], [0, 240.0, 32.0], [0, 0, 1]], np.float32)
    pts, _ = get_normal(depth, K, with_normal=False)

    scale = rng.uniform(0.5, 1.5, (4,)).astype(np.float32)
    trans2d = rng.uniform(-0.5, 0.5, (4, 2)).astype(np.float32)
    label3d = rng.uniform(-1, 1, (4, 21, 3)).astype(np.float32)
    with torch.no_grad():
        proj = projection_batch(torch.from_numpy(scale), torch.from_numpy(trans2d),
                                torch.from_numpy(label3d), img_size=384)
    np.savez_compressed(os.path.join(GOLDEN_DIR, "geometry.npz"),
                        depth=depth, K=K, points=pts,
                        scale=scale, trans2d=trans2d, label3d=label3d,
                        proj=proj.numpy())
    print("wrote geometry.npz")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ref", default="/root/reference")
    args = p.parse_args()
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    _install_chumpy_stub()
    record_mano(args.ref)
    record_grouping(args.ref)
    record_cheb(args.ref)
    record_geometry(args.ref)


if __name__ == "__main__":
    main()
