"""Record a full reference-model forward for end-to-end parity testing.

Instantiates the reference HandNET_GCN (torch-cpu, with torchvision/chumpy
shims), runs one eval forward on fixed random inputs, and saves the
state_dict + inputs + outputs to /tmp/pdfnet_parity/.  The parity test
(tests/test_full_parity.py) converts the state_dict with
pdfnet_tpu.utils.convert_torch and compares our forward against the
recording.  Artifacts are large and machine-local — not committed.

Usage: python tools/make_model_golden.py [--ref /root/reference]
"""

import argparse
import os
import sys
import types

import numpy as np

OUT_DIR = "/tmp/pdfnet_parity"


def install_shims(ref_root):
    sys.path.insert(0, ref_root)
    import lib.models.networks.resnet as vres
    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    for n in ["resnet18", "resnet34", "resnet50", "resnet101", "resnet152"]:
        setattr(tvm, n, getattr(vres, n))
    tv.models = tvm
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args()
    os.makedirs(OUT_DIR, exist_ok=True)

    import torch
    install_shims(args.ref)
    from types import SimpleNamespace
    opt = SimpleNamespace(
        heads={"hm": 2, "wh": 2, "params": 122}, depth=True, iterations=False,
        PCA_SZ=63, knn_K=64, ball_radius=0.015, ball_radius2=0.04,
        sample_num_level1=512, sample_num_level2=128, INPUT_FEATURE_NUM=3,
        SAMPLE_NUM=1024, default_resolution=384,
        DECONV_DIMS=[256, 256, 256, 256], GCN_IN_DIM=[512, 256, 128],
        GCN_OUT_DIM=[256, 128, 64], IMG_DIMS=[256, 128, 64], graph_k=2,
        graph_layer_num=4)
    from lib.models.networks.intaghand_model import load_model_intag
    torch.manual_seed(0)
    model = load_model_intag(opt)
    model.eval()

    rng = np.random.RandomState(42)
    B, res, N = 1, 384, 1024
    img = rng.randn(B, 3, res, res).astype(np.float32)
    # clustered plausible cloud so ball query has in-radius neighbors
    base = rng.uniform(-0.05, 0.05, (1, 1, 3))
    cloud = (base + rng.normal(0, 0.03, (B, 2, N, 3))).astype(np.float32)
    choose = rng.randint(0, res * res, (B, 2, N)).astype(np.int64)
    depth = rng.uniform(0.3, 0.8, (B, res, res)).astype(np.float32)
    ind = np.array([[48 * 96 + 30, 50 * 96 + 60]], np.int64)
    K = np.array([[[480.0, 0, 192], [0, 480.0, 192], [0, 0, 1]]], np.float32)
    valid = np.ones((B, 2), np.float32)

    with torch.no_grad():
        result, params, hand_dicts, other = model(
            torch.from_numpy(img), torch.from_numpy(choose),
            torch.from_numpy(cloud), torch.from_numpy(depth),
            torch.from_numpy(ind), torch.from_numpy(K),
            torch.from_numpy(valid))

    np.savez(os.path.join(OUT_DIR, "inputs.npz"), img=img, cloud=cloud,
             choose=choose, depth=depth, ind=ind, K=K, valid=valid)
    np.savez(
        os.path.join(OUT_DIR, "outputs.npz"),
        verts3d_left=result["verts3d"]["left"].numpy(),
        verts3d_right=result["verts3d"]["right"].numpy(),
        verts2d_left=result["verts2d"]["left"].numpy(),
        verts2d_right=result["verts2d"]["right"].numpy(),
        scale_left=params["scale"]["left"].numpy(),
        scale_right=params["scale"]["right"].numpy(),
        trans2d_left=params["trans2d"]["left"].numpy(),
        trans2d_right=params["trans2d"]["right"].numpy(),
        root_left=params["root"]["left"].numpy(),
        root_right=params["root"]["right"].numpy(),
        gcn_verts_left=hand_dicts[0]["verts3d"]["left"].numpy(),
        gcn_verts_right=hand_dicts[0]["verts3d"]["right"].numpy(),
        hms=other["hms"].numpy(),
        mask=other["mask"].numpy(),
        hm=other["ret"]["hm"].numpy(),
        wh=other["ret"]["wh"].numpy(),
    )
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}
    np.savez(os.path.join(OUT_DIR, "state_dict.npz"), **sd)
    print(f"wrote parity fixtures to {OUT_DIR}")


if __name__ == "__main__":
    main()
