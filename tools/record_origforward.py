"""Record one reference origforward loss evaluation for per-term parity.

Runs the reference CtdetLoss.origforward (simplified.py:657-1048) on
torch-cpu with synthetic inputs — random 122-d thetas at GT centers, random
heatmap logits, random GT — for epochs on both sides of the alpha gate
(epoch 20), and saves the inputs + every loss_stats term (batch-meaned) to
.parity_fixtures/origforward.npz.  tests/test_mano_branch_parity.py replays
the same inputs through pdfnet_tpu.train.mano_branch.origforward_loss.

Usage: python tools/record_origforward.py [--ref /root/reference]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from make_model_golden import (OUT_DIR, _install_chumpy_stub, _train_opt,
                               install_shims)

EPOCHS = (0, 25)          # straddle the alpha gate (epoch 20)
B = 3


def make_inputs(seed=0, res=384, grid=96):
    rng = np.random.RandomState(seed)
    # center heatmap target: background decays + exact-1.0 peaks (the focal
    # loss branches on gt == 1)
    hm_gt = (rng.rand(B, 2, grid, grid) * 0.9).astype(np.float32)
    ind = rng.randint(0, grid * grid, (B, 2)).astype(np.int64)
    for b in range(B):
        for h in range(2):
            hm_gt[b, h, ind[b, h] // grid, ind[b, h] % grid] = 1.0
    K = np.tile(np.array([[[480.0, 0, res / 2], [0, 480.0, res / 2],
                           [0, 0, 1]]], np.float32), (B, 1, 1))
    K[:, 0, 0] += rng.randn(B) * 5
    K[:, 1, 1] += rng.randn(B) * 5
    joints_l = (rng.randn(B, 21, 3) * 0.05 + [0, 0, 0.6]).astype(np.float32)
    joints_r = (rng.randn(B, 21, 3) * 0.05 + [0, 0, 0.6]).astype(np.float32)
    return {
        "hm_logits": rng.randn(B, 2, grid, grid).astype(np.float32),
        "theta_l": (rng.randn(B, 122) * 0.3).astype(np.float32),
        "theta_r": (rng.randn(B, 122) * 0.3).astype(np.float32),
        "hm": hm_gt,
        "ind": ind,
        "valid": np.array([[1, 1], [1, 0], [0, 1]], np.float32),
        "K_new": K,
        # 'lms' itself only gates the landmark-term block (simplified.py:773)
        "lms": (rng.rand(B, 42, 2) * res).astype(np.float32),
        "lms_left_gt": (rng.rand(B, 21, 2) * res).astype(np.float32),
        "lms_right_gt": (rng.rand(B, 21, 2) * res).astype(np.float32),
        "joints_left_gt": joints_l,
        "joints_right_gt": joints_r,
        "verts_left_gt": (rng.randn(B, 778, 3) * 0.05
                          + [0, 0, 0.6]).astype(np.float32),
        "verts_right_gt": (rng.randn(B, 778, 3) * 0.05
                           + [0, 0, 0.6]).astype(np.float32),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    args = ap.parse_args()
    install_shims(args.ref)
    _install_chumpy_stub()
    import torch

    opt = _train_opt(B)
    # origforward-only weights (opts.py:134,142; unused by the live branch
    # recorder so _train_opt doesn't carry them)
    opt.joints_weight = 1.0
    opt.norm_weight = 1000.0
    from lib.models.hand3d.Mano_render import ManoRender
    from lib.trains.simplified import CtdetLoss

    render = ManoRender(opt).eval()
    loss_mod = CtdetLoss(opt, render=render).eval()

    inp = make_inputs()
    out = {f"in_{k}": v for k, v in inp.items()}
    for epoch in EPOCHS:
        # fresh tensors each call: Split_coeff's `view[:, 2] = view[:, 2]
        # + 0.6` writes through into theta (Mano_render.py:165,171), and
        # origforward sigmoids output['hm'] in place (simplified.py:681)
        output = {
            "hm": torch.from_numpy(inp["hm_logits"].copy()),
            "point2mano_left": torch.from_numpy(
                inp["theta_l"].copy()[:, None, :]),
            "point2mano_right": torch.from_numpy(
                inp["theta_r"].copy()[:, None, :]),
        }
        batch = {k: torch.from_numpy(np.asarray(v).copy())
                 for k, v in inp.items()
                 if k not in ("hm_logits", "theta_l", "theta_r")}
        batch["file_id"] = torch.full((B,), 1, dtype=torch.int64)  # skip %103 vis
        with torch.no_grad():
            loss, stats, _, _ = loss_mod.origforward(output, "train", batch,
                                                     epoch)
        assert loss.shape == (B,), loss.shape
        out[f"ep{epoch}_loss_vec"] = loss.numpy()
        for k, v in stats.items():
            out[f"ep{epoch}_{k}"] = np.asarray(
                v.mean().item() if torch.is_tensor(v) else v, np.float64)
        print(f"epoch {epoch}: loss={loss.mean().item():.6f}  terms="
              f"{sorted(k for k in stats)}")

    os.makedirs(OUT_DIR, exist_ok=True)
    path = os.path.join(OUT_DIR, "origforward.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
