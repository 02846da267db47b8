"""Smoke tests for the demo and batched-serving CLIs (random weights,
reduced shapes, bundled reference assets).

Guards the demo/serving surfaces (reference demo.py:55-443 and our batched
infer) against regression; also covers the explicit-synthetic dataset
factory contract.
"""

import json
import os

import numpy as np
import pytest

ASSETS = "/root/reference/assets/H2O"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(ASSETS, "color", "000002.png")),
    reason="bundled reference H2O assets not available")

# match tests/test_model.py's tiny config so the suite compile cache is warm
SMALL = ["--res", "128", "--sample_num", "256", "--sample_num_level1", "128",
         "--sample_num_level2", "32", "--knn_k", "16", "--cpu"]


def test_demo_cli_smoke(tmp_path):
    from pdfnet_tpu.cli import demo
    out = str(tmp_path / "demo")
    demo.main(["--input", ASSETS, "--limit", "1", "--out", out] + SMALL)
    got = sorted(os.listdir(os.path.join(out, "color")))
    assert got == ["bones_lr_000002.jpg", "mask_lr_000002.jpg",
                   "render_000002.jpg"]
    import cv2
    img = cv2.imread(os.path.join(out, "color", "render_000002.jpg"))
    assert img is not None and img.shape == (128, 128, 3)


def test_infer_cli_smoke(tmp_path):
    from pdfnet_tpu.cli import infer
    out = str(tmp_path / "preds")
    # 3 files at batch 2 -> exercises the padded tail batch + drop
    infer.main(["--input", ASSETS, "--limit", "3", "--batch", "2",
                "--out", out, "--json"] + SMALL)
    preds = np.load(os.path.join(out, "predictions.npz"))
    assert list(preds["names"]) == ["000002", "000003", "000007"]
    assert preds["joints_abs"].shape == (3, 2, 21, 3)
    assert preds["joints_rel"].shape == (3, 2, 21, 3)
    assert preds["verts_abs"].shape == (3, 2, 778, 3)
    assert preds["lms2d"].shape == (3, 2, 21, 2)
    assert np.isfinite(preds["joints_abs"]).all()
    with open(os.path.join(out, "hand_poses.json")) as f:
        sub = json.load(f)
    assert set(sub) == {"000002", "000003", "000007"}
    assert all(len(v) == 126 for v in sub.values())   # H2O challenge layout


def test_dataset_factory_requires_explicit_synthetic(tmp_path):
    from pdfnet_tpu.config import Config
    from pdfnet_tpu.data.h2o import build_dataset

    cfg = Config(cache_path=str(tmp_path / "nonexistent"))
    with pytest.raises(FileNotFoundError, match="annotation cache"):
        build_dataset(cfg, "train")                   # typo'd path fails loud
    ds = build_dataset(cfg, "train", synthetic=True)  # explicit opt-in only
    assert len(ds) > 0
