"""InterHandNew dataset branch test against a generated on-disk fixture."""

import os
import pickle

import cv2
import numpy as np
import pytest

from pdfnet_tpu.config import Config
from pdfnet_tpu.mano import layer as mano


@pytest.fixture(scope="module")
def ihn_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ihn")
    base = root / "InterHandNew" / "test"
    for sub in ("img", "mask", "anno"):
        os.makedirs(base / sub)

    H = W = 256
    camera = np.array([[300.0, 0, 128], [0, 300.0, 128], [0, 0, 1]],
                      np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.array([0, 0, 0.6], np.float32)
    rng = np.random.RandomState(0)
    for i in range(2):
        img = np.full((H, W, 3), 90, np.uint8)
        mask = np.zeros((H, W, 3), np.uint8)
        anno = {"camera": {"R": R, "t": T, "camera": camera},
                "mano_params": {}}
        for side, xo in (("left", -0.08), ("right", 0.05)):
            params = {
                "R": rng.uniform(-0.3, 0.3, (1, 3)).astype(np.float32),
                "pose": rng.uniform(-0.2, 0.2, (1, 45)).astype(np.float32),
                "shape": rng.uniform(-0.5, 0.5, (1, 10)).astype(np.float32),
                "trans": np.array([[xo, 0.0, -0.05]], np.float32),
            }
            anno["mano_params"][side] = params
            c = mano.load_mano_consts(side)
            v, _ = mano.mano_forward(c, params["R"], params["pose"],
                                     params["shape"], trans=params["trans"])
            v = np.asarray(v[0]) @ R.T + T
            pv = v @ camera.T
            uv = (pv[:, :2] / pv[:, 2:]).astype(int)
            ok = ((uv[:, 0] >= 1) & (uv[:, 0] < W - 1) &
                  (uv[:, 1] >= 1) & (uv[:, 1] < H - 1))
            ch = 1 if side == "right" else 2
            for x, y in uv[ok]:
                mask[y - 1:y + 2, x - 1:x + 2, ch] = 255
                img[y - 1:y + 2, x - 1:x + 2] = (170, 150, 130)
        cv2.imwrite(str(base / "img" / f"{i}.jpg"), img)
        cv2.imwrite(str(base / "mask" / f"{i}.jpg"), mask)
        cv2.imwrite(str(base / "dense" / f"{i}.jpg"), img) \
            if os.path.isdir(base / "dense") else None
        with open(base / "anno" / f"{i}.pkl", "wb") as f:
            pickle.dump(anno, f)
    return str(root)


def test_interhand_new_sample(ihn_tree):
    from pdfnet_tpu.data.interhand_new import InterHandNewDataset
    cfg = Config(dataset="InterHandNew", cache_path=ihn_tree,
                 default_resolution=128, sample_num=64)
    ds = InterHandNewDataset(cfg, "test")
    assert len(ds) == 2
    s = ds[0]
    assert s["input"].shape == (128, 128, 3)
    assert s["verts_left_gt"].shape == (778, 3)
    assert s["cloud"].shape == (2, 64, 3)            # RGB-only: zero clouds
    assert s["cloud"].sum() == 0
    assert np.isfinite(s["joints_right_gt"]).all()
    # GT joints project onto the stored 2D landmarks through the warp
    j = s["joints_left_gt"]
    pj = j @ s["K_new"].T
    lms = pj[:, :2] / pj[:, 2:]
    np.testing.assert_allclose(lms, s["lms_left_gt"], atol=1.0)
