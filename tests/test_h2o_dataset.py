"""H2O dataset reader test against a generated on-disk fixture.

Builds a miniature H2O-format tree (rgb/depth/mask pngs + annotation cache
pickle) from MANO ground truth, then exercises the full reader: MANO GT
synthesis, two-stage warps with intrinsics update, mask binarization,
cloud sampling, CenterNet targets.
"""

import os
import pickle

import cv2
import numpy as np
import pytest

from pdfnet_tpu.config import Config
from pdfnet_tpu.mano import layer as mano


@pytest.fixture(scope="module")
def h2o_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("h2o")
    img_dir = root / "H2O" / "subject1" / "rgb"
    depth_dir = root / "H2O" / "subject1" / "depth"
    mask_dir = root / "H2O" / "subject1" / "mask"
    for d in (img_dir, depth_dir, mask_dir):
        os.makedirs(d)

    H, W = 480, 640
    K = np.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1]], np.float32)
    records = []
    rng = np.random.RandomState(0)
    for i in range(3):
        coeff = np.zeros(124, np.float32)
        joints_all, lms_all = [], []
        img = np.full((H, W, 3), 60, np.uint8)
        depth_mm = np.zeros((H, W), np.uint16)
        mask = np.zeros((H, W, 3), np.uint8)
        for h, (side, xo) in enumerate((("left", -0.09), ("right", 0.06))):
            o = 62 * h
            coeff[o] = 1.0                                   # valid
            coeff[o + 1:o + 4] = [xo, 0.0, 0.55]             # trans
            coeff[o + 4:o + 7] = rng.uniform(-0.3, 0.3, 3)   # orient
            coeff[o + 7:o + 52] = rng.uniform(-0.2, 0.2, 45)
            coeff[o + 52:o + 62] = rng.uniform(-0.5, 0.5, 10)
            c = mano.load_mano_consts(side)
            v, j = mano.mano_forward(
                c, coeff[None, o + 4:o + 7], coeff[None, o + 7:o + 52],
                coeff[None, o + 52:o + 62], trans=coeff[None, o + 1:o + 4])
            v, j = np.asarray(v[0]), np.asarray(j[0])
            joints_all.append(j)
            pj = j @ K.T
            lms_all.append(pj[:, :2] / pj[:, 2:])
            pv = v @ K.T
            uv = (pv[:, :2] / pv[:, 2:]).astype(int)
            okm = (uv[:, 0] >= 2) & (uv[:, 0] < W - 2) & \
                  (uv[:, 1] >= 2) & (uv[:, 1] < H - 2)
            for (x, y), z in zip(uv[okm], v[okm, 2]):
                depth_mm[y - 2:y + 3, x - 2:x + 3] = int(z * 1000)
                # G channel codes right hand, R channel codes left
                mask[y - 2:y + 3, x - 2:x + 3, 1 if side == "right" else 2] = 255
                img[y - 2:y + 3, x - 2:x + 3] = (180, 140, 120)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
        cv2.imwrite(str(depth_dir / f"{i:06d}.png"), depth_mm)
        cv2.imwrite(str(mask_dir / f"{i:06d}.png"), mask)
        records.append({
            "imgpath": f"subject1/rgb/{i:06d}.png",
            "depthpath": f"subject1/depth/{i:06d}.png",
            "mano_coeff": coeff,
            "lms": np.concatenate(lms_all).astype(np.float32),
            "joints": np.concatenate(joints_all).astype(np.float32),
            "K": K,
            "id": 1,
        })
    with open(root / "H2O_train.pkl", "wb") as f:
        pickle.dump(records, f)
    with open(root / "H2O_test.pkl", "wb") as f:
        pickle.dump(records, f)
    return str(root)


def _cfg(h2o_tree, **kw):
    return Config(cache_path=h2o_tree, pre_fix=h2o_tree,
                  sample_num=256, **kw)


def test_h2o_sample_structure(h2o_tree):
    from pdfnet_tpu.data.h2o import H2ODataset
    ds = H2ODataset(_cfg(h2o_tree), "train")
    # train adds the val cache only when present; we wrote none -> 3 records
    assert len(ds) == 3


def test_h2o_getitem_keys_and_consistency(h2o_tree):
    from pdfnet_tpu.data.h2o import H2ODataset
    cfg = _cfg(h2o_tree)
    ds = H2ODataset(cfg, "test")   # deterministic: no aug
    s = ds[0]
    res = cfg.default_resolution
    assert s["input"].shape == (res, res, 3)
    assert s["depth"].shape == (res, res)
    assert s["cloud"].shape == (2, cfg.sample_num, 3)
    assert s["mask"].shape == (res, res, 2)
    assert s["verts_left_gt"].shape == (778, 3)
    assert s["hm"].shape == (res // 4, res // 4, 2)
    assert (s["ind"] >= 0).all() and (s["ind"] < (res // 4) ** 2).all()
    assert np.isfinite(s["input"]).all()
    # geometric consistency: projected GT joints == stored landmarks
    j = s["joints_left_gt"]
    pj = j @ s["K_new"].T
    lms = pj[:, :2] / pj[:, 2:]
    np.testing.assert_allclose(lms, s["lms_left_gt"], atol=0.5)
    # clouds come from the hand region depth band
    for h in range(2):
        if s["valid"][h]:
            z = s["cloud"][h][:, 2]
            assert 0.4 < z[z > 0].mean() < 0.7
    # masks exclusive-ish and nonzero
    assert s["mask"].sum() > 0


def test_h2o_train_augmentation_runs(h2o_tree):
    from pdfnet_tpu.data.h2o import H2ODataset
    ds = H2ODataset(_cfg(h2o_tree), "train")
    batch = next(iter(ds.batches(2, epoch=0)))
    assert batch["input"].shape[0] == 2
    assert np.isfinite(batch["joints_left_gt"]).all()
    # aug consistency: GT joints still project onto stored landmarks
    for b in range(2):
        j = batch["joints_right_gt"][b]
        pj = j @ batch["K_new"][b].T
        lms = pj[:, :2] / pj[:, 2:]
        np.testing.assert_allclose(lms, batch["lms_right_gt"][b], atol=1.0)


def test_fps_sampling_strategy(h2o_tree):
    from scipy.spatial.distance import pdist
    from pdfnet_tpu.data.h2o import H2ODataset

    kw = dict(sample_num_level1=64, sample_num_level2=16)
    s_fps = H2ODataset(_cfg(h2o_tree, sample_strategy="FPS", **kw), "test")[0]
    s_rnd = H2ODataset(_cfg(h2o_tree, sample_strategy="random", **kw),
                       "test")[0]
    assert s_fps["valid"][0], "fixture must yield a valid left hand"
    # An FPS prefix is farther spread than a random prefix of the same cloud:
    # its minimum pairwise distance is (near-)maximal by construction.
    fps_min = pdist(s_fps["cloud"][0][:16, :3]).min()
    rnd_min = pdist(s_rnd["cloud"][0][:16, :3]).min()
    assert fps_min > rnd_min * 1.5, (fps_min, rnd_min)
    # cloud and choose stay aligned through the reordering
    from pdfnet_tpu.data.cloud import backproject_np
    xyz = backproject_np(s_fps["depth"], s_fps["K_new"]).reshape(-1, 3)
    np.testing.assert_allclose(xyz[s_fps["choose"][0][:16]],
                               s_fps["cloud"][0][:16], atol=1e-5)


def test_h2o_epoch_varies_augmentation(h2o_tree):
    """The same sample must draw different augmentations in different epochs
    (the per-sample RNG folds the epoch in), while staying deterministic
    for a fixed (sample, epoch) pair."""
    from pdfnet_tpu.data.h2o import H2ODataset
    ds = H2ODataset(_cfg(h2o_tree), "train")
    a0 = ds.__getitem__(0, epoch=0)
    a0b = ds.__getitem__(0, epoch=0)
    np.testing.assert_array_equal(a0["input"], a0b["input"])
    diff = any(
        not np.array_equal(a0["input"], ds.__getitem__(0, epoch=e)["input"])
        for e in range(1, 6))
    assert diff, "augmentation identical across epochs 1..5"


def test_split_slicing_rules():
    """Per-dataset split slicing (reference joint_dataset.py:86-127)."""
    from pdfnet_tpu.data.h2o import H2ODataset

    recs = [{"i": i} for i in range(8000)]
    s = H2ODataset._slice_split
    assert len(s(recs, "FreiHAND", "val")) == 6000
    assert s(recs, "FreiHAND", "train") == recs
    assert len(s(recs, "HO3D", "train")) == 2000          # [3000:-3000]
    assert s(recs, "HO3D", "test") == recs
    assert len(s(recs, "HO3D", "val")) == 6000
    assert len(s(recs, "OneHand10K", "test")) == 2000
    assert len(s(recs, "OneHand10K", "train")) == 6000
    assert len(s(recs, "H2O", "test")) == 100
    assert s(recs, "H2O", "train") == recs
    assert s(recs, "RHD", "train") == recs


@pytest.fixture(scope="module")
def h2o3d_tree(tmp_path_factory):
    """Miniature H2O3D-format tree: 'color' image naming (-> color->mask
    path resolution), 16-bit depth, label-id masks (non-H2O branch)."""
    root = tmp_path_factory.mktemp("h2o3d")
    img_dir = root / "H2O3D" / "seq0" / "color"
    depth_dir = root / "H2O3D" / "seq0" / "depth"
    mask_dir = root / "H2O3D" / "seq0" / "mask"
    for d in (img_dir, depth_dir, mask_dir):
        os.makedirs(d)

    H, W = 480, 640
    K = np.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1]], np.float32)
    records = []
    rng = np.random.RandomState(1)
    for i in range(2):
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
            v, j = np.asarray(v[0]), np.asarray(j[0])
            joints_all.append(j)
            pj = j @ K.T
            lms_all.append(pj[:, :2] / pj[:, 2:])
            pv = v @ K.T
            uv = (pv[:, :2] / pv[:, 2:]).astype(int)
            okm = (uv[:, 0] >= 2) & (uv[:, 0] < W - 2) & \
                  (uv[:, 1] >= 2) & (uv[:, 1] < H - 2)
            for (x, y), z in zip(uv[okm], v[okm, 2]):
                depth_mm[y - 2:y + 3, x - 2:x + 3] = int(z * 1000)
                # label-id mask on channel 0: 2-17 left, >=18 right
                mask[y - 2:y + 3, x - 2:x + 3, 0] = \
                    5 if side == "left" else 20
                img[y - 2:y + 3, x - 2:x + 3] = (180, 140, 120)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
        cv2.imwrite(str(depth_dir / f"{i:06d}.png"), depth_mm)
        cv2.imwrite(str(mask_dir / f"{i:06d}.png"), mask)
        records.append({
            "imgpath": f"seq0/color/{i:06d}.png",
            "depthpath": f"seq0/depth/{i:06d}.png",
            "mano_coeff": coeff,
            "lms": np.concatenate(lms_all).astype(np.float32),
            "joints": np.concatenate(joints_all).astype(np.float32),
            "K": K,
        })
    with open(root / "H2O3D_test.pkl", "wb") as f:
        pickle.dump(records, f)
    return str(root)


def test_h2o3d_branch(h2o3d_tree):
    """H2O3D flows through the non-H2O branches: color->mask path, label-id
    mask decoding, MANO GT synthesis, full sample structure."""
    from pdfnet_tpu.data.h2o import H2ODataset
    cfg = Config(cache_path=h2o3d_tree, pre_fix=h2o3d_tree,
                 dataset="H2O3D", sample_num=256)
    ds = H2ODataset(cfg, "test")
    assert len(ds) == 2
    s = ds[0]
    res = cfg.default_resolution
    assert s["input"].shape == (res, res, 3)
    assert s["verts_left_gt"].shape == (778, 3)
    # label-id mask decoded into per-hand binaries
    assert s["mask_left_gt"].sum() > 0 and s["mask_right_gt"].sum() > 0
    assert set(np.unique(s["mask_left_gt"])) <= {0.0, 1.0}
    # both hands valid with sampled clouds in the depth band
    assert s["valid"].tolist() == [1, 1]
    for h in range(2):
        z = s["cloud"][h][:, 2]
        assert 0.4 < z[z > 0].mean() < 0.7
    # projected GT joints == landmarks after warps
    j = s["joints_left_gt"]
    pj = j @ s["K_new"].T
    np.testing.assert_allclose(pj[:, :2] / pj[:, 2:], s["lms_left_gt"],
                               atol=0.5)


def test_mano_gt_cache_matches_per_sample_forward(h2o_tree):
    """The precomputed MANO-GT memmap must reproduce the per-sample jitted
    forward exactly (same compiled function, batched)."""
    from pdfnet_tpu.data.h2o import H2ODataset, mano_gt_from_coeff

    ds = H2ODataset(_cfg(h2o_tree), "train")
    assert ds._mano_gt is not None
    assert ds._mano_gt["verts"].shape == (3, 2, 778, 3)
    for i in (0, 2):
        coeff = np.asarray(ds.records[i]["mano_coeff"], np.float32)
        for si, (side, off) in enumerate((("left", 0), ("right", 62))):
            v, j = mano_gt_from_coeff(coeff[off:off + 62], side)
            np.testing.assert_allclose(ds._mano_gt["verts"][i, si], v,
                                       atol=1e-6)
            np.testing.assert_allclose(ds._mano_gt["joints"][i, si], j,
                                       atol=1e-6)
    # cache files are reused on reconstruction (no rebuild)
    import glob
    n_files = len(glob.glob(os.path.join(h2o_tree, "*_manogt_*")))
    ds2 = H2ODataset(_cfg(h2o_tree), "train")
    assert len(glob.glob(os.path.join(h2o_tree, "*_manogt_*"))) == n_files
    s1, s2 = ds.__getitem__(1, epoch=0), ds2.__getitem__(1, epoch=0)
    np.testing.assert_allclose(s1["verts_left_gt"], s2["verts_left_gt"])


def _single_hand_tree(root, name, with_depth, with_mask):
    """Mini FreiHAND/HO3D-format tree: single right hand, optional 16-bit
    depth and red-hand mask (joint_dataset.py conventions)."""
    img_dir = root / name / "seq" / "color"
    os.makedirs(img_dir)
    if with_depth:
        os.makedirs(root / name / "seq" / "depth")
    if with_mask:
        os.makedirs(root / name / "seq" / "mask")
    H, W = 480, 640
    K = np.array([[520.0, 0, 320], [0, 520.0, 240], [0, 0, 1]], np.float32)
    rng = np.random.RandomState(5)
    records = []
    for i in range(3):
        coeff = np.zeros(124, np.float32)
        o = 62                                    # right hand block
        coeff[o] = 1.0
        coeff[o + 1:o + 4] = [0.02, 0.0, 0.55]
        coeff[o + 4:o + 7] = rng.uniform(-0.3, 0.3, 3)
        coeff[o + 7:o + 52] = rng.uniform(-0.2, 0.2, 45)
        coeff[o + 52:o + 62] = rng.uniform(-0.5, 0.5, 10)
        c = mano.load_mano_consts("right")
        v, j = mano.mano_forward(c, coeff[None, o + 4:o + 7],
                                 coeff[None, o + 7:o + 52],
                                 coeff[None, o + 52:o + 62],
                                 trans=coeff[None, o + 1:o + 4])
        v, j = np.asarray(v[0]), np.asarray(j[0])
        pj = j @ K.T
        lms = np.zeros((42, 2), np.float32)
        lms[21:] = pj[:, :2] / pj[:, 2:]
        img = np.full((H, W, 3), 70, np.uint8)
        depth_mm = np.zeros((H, W), np.uint16)
        mask = np.zeros((H, W, 3), np.uint8)
        pv = v @ K.T
        uv = (pv[:, :2] / pv[:, 2:]).astype(int)
        okm = ((uv[:, 0] >= 2) & (uv[:, 0] < W - 2) &
               (uv[:, 1] >= 2) & (uv[:, 1] < H - 2))
        for (x, y), z in zip(uv[okm], v[okm, 2]):
            depth_mm[y - 2:y + 3, x - 2:x + 3] = int(z * 1000)
            mask[y - 2:y + 3, x - 2:x + 3, 2] = 255      # red hand (BGR)
            img[y - 2:y + 3, x - 2:x + 3] = (160, 150, 130)
        cv2.imwrite(str(img_dir / f"{i:06d}.png"), img)
        rec = {"imgpath": f"seq/color/{i:06d}.png", "mano_coeff": coeff,
               "lms": lms,
               "joints": np.concatenate([np.zeros((21, 3), np.float32), j]),
               "K": K}
        if with_depth:
            cv2.imwrite(str(root / name / "seq" / "depth" / f"{i:06d}.png"),
                        depth_mm)
            rec["depthpath"] = f"seq/depth/{i:06d}.png"
        if with_mask:
            cv2.imwrite(str(root / name / "seq" / "mask" / f"{i:06d}.png"),
                        mask)
        records.append(rec)
    return records


def test_freihand_branch(tmp_path):
    """FreiHAND format: RGB-only (no depthpath, no mask) single right hand.
    Validity must NOT be demoted by the missing depth (clouds zero-padded)."""
    from pdfnet_tpu.data.h2o import H2ODataset

    records = _single_hand_tree(tmp_path, "FreiHAND", with_depth=False,
                                with_mask=False)
    with open(tmp_path / "FreiHAND_train.pkl", "wb") as f:
        pickle.dump(records, f)
    cfg = Config(cache_path=str(tmp_path), pre_fix=str(tmp_path),
                 dataset="FreiHAND", sample_num=256)
    ds = H2ODataset(cfg, "train")
    assert len(ds) == 3                 # FreiHAND trains on all records
    s = ds.__getitem__(0, epoch=1)
    B_valid = s["valid"]
    # exactly one hand valid (right, unless the flip aug swapped sides)
    assert B_valid.sum() == 1.0, B_valid
    assert np.all(s["depth"] == 0.0)
    assert np.all(s["cloud"] == 0.0)    # zero-padded, not demoted
    assert s["verts_right_gt"].shape == (778, 3)


def test_ho3d_branch(tmp_path):
    """HO3D format: 16-bit depth + red-hand mask, single right hand, and the
    reference's [3000:-3000] train slicing asymmetry."""
    from pdfnet_tpu.data.h2o import H2ODataset

    records = _single_hand_tree(tmp_path, "HO3D", with_depth=True,
                                with_mask=True)
    with open(tmp_path / "HO3D_test.pkl", "wb") as f:
        pickle.dump(records, f)
    cfg = Config(cache_path=str(tmp_path), pre_fix=str(tmp_path),
                 dataset="HO3D", sample_num=256)
    ds = H2ODataset(cfg, "test")
    s = ds.__getitem__(0)
    # red mask decoded into the RIGHT channel-slot ([right, left] order)
    assert s["mask"].shape[-1] == 2
    assert s["mask"][..., 0].sum() > 0 and s["mask"][..., 1].sum() == 0
    assert s["valid"][1] == 1 and s["valid"][0] == 0
    # depth produced a real cloud for the right hand
    assert np.abs(s["cloud"][1]).sum() > 0
    assert np.all(s["cloud"][0] == 0)


def test_onehand10k_branch(tmp_path):
    """OneHand10K format: single right hand (red mask), and the reference's
    own split slicing — test = [:1000] + [-1000:], train = [1000:-1000]
    (joint_dataset.py:107-114)."""
    from pdfnet_tpu.data.h2o import H2ODataset

    records = _single_hand_tree(tmp_path, "OneHand10K", with_depth=True,
                                with_mask=True)
    with open(tmp_path / "OneHand10K_test.pkl", "wb") as f:
        pickle.dump(records, f)
    cfg = Config(cache_path=str(tmp_path), pre_fix=str(tmp_path),
                 dataset="OneHand10K", sample_num=256)
    ds = H2ODataset(cfg, "test")
    # [:1000] + [-1000:] on 3 records -> all 3 twice (reference semantics)
    assert len(ds) == 6
    s = ds.__getitem__(0)
    assert s["input"].shape == (384, 384, 3)
    # red mask decoded into the RIGHT channel slot ([right, left] order)
    assert s["mask"][..., 0].sum() > 0 and s["mask"][..., 1].sum() == 0
    assert s["valid"][1] == 1 and s["valid"][0] == 0
    assert np.abs(s["cloud"][1]).sum() > 0 and np.all(s["cloud"][0] == 0)
    assert np.isfinite(s["hm"]).all() and s["hm"].max() > 0.9


def test_onehand10k_train_slice_excludes_test_rows():
    """Slice math on a synthetic 2500-record list (joint_dataset.py:107-114):
    train = [1000:-1000], test = [:1000] + [-1000:]."""
    from pdfnet_tpu.data.h2o import H2ODataset

    recs = list(range(2500))
    train = H2ODataset._slice_split(recs, "OneHand10K", "train")
    test = H2ODataset._slice_split(recs, "OneHand10K", "test")
    ev = H2ODataset._slice_split(recs, "OneHand10K", "eval")
    assert train == recs[1000:-1000]
    assert test == recs[:1000] + recs[-1000:]
    assert ev == recs
    assert not (set(train) & set(test))
