"""Tests: rasterizer, SH lighting, eval kit, vis, augmentation math."""

import jax
import jax.numpy as jnp
import numpy as np

from pdfnet_tpu import assets
from pdfnet_tpu.data import augment as aug
from pdfnet_tpu.render import rasterize_mesh, render_two_hands, sh_illumination
from pdfnet_tpu.utils.eval_kit import EvalUtil, align_w_scale, align_sc_tr
from pdfnet_tpu.utils.vis import draw_hand_skeleton


def test_rasterizer_single_triangle():
    v2d = jnp.asarray([[8.0, 4.0], [56.0, 4.0], [32.0, 56.0]])
    z = jnp.asarray([0.5, 0.5, 0.5])
    faces = jnp.asarray([[0, 1, 2]], jnp.int32)
    zbuf, fid, bary = rasterize_mesh(v2d, z, faces, 64, 64)
    zbuf, fid = np.asarray(zbuf), np.asarray(fid)
    assert fid[30, 32] == 0                       # centroid hit
    assert abs(zbuf[30, 32] - 0.5) < 1e-5
    assert fid[2, 2] == -1                        # corner miss
    assert zbuf[2, 2] == 0.0


def test_rasterizer_depth_order():
    # two stacked triangles; the nearer one must win
    v2d = jnp.asarray([[8.0, 4.0], [56.0, 4.0], [32.0, 56.0],
                       [8.0, 4.0], [56.0, 4.0], [32.0, 56.0]])
    z = jnp.asarray([0.9, 0.9, 0.9, 0.4, 0.4, 0.4])
    faces = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
    zbuf, fid, _ = rasterize_mesh(v2d, z, faces, 64, 64)
    assert int(fid[30, 32]) == 1
    assert abs(float(zbuf[30, 32]) - 0.4) < 1e-5


def test_render_two_hands_shapes():
    from pdfnet_tpu.mano import load_mano_consts, mano_forward
    cl = load_mano_consts("left")
    cr = load_mano_consts("right")
    vl, _ = mano_forward(cl, jnp.zeros((1, 3)), jnp.zeros((1, 45)),
                         jnp.zeros((1, 10)),
                         trans=jnp.asarray([[-0.06, 0.0, 0.5]]))
    vr, _ = mano_forward(cr, jnp.zeros((1, 3)), jnp.zeros((1, 45)),
                         jnp.zeros((1, 10)),
                         trans=jnp.asarray([[0.06, 0.0, 0.5]]))
    K = jnp.asarray([[120.0, 0, 48], [0, 120.0, 48], [0, 0, 1]])
    rgb, mask, depth = render_two_hands(
        vl[0], vr[0], K, assets.load_mano("left").faces,
        assets.load_mano("right").faces, 96, 96)
    rgb, mask, depth = map(np.asarray, (rgb, mask, depth))
    assert rgb.shape == (96, 96, 3) and mask.shape == (96, 96)
    assert mask.sum() > 100                       # hands visible
    d = depth[mask > 0]
    assert 0.3 < d.min() < d.max() < 0.8          # plausible depth band


def test_sh_illumination_dc_only():
    albedo = jnp.ones((1, 10, 3))
    normals = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (10, 1))[None]
    gamma = jnp.zeros((1, 27))                    # DC boosted internally
    color, lighting = sh_illumination(albedo, normals, gamma)
    # flat lighting: all vertices identical, wherever the normal points
    assert np.allclose(np.asarray(lighting[0, 0]), np.asarray(lighting[0, 5]))
    assert np.asarray(color).shape == (1, 10, 3)


def test_align_w_scale_recovers_transform():
    rng = np.random.RandomState(0)
    x = rng.randn(21, 3)
    theta = 0.7
    R = np.array([[np.cos(theta), -np.sin(theta), 0],
                  [np.sin(theta), np.cos(theta), 0], [0, 0, 1]])
    y = 1.7 * x @ R.T + np.array([0.3, -0.2, 1.0])
    aligned = align_w_scale(y, x)
    np.testing.assert_allclose(aligned, y, atol=1e-6)
    # bone-scale + wrist-pin alignment (reference align_sc_tr semantics):
    # a scaled+shifted copy aligns back exactly — wrist matches GT wrist
    # and the |j4-j0| bone length matches GT
    st = align_sc_tr(y, y * 2.0 + 5.0)
    np.testing.assert_allclose(st, y, atol=1e-8)
    assert np.abs(st[0] - y[0]).max() < 1e-12


def test_evalutil_pck_auc():
    ev = EvalUtil()
    gt = np.zeros((21, 3))
    pred = np.zeros((21, 3))
    pred[:, 0] = 0.01                              # constant 10mm error
    for _ in range(5):
        ev.feed(gt, np.ones(21), pred)
    mean, median, auc, pck, th = ev.get_measures(0.0, 0.05, 20)
    assert abs(mean - 0.01) < 1e-9
    assert 0.5 < auc < 1.0
    assert pck[0] == 0.0 and pck[-1] == 1.0


def test_affine_roundtrip_and_intrinsics():
    c = np.array([320.0, 240.0], np.float32)
    trans, inv = aug.get_affine_transform(c, 640.0, 0, (384, 384))
    pt = np.array([[100.0, 200.0]], np.float32)
    fwd = aug.affine_transform_points(pt, trans)
    back = aug.affine_transform_points(fwd, inv)
    np.testing.assert_allclose(back, pt, atol=1e-3)

    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]], np.float32)
    K2 = aug.update_intrinsics(K, trans)
    # a 3D point projected with K then warped == projected with K2
    p3 = np.array([0.1, -0.05, 0.6])
    uv1 = (K @ p3)[:2] / p3[2]
    uv2 = (K2 @ p3)[:2] / p3[2]
    np.testing.assert_allclose(
        aug.affine_transform_points(uv1[None].astype(np.float32), trans)[0],
        uv2, atol=1e-3)


def test_rotation_point_matrix_consistency():
    """3D points through rot_point must project onto rotated 2D points."""
    res = 384
    K = np.array([[480.0, 0, 192], [0, 480.0, 192], [0, 0, 1]], np.float32)
    c = np.array([res / 2, res / 2], np.float32)
    rot = 30.0
    trans2, _ = aug.get_affine_transform(c, float(res), rot, (res, res))
    m = aug.rotation_point_matrix(trans2, K, rot)
    p3 = np.array([[0.05, -0.08, 0.6], [0.0, 0.0, 0.55]], np.float32)
    uv = (p3 @ K.T)
    uv = uv[:, :2] / uv[:, 2:]
    uv_rot = aug.affine_transform_points(uv.astype(np.float32), trans2)
    p3_rot = p3 @ m.T
    uv2 = p3_rot @ K.T
    uv2 = uv2[:, :2] / uv2[:, 2:]
    np.testing.assert_allclose(uv2, uv_rot, atol=0.5)  # sub-pixel


def test_skeleton_drawing():
    img = np.zeros((96, 96, 3), np.uint8)
    joints = np.stack([np.linspace(10, 80, 21), np.linspace(10, 80, 21)], 1)
    out = draw_hand_skeleton(img, joints)
    assert out.sum() > 0


def test_freihand_scorer(tmp_path):
    """Full FreiHAND-protocol scorer (reference eval.py:205-383)."""
    from pdfnet_tpu.utils.eval_kit import score_predictions

    rng = np.random.RandomState(0)
    gt_xyz = [rng.randn(21, 3) * 0.05 for _ in range(4)]
    gt_verts = [rng.randn(778, 3) * 0.05 for _ in range(4)]
    # predictions = rotated + scaled + shifted GT plus small noise:
    # raw error is large, procrustes-aligned error is the noise floor
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    pred_xyz = [x @ R.T * 1.1 + 0.02 + rng.randn(21, 3) * 1e-4
                for x in gt_xyz]
    pred_verts = [v @ R.T * 1.1 + 0.02 + rng.randn(778, 3) * 1e-4
                  for v in gt_verts]
    out = str(tmp_path)
    s = score_predictions(gt_xyz, gt_verts, pred_xyz, pred_verts, out)
    assert s["xyz_procrustes_al_mean3d"] < 0.1        # cm, ~noise floor
    assert s["xyz_mean3d"] > s["xyz_scale_trans_al_mean3d"] \
        > s["xyz_procrustes_al_mean3d"]
    assert s["mesh_al_auc3d"] > 0.95
    assert 0 <= s["f_score_5"] <= 1
    # artifacts exist and the html embeds all five curves
    txt = open(f"{out}/scores.txt").read()
    assert "xyz_procrustes_al_mean3d" in txt and "f_al_score_15" in txt
    html = open(f"{out}/scores2.html").read()
    assert html.count("<svg") == 5 and "PCV curve" in html


def test_fscore_perfect_match():
    from pdfnet_tpu.utils.eval_kit import calculate_fscore
    pts = np.random.RandomState(1).randn(50, 3)
    f, p, r = calculate_fscore(pts, pts, 0.005)
    assert f == 1.0 and p == 1.0 and r == 1.0
