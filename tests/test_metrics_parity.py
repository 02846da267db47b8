"""Metric-pipeline + artifact-format parity vs the reference evaluator.

The oracle below transcribes the reference's accumulation math
(/root/reference/lib/trains/base_trainer.py:262-335 abs+off blocks,
:406-429 summary/score file, :328-335,431-433,486-489 H2O submission dict)
with torch on identical inputs, and the artifact tests pin our
``H2O-val.txt`` block bytes and ``hand_poses.json`` schema against the
reference writer's output format (and the checked-in
/root/reference/H2O-val.txt header block).
"""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from pdfnet_tpu.train.metrics import MetricAccumulator  # noqa: E402

REF_SCORES = "/root/reference/H2O-val.txt"


def _fake_eval_stream(n=7, seed=0):
    """Per-sample eval outputs in the shapes the evaluator consumes."""
    rng = np.random.RandomState(seed)
    stream = []
    for i in range(n):
        s = lambda *sh: rng.randn(1, *sh).astype(np.float32)
        out = dict(
            joints_pred=s(2, 21, 3) * 0.01 + 0.4,
            joints_gt=s(2, 21, 3) * 0.01 + 0.4,
            verts_pred=s(2, 778, 3) * 0.01 + 0.4,
            verts_gt=s(2, 778, 3) * 0.01 + 0.4,
            joints_pred_off=s(2, 21, 3) * 0.01,
            joints_gt_off=s(2, 21, 3) * 0.01,
            verts_pred_off=s(2, 778, 3) * 0.01,
            verts_gt_off=s(2, 778, 3) * 0.01,
            lms21_pred=s(2, 21, 2) * 5 + 192,
        )
        batch = dict(
            lms_left_gt=s(21, 2)[0][None] * 5 + 192,
            lms_right_gt=s(21, 2)[0][None] * 5 + 192,
            # 7 frames over 3 actions, sequential like the H2O val loader
            id=np.array([1 + (i >= 3) + (i >= 5)], np.int64),
            frame_num=np.array([10 + i], np.int64),
        )
        stream.append((out, batch))
    return stream


def _reference_oracle(stream):
    """The reference evaluation loop at bs=1, verbatim math.

    Mirrors base_trainer.py:220-231 (accumulators), :262-283 (abs block),
    :291-323 (off block), :275 (lms), :328-335 + :431-433 (H2O dict),
    :406-429 (per-split division + score lines).
    """
    t = torch.from_numpy
    hand_num = 2  # noqa: F841  (mirrors :221)
    left_joints_loss_all = right_joints_loss_all = 0
    left_verts_loss_all = right_verts_loss_all = 0
    left_joints_loss_all_off = right_joints_loss_all_off = 0
    left_verts_loss_all_off = right_verts_loss_all_off = 0
    lms_loss_all = 0
    H2O_list = {"modality": "RGBD"}
    local_list = {}
    action_id = 1

    for out, data in stream:
        joints_pred, joints_gt = t(out["joints_pred"]), t(out["joints_gt"])
        vertex_pred, vertex_gt = t(out["verts_pred"]), t(out["verts_gt"])
        lms21_pred = t(out["lms21_pred"])

        joint_left_loss = torch.norm(
            joints_pred[:, 0] - joints_gt[:, 0], dim=-1).numpy()
        joint_right_loss = torch.norm(
            joints_pred[:, 1] - joints_gt[:, 1], dim=-1).numpy()
        vert_left_loss = torch.norm(
            vertex_pred[:, 0] - vertex_gt[:, 0], dim=-1).numpy()
        vert_right_loss = torch.norm(
            vertex_pred[:, 1] - vertex_gt[:, 1], dim=-1).numpy()
        lms_left_loss = torch.norm(
            lms21_pred[:, 0] - t(data["lms_left_gt"]), dim=-1).numpy()
        lms_right_loss = torch.norm(
            lms21_pred[:, 1] - t(data["lms_right_gt"]), dim=-1).numpy()

        lms_loss_all += (lms_left_loss + lms_right_loss).mean() / 2
        left_joints_loss_all += joint_left_loss.mean() * 1000
        right_joints_loss_all += joint_right_loss.mean() * 1000
        left_verts_loss_all += vert_left_loss.mean() * 1000
        right_verts_loss_all += vert_right_loss.mean() * 1000

        jp_off, jg_off = t(out["joints_pred_off"]), t(out["joints_gt_off"])
        vp_off, vg_off = t(out["verts_pred_off"]), t(out["verts_gt_off"])
        left_joints_loss_all_off += torch.norm(
            jp_off[:, 0] - jg_off[:, 0], dim=-1).numpy().mean() * 1000
        right_joints_loss_all_off += torch.norm(
            jp_off[:, 1] - jg_off[:, 1], dim=-1).numpy().mean() * 1000
        left_verts_loss_all_off += torch.norm(
            vp_off[:, 0] - vg_off[:, 0], dim=-1).numpy().mean() * 1000
        right_verts_loss_all_off += torch.norm(
            vp_off[:, 1] - vg_off[:, 1], dim=-1).numpy().mean() * 1000

        # H2O submission dict (base_trainer.py:328-335)
        if data["id"][0] == action_id + 1:
            H2O_list.update({"{}".format(action_id): local_list})
            action_id = action_id + 1
            local_list = {}
        frame_num = data["frame_num"][0]
        local_list.update({"{:06d}.txt".format(frame_num):
                           joints_pred.reshape(-1).tolist()})
    H2O_list.update({"{}".format(action_id): local_list})  # :431-433

    n = len(stream)
    metrics = dict(
        abs_left_joints_loss_all=left_joints_loss_all / n,
        abs_right_joints_loss_all=right_joints_loss_all / n,
        abs_left_verts_loss_all=left_verts_loss_all / n,
        abs_right_verts_loss_all=right_verts_loss_all / n,
        off_left_joints_loss_all=left_joints_loss_all_off / n,
        off_right_joints_loss_all=right_joints_loss_all_off / n,
        off_left_verts_loss_all=left_verts_loss_all_off / n,
        off_right_verts_loss_all=right_verts_loss_all_off / n,
        lms=lms_loss_all / n,
    )
    # the exact score-file block the reference appends (:420-429)
    block = "eval \n"
    for name in ("abs_left_joints_loss_all", "abs_right_joints_loss_all",
                 "abs_left_verts_loss_all", "abs_right_verts_loss_all",
                 "off_left_joints_loss_all", "off_right_joints_loss_all",
                 "off_left_verts_loss_all", "off_right_verts_loss_all"):
        block += "%s: %.2f\n" % (name, metrics[name])
    return metrics, block, H2O_list


OUR_KEY = dict(abs_left_joints_loss_all="abs_mpjpe_left",
               abs_right_joints_loss_all="abs_mpjpe_right",
               abs_left_verts_loss_all="abs_mpvpe_left",
               abs_right_verts_loss_all="abs_mpvpe_right",
               off_left_joints_loss_all="off_mpjpe_left",
               off_right_joints_loss_all="off_mpjpe_right",
               off_left_verts_loss_all="off_mpvpe_left",
               off_right_verts_loss_all="off_mpvpe_right",
               lms="lms_px")


def test_accumulator_matches_reference_math_bs1():
    stream = _fake_eval_stream()
    ref, _, _ = _reference_oracle(stream)
    acc = MetricAccumulator()
    for out, batch in stream:
        acc.update(out, batch)
    ours = acc.result()
    for ref_name, our_name in OUR_KEY.items():
        np.testing.assert_allclose(ours[our_name], ref[ref_name], rtol=1e-5,
                                   err_msg=ref_name)


def test_accumulator_matches_reference_math_batched_padded():
    """One padded 8-row batch == the reference's 7 bs=1 steps exactly."""
    stream = _fake_eval_stream()
    ref, _, _ = _reference_oracle(stream)
    out = {k: np.concatenate([o[k] for o, _ in stream] + [stream[0][0][k]])
           for k in stream[0][0]}
    batch = {k: np.concatenate([b[k] for _, b in stream] + [stream[0][1][k]])
             for k in stream[0][1]}
    batch["pad_mask"] = np.array([1] * 7 + [0], np.float32)  # padded tail row
    acc = MetricAccumulator()
    acc.update(out, batch)
    ours = acc.result()
    for ref_name, our_name in OUR_KEY.items():
        np.testing.assert_allclose(ours[our_name], ref[ref_name], rtol=1e-5,
                                   err_msg=ref_name)


def test_score_block_bytes_match_reference_writer():
    stream = _fake_eval_stream()
    _, ref_block, _ = _reference_oracle(stream)
    acc = MetricAccumulator()
    for out, batch in stream:
        acc.update(out, batch)
    assert acc.format_block() == ref_block


@pytest.mark.skipif(not os.path.exists(REF_SCORES),
                    reason="reference H2O-val.txt not available")
def test_score_block_shape_matches_checked_in_reference_file():
    """Line names/order/format identical to /root/reference/H2O-val.txt:1-9."""
    with open(REF_SCORES) as f:
        ref_lines = [f.readline() for _ in range(9)]
    acc = MetricAccumulator()
    acc.update(*_fake_eval_stream(n=1)[0])
    ours = acc.format_block().splitlines(keepends=True)
    assert len(ours) == 9
    assert ours[0] == ref_lines[0]            # 'eval \n' incl trailing space
    for our_line, ref_line in zip(ours[1:], ref_lines[1:]):
        name, val = our_line.split(": ")
        ref_name, ref_val = ref_line.split(": ")
        assert name == ref_name
        float(val)                            # '%.2f\n' parses
        assert len(val.rstrip("\n").split(".")[1]) == 2


def test_h2o_submission_identical_bs1_vs_batched(tmp_path):
    """A padded batched eval writes the exact hand_poses.json of a bs=1 run
    (the reference can only produce it at bs=1, base_trainer.py:486)."""
    stream = _fake_eval_stream()
    acc1 = MetricAccumulator()
    for out, batch in stream:
        acc1.update(out, batch)
    accB = MetricAccumulator()
    out = {k: np.concatenate([o[k] for o, _ in stream] + [stream[0][0][k]])
           for k in stream[0][0]}
    batch = {k: np.concatenate([b[k] for _, b in stream] + [stream[0][1][k]])
             for k in stream[0][1]}
    batch["pad_mask"] = np.array([1] * 7 + [0], np.float32)
    accB.update(out, batch)
    p1 = os.path.join(tmp_path, "bs1.json")
    pB = os.path.join(tmp_path, "batched.json")
    acc1.write_h2o_submission(p1)
    accB.write_h2o_submission(pB)
    with open(p1) as f1, open(pB) as fB:
        assert f1.read() == fB.read()


def test_h2o_submission_json_matches_reference_writer(tmp_path):
    stream = _fake_eval_stream()
    _, _, ref_dict = _reference_oracle(stream)
    acc = MetricAccumulator()
    for out, batch in stream:
        acc.update(out, batch)
    path = os.path.join(tmp_path, "hand_poses.json")
    acc.write_h2o_submission(path)
    with open(path) as f:
        ours = json.load(f)
    # identical schema AND values (json round-trips the reference dict too,
    # matching base_trainer.py:486-489's json.dump)
    assert ours == json.loads(json.dumps(ref_dict))


# ---------------------------------------------------------------------------
# FreiHAND-protocol scorer parity (reference lib/utils/eval.py:205-383 main
# + eval_util.py EvalUtil + align_sc_tr/align_w_scale).  The oracle below
# transcribes the reference math (numpy/scipy, no torch) and every
# scores.txt key must match our kit to 1e-6.
# ---------------------------------------------------------------------------

def _ref_align_w_scale(mtx1, mtx2, return_trafo=False):
    """Reference eval.py:96-119 verbatim math (scipy orthogonal_procrustes)."""
    from scipy.linalg import orthogonal_procrustes
    t1 = mtx1.mean(0)
    t2 = mtx2.mean(0)
    mtx1_t = mtx1 - t1
    mtx2_t = mtx2 - t2
    s1 = np.linalg.norm(mtx1_t) + 1e-8
    mtx1_t /= s1
    s2 = np.linalg.norm(mtx2_t) + 1e-8
    mtx2_t /= s2
    R, s = orthogonal_procrustes(mtx1_t, mtx2_t)
    mtx2_t = np.dot(mtx2_t, R.T) * s
    mtx2_t = mtx2_t * s1 + t1
    if return_trafo:
        return R, s, s1, s2, t1, t2
    return mtx2_t


def _ref_align_sc_tr(mtx1, mtx2):
    """Reference eval.py:75-93 verbatim math."""
    predCurr = mtx2.copy()
    s = np.sqrt(np.sum(np.square(predCurr[4] - predCurr[0])))
    if s > 0:
        predCurr = predCurr / s
    sGT = np.sqrt(np.sum(np.square(mtx1[4] - mtx1[0])))
    predCurr = predCurr * sGT
    predCurrRel = predCurr - predCurr[0:1, :]
    return predCurrRel + mtx1[0:1, :]


class _RefEvalUtil:
    """Reference eval_util.py:4-94 math: per-keypoint accumulation with
    mean-of-per-keypoint-means aggregation and per-keypoint AUC."""

    def __init__(self, num_kp=21):
        self.data = [list() for _ in range(num_kp)]
        self.num_kp = num_kp

    def feed(self, gt, vis, pred):
        dist = np.sqrt(np.sum(np.square(gt - pred), axis=1))
        for i in range(gt.shape[0]):
            if vis[i]:
                self.data[i].append(dist[i])

    def get_measures(self, val_min, val_max, steps):
        thresholds = np.linspace(val_min, val_max, steps)
        norm_factor = np.trapezoid(np.ones_like(thresholds), thresholds)
        epe_mean_all, auc_all, pck_curve_all = [], [], []
        for part_id in range(self.num_kp):
            if len(self.data[part_id]) == 0:
                continue
            d = np.array(self.data[part_id])
            epe_mean_all.append(np.mean(d))
            pck_curve = np.array(
                [np.mean((d <= t).astype("float")) for t in thresholds])
            pck_curve_all.append(pck_curve)
            auc_all.append(np.trapezoid(pck_curve, thresholds) / norm_factor)
        return (np.mean(np.array(epe_mean_all)), None,
                np.mean(np.array(auc_all)),
                np.mean(np.array(pck_curve_all), 0), thresholds)


def _ref_scorer(gt_xyz_list, gt_verts_list, pred_xyz_list, pred_verts_list):
    """Reference eval.py:205-371 main() scorer math; returns the 10-key
    scores dict exactly as written to scores.txt (cm via unconditional
    x100, -100.0 for absent mesh means)."""
    eval_xyz, eval_xyz_pa, eval_xyz_sc = (
        _RefEvalUtil(), _RefEvalUtil(), _RefEvalUtil())
    eval_mesh, eval_mesh_al = _RefEvalUtil(778), _RefEvalUtil(778)
    shape_is_mano = None
    for idx in range(len(pred_verts_list)):
        xyz = np.array(gt_xyz_list[idx])
        verts = np.array(gt_verts_list[idx])
        xyz_pred = np.array(pred_xyz_list[idx])
        verts_pred = np.array(pred_verts_list[idx])
        eval_xyz.feed(xyz, np.ones_like(xyz[:, 0]), xyz_pred)
        if shape_is_mano is None:
            shape_is_mano = verts_pred.shape[0] == verts.shape[0]
        if shape_is_mano:
            eval_mesh.feed(verts, np.ones_like(verts[:, 0]), verts_pred)
        eval_xyz_sc.feed(xyz, np.ones_like(xyz[:, 0]),
                         _ref_align_sc_tr(xyz, xyz_pred))
        xyz_pred_al = _ref_align_w_scale(xyz, xyz_pred)
        if shape_is_mano:
            verts_pred_al = _ref_align_w_scale(verts, verts_pred)
            eval_mesh_al.feed(verts, np.ones_like(verts[:, 0]),
                              verts_pred_al)
        eval_xyz_pa.feed(xyz, np.ones_like(xyz[:, 0]), xyz_pred_al)
    xyz_m, _, xyz_auc, _, _ = eval_xyz.get_measures(0.0, 0.05, 100)
    pa_m, _, pa_auc, _, _ = eval_xyz_pa.get_measures(0.0, 0.05, 100)
    sc_m, _, sc_auc, _, _ = eval_xyz_sc.get_measures(0.0, 0.05, 100)
    if shape_is_mano:
        mesh_m, _, mesh_auc, _, _ = eval_mesh.get_measures(0.0, 0.05, 100)
        mal_m, _, mal_auc, _, _ = eval_mesh_al.get_measures(0.0, 0.05, 100)
    else:
        mesh_m, mesh_auc, mal_m, mal_auc = -1.0, -1.0, -1.0, -1.0
    return {
        "xyz_mean3d": xyz_m * 100, "xyz_auc3d": xyz_auc,
        "xyz_procrustes_al_mean3d": pa_m * 100,
        "xyz_procrustes_al_auc3d": pa_auc,
        "xyz_scale_trans_al_mean3d": sc_m * 100,
        "xyz_scale_trans_al_auc3d": sc_auc,
        "mesh_mean3d": mesh_m * 100, "mesh_auc3d": mesh_auc,
        "mesh_al_mean3d": mal_m * 100, "mesh_al_auc3d": mal_auc,
    }


def _freihand_fixtures(n=6, seed=3):
    rng = np.random.RandomState(seed)
    th = 0.4
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1.0]])
    gt_xyz = [rng.randn(21, 3) * 0.05 for _ in range(n)]
    gt_verts = [rng.randn(778, 3) * 0.05 for _ in range(n)]
    pred_xyz = [x @ R.T * 1.1 + 0.02 + rng.randn(21, 3) * 1e-3
                for x in gt_xyz]
    pred_verts = [v @ R.T * 1.1 + 0.02 + rng.randn(778, 3) * 1e-3
                  for v in gt_verts]
    return gt_xyz, gt_verts, pred_xyz, pred_verts


def test_freihand_scorer_matches_reference_math(tmp_path):
    from pdfnet_tpu.utils.eval_kit import score_predictions

    gt_xyz, gt_verts, pred_xyz, pred_verts = _freihand_fixtures()
    ref = _ref_scorer(gt_xyz, gt_verts, pred_xyz, pred_verts)
    out = str(tmp_path)
    ours = score_predictions(gt_xyz, gt_verts, pred_xyz, pred_verts,
                             output_dir=out, f_scores=False)
    assert set(ours) == set(ref)
    for k, v in ref.items():
        assert abs(ours[k] - v) < 1e-6, (k, ours[k], v)
    # scores.txt: reference-identical key set, order, and %f formatting
    with open(os.path.join(out, "scores.txt")) as f:
        lines = f.read().splitlines()
    assert lines == [f"{k}: {v:f}" for k, v in ours.items()]


def test_freihand_scorer_non_mano_branch(tmp_path):
    """Non-MANO-topology predictions: mesh keys carry the reference's
    unconditional-x100 quirk (-100.0 means / -1.0 AUCs, eval.py:330-366)."""
    from pdfnet_tpu.utils.eval_kit import score_predictions

    gt_xyz, gt_verts, pred_xyz, pred_verts = _freihand_fixtures(n=3, seed=5)
    pred_verts = [v[:400] for v in pred_verts]       # not 778 rows
    ref = _ref_scorer(gt_xyz, gt_verts, pred_xyz, pred_verts)
    ours = score_predictions(gt_xyz, gt_verts, pred_xyz, pred_verts,
                             output_dir=None, f_scores=False)
    assert ref["mesh_mean3d"] == -100.0
    for k, v in ref.items():
        assert abs(ours[k] - v) < 1e-6, (k, ours[k], v)
