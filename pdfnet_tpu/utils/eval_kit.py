"""FreiHAND-style evaluation kit: alignment + PCK/AUC curves.

Reference: lib/utils/eval.py:75-404 (align_w_scale, scale/trans alignment)
and lib/utils/eval_util.py:4-94 (EvalUtil).  Used for cross-dataset
evaluation protocols (FreiHAND/HO3D-style aligned metrics).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np


def align_w_scale(mtx1: np.ndarray, mtx2: np.ndarray,
                  return_trafo: bool = False):
    """Procrustes: align mtx2 to mtx1 with rotation + scale + translation."""
    t1 = mtx1.mean(0)
    t2 = mtx2.mean(0)
    mtx1_t = mtx1 - t1
    mtx2_t = mtx2 - t2
    s1 = np.linalg.norm(mtx1_t) + 1e-8
    s2 = np.linalg.norm(mtx2_t) + 1e-8
    mtx1_t = mtx1_t / s1
    mtx2_t = mtx2_t / s2
    u, w, vt = np.linalg.svd(mtx2_t.T @ mtx1_t)
    R = (u @ vt).T
    scale = w.sum() * s1
    if return_trafo:
        return R, scale, s2, t1, t2
    return mtx2_t @ R.T * scale + t1


def align_by_trafo(mtx: np.ndarray, trafo) -> np.ndarray:
    """Apply a recorded alignment to another point set (e.g. verts)."""
    R, scale, s2, t1, t2 = trafo
    return (mtx - t2) / s2 @ R.T * scale + t1


def align_scale_trans(mtx1: np.ndarray, mtx2: np.ndarray) -> np.ndarray:
    """Scale + translation (no rotation) alignment of mtx2 to mtx1."""
    t1, t2 = mtx1.mean(0), mtx2.mean(0)
    s1 = np.linalg.norm(mtx1 - t1) + 1e-8
    s2 = np.linalg.norm(mtx2 - t2) + 1e-8
    return (mtx2 - t2) * (s1 / s2) + t1


class EvalUtil:
    """Accumulates keypoint errors; produces PCK curves, AUC, mean/median."""

    def __init__(self, num_kp: int = 21):
        self.data: List[List[float]] = [[] for _ in range(num_kp)]
        self.num_kp = num_kp

    def feed(self, keypoint_gt: np.ndarray, keypoint_vis: np.ndarray,
             keypoint_pred: np.ndarray) -> None:
        keypoint_gt = np.squeeze(keypoint_gt)
        keypoint_pred = np.squeeze(keypoint_pred)
        keypoint_vis = np.squeeze(keypoint_vis).astype(bool)
        dist = np.linalg.norm(keypoint_gt - keypoint_pred, axis=-1)
        for i in range(self.num_kp):
            if keypoint_vis[i]:
                self.data[i].append(float(dist[i]))

    def _pck(self, kp_id: int, threshold: float) -> float:
        d = np.asarray(self.data[kp_id])
        if len(d) == 0:
            return float("nan")
        return float((d <= threshold).mean())

    def get_measures(self, val_min: float, val_max: float, steps: int):
        """Returns (mean, median, auc, pck_curve_all, thresholds)."""
        thresholds = np.linspace(val_min, val_max, steps)
        norm = np.trapezoid(np.ones_like(thresholds), thresholds)

        pck_curves = []
        aucs = []
        for kp in range(self.num_kp):
            pck = np.array([self._pck(kp, t) for t in thresholds])
            pck_curves.append(pck)
            if not np.isnan(pck).any():
                aucs.append(np.trapezoid(pck, thresholds) / norm)
        all_d = np.concatenate([np.asarray(d) for d in self.data if d])
        pck_all = np.mean(np.stack(pck_curves), axis=0)
        return (float(all_d.mean()), float(np.median(all_d)),
                float(np.mean(aucs)) if aucs else float("nan"),
                pck_all, thresholds)
