"""Model-data assets: MANO hand model + GCN mesh-coarsening graphs.

The original distribution ships these as Python pickles containing chumpy /
scipy-sparse / torch objects (``lib/models/hand3d/mano_core/MANO_*.pkl``,
``lib/models/networks/gcn_core/*.pkl`` in the reference).  We convert them
once into plain ``.npz`` archives of dense float32 arrays so the framework
has zero pickle/chumpy/torch dependencies at runtime and the arrays can be
fed straight to the TPU.

Run ``python -m pdfnet_tpu.assets.convert --src <reference_root>`` (or call
:func:`build_assets`) to produce the caches; afterwards :func:`load_mano`
and friends are pure-numpy loads.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, List, NamedTuple

import numpy as np

ASSET_DIR = os.path.dirname(os.path.abspath(__file__))

# MANO joint re-ordering: wrist, thumb(4), index(4), middle(4), ring(4),
# pinky(4) -> standard 21-joint layout (manolayer.py:110-115).
NEW_ORDER = [0, 13, 14, 15, 16, 1, 2, 3, 17, 4, 5, 6, 18, 10, 11, 12, 19, 7, 8, 9, 20]

# Fingertip vertex ids appended after the 16 kinematic joints.
# ManoLayer uses 445 for the left middle fingertip, 444 for the right
# (manolayer.py:305-308); the SMPL-X-style regressor uses 444 for both
# (Mano_model.py:311-316).  Both variants are preserved.
TIP_VERTS_LEFT = [745, 317, 445, 556, 673]
TIP_VERTS_RIGHT = [745, 317, 444, 556, 673]
TIP_VERTS_REGRESSOR = [745, 317, 444, 556, 673]


class _ChumpyStub:
    """Placeholder standing in for chumpy classes during unpickling."""

    def __init__(self, *a, **k):  # pragma: no cover - never called by pickle
        pass


class _ChumpyUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("chumpy"):
            return type(name, (_ChumpyStub,), {"__module__": module})
        return super().find_class(module, name)


def _densify_chumpy(obj: Any) -> np.ndarray:
    """Recover the dense ndarray from a stubbed-out chumpy expression.

    MANO's ``shapedirs`` is a ``chumpy.reordering.Select`` holding a source
    array ``a.x`` (778, 3, 2*n_betas) and flat indices ``idxs`` selecting the
    first ``n_betas`` shape directions.
    """
    if isinstance(obj, np.ndarray):
        return obj
    d = vars(obj)
    if "x" in d:
        return np.asarray(d["x"])
    if "a" in d and "idxs" in d:
        src = _densify_chumpy(d["a"]).ravel()
        out = src[np.asarray(d["idxs"])]
        shape = d.get("preferred_shape")
        if shape:
            out = out.reshape(shape)
        else:
            out = out.reshape(778, 3, -1)
        return out
    raise ValueError(f"cannot densify chumpy object with fields {list(d)}")


def convert_mano_pkl(path: str) -> Dict[str, np.ndarray]:
    """Load a MANO pickle and return plain float32/int32 arrays."""
    with open(path, "rb") as f:
        raw = _ChumpyUnpickler(f, encoding="latin1").load()

    j_reg = raw["J_regressor"]
    if not isinstance(j_reg, np.ndarray):
        j_reg = np.asarray(j_reg.todense())

    return {
        "v_template": np.asarray(raw["v_template"], np.float32),        # (778, 3)
        "shapedirs": _densify_chumpy(raw["shapedirs"]).astype(np.float32),  # (778, 3, 10)
        "posedirs": np.asarray(raw["posedirs"], np.float32),            # (778, 3, 135)
        "J_regressor": j_reg.astype(np.float32),                        # (16, 778)
        "J_zero": np.asarray(raw["J"], np.float32),                     # (16, 3)
        "weights": np.asarray(raw["weights"], np.float32),              # (778, 16)
        "hands_components": np.asarray(raw["hands_components"], np.float32),  # (45, 45)
        "hands_mean": np.asarray(raw["hands_mean"], np.float32),        # (45,)
        "faces": np.asarray(raw["f"], np.int32),                        # (1538, 3)
        "kintree_parent": np.asarray(raw["kintree_table"][0], np.int32),  # (16,)
    }


def convert_graph_pkl(path: str) -> Dict[str, np.ndarray]:
    """Convert an IntagHand mesh-coarsening graph pickle to dense arrays.

    The pickle stores rescaled graph Laplacians of the coarsened hand mesh at
    1008/504/252/126/63 vertices (scipy CSR) plus the permutation mapping MANO
    vertex order <-> padded coarsening order.
    """
    with open(path, "rb") as f:
        raw = pickle.load(f)
    out: Dict[str, np.ndarray] = {
        "graph_perm": np.asarray(raw["graph_perm"], np.int32),
        "graph_perm_reverse": np.asarray(raw["graph_perm_reverse"], np.int32),
        "mesh_faces": np.asarray(raw["mesh_faces"], np.int32),
    }
    for i, L in enumerate(raw["coarsen_graphs_L"]):
        out[f"L{i}"] = np.asarray(L.todense(), np.float32)
    out["num_levels"] = np.int32(len(raw["coarsen_graphs_L"]))
    return out


def build_assets(reference_root: str, asset_dir: str = ASSET_DIR) -> None:
    """One-time conversion of all pickled assets into .npz caches."""
    mano_dir = os.path.join(reference_root, "lib/models/hand3d/mano_core")
    gcn_dir = os.path.join(reference_root, "lib/models/networks/gcn_core")
    os.makedirs(asset_dir, exist_ok=True)
    for side, name in (("left", "MANO_LEFT.pkl"), ("right", "MANO_RIGHT.pkl")):
        np.savez_compressed(
            os.path.join(asset_dir, f"mano_{side}.npz"),
            **convert_mano_pkl(os.path.join(mano_dir, name)),
        )
    for side in ("left", "right"):
        np.savez_compressed(
            os.path.join(asset_dir, f"graph_{side}.npz"),
            **convert_graph_pkl(os.path.join(gcn_dir, f"graph_{side}.pkl")),
        )
    with open(os.path.join(gcn_dir, "upsample.pkl"), "rb") as f:
        up = np.asarray(pickle.load(f), np.float32)  # (778, 252)
    with open(os.path.join(gcn_dir, "v_color.pkl"), "rb") as f:
        vc = np.asarray(pickle.load(f), np.float32)  # (778, 3)
    np.savez_compressed(os.path.join(asset_dir, "mesh_extras.npz"),
                        upsample=up, dense_coor=vc)


class ManoData(NamedTuple):
    """Dense MANO model arrays (numpy, host-side; move to device as needed)."""

    v_template: np.ndarray       # (778, 3)
    shapedirs: np.ndarray        # (778, 3, 10)
    posedirs: np.ndarray         # (778, 3, 135)
    J_regressor: np.ndarray      # (16, 778)
    weights: np.ndarray          # (778, 16)
    hands_components: np.ndarray  # (45, 45)
    hands_mean: np.ndarray       # (45,)
    faces: np.ndarray            # (1538, 3) int32
    parent: np.ndarray           # (16,) int32, parent[0] undefined
    tip_verts: np.ndarray        # (5,) int32
    side: str


class GraphData(NamedTuple):
    """Coarsened-mesh graph pyramid for one hand."""

    laplacians: List[np.ndarray]     # dense L at [63, 126, 252, 504, 1008] verts
    graph_perm: np.ndarray           # (1008,) MANO(padded) -> graph order
    graph_perm_reverse: np.ndarray   # (1008,) graph order -> MANO(padded)
    mesh_faces: np.ndarray           # (1538, 3)


_MANO_CACHE: Dict[str, ManoData] = {}
_GRAPH_CACHE: Dict[str, GraphData] = {}
_EXTRAS_CACHE: Dict[str, np.ndarray] = {}


def load_mano(side: str, fix_shape: bool = True) -> ManoData:
    """Load MANO data for one hand.

    ``fix_shape`` applies the well-known left-hand shapedirs sign fix
    (interhand.py:120-123): the distributed left model's first shape
    direction is mirrored; flip it so left/right differ as intended.
    """
    key = f"{side}:{fix_shape}"
    if key in _MANO_CACHE:
        return _MANO_CACHE[key]
    with np.load(os.path.join(ASSET_DIR, f"mano_{side}.npz")) as z:
        shapedirs = z["shapedirs"]
        if side == "left" and fix_shape:
            right = np.load(os.path.join(ASSET_DIR, "mano_right.npz"))
            if float(np.abs(shapedirs[:, 0, :] - right["shapedirs"][:, 0, :]).sum()) < 1:
                shapedirs = shapedirs.copy()
                shapedirs[:, 0, :] *= -1
            right.close()
        data = ManoData(
            v_template=z["v_template"],
            shapedirs=shapedirs,
            posedirs=z["posedirs"],
            J_regressor=z["J_regressor"],
            weights=z["weights"],
            hands_components=z["hands_components"],
            hands_mean=z["hands_mean"],
            faces=z["faces"],
            parent=z["kintree_parent"],
            tip_verts=np.asarray(
                TIP_VERTS_LEFT if side == "left" else TIP_VERTS_RIGHT, np.int32
            ),
            side=side,
        )
    _MANO_CACHE[key] = data
    return data


def load_graph(side: str) -> GraphData:
    if side in _GRAPH_CACHE:
        return _GRAPH_CACHE[side]
    with np.load(os.path.join(ASSET_DIR, f"graph_{side}.npz")) as z:
        n = int(z["num_levels"])
        # Stored coarse-to-fine as saved (1008...63); expose fine index 0 = 63
        # to match the decoder's reversed ordering (intaghand_decoder.py:99-100).
        laps = [z[f"L{i}"] for i in range(n)][::-1]
        data = GraphData(
            laplacians=laps,
            graph_perm=z["graph_perm"],
            graph_perm_reverse=z["graph_perm_reverse"],
            mesh_faces=z["mesh_faces"],
        )
    _GRAPH_CACHE[side] = data
    return data


def load_mesh_extras() -> Dict[str, np.ndarray]:
    """Upsample matrix (778x252) and dense vertex color coords (778x3)."""
    if not _EXTRAS_CACHE:
        with np.load(os.path.join(ASSET_DIR, "mesh_extras.npz")) as z:
            _EXTRAS_CACHE["upsample"] = z["upsample"]
            _EXTRAS_CACHE["dense_coor"] = z["dense_coor"]
    return dict(_EXTRAS_CACHE)


def full_regressor(side: str) -> np.ndarray:
    """21x778 joint regressor incl. fingertips (Mano_model.py:309-323)."""
    mano = load_mano(side)
    tips = np.zeros((5, 778), np.float32)
    for i, v in enumerate(TIP_VERTS_REGRESSOR):
        tips[i, v] = 1.0
    reg = np.concatenate([mano.J_regressor, tips], axis=0)
    return reg[NEW_ORDER].copy()
