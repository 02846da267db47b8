"""Checkpoint save / restore (orbax) with tolerant partial restore.

Mirrors the reference semantics (lib/utils/utils.py:37-119): checkpoints
carry {epoch, params, batch_stats, opt_state}; restore skips shape-mismatched
entries with a warning instead of failing, and can resume the optimizer with
the LR fast-forwarded through the step schedule.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from pdfnet_tpu.train.step import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    keep: int = 10) -> str:
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"model_{epoch}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": state.params, "batch_stats": state.batch_stats,
               "opt_state": state.opt_state,
               "step": np.asarray(state.step), "epoch": np.asarray(epoch)}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    # retention: keep the ``keep`` newest model_<epoch> checkpoints
    if keep and keep > 0:
        cands = sorted((d for d in os.listdir(ckpt_dir)
                        if d.startswith("model_")
                        and d.split("_")[-1].isdigit()),
                       key=lambda d: int(d.split("_")[-1]))
        for old in cands[:-keep]:
            shutil.rmtree(os.path.join(ckpt_dir, old), ignore_errors=True)
    return path


def _tolerant_merge(target: Any, loaded: Any, prefix: str = "") -> Any:
    """Replace target leaves with loaded leaves where paths + shapes match."""
    t_paths, treedef = jax.tree_util.tree_flatten_with_path(target)
    l_paths, _ = jax.tree_util.tree_flatten_with_path(loaded)
    loaded_map = {jax.tree_util.keystr(p): v for p, v in l_paths}
    out = []
    for path, val in t_paths:
        key = jax.tree_util.keystr(path)
        if key in loaded_map:
            lv = loaded_map[key]
            if getattr(lv, "shape", None) == getattr(val, "shape", None):
                out.append(lv)
                continue
            print(f"checkpoint: skip {key}: shape "
                  f"{getattr(lv, 'shape', None)} != {getattr(val, 'shape', None)}")
        else:
            print(f"checkpoint: missing {key}, keeping init")
        out.append(val)
    return jax.tree_util.tree_unflatten(treedef, out)


def load_checkpoint(path: str, state: TrainState,
                    resume_optimizer: bool = True) -> Tuple[TrainState, int]:
    """Restore into an existing state; returns (state, start_epoch)."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"params": state.params, "batch_stats": state.batch_stats,
                "opt_state": state.opt_state,
                "step": np.asarray(state.step), "epoch": np.zeros((), np.int64)}
    try:
        loaded = ckptr.restore(path, template)
    except Exception:
        # Shape drift: restore raw and merge tolerantly.
        loaded = ckptr.restore(path)
    params = _tolerant_merge(state.params, loaded.get("params", {}))
    batch_stats = _tolerant_merge(state.batch_stats,
                                  loaded.get("batch_stats", {}))
    opt_state = state.opt_state
    step = state.step
    if resume_optimizer and "opt_state" in loaded:
        try:
            opt_state = jax.tree.map(lambda a, b: b, state.opt_state,
                                     loaded["opt_state"])
            step = loaded.get("step", state.step)
        except Exception:
            print("checkpoint: optimizer state incompatible, reinitialized")
    epoch = int(np.asarray(loaded.get("epoch", 0)))
    return TrainState(params=params, batch_stats=batch_stats,
                      opt_state=opt_state, step=step), epoch


def load_variables(path: str, variables):
    """Tolerant {params, batch_stats} restore for the inference CLIs.

    Same merge semantics as load_checkpoint (path+shape-matched leaves
    overlaid onto the initialized tree, everything else kept — the
    reference load_model's skip-on-mismatch behavior, lib/utils/
    utils.py:63-79) but without optimizer state: demo/infer initialize
    the model and overlay every matching checkpoint leaf.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    template = {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})}
    try:
        loaded = ckptr.restore(path, template)
    except Exception:
        # extra keys (opt_state/epoch of a trainer checkpoint) or shape
        # drift: restore raw and merge tolerantly
        loaded = ckptr.restore(path)
    return {"params": _tolerant_merge(variables["params"],
                                      loaded.get("params", {})),
            "batch_stats": _tolerant_merge(variables.get("batch_stats", {}),
                                           loaded.get("batch_stats", {}))}


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    cands = [d for d in os.listdir(ckpt_dir) if d.startswith("model_")]
    if not cands:
        return None
    best = max(cands, key=lambda d: int(d.split("_")[-1]))
    return os.path.join(ckpt_dir, best)


def save_subtree_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                            subtree: str = "decoder") -> str:
    """Save only one top-level module's params (reference main.py:127-129
    saves a GCN-decoder-only checkpoint with buffers stripped)."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    params = state.params
    if subtree not in params:
        raise KeyError(f"no top-level module {subtree!r}; have "
                       f"{sorted(params)}")
    path = os.path.join(ckpt_dir, f"{subtree}_{epoch}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"params": {subtree: params[subtree]},
                      "epoch": np.asarray(epoch)}, force=True)
    ckptr.wait_until_finished()
    return path
