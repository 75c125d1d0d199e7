"""Checkpoint save/restore with the reference's bookkeeping semantics.

Role of the reference torch ``.tar`` checkpoints
(``/root/reference/Python/Soccer/PlayerReconstruction/player_recon.py:803-831``
and ``utils/checkpoint_utils.py:4-26``): a dict carrying {epoch, best_epoch,
best_epoch_val_metrics, model_state_dict, best_model_state_dict,
optimiser_state_dict, criterion_state_dict}; on resume the epoch counter and
best-val bookkeeping are restored, and "best" weights update only when every
tracked val metric improves.

TPU-native format: one orbax/npz-free msgpack-like directory using numpy
``.npz`` per pytree (portable, no torch). Layout:
``<dir>/step_<N>/{params,batch_stats,log_vars,opt_state}.npz`` + meta.json.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np


def _flatten(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten_like(template, flat: Dict[str, np.ndarray]):
    leaves_with_path, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in leaves_with_path:
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        arr = flat[key]
        leaves.append(arr.astype(np.asarray(leaf).dtype).reshape(
            np.asarray(leaf).shape))
    return jax.tree_util.tree_unflatten(treedef, leaves)


class CheckpointManager:
    """Save/restore training state with current+best model snapshots."""

    def __init__(self, directory: str, save_val_metrics: Optional[list] = None):
        self.directory = directory
        self.save_val_metrics = save_val_metrics or []
        os.makedirs(directory, exist_ok=True)

    def save(self, epoch: int, state: Any,
             best_params: Any,
             best_epoch: int,
             best_epoch_val_metrics: Dict[str, float],
             tag: str = "latest") -> str:
        ckpt_dir = os.path.join(self.directory, tag)
        tmp_dir = ckpt_dir + ".tmp"
        if os.path.exists(tmp_dir):
            shutil.rmtree(tmp_dir)
        os.makedirs(tmp_dir)

        np.savez(os.path.join(tmp_dir, "params.npz"), **_flatten(state.params))
        np.savez(os.path.join(tmp_dir, "batch_stats.npz"),
                 **_flatten(state.batch_stats))
        np.savez(os.path.join(tmp_dir, "log_vars.npz"), **_flatten(state.log_vars))
        np.savez(os.path.join(tmp_dir, "opt_state.npz"), **_flatten(state.opt_state))
        np.savez(os.path.join(tmp_dir, "best_params.npz"), **_flatten(best_params))
        with open(os.path.join(tmp_dir, "meta.json"), "w") as f:
            json.dump({"epoch": epoch, "best_epoch": best_epoch,
                       "best_epoch_val_metrics": best_epoch_val_metrics,
                       "save_val_metrics": self.save_val_metrics,
                       "step": int(state.step)}, f)

        if os.path.exists(ckpt_dir):
            shutil.rmtree(ckpt_dir)
        os.replace(tmp_dir, ckpt_dir)
        return ckpt_dir

    def restore(self, state_template: Any,
                tag: str = "latest") -> Tuple[Any, Any, Dict]:
        """Returns (state, best_params, meta). Templates give shapes/dtypes."""
        ckpt_dir = os.path.join(self.directory, tag)
        with open(os.path.join(ckpt_dir, "meta.json")) as f:
            meta = json.load(f)

        def load(name, template):
            with np.load(os.path.join(ckpt_dir, name)) as z:
                return _unflatten_like(template, dict(z))

        state = state_template._replace(
            params=load("params.npz", state_template.params),
            batch_stats=load("batch_stats.npz", state_template.batch_stats),
            log_vars=load("log_vars.npz", state_template.log_vars),
            opt_state=load("opt_state.npz", state_template.opt_state),
            step=np.asarray(meta["step"], np.int32),
        )
        best_params = load("best_params.npz", state_template.params)
        return state, best_params, meta
