"""Checkpoint save/restore for parameter/optimizer pytrees.

The reference checkpoints only MAPPO actor/critic ``state_dict``s
(``train/MAPPO/main_player.py:311-325``); here every training path can
save/load its full state (params, optimizer, normalizer, RNG) so training
actually resumes, plus a weights-only export for serving/demo use (the
analog of the reference's ``torch_to_tfjs.py`` actor export, as portable
npz/JSON instead of TFJS).
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import numpy as np


def save_pytree(path: str, tree: Any) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump(jax.device_get(tree), f)


def load_pytree(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def export_weights_json(path: str, params: Any) -> None:
    """Flatten a params pytree to {dotted.path: nested-list} JSON — consumable
    from JS for the browser demo (replaces the ONNX->TF->TFJS pipeline of
    ``train/torch_to_tfjs.py``; the demo nets are plain MLPs)."""
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf).tolist()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(flat, f)


def export_weights_npz(path: str, params: Any) -> None:
    flat = {}
    for keypath, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        name = ".".join(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in keypath
        )
        flat[name] = np.asarray(leaf)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)
