"""Small model/dataset utilities.

* :func:`count_parameters` — trainable parameter count (reference
  ``utils/model_utils.py:3-4``).
* :func:`random_select_train_set` — random train/val split of game folders,
  written as ``train_set.xml`` (reference ``global_utils.py:350-362``).
"""

from __future__ import annotations

import os
from typing import List, Optional

import jax
import numpy as np


def count_parameters(params) -> int:
    """Total number of scalars in a parameter pytree."""
    return sum(int(np.prod(np.shape(x)))
               for x in jax.tree_util.tree_leaves(params))


def random_select_train_set(dataset_root: str, out_path: str,
                            train_fraction: float = 0.8,
                            seed: int = 0) -> List[str]:
    """Randomly pick a train-game subset and write it as JSON train_set.xml."""
    from soccerplayershapepose_tpu.io.formats import write_json_xml
    games = sorted(g for g in os.listdir(dataset_root)
                   if os.path.isdir(os.path.join(dataset_root, g)))
    rng = np.random.RandomState(seed)
    n_train = max(1, int(round(len(games) * train_fraction)))
    picked = sorted(rng.permutation(games)[:n_train].tolist())
    write_json_xml(out_path, picked)
    return picked
