"""Parameter freezing (encoder_dict.py:84 equivalent): train only a subset.

TPU-native mechanism: optax.multi_transform with a label fn over the param
tree — frozen subtrees get set_to_zero, trainable ones the real optimizer.
"""

from __future__ import annotations

import optax


def freeze_by_prefix(tx, params, frozen_prefixes=("inconv", "down")):
    """Wrap optimizer ``tx`` so params whose top-level module name starts
    with any of ``frozen_prefixes`` receive zero updates."""
    import jax

    def label_tree(p):
        return {k: jax.tree_util.tree_map(
            lambda _: "frozen" if any(k.startswith(f) for f in frozen_prefixes)
            else "train", v) for k, v in p.items()}

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label_tree(params))


def trainable_param_count(params, frozen_prefixes=()):
    import jax
    import numpy as np

    total = 0
    for k, v in params.items():
        if any(k.startswith(f) for f in frozen_prefixes):
            continue
        total += sum(int(np.prod(x.shape))
                     for x in jax.tree_util.tree_leaves(v))
    return total
