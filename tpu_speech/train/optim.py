"""Optimizers and gradient clipping.

The reference clips encoder and decoder gradients to max_norm=1 *separately*
(Grad-TTS/train.py:115-118) before a plain Adam step; we reproduce that with a
group-wise global-norm clip over parameter subtrees, implemented as a pure
function so it runs inside the jitted train step.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax


def global_norm(tree) -> jnp.ndarray:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x)) for x in jax.tree.leaves(tree))
    )


def clip_subtree_by_global_norm(grads: Dict, keys: Sequence[str], max_norm: float):
    """Clip the union of ``grads[k] for k in keys`` to a joint global norm.

    Returns (clipped_grads, pre_clip_norm). Missing keys are ignored.
    """
    present = [k for k in keys if k in grads]
    norm = global_norm([grads[k] for k in present])
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    out = dict(grads)
    for k in present:
        out[k] = jax.tree.map(lambda g: g * scale, grads[k])
    return out, norm


def adam(learning_rate, b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    return optax.adam(learning_rate, b1=b1, b2=b2, eps=eps)


def adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.0):
    return optax.adamw(
        learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
    )
