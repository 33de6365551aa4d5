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


def novograd(learning_rate, b1=0.95, b2=0.25, eps=1e-8, weight_decay=0.0):
    """Novograd (reference core/optim/novograd.py): layer-wise normalized
    second moment + decoupled weight decay."""
    return optax.novograd(
        learning_rate, b1=b1, b2=b2, eps=eps, weight_decay=weight_decay
    )


def sgd(learning_rate, momentum=0.0, weight_decay=0.0):
    tx = optax.sgd(learning_rate, momentum=momentum or None)
    if weight_decay:
        tx = optax.chain(optax.add_decayed_weights(weight_decay), tx)
    return tx


# Reference registry parity (SPIRAL/nemo/core/optim/optimizers.py:30-162).
# Each entry maps an optim-config to an optax GradientTransformation given a
# learning-rate schedule (or constant).
def _build(name, cfg, lr):
    b1, b2 = getattr(cfg, "betas", (0.9, 0.999))
    eps = getattr(cfg, "eps", 1e-8)
    wd = getattr(cfg, "weight_decay", 0.0)
    momentum = getattr(cfg, "momentum", 0.0)
    if name == "adam":
        return optax.adam(lr, b1=b1, b2=b2, eps=eps)
    if name == "adamw":
        return optax.adamw(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    if name == "novograd":
        return optax.novograd(lr, b1=b1, b2=b2, eps=eps, weight_decay=wd)
    if name == "sgd":
        return sgd(lr, momentum=momentum, weight_decay=wd)
    if name == "adadelta":
        return optax.adadelta(lr, eps=eps)
    if name == "adamax":
        return optax.adamax(lr, b1=b1, b2=b2, eps=eps)
    if name == "adagrad":
        return optax.adagrad(lr, eps=eps)
    if name == "rprop":
        return optax.rprop(lr)
    raise ValueError(f"unknown optimizer '{name}' (have {sorted(OPTIMIZERS)})")


OPTIMIZERS = {
    "adam", "adamw", "novograd", "sgd", "adadelta", "adamax", "adagrad",
    "rprop",
}


def make_schedule(optim_cfg, total_steps, lr_scale: float = 1.0):
    """Build the lr schedule from an optim config's `sched` sub-config
    (reference prepare_lr_scheduler, core/optim/lr_scheduler.py:41-696)."""
    from tpu_speech.train.schedules import polynomial_hold, warmup_cosine, SCHEDULES

    lr = optim_cfg.lr * lr_scale
    sched_cfg = getattr(optim_cfg, "sched", None)
    if sched_cfg is None:
        return lr
    max_steps = sched_cfg.max_steps or total_steps
    warm = sched_cfg.warmup_steps or int(
        (sched_cfg.warmup_ratio or 0.0) * max_steps
    )
    name = sched_cfg.name
    if name == "PolynomialHoldDecayAnnealing":
        hold = int((sched_cfg.hold_ratio or 0.0) * max_steps)
        return polynomial_hold(lr, warm, max_steps, hold, min_lr=sched_cfg.min_lr)
    if name in ("CosineAnnealing", None, ""):
        return warmup_cosine(lr, warm, max_steps, sched_cfg.min_lr)
    if name == "InverseSquareRootAnnealing":
        return SCHEDULES[name](lr, warm)
    if name == "NoamAnnealing":
        return SCHEDULES[name](lr, getattr(sched_cfg, "d_model", 512), warm)
    fn = SCHEDULES.get(name)
    if fn is None:
        raise ValueError(f"unknown schedule '{name}' (have {sorted(SCHEDULES)})")
    return fn(lr, warm, max_steps, sched_cfg.min_lr)


def make_optimizer(optim_cfg, total_steps, lr_scale: float = 1.0):
    """Optimizer + schedule from a structured optim config.

    lr_scale implements the expected_gpu_num linear-scaling rule
    (reference run_spiral.py:83-86): configs carry the lr tuned for
    `expected_gpu_num` workers; the launcher rescales for the actual
    data-parallel size × gradient accumulation."""
    sched = make_schedule(optim_cfg, total_steps, lr_scale)
    name = getattr(optim_cfg, "name", "adamw") or "adamw"
    return _build(name, optim_cfg, sched)
