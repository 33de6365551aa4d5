"""LR schedule zoo (optax formulation).

Covers the reference's scheduler inventory
(SPIRAL/nemo/core/optim/lr_scheduler.py:41-696): warmup/warmup-hold policies
with cosine, Noam, square/square-root, inverse-square-root, and polynomial
(+hold) annealing.
"""

from __future__ import annotations

import optax


def warmup_cosine(lr, warmup_steps, max_steps, min_lr=0.0):
    """CosineAnnealing with linear warmup (lr_scheduler.py CosineAnnealing)."""
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0,
        peak_value=lr,
        warmup_steps=max(warmup_steps, 1),
        decay_steps=max(max_steps, warmup_steps + 1),
        end_value=min_lr,
    )


def noam(lr, d_model, warmup_steps):
    """Noam annealing: lr * d^-0.5 * min(s^-0.5, s * w^-1.5)."""

    def schedule(step):
        import jax.numpy as jnp

        s = jnp.maximum(jnp.asarray(step, dtype=jnp.float32), 1.0)
        factor = jnp.minimum(s**-0.5, s * warmup_steps**-1.5)
        return lr * (d_model**-0.5) * factor

    return schedule


def square_annealing(lr, warmup_steps, max_steps, min_lr=0.0):
    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        frac = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        mult = (1.0 - frac) ** 2
        return jnp.where(
            step < warmup_steps, lr * warm, min_lr + (lr - min_lr) * mult
        )

    return schedule


def squareroot_annealing(lr, warmup_steps, max_steps, min_lr=0.0):
    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        frac = jnp.clip(
            (step - warmup_steps) / max(max_steps - warmup_steps, 1), 0.0, 1.0
        )
        mult = jnp.sqrt(1.0 - frac)
        return jnp.where(
            step < warmup_steps, lr * warm, min_lr + (lr - min_lr) * mult
        )

    return schedule


def inverse_sqrt_annealing(lr, warmup_steps):
    def schedule(step):
        import jax.numpy as jnp

        s = jnp.maximum(step.astype(float) if hasattr(step, "astype") else float(step), 1.0)
        w = max(warmup_steps, 1)  # warmup_steps=0 must not zero the lr
        warm = jnp.clip(s / w, 0.0, 1.0)
        decay = jnp.sqrt(w / jnp.maximum(s, w))
        return lr * warm * decay

    return schedule


def polynomial_hold(lr, warmup_steps, max_steps, hold_steps=0, power=1.0,
                    min_lr=0.0):
    """PolynomialHoldDecayAnnealing: warmup -> hold -> poly decay
    (the reference finetune recipe, spiral_base_finetune_ls100_subword.py)."""

    def schedule(step):
        import jax.numpy as jnp

        warm = jnp.clip(step / max(warmup_steps, 1), 0.0, 1.0)
        decay_start = warmup_steps + hold_steps
        frac = jnp.clip(
            (step - decay_start) / max(max_steps - decay_start, 1), 0.0, 1.0
        )
        decayed = min_lr + (lr - min_lr) * (1.0 - frac) ** power
        return jnp.where(
            step < warmup_steps,
            lr * warm,
            jnp.where(step < decay_start, lr, decayed),
        )

    return schedule


SCHEDULES = {
    "CosineAnnealing": warmup_cosine,
    "SquareAnnealing": square_annealing,
    "SquareRootAnnealing": squareroot_annealing,
    "InverseSquareRootAnnealing": inverse_sqrt_annealing,
    "PolynomialHoldDecayAnnealing": polynomial_hold,
    "NoamAnnealing": noam,
}
