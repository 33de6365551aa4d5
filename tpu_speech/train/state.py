"""Train state container (params + optimizer state + step)."""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation):
        import jax.numpy as jnp

        return cls(
            step=jnp.zeros((), dtype=jnp.int32),
            params=params,
            opt_state=tx.init(params["params"] if "params" in params else params),
        )
