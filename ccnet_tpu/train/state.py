"""Training state: params + batch stats + optimizer state as one pytree."""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def create_train_state(
    model,
    tx: optax.GradientTransformation,
    input_shape=(1, 769, 769, 3),
    rng=None,
) -> TrainState:
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    x = jnp.zeros(input_shape, jnp.float32)
    variables = model.init(rng, x, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )
