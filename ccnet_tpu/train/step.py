"""The jitted training step — SPMD over the mesh.

One compiled program per train step: forward (with global sync-BN stats),
criterion, backward, SGD update. With the batch sharded over the mesh's
``data`` axis, XLA emits the gradient all-reduce, BN-moment all-reduce and
loss all-reduce itself — the entire comm surface of the reference
(apex DDP buckets + InPlaceABNSync + ``engine.all_reduce_tensor``,
SURVEY §3.5) is implicit here.

State is donated: params/momentum buffers are updated in place in HBM.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from ccnet_tpu.parallel.mesh import batch_sharding, label_sharding, replicated_sharding
from ccnet_tpu.train.state import TrainState


def make_train_step(
    model,
    criterion: Callable,
    tx: optax.GradientTransformation,
    mesh=None,
):
    """Build the jitted train step: (state, images, labels, rng) -> (state, metrics)."""

    def train_step(state: TrainState, images, labels, rng):
        # fold the step into the dropout key so every step draws fresh noise
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            outputs, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                images,
                train=True,
                rngs={"dropout": dropout_rng},
                mutable=["batch_stats"],
            )
            loss = criterion(outputs, labels)
            return loss, mutated["batch_stats"]

        (loss, new_batch_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_batch_stats,
            opt_state=new_opt_state,
        )
        metrics = {"loss": loss.astype(jnp.float32)}
        return new_state, metrics

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    repl = replicated_sharding(mesh)
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sharding(mesh), label_sharding(mesh), repl),
        donate_argnums=(0,),
    )
