"""Optimizer: SGD with torch semantics + poly LR decay.

Training recipe of the reference (``train.py:126-127,182-183``,
``run_local.sh``): SGD momentum 0.9, weight decay, poly LR
``base_lr * (1 - step/max_steps)^0.9``.

The flagship weight decay is **1e-4** — the value in the published commands
that back the reference's mIoU table (reference ``README.md:97,102``).  The
reference's argparse default is 5e-4 (``train.py:47``) but the published runs
override it; this package uses 1e-4 consistently (TrainConfig, CLI, bench).

Torch-SGD semantics: weight decay is added to the gradient BEFORE the
momentum accumulation (``g += wd*p; buf = mu*buf + g; p -= lr*buf``) — hence
``add_decayed_weights`` ahead of the momentum trace in the chain.
"""

from __future__ import annotations

import optax


def poly_schedule(base_lr: float, max_steps: int, power: float = 0.9):
    def schedule(step):
        frac = 1.0 - step / max_steps
        return base_lr * (frac ** power)

    return schedule


def make_optimizer(
    base_lr: float = 1e-2,
    max_steps: int = 60000,
    power: float = 0.9,
    momentum: float = 0.9,
    weight_decay: float = 1e-4,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=poly_schedule(base_lr, max_steps, power), momentum=momentum),
    )
