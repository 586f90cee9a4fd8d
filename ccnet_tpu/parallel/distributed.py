"""Multi-host initialization (the reference's NCCL ``env://`` rendezvous,
``engine.py:55-56``, maps to ``jax.distributed``).

On a single host this is a no-op; on a multi-host slice set
``JAX_COORDINATOR_ADDRESS`` (or run under a launcher that sets JAX's standard
cluster env) and every entry point picks it up. Collectives then ride ICI
within a slice and DCN between hosts through the same ``jit`` programs —
no code changes anywhere else.
"""

from __future__ import annotations

import os


def maybe_initialize_distributed(logger=None) -> bool:
    """Initialize jax.distributed if a coordinator is configured."""
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return False
    import jax

    jax.distributed.initialize()
    if logger:
        logger.info(
            f"jax.distributed initialized: process {jax.process_index()}/{jax.process_count()}"
        )
    return True


def is_primary_host() -> bool:
    """True on the checkpoint-writing host (rank 0; reference train.py:232)."""
    import jax

    return jax.process_index() == 0
