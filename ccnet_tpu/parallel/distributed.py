"""Multi-host initialization (the reference's NCCL ``env://`` rendezvous,
``engine.py:55-56``, maps to ``jax.distributed``).

Three launch shapes, all funneled through :func:`maybe_initialize_distributed`
(called by every CLI entry point):

* **Single host** — initialization is attempted and harmlessly degrades to a
  1-process topology (or is skipped off-TPU); everything runs as before.
* **Explicit coordinator** — set ``JAX_COORDINATOR_ADDRESS`` (plus the
  standard ``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID`` or launcher-provided
  equivalents) and ``jax.distributed.initialize()`` uses them; failure here
  is a hard error because the user asked for a cluster.
* **Cloud TPU pod** — no env vars needed: on any TPU backend we call
  ``jax.distributed.initialize()`` unconditionally and let JAX's cluster
  auto-detection (TPU metadata, GKE, SLURM) find the topology.  Every host of
  a pod slice must run the same command (e.g. ``gcloud compute tpus tpu-vm
  ssh $TPU --worker=all --command="python train_cli.py ..."``).  If detection
  fails (single TPU VM, tunneled plugin), we log and continue single-process
  — but we never *silently* skip on a pod, which would leave every host as
  process 0 and e.g. have all of them write rank-0 checkpoints.

Set ``CCNET_TPU_NO_DISTRIBUTED=1`` to force single-process mode.
Collectives then ride ICI within a slice and DCN between hosts through the
same ``jit`` programs — no code changes anywhere else.
"""

from __future__ import annotations

import os

_initialized = False


def _already_initialized() -> bool:
    try:
        from jax._src import distributed

        return distributed.global_state.client is not None
    except Exception:
        return False


def maybe_initialize_distributed(logger=None) -> bool:
    """Initialize ``jax.distributed`` if configured or auto-detectable.

    Returns True when a multi-process (or explicitly requested) topology was
    initialized. Safe to call multiple times.
    """
    global _initialized
    if os.environ.get("CCNET_TPU_NO_DISTRIBUTED"):
        return False
    if _initialized or _already_initialized():
        return True

    import jax

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS")
    if addr:
        # user explicitly configured a cluster: failure is a real error
        jax.distributed.initialize()
        _initialized = True
        if logger:
            logger.info(
                f"jax.distributed initialized (coordinator {addr}): "
                f"process {jax.process_index()}/{jax.process_count()}"
            )
        return True

    # Cloud TPU pod slices need no env vars — auto-detection finds the
    # topology. Best-effort, and attempted WITHOUT first querying the
    # backend: any jax.devices()/default_backend() call would initialise
    # XLA, after which initialize() refuses to run — so there is no
    # "am I on a TPU?" pre-check here. A lone TPU VM, a tunneled plugin,
    # or a plain CPU box has no cluster metadata and raises immediately;
    # that is the single-process case.
    #
    # The auto attempt gets a BOUNDED rendezvous: a deliberately
    # single-process run inside a cluster-scheduled allocation (e.g. one
    # task of a SLURM job with SLURM_NTASKS=8) would otherwise block for
    # jax's multi-minute default waiting on peers that never join. The
    # explicit-coordinator path above keeps the default timeout — there
    # the user asked for a cluster and slow peers are normal.
    timeout_s = int(os.environ.get("CCNET_TPU_AUTO_INIT_TIMEOUT", "60"))
    try:
        try:
            jax.distributed.initialize(initialization_timeout=timeout_s)
        except TypeError:  # older jax without the kwarg
            jax.distributed.initialize()
        _initialized = True
        if logger:
            logger.info(
                "jax.distributed initialized (auto-detected): "
                f"process {jax.process_index()}/{jax.process_count()}"
            )
        return True
    except Exception as e:  # noqa: BLE001 - degrade to single-process
        if logger:
            logger.info(f"jax.distributed auto-init unavailable ({e!r}); single-process")
        return False


def is_primary_host() -> bool:
    """True on the checkpoint-writing host (rank 0; reference train.py:232)."""
    import jax

    return jax.process_index() == 0
