"""Shared CLI plumbing for the inference entry points.

``evaluate_cli`` and ``predict_cli`` advertise the same multi-chip surface
(`--data-parallel` tile sharding, `--whole --space N` height sharding);
resolving it lives here so the two cannot drift apart.
"""

from __future__ import annotations

import jax


def str2bool(v) -> bool:
    return str(v).lower() in ("yes", "true", "t", "1")


def resolve_inference_mesh(args, logger, *, batch_size: int = 1):
    """``--space`` / ``--data-parallel`` flags → ``(mesh | None, spatial)``.

    ``--whole --space N`` shards image HEIGHT over N devices (XLA partitions
    the convs with halo exchange; callers gate the CCA to the jnp impl whose
    row/column softmax XLA gathers once itself — the Pallas kernel's SPMD
    rule is batch-only). The mesh's residual ``data`` axis is sized to the
    actual per-step image batch, ``min(batch_size, n_devices // space)``:
    with the default ``--batch-size 1`` on an 8-chip slice, a full 4×2 mesh
    would GSPMD-pad the size-1 batch to 4 and run 6 of 8 chips on padding —
    the extra chips stay idle instead. Multi-process execution keeps the
    full mesh (every process's addressable devices must participate in the
    jit); there the padding trade-off is explicit in the log line.

    Without ``--space``, ``--data-parallel`` (the default, no-op on 1 chip)
    shards sliding-window inference's TILE batch over the full mesh, and
    ``--whole`` inference's IMAGE batch over a ``data``-axis mesh sized the
    same way (``min(batch_size, n_devices)``).
    """
    if args.space > 1 and not args.whole:
        raise SystemExit("--space N applies to --whole inference only "
                         "(sliding mode shards the tile batch instead: "
                         "--data-parallel, the default)")
    spatial = bool(args.whole) and args.space > 1
    n = len(jax.devices())
    if spatial or (args.whole and args.data_parallel and n > 1):
        from ccnet_tpu.parallel import make_mesh

        if n % args.space:
            raise SystemExit(
                f"--space {args.space} must divide the {n} devices")
        if jax.process_count() == 1:
            data = max(1, min(batch_size, n // args.space))
            devices = jax.devices()[: data * args.space]
        else:
            devices = jax.devices()
        if not spatial and len(devices) == 1:
            return None, False  # batch 1 on one chip — a mesh adds nothing
        mesh = make_mesh(devices, space=args.space)
        detail = ("image height over 'space' (convs halo-exchange; CCA "
                  "impl='jnp', XLA gathers its row/column attention over "
                  "ICI)" if spatial else "images over 'data'")
        logger.info(f"--whole multi-chip: mesh {dict(mesh.shape)} over "
                    f"{len(devices)}/{n} devices — {detail}")
        return mesh, spatial
    if args.data_parallel and n > 1 and not args.whole:
        from ccnet_tpu.parallel import make_mesh

        return make_mesh(), False
    return None, False
