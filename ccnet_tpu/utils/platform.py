"""Centralised backend/platform detection.

The deployment platform may be a PJRT plugin (e.g. the ``axon`` tunnel used
in this environment) rather than a stock backend; such plugins normally
report ``jax.default_backend() == "tpu"`` but that is plugin behaviour, not a
guarantee.  Every fused-kernel gate and interpret-mode default in the package
goes through these helpers so the decision lives in exactly one place:

* :func:`is_tpu_backend` — True when the default device is a TPU (by backend
  name or by device ``platform``/``device_kind``).  Gates the Pallas fast
  paths (:mod:`ccnet_tpu.ops.upsampled_ce`,
  :mod:`ccnet_tpu.ops.cc_attention_pallas`).
* :func:`pallas_interpret_default` — ``not is_tpu_backend()``: any non-TPU
  backend (cpu, gpu, an unknown plugin) runs Pallas kernels in interpreter
  mode instead of attempting (and failing) a TPU lowering.
"""

from __future__ import annotations

import jax


def backend_name() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        return "unknown"


def is_tpu_backend() -> bool:
    """True when jit'd code runs on a TPU (directly or via a PJRT plugin)."""
    if backend_name() == "tpu":
        return True
    try:
        dev = jax.devices()[0]
    except Exception:  # pragma: no cover - backend init failure
        return False
    text = f"{getattr(dev, 'platform', '')} {getattr(dev, 'device_kind', '')}".lower()
    return "tpu" in text


def is_cpu_backend() -> bool:
    return backend_name() == "cpu"


def pallas_interpret_default() -> bool:
    """Interpret-mode default for Pallas kernels: interpret everywhere but TPU."""
    return not is_tpu_backend()
