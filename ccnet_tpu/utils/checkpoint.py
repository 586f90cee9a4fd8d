"""Checkpointing: orbax-native full-state checkpoints + ``.pth`` converter.

Two formats:

* **Native** (orbax): the complete ``TrainState`` — params, batch stats,
  optimizer momentum, step — enabling true resume. (The reference saved raw
  ``state_dict`` only and could not resume optimizer state; SURVEY §5.4.)
* **torch ``.pth``** — bidirectional converter matching the reference's
  ``state_dict`` names exactly (``networks/ccnet.py`` attribute/Sequential
  naming), so released CCNet/ImageNet checkpoints load into this framework
  and our training can export checkpoints the reference ecosystem reads.
  Loading follows the reference's lenient ``load_model`` behaviour
  (``utils/pyt_utils.py:47-85``): ``strict=False`` with missing/unexpected
  key reporting, optional ``'model'`` wrapper unwrap, ``module.`` prefix
  strip.

Conv kernels transpose between HWIO (flax/NHWC) and OIHW (torch).
"""

from __future__ import annotations

import os
import os.path as osp
import re
from typing import Dict, Optional, Tuple

import jax
import numpy as np

from ccnet_tpu.utils.logging import get_logger

logger = get_logger("ccnet_tpu.checkpoint")

_LAYER_RE = re.compile(r"^layer(\d+)_(\d+)$")

# RCCA head Sequential-index mapping (reference networks/ccnet.py:99-114)
_RCCA_MAP = {
    "conva_conv": "head.conva.0", "conva_bn": "head.conva.1",
    "convb_conv": "head.convb.0", "convb_bn": "head.convb.1",
    "bottleneck_conv": "head.bottleneck.0", "bottleneck_bn": "head.bottleneck.1",
    "classifier": "head.bottleneck.3",
}
# PSP head (reference networks/pspnet.py:62-113)
_PSP_MAP = {
    "bottleneck_conv": "head.0.bottleneck.0", "bottleneck_bn": "head.0.bottleneck.1",
}
# ASPP head (reference networks/deeplabv3.py:62-126)
_ASPP_MAP = {
    "image_pool_conv": "head.0.conv1.1", "image_pool_bn": "head.0.conv1.2",
    "conv1x1": "head.0.conv2.0", "conv1x1_bn": "head.0.conv2.1",
    "atrous0_conv": "head.0.conv3.0", "atrous0_bn": "head.0.conv3.1",
    "atrous1_conv": "head.0.conv4.0", "atrous1_bn": "head.0.conv4.1",
    "atrous2_conv": "head.0.conv5.0", "atrous2_bn": "head.0.conv5.1",
    "bottleneck_conv": "head.0.bottleneck.0", "bottleneck_bn": "head.0.bottleneck.1",
}


def _module_to_torch(mods: Tuple[str, ...]) -> str:
    """Map a flax module path (without the leaf) to the torch module name."""
    top = mods[0]
    if top == "backbone":
        parts = []
        for m in mods[1:]:
            lm = _LAYER_RE.match(m)
            if lm:
                parts.append(f"layer{lm.group(1)}.{lm.group(2)}")
            elif m == "downsample_conv":
                parts.append("downsample.0")
            elif m == "downsample_bn":
                parts.append("downsample.1")
            else:
                parts.append(m)
        return ".".join(parts)
    if top == "dsn":
        sub = {"conv": "dsn.0", "bn": "dsn.1", "classifier": "dsn.3"}
        return sub[mods[1]]
    if top == "head":  # RCCA
        if mods[1] == "cca":
            return "head.cca." + ".".join(mods[2:]) if len(mods) > 2 else "head.cca"
        return _RCCA_MAP[mods[1]]
    if top == "psp":
        m = mods[1]
        sm = re.match(r"^stage(\d+)_(conv|bn)$", m)
        if sm:
            idx = {"conv": 1, "bn": 2}[sm.group(2)]
            return f"head.0.stages.{sm.group(1)}.{idx}"
        return _PSP_MAP[m]
    if top == "aspp":
        return _ASPP_MAP[mods[1]]
    if top == "classifier":  # PSP/ASPP top-level 1×1 classifier
        return "head.1"
    raise KeyError(f"no torch mapping for flax module path {mods}")


def flax_path_to_torch_key(path: Tuple[str, ...]) -> str:
    *mods, leaf = path
    base = _module_to_torch(tuple(mods))
    return f"{base}.{leaf}"


def variables_to_torch_state_dict(variables) -> Dict[str, np.ndarray]:
    """Flatten flax {'params', 'batch_stats'} into a torch-style state_dict."""
    out: Dict[str, np.ndarray] = {}

    def walk(tree, prefix):
        for k, v in tree.items():
            if isinstance(v, dict):
                walk(v, prefix + (k,))
            else:
                key = flax_path_to_torch_key(prefix + (k,))
                arr = np.asarray(v)
                if k == "weight" and arr.ndim == 4:  # conv HWIO -> OIHW
                    arr = arr.transpose(3, 2, 0, 1)
                out[key] = arr

    walk(variables["params"], ())
    walk(variables.get("batch_stats", {}), ())
    return out


def _normalise_torch_keys(state_dict) -> Dict[str, np.ndarray]:
    """Unwrap {'model': ...}, strip 'module.' prefixes, to numpy."""
    if "model" in state_dict and isinstance(state_dict["model"], dict):
        state_dict = state_dict["model"]
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        try:
            out[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        except Exception:
            continue
    return out


# torch names of the final per-class classifier convs (RCCA head + DSN aux,
# PSP/ASPP top classifier) — the layers the reference's --not-restore-last
# skips when fine-tuning to a different class count (train.py:80-81)
_CLASSIFIER_KEYS = ("head.bottleneck.3", "dsn.3", "head.1")


def torch_state_dict_to_variables(state_dict, template_variables, strict: bool = False,
                                  skip_mismatch: bool = False,
                                  restore_last: bool = True):
    """Fill a flax variables template from a torch state_dict.

    Returns (variables, missing_keys, unexpected_keys). Missing entries keep
    the template's values (reference ``load_model`` strict=False semantics).

    ``restore_last=False`` drops the final classifier layers before loading
    (the reference's ``--not-restore-last`` fine-tune path, train.py:80-81);
    ``skip_mismatch`` turns shape mismatches into skipped keys instead of
    errors (e.g. a 19-class checkpoint into a 21-class model).
    """
    sd = _normalise_torch_keys(state_dict)
    if not restore_last:
        sd = {k: v for k, v in sd.items()
              if not any(k.startswith(c + ".") for c in _CLASSIFIER_KEYS)}
    used = set()
    missing = []
    mismatched = []

    def walk(tree, prefix):
        out = {}
        for k, v in tree.items():
            if isinstance(v, dict):
                out[k] = walk(v, prefix + (k,))
            else:
                key = flax_path_to_torch_key(prefix + (k,))
                if key in sd:
                    arr = np.asarray(sd[key])
                    if k == "weight" and np.ndim(v) == 4:  # OIHW -> HWIO
                        arr = arr.transpose(2, 3, 1, 0)
                    if arr.shape != tuple(np.shape(v)):
                        if skip_mismatch:
                            mismatched.append(key)
                            missing.append(key)
                            out[k] = v
                            continue
                        raise ValueError(
                            f"shape mismatch for {key}: ckpt {arr.shape} vs model {np.shape(v)}"
                        )
                    out[k] = arr.astype(np.asarray(v).dtype)
                    used.add(key)
                else:
                    missing.append(key)
                    out[k] = v
        return out

    new_vars = {"params": walk(template_variables["params"], ())}
    if "batch_stats" in template_variables:
        new_vars["batch_stats"] = walk(template_variables["batch_stats"], ())
    unexpected = sorted(set(sd) - used)
    if mismatched:
        logger.warning(f"{len(mismatched)} keys skipped on shape mismatch: {mismatched[:5]}")
    if missing:
        logger.warning(f"{len(missing)} keys missing from checkpoint, e.g. {missing[:5]}")
    if unexpected:
        logger.warning(f"{len(unexpected)} unexpected checkpoint keys, e.g. {unexpected[:5]}")
    if strict and (missing or unexpected):
        raise KeyError(f"strict load failed: missing={missing[:10]} unexpected={unexpected[:10]}")
    return new_vars, missing, unexpected


def save_pth(variables, path: str):
    """Export to a reference-compatible ``.pth`` (torch serialization)."""
    import torch

    # .copy(): torch refuses to wrap read-only numpy views (jax exports)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v).copy()) for k, v in
          variables_to_torch_state_dict(variables).items()}
    torch.save(sd, path)


def load_pth(path: str, template_variables, strict: bool = False,
             skip_mismatch: bool = False, restore_last: bool = True):
    """Load a reference/ImageNet ``.pth`` into a flax variables template."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    return torch_state_dict_to_variables(sd, template_variables, strict=strict,
                                         skip_mismatch=skip_mismatch,
                                         restore_last=restore_last)


# -------------------------------------------------------- native (orbax) ---


def save_checkpoint(ckpt_dir: str, state, step: int):
    """Save the full TrainState (params + stats + optimizer + step)."""
    import orbax.checkpoint as ocp

    path = osp.join(osp.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, jax.device_get(state), force=True)
    logger.info(f"saved checkpoint {path}")


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    if not osp.isdir(ckpt_dir):
        return None
    steps = []
    for d in os.listdir(ckpt_dir):
        m = re.match(r"^step_(\d+)$", d)
        if m:
            steps.append(int(m.group(1)))
    return max(steps) if steps else None


def restore_checkpoint(ckpt_dir: str, state_template, step: Optional[int] = None):
    """Restore a TrainState; step=None picks the latest."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_checkpoint_step(ckpt_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {ckpt_dir}")
    path = osp.join(osp.abspath(ckpt_dir), f"step_{step:08d}")
    ckptr = ocp.PyTreeCheckpointer()
    restored = ckptr.restore(path, item=jax.device_get(state_template))
    logger.info(f"restored checkpoint {path}")
    return restored
