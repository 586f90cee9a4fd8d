"""Test-set prediction CLI → Cityscapes-server submission PNGs.

Capability parity with the reference's ``test.py`` (``:151-204``): sliding
or whole-image prediction, argmax, reverse trainId→labelId mapping, indexed
PNGs to the output dir. (The reference's test entry was bit-rotted — broken
import and a shadowed dataset class with an inconsistent 0.5×-downscale
min-max-normalize preprocessing, SURVEY §2.16/§3.3; this implementation uses
the training-consistent mean-subtract preprocessing.)
"""

from __future__ import annotations

import argparse
import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from ccnet_tpu.cli.common import resolve_inference_mesh, str2bool
from ccnet_tpu.data import CityscapesDataset, DataLoader
from ccnet_tpu.data.cityscapes import trainid_to_labelid
from ccnet_tpu.data.palette import cityscapes_palette, save_indexed_png
from ccnet_tpu.evaluation import Evaluator
from ccnet_tpu.models import build_model
from ccnet_tpu.utils import get_logger, load_pth


def get_parser():
    p = argparse.ArgumentParser(description="ccnet_tpu test-set prediction")
    p.add_argument("--data-dir", type=str, default="cityscapes")
    p.add_argument("--data-list", type=str, default=None)
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--model", type=str, default="ccnet",
                   choices=["ccnet", "pspnet", "deeplabv3"])
    p.add_argument("--recurrence", type=int, default=2)
    p.add_argument("--depth", type=int, default=101)
    p.add_argument("--num-classes", type=int, default=19)
    p.add_argument("--input-size", type=str, default="769,769")
    p.add_argument("--restore-from", type=str, required=True)
    p.add_argument("--whole", type=str2bool, default=False)
    p.add_argument("--flip", type=str2bool, default=False)
    p.add_argument("--scales", type=str, default="1.0",
                   help="comma list, e.g. 0.75,1.0,1.25 (multi-scale average)")
    p.add_argument("--output-dir", type=str, default="outputs")
    p.add_argument("--labelid", type=str2bool, default=True,
                   help="write labelId PNGs (server format); False = trainId palette PNGs")
    p.add_argument("--fp32", type=str2bool, default=False)
    p.add_argument("--data-parallel", type=str2bool, default=True,
                   help="shard the tile batch (sliding) or the image batch "
                        "(--whole) over devices (no-op on 1 chip)")
    p.add_argument("--space", type=int, default=1,
                   help="with --whole: shard image HEIGHT over this many "
                        "devices (same surface as evaluate_cli --space)")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = get_logger("ccnet_tpu.cli.predict")
    from ccnet_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed(logger)
    h, w = (int(x) for x in args.input_size.split(","))
    if args.fp32:
        # strict numerics: f32 MXU passes instead of the TPU's bf16 default
        jax.config.update("jax_default_matmul_precision", "highest")

    mesh, spatial = resolve_inference_mesh(args, logger, batch_size=1)
    model = build_model(args.model, num_classes=args.num_classes,
                        recurrence=args.recurrence, depth=args.depth,
                        dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
                        # same gating as evaluate_cli: the Pallas CCA kernel's
                        # SPMD rule is batch-only, so H-sharded inputs route to
                        # the jnp CCA (XLA gathers its row/col softmax itself)
                        impl="jnp" if spatial else "auto")
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32), train=False
    ))()
    variables, _, _ = load_pth(args.restore_from, variables)

    def apply_fn(x):
        return model.apply(variables, x, train=False)["main"]

    evaluator = Evaluator(apply_fn, num_classes=args.num_classes,
                          tile_hw=(h, w),
                          scales=[float(s) for s in args.scales.split(",")],
                          flip=args.flip, whole=args.whole, mesh=mesh)
    dataset = CityscapesDataset(args.data_dir, args.data_list,
                                split=args.split, raw_dtype="uint8")
    loader = DataLoader(dataset, 1, shuffle=False, num_workers=4, drop_last=False)

    os.makedirs(args.output_dir, exist_ok=True)
    palette = cityscapes_palette()
    n = 0
    for images, _, names in loader:
        preds = evaluator.predict_batch(images)
        for pred, name in zip(preds, names):
            if args.labelid:
                out = trainid_to_labelid(pred)
                from PIL import Image

                Image.fromarray(out).save(osp.join(args.output_dir, f"{name}.png"))
            else:
                save_indexed_png(osp.join(args.output_dir, f"{name}.png"), pred, palette)
            n += 1
        logger.info(f"predicted {n} images")
    logger.info(f"wrote {n} PNGs to {args.output_dir}")


if __name__ == "__main__":
    main()
