"""Evaluation CLI — val mIoU with sliding-window / multi-scale / flip
(reference ``evaluate.py`` capability: ``--whole``, scales, result.txt,
palette PNGs)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from ccnet_tpu.cli.common import resolve_inference_mesh, str2bool
from ccnet_tpu.data import CityscapesDataset, DataLoader, SyntheticDataset
from ccnet_tpu.data.cityscapes import CITYSCAPES_CLASS_NAMES
from ccnet_tpu.data.preprocess import CITYSCAPES_MEAN_BGR
from ccnet_tpu.data.voc import VOC_CLASS_NAMES, VOC_MEAN, VOCDataset
from ccnet_tpu.evaluation import Evaluator
from ccnet_tpu.models import build_model
from ccnet_tpu.train.optim import make_optimizer
from ccnet_tpu.utils import get_logger, load_pth, restore_checkpoint


def get_parser():
    p = argparse.ArgumentParser(description="ccnet_tpu evaluation")
    p.add_argument("--data-dir", type=str, default="cityscapes")
    p.add_argument("--data-list", type=str, default=None)
    p.add_argument("--dataset", type=str, default="cityscapes",
                   choices=["cityscapes", "voc"])
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--bucket", type=int, default=None,
                   help="pad variable-size inputs up to multiples of this "
                        "(bounds recompilation; default 128 for voc)")
    p.add_argument("--model", type=str, default="ccnet",
                   choices=["ccnet", "pspnet", "deeplabv3"])
    p.add_argument("--recurrence", type=int, default=2)
    p.add_argument("--depth", type=int, default=101, choices=[50, 101, 152])
    p.add_argument("--num-classes", type=int, default=19)
    p.add_argument("--input-size", type=str, default="769,769")
    p.add_argument("--batch-size", type=int, default=1)
    p.add_argument("--restore-from", type=str, default=None, help=".pth checkpoint")
    p.add_argument("--restore-dir", type=str, default=None, help="orbax snapshot dir")
    p.add_argument("--whole", type=str2bool, default=False)
    p.add_argument("--flip", type=str2bool, default=False)
    p.add_argument("--scales", type=str, default="1.0",
                   help="comma list, e.g. 0.75,1.0,1.25")
    p.add_argument("--output-dir", type=str, default="outputs")
    p.add_argument("--save-preds", type=str2bool, default=True)
    p.add_argument("--fp32", type=str2bool, default=False)
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--data-parallel", type=str2bool, default=True,
                   help="shard the tile batch (sliding) or the image batch "
                        "(--whole) over devices (no-op on 1 chip)")
    p.add_argument("--space", type=int, default=1,
                   help="with --whole: shard image HEIGHT over this many "
                        "devices (1024 divides evenly) — XLA partitions the "
                        "convs with halo exchange; CCA routes to the jnp "
                        "impl (its row/col softmax spans the sharded axis)")
    p.add_argument("--synthetic", action="store_true")
    p.add_argument("--synthetic-size", type=str, default="1024,2048")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = get_logger("ccnet_tpu.cli.evaluate")
    from ccnet_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed(logger)
    h, w = (int(x) for x in args.input_size.split(","))
    if args.fp32:
        # strict numerics: f32 MXU passes instead of the TPU's bf16 default
        jax.config.update("jax_default_matmul_precision", "highest")

    is_voc = args.dataset == "voc"
    num_classes = args.num_classes
    if is_voc and num_classes == 19:
        num_classes = 21  # VOC default (20 classes + background)
    args.num_classes = num_classes
    if is_voc and args.batch_size != 1:
        # VOC val images have per-image sizes — they cannot be stacked
        # into one batch (and bucket-padding inside a batch would mix
        # shapes per step anyway)
        logger.warning("--dataset voc evaluates variable-size images; "
                       f"forcing --batch-size {args.batch_size} -> 1")
        args.batch_size = 1

    mesh, spatial = resolve_inference_mesh(args, logger,
                                           batch_size=args.batch_size)
    model = build_model(
        args.model, num_classes=num_classes, recurrence=args.recurrence,
        depth=args.depth, dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
        # spatially-sharded whole-image inference: the Pallas CCA kernel's
        # custom_partitioning rule is batch-only, so under an H-sharded input
        # it would gather H per shard per call — gate to the jnp CCA, whose
        # row/column softmax XLA partitions/gathers once itself
        impl="jnp" if spatial else "auto",
    )
    variables = jax.jit(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3), jnp.float32), train=False
    ))()
    if args.restore_from:
        variables, _, _ = load_pth(args.restore_from, variables)
        logger.info(f"loaded weights from {args.restore_from}")
    elif args.restore_dir:
        from ccnet_tpu.train import create_train_state

        state = create_train_state(model, make_optimizer(max_steps=1), (1, h, w, 3))
        state = restore_checkpoint(args.restore_dir, state)
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        logger.info(f"loaded snapshot from {args.restore_dir}")
    else:
        logger.warning("no checkpoint given — evaluating RANDOM weights")

    def apply_fn(x):
        return model.apply(variables, x, train=False)["main"]

    if args.synthetic:
        sh, sw = (int(x) for x in args.synthetic_size.split(","))
        dataset = SyntheticDataset(n=2, hw=(sh, sw), num_classes=args.num_classes)
    elif is_voc:
        if not args.data_list:
            raise SystemExit("--data-list (VOC id list) is required for --dataset voc")
        dataset = VOCDataset(args.data_dir, args.data_list, raw_dtype="uint8")
    else:
        # uint8 wire layout: the f32 widen + mean subtract happen inside the
        # Evaluator's jit — 4× less host→device traffic per image
        dataset = CityscapesDataset(args.data_dir, args.data_list,
                                    split=args.split, raw_dtype="uint8")
    loader = DataLoader(dataset, args.batch_size, shuffle=False,
                        num_workers=args.num_workers, drop_last=False)

    if is_voc:
        from ccnet_tpu.data.palette import voc_colormap

        mean = VOC_MEAN
        class_names = VOC_CLASS_NAMES if num_classes == 21 else None
        palette = voc_colormap(256).astype("uint8").ravel().tolist()
        bucket = args.bucket if args.bucket is not None else 128
    else:
        mean = CITYSCAPES_MEAN_BGR
        class_names = CITYSCAPES_CLASS_NAMES if num_classes == 19 else None
        palette = None
        bucket = args.bucket
    evaluator = Evaluator(
        apply_fn, num_classes=num_classes, tile_hw=(h, w),
        scales=[float(s) for s in args.scales.split(",")],
        flip=args.flip, whole=args.whole, mean=mean,
        class_names=class_names, mesh=mesh, bucket=bucket, palette=palette,
    )
    result = evaluator.run(loader, output_dir=args.output_dir,
                           save_preds=args.save_preds, logger=logger)
    logger.info(f"meanIU: {result['meanIU']:.4f}")
    if "per_class" in result:
        for name, iu in result["per_class"].items():
            logger.info(f"  {name:16s} {iu:.4f}")
    return result


if __name__ == "__main__":
    main()
