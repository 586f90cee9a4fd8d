"""Training CLI — flag surface mirrors the reference's ``train.py:57-123``.

Example (reference-equivalent recipe, one TPU host driving all chips):
    python -m ccnet_tpu.cli.train --data-dir /data/cityscapes \\
        --data-list lists/train.lst --model ccnet --recurrence 2 --ohem 1 \\
        --batch-size 8 --num-steps 60000 --input-size 769,769

``--synthetic`` runs the full pipeline on generated data (smoke/CI).
"""

from __future__ import annotations

import argparse

from ccnet_tpu.cli.common import str2bool
from ccnet_tpu.data import (AugmentingDataset, CityscapesDataset, DataLoader,
                            SyntheticDataset, VOCDataset)
from ccnet_tpu.train.trainer import TrainConfig, Trainer
from ccnet_tpu.utils import get_logger


def get_parser():
    p = argparse.ArgumentParser(description="ccnet_tpu training")
    p.add_argument("--dataset", type=str, default="cityscapes",
                   choices=["cityscapes", "voc"])
    p.add_argument("--data-dir", type=str, default="cityscapes")
    p.add_argument("--data-list", type=str, default=None,
                   help=".lst file (image label per line); default: discover layout")
    p.add_argument("--model", type=str, default="ccnet",
                   choices=["ccnet", "pspnet", "deeplabv3"])
    p.add_argument("--recurrence", type=int, default=2)
    p.add_argument("--depth", type=int, default=101, choices=[50, 101, 152])
    p.add_argument("--num-classes", type=int, default=19)
    p.add_argument("--input-size", type=str, default="769,769")
    p.add_argument("--batch-size", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=1e-2)
    p.add_argument("--momentum", type=float, default=0.9)
    p.add_argument("--weight-decay", type=float, default=1e-4,
                   help="published table recipe (README); run_local.sh used 5e-4")
    p.add_argument("--power", type=float, default=0.9)
    p.add_argument("--num-steps", type=int, default=60000)
    p.add_argument("--start-iters", type=int, default=0)
    p.add_argument("--ohem", type=str2bool, default=False)
    p.add_argument("--ohem-thres", type=float, default=0.7)
    p.add_argument("--ohem-keep", type=int, default=100000)
    p.add_argument("--ignore-label", type=int, default=255)
    p.add_argument("--save-pred-every", type=int, default=10000)
    p.add_argument("--snapshot-dir", type=str, default="snapshots")
    p.add_argument("--restore-from", type=str, default=None,
                   help=".pth weights for init (ImageNet or CCNet)")
    p.add_argument("--not-restore-last", action="store_true",
                   help="skip classifier layers when restoring (fine-tune "
                        "to a different class count, reference train.py:80-81)")
    p.add_argument("--random-scale", type=str2bool, default=True)
    p.add_argument("--random-mirror", type=str2bool, default=True)
    p.add_argument("--resume", type=str2bool, default=False,
                   help="resume full train state from snapshot-dir")
    p.add_argument("--random-seed", type=int, default=304)
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--fp32", type=str2bool, default=False)
    p.add_argument(
        "--remat", type=str, default="none",
        choices=["none", "blocks", "conv12", "convs"],
        help="activation remat: none (fastest, fits bs-8 769² on 16 GB), "
             "blocks (remat layers 3-4), conv12/convs (policy: pin conv outs)",
    )
    p.add_argument("--export-pth", type=str2bool, default=True)
    p.add_argument("--augment-backend", type=str, default="host_u8",
                   choices=["device", "native", "host_u8", "precropped"],
                   help="host_u8 (default, the measured-fastest end-to-end "
                        "path): host augmentation to uint8 crops (engine "
                        "auto→C++/OpenMP when built, else cv2; wire-minimal "
                        "— 3.4× fewer bytes/batch than shipping raw images); "
                        "device: jitted TPU sampler on raw images; native: "
                        "C++/OpenMP host kernel, f32 wire; precropped: "
                        "loader already yields final crops")
    p.add_argument("--tensorboard", type=str2bool, default=False)
    p.add_argument("--profile-steps", type=str, default=None,
                   help="start,stop step range for a jax.profiler trace")
    p.add_argument("--cache-decoded", type=str2bool, default=True,
                   help="RAM-cache decoded samples after first epoch "
                        "(~8 MB/sample with the uint8 layout; byte-bounded "
                        "by CCNET_TPU_CACHE_GB, default 8 GB — a 60k-step "
                        "run revisits each image ~160×)")
    p.add_argument("--synthetic", action="store_true", help="synthetic data smoke run")
    p.add_argument("--synthetic-size", type=str, default="1024,2048")
    return p


def main(argv=None):
    args = get_parser().parse_args(argv)
    logger = get_logger("ccnet_tpu.cli.train")
    from ccnet_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed(logger)
    h, w = (int(x) for x in args.input_size.split(","))

    cfg = TrainConfig(
        model=args.model, num_classes=args.num_classes, recurrence=args.recurrence,
        depth=args.depth, input_size=(h, w), batch_size=args.batch_size,
        learning_rate=args.learning_rate, momentum=args.momentum,
        weight_decay=args.weight_decay, power=args.power, num_steps=args.num_steps,
        ohem=args.ohem, ohem_thres=args.ohem_thres, ohem_keep=args.ohem_keep,
        ignore_label=args.ignore_label, save_every=args.save_pred_every,
        snapshot_dir=args.snapshot_dir, restore_from=args.restore_from,
        restore_last=not args.not_restore_last,
        random_scale=args.random_scale, random_mirror=args.random_mirror,
        resume=args.resume, start_step=args.start_iters, seed=args.random_seed,
        bf16=not args.fp32,
        remat={"none": False, "blocks": True}.get(args.remat, args.remat),
        export_pth=args.export_pth,
        augment_backend=args.augment_backend,
        tensorboard=args.tensorboard,
        profile_steps=(tuple(int(x) for x in args.profile_steps.split(","))
                       if args.profile_steps else None),
    )
    if args.synthetic:
        sh, sw = (int(x) for x in args.synthetic_size.split(","))
        dataset = SyntheticDataset(n=max(args.batch_size * 4, 16), hw=(sh, sw),
                                   num_classes=args.num_classes)
        if cfg.augment_backend == "host_u8":
            cfg.augment_backend = "device"  # synthetic yields f32 full images
    elif args.dataset == "voc":
        # variable-size images: host augmentation, crops arrive pre-made
        from ccnet_tpu.data.voc import VOC_MEAN, VOC_SCALE_MIN, VOC_SCALE_STEPS

        raw = VOCDataset(args.data_dir, args.data_list)
        if args.cache_decoded:
            from ccnet_tpu.data import CachedDataset

            raw = CachedDataset(raw)  # cache RAW samples, not augmented crops
        dataset = AugmentingDataset(
            raw, crop_hw=(h, w), mean=VOC_MEAN, ignore_label=args.ignore_label,
            scale=args.random_scale, mirror=args.random_mirror,
            scale_min=VOC_SCALE_MIN, scale_steps=VOC_SCALE_STEPS,
            seed=args.random_seed,
        )
        cfg.augment_backend = "precropped"
        cfg.mean = VOC_MEAN
    else:
        # uint8 wire layout for the on-device/native/host_u8 augmenters: 4×
        # less host→device transfer than f32, exact (raw pixels are integers)
        raw_dtype = ("uint8" if cfg.augment_backend in ("device", "native", "host_u8")
                     else "float32")
        dataset = CityscapesDataset(args.data_dir, args.data_list, split="train",
                                    raw_dtype=raw_dtype)
        if args.cache_decoded:
            from ccnet_tpu.data import CachedDataset

            dataset = CachedDataset(dataset)  # raw samples, pre-augmentation
        if cfg.augment_backend == "host_u8":
            from ccnet_tpu.data import U8CropDataset

            dataset = U8CropDataset(
                dataset, crop_hw=(h, w), mean=tuple(cfg.mean),
                ignore_label=args.ignore_label, scale=args.random_scale,
                mirror=args.random_mirror, scale_min=cfg.scale_min,
                scale_steps=cfg.scale_steps, seed=args.random_seed,
            )
    import jax

    if args.batch_size % jax.process_count():
        raise SystemExit(
            f"--batch-size {args.batch_size} must divide over "
            f"{jax.process_count()} processes"
        )
    # batch_size is the GLOBAL batch (reference semantics, run_local.sh);
    # each process loads its 1/process_count share
    loader = DataLoader(dataset, args.batch_size // jax.process_count(),
                        shuffle=True, seed=args.random_seed,
                        num_workers=args.num_workers)
    trainer = Trainer(cfg)
    result = trainer.run(loader)
    logger.info(f"training done: {result}")
    return result


if __name__ == "__main__":
    main()
