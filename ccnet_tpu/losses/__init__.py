from ccnet_tpu.losses.cross_entropy import softmax_cross_entropy_ignore
from ccnet_tpu.losses.ohem import ohem_cross_entropy
from ccnet_tpu.losses.lovasz import (
    binary_xloss,
    flatten_binary_scores,
    iou,
    iou_binary,
    lovasz_hinge,
    lovasz_hinge_flat,
    lovasz_softmax,
)
from ccnet_tpu.losses.criterion import (
    criterion_dsn,
    criterion_ohem_dsn,
    criterion_ohem_dsn2,
    build_criterion,
)

__all__ = [
    "softmax_cross_entropy_ignore",
    "ohem_cross_entropy",
    "lovasz_softmax",
    "lovasz_hinge",
    "lovasz_hinge_flat",
    "flatten_binary_scores",
    "binary_xloss",
    "iou",
    "iou_binary",
    "criterion_dsn",
    "criterion_ohem_dsn",
    "criterion_ohem_dsn2",
    "build_criterion",
]
