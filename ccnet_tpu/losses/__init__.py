from ccnet_tpu.losses.cross_entropy import softmax_cross_entropy_ignore
from ccnet_tpu.losses.ohem import ohem_cross_entropy
from ccnet_tpu.losses.lovasz import lovasz_softmax
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
    "criterion_dsn",
    "criterion_ohem_dsn",
    "criterion_ohem_dsn2",
    "build_criterion",
]
