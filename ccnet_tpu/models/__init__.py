from ccnet_tpu.models.backbone import Bottleneck, DilatedResNet
from ccnet_tpu.models.ccnet import CCNet, CrissCrossAttention, DSNHead, RCCAModule
from ccnet_tpu.models.deeplabv3 import ASPPModule, DeepLabV3
from ccnet_tpu.models.pspnet import PSPModule, PSPNet
from ccnet_tpu.models.registry import build_model

__all__ = [
    "Bottleneck",
    "DilatedResNet",
    "CCNet",
    "CrissCrossAttention",
    "DSNHead",
    "RCCAModule",
    "ASPPModule",
    "DeepLabV3",
    "PSPModule",
    "PSPNet",
    "build_model",
]
