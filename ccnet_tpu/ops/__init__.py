from ccnet_tpu.ops.cc_attention import criss_cross_attention, cca_logits_reference
from ccnet_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_bilinear_cv2,
    resize_nearest_cv2,
)
from ccnet_tpu.ops.pooling import max_pool_ceil, adaptive_avg_pool

__all__ = [
    "criss_cross_attention",
    "cca_logits_reference",
    "resize_bilinear_align_corners",
    "resize_bilinear_cv2",
    "resize_nearest_cv2",
    "max_pool_ceil",
    "adaptive_avg_pool",
]
