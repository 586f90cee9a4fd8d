"""ccnet_tpu — a TPU-native (JAX/XLA/Pallas/pjit) semantic-segmentation framework.

A from-scratch rebuild of the capabilities of the CCNet reference codebase
(criss-cross attention segmentation on Cityscapes/VOC), designed TPU-first:

* the criss-cross attention op is a fused Pallas TPU kernel
  (:mod:`ccnet_tpu.ops.cc_attention_pallas`) with a pure-``jnp`` reference
  (:mod:`ccnet_tpu.ops.cc_attention`);
* models are functional flax modules in NHWC layout
  (:mod:`ccnet_tpu.models`);
* data parallelism / sync-BN / spatial partitioning ride ``jax.sharding``
  meshes and XLA collectives (:mod:`ccnet_tpu.parallel`);
* preprocessing (scale/crop/mirror augmentation) is a jit-compiled on-device
  bilinear-sampling op (:mod:`ccnet_tpu.data.preprocess`);
* evaluation (sliding-window, multi-scale + flip) batches tiles through one
  compiled forward (:mod:`ccnet_tpu.evaluation`).
"""

__version__ = "0.1.0"
