"""Probe: does batching whole 1024x2048 images win per-image time on chip?

The `--whole` eval path now accepts an image batch (and shards it over the
mesh's `data` axis multi-chip); on ONE chip the open question is whether a
B>1 whole-image forward amortizes enough dispatch/layout overhead to beat
B=1 per image, and whether it fits HBM. Measures the flagship R101 R=2
eval-mode forward + argmax at B=1,2,4.
"""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from ccnet_tpu.evaluation.sliding import predict_whole
from ccnet_tpu.models import build_model


def main():
    model = build_model("ccnet", num_classes=19, recurrence=2, depth=101,
                        dtype=jnp.bfloat16, impl="auto")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 97, 97, 3)),
                           train=False)

    @jax.jit
    def eval_img(variables, img):
        return jnp.argmax(predict_whole(
            lambda x: model.apply(variables, x, train=False)["main"],
            img, 19), axis=-1)

    rng = np.random.RandomState(4)
    for B in (1, 2, 4):
        img = jnp.asarray(rng.randn(B, 1024, 2048, 3).astype(np.float32) * 30.0)
        try:
            pred = eval_img(variables, img)  # compile + warmup
            _ = int(pred[0, 0, 0])
            n = max(1, 6 // B)
            t0 = time.perf_counter()
            for _ in range(n):
                pred = eval_img(variables, img)
            _ = int(pred[0, 0, 0])
            dt = (time.perf_counter() - t0) / n
            print(f"B={B}: {dt*1e3:8.1f} ms/batch  {dt/B*1e3:7.1f} ms/img")
        except Exception as e:
            print(f"B={B}: failed — {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
