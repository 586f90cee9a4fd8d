"""Per-op device trace of the multi-scale+flip eval program (VERDICT r3 #7).

BENCH_r03 measured MS+flip (scales 0.75/1.0/1.25 + flip, 1024x2048) at
0.679 s/img while 6 single-scale passes over an 8-tile image cost ~6x0.080
= 0.48 s -- this script attributes the extra ~0.2 s by tracing the ONE-jit
``predict_multiscale`` program (reference surface evaluate.py:155-175) and
aggregating per-op device time into pools: tile forwards vs stitch
(dynamic-update-slice) vs scale-resizes vs flip copies vs everything else.

Run on the real chip: python scripts/trace_msflip.py [--imgs 2]
"""

import argparse
import collections
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

from trace_step import parse_xplane  # noqa: E402  (same-dir import)


def capture(logdir, imgs, scales, flip):
    import jax
    import jax.numpy as jnp

    from ccnet_tpu.evaluation.sliding import predict_multiscale
    from ccnet_tpu.models import build_model

    model = build_model("ccnet", num_classes=19, recurrence=2, depth=101,
                        dtype=jnp.bfloat16, impl="auto", remat=False)
    rng = np.random.RandomState(0)
    x1 = jnp.asarray(rng.randn(1, 769, 769, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x1, train=False)

    @jax.jit
    def eval_img(variables, img):
        logits = predict_multiscale(
            lambda x: model.apply(variables, x, train=False)["main"],
            img, (769, 769), 19, scales=scales, flip=flip,
        )
        return jnp.argmax(logits, axis=-1)

    img = jnp.asarray(rng.randn(1, 1024, 2048, 3).astype(np.float32) * 30.0)
    pred = eval_img(variables, img)  # compile + warm
    _ = int(pred[0, 0, 0])
    t0 = time.perf_counter()
    with jax.profiler.trace(logdir):
        for _ in range(imgs):
            pred = eval_img(variables, img)
        _ = int(pred[0, 0, 0])
    wall = (time.perf_counter() - t0) / imgs
    return wall


def pool(name: str) -> str:
    """Pools tuned to the msflip program's structure."""
    head = name.split(" = ", 1)[0].lstrip("%").lower()
    body = name.split(" = ", 1)[1] if " = " in name else ""
    if "dynamic-update-slice" in head or "dynamic_update_slice" in head:
        return "stitch (canvas dynamic-update-slice)"
    if head.startswith(("convolution", "dot")) or "while" in head:
        return "tile forwards (convs/dots/while-mapped net)"
    if head.startswith(("fusion", "loop_fusion", "input_fusion")) or "fusion" in head:
        return "fusions (net elementwise + resizes + averages)"
    if head.startswith(("copy", "transpose", "reverse")):
        return "copies/transposes/flips"
    if " custom-call(" in body:
        return "custom-call (pallas)"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--imgs", type=int, default=2)
    p.add_argument("--logdir", type=str, default="/tmp/ccnet_trace_msflip")
    p.add_argument("--top", type=int, default=30)
    p.add_argument("--single-scale", action="store_true",
                   help="trace scales=(1.0,) no-flip instead (the 0.081 s/img leg)")
    args = p.parse_args()

    scales = (1.0,) if args.single_scale else (0.75, 1.0, 1.25)
    flip = not args.single_scale
    # a reused logdir accumulates xplanes across runs and the parse sums
    # them — delete exactly the files the parser globs (never rmtree a
    # user-supplied path: --logdir could name a populated directory)
    import glob
    for p in glob.glob(os.path.join(args.logdir, "**", "*.xplane.pb"),
                       recursive=True):
        os.unlink(p)
    os.makedirs(args.logdir, exist_ok=True)
    wall = capture(args.logdir, args.imgs, scales, flip)
    print(f"wall: {wall:.3f} s/img (scales={scales} flip={flip})")

    per_op, _ = parse_xplane(args.logdir)
    total_ms = sum(per_op.values()) / 1e9
    print(f"total device op time: {total_ms / args.imgs:.1f} ms/img\n")
    pools = collections.Counter()
    for name, ps in per_op.items():
        pools[pool(name)] += ps
    print("== by pool (ms/img) ==")
    for cat, ps in pools.most_common():
        print(f"{ps / 1e9 / args.imgs:9.2f}  {cat}")
    print(f"\n== top {args.top} ops (ms/img) ==")
    for name, ps in per_op.most_common(args.top):
        print(f"{ps / 1e9 / args.imgs:9.2f}  {name[:110]}")


if __name__ == "__main__":
    main()
