"""Per-op device trace of the flagship train step, aggregated by XLA op.

Captures a ``jax.profiler`` trace of the bench-config train step on the real
chip, parses the ``*.xplane.pb`` directly (the tensorboard profile plugin's
converter is version-broken in this image — see
.claude/skills/verify/SKILL.md), and prints the "XLA Ops" line aggregated
per op and per category: conv fusions vs elementwise fusions vs copies vs
the rest. This is the tool behind the PARITY.md step-budget numbers.

Run: python scripts/trace_step.py [--steps 3]
"""

import argparse
import collections
import glob
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")


def capture(logdir, steps):
    import jax
    import jax.numpy as jnp

    from ccnet_tpu.losses import build_criterion
    from ccnet_tpu.models import build_model
    from ccnet_tpu.train import create_train_state, make_optimizer, make_train_step

    model = build_model("ccnet", num_classes=19, recurrence=2, depth=101,
                        dtype=jnp.bfloat16, impl="auto", remat=False)
    tx = make_optimizer(base_lr=1e-2, max_steps=60000, weight_decay=1e-4)
    criterion = build_criterion(ohem=True, thresh=0.7, min_kept=100000)
    state = create_train_state(model, tx, input_shape=(1, 769, 769, 3))
    step = make_train_step(model, criterion, tx)

    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(8, 769, 769, 3).astype(np.float32) * 30.0)
    labels = jnp.asarray(rng.randint(0, 19, size=(8, 769, 769)).astype(np.int32))
    key = jax.random.PRNGKey(0)
    for _ in range(2):  # compile + warm
        state, metrics = step(state, images, labels, key)
    _ = float(metrics["loss"])

    with jax.profiler.trace(logdir):
        for _ in range(steps):
            state, metrics = step(state, images, labels, key)
        _ = float(metrics["loss"])
    return steps


def parse_xplane(logdir):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    assert paths, f"no xplane under {logdir}"
    per_op = collections.Counter()      # op name -> total ps
    per_cat = collections.Counter()     # coarse category -> total ps
    for path in paths:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "/device:" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                if line.name != "XLA Ops":
                    continue
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    per_op[name] += ev.duration_ps
    for name, ps in per_op.items():
        per_cat[categorize(name)] += ps
    return per_op, per_cat


def categorize(name: str) -> str:
    """Categorize by the instruction's own name/opcode, NOT by substring over
    the whole HLO line (operand text would misattribute — a BN fusion whose
    operand list mentions a conv weight is not a conv)."""
    head = name.split(" = ", 1)[0].lstrip("%").lower()
    body = name.split(" = ", 1)[1] if " = " in name else ""
    if " custom-call(" in body:
        return "custom-call (pallas kernels etc.)"
    if head.startswith("convolution"):
        return "conv"
    if head.startswith("multiply_reduce_fusion"):
        return "multiply_reduce_fusion (conv dgrads, BN-grad reduces)"
    if head.startswith("multiply_add_fusion"):
        return "multiply_add_fusion (conv wgrads + SGD update)"
    if head.startswith("copy") or head.startswith("transpose"):
        return "copy/transpose"
    if head.startswith("dot"):
        return "dot"
    if head.startswith(("reduce_window", "select-and-scatter", "select_and_scatter")):
        return "pooling"
    if head.startswith(("all-reduce", "all-gather", "reduce-scatter")):
        return "collective"
    if "fusion" in head:
        return "other fusion (conv+BN fwd, residual/ReLU elementwise)"
    return "other"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--logdir", type=str, default="/tmp/ccnet_trace")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    os.makedirs(args.logdir, exist_ok=True)
    t0 = time.time()
    steps = capture(args.logdir, args.steps)
    print(f"traced {steps} steps in {time.time() - t0:.1f}s wall")

    per_op, per_cat = parse_xplane(args.logdir)
    total_ms = sum(per_op.values()) / 1e9
    print(f"\ntotal device op time: {total_ms:.1f} ms "
          f"({total_ms / steps:.1f} ms/step over {steps} steps)\n")
    print("== by category (ms/step) ==")
    for cat, ps in per_cat.most_common():
        print(f"{ps / 1e9 / steps:9.2f}  {cat}")
    print(f"\n== top {args.top} ops (ms/step) ==")
    for name, ps in per_op.most_common(args.top):
        print(f"{ps / 1e9 / steps:9.2f}  {name[:110]}")


if __name__ == "__main__":
    main()
