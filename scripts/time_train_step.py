#!/usr/bin/env python3
"""Honest YOLO train-step timing on the tunnel TPU (CLAUDE.md rule 1d).

Times the full train step (fwd + TAL loss + bwd + SGD/EMA) and the
loss-only forward with K-vs-1 scan differencing: the step runs K times
inside one dispatched ``lax.scan`` whose carry chains the train state, so
the compiler cannot fold iterations and the ~120 ms tunnel dispatch
latency cancels in the difference.

Motivation: the r1 residual "TAL loss runtime ~30 ms/step (batch 16)" —
the gather-free reformulation (train/yolo_loss.py) should cut this.

Run on TPU: python scripts/time_train_step.py
Env: BATCH (16), SIZE (320), ITERS (8), TRIALS (3).
Prints one JSON line.
"""

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> None:
    batch = int(os.environ.get("BATCH", "16"))
    size = int(os.environ.get("SIZE", "320"))
    iters = int(os.environ.get("ITERS", "8"))
    trials = int(os.environ.get("TRIALS", "3"))

    import jax
    import jax.numpy as jnp
    import optax

    from iqc_tpu.models.yolo import STRIDES, YOLOv8, feature_shapes
    from iqc_tpu.ops.jit_utils import hoisted_jit
    from iqc_tpu.ops.nms import make_anchors
    from iqc_tpu.train.steps import TrainState, create_train_state
    from iqc_tpu.train.yolo_loss import YoloLossConfig, yolo_loss

    module = YOLOv8(num_classes=5, width_mult=0.25, depth_mult=0.34,
                    dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    variables = module.init(rng, jnp.zeros((1, size, size, 3), jnp.float32),
                            train=False)
    optimizer = optax.chain(
        optax.add_decayed_weights(5e-4),
        optax.sgd(1e-2, momentum=0.937, nesterov=True),
    )
    state = create_train_state(variables, optimizer)
    ema = jax.tree_util.tree_map(jnp.copy, state.params)
    anchors, strides = make_anchors(feature_shapes((size, size)), STRIDES)
    loss_cfg = YoloLossConfig()
    reg_max = 16

    m = 24
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    images = jax.random.uniform(ks[0], (batch, size, size, 3))
    wh = jax.random.uniform(ks[1], (batch, m, 2), minval=8.0, maxval=80.0)
    cxy = jax.random.uniform(ks[2], (batch, m, 2), minval=40.0,
                             maxval=size - 40.0)
    boxes = jnp.concatenate([cxy - wh / 2, cxy + wh / 2], axis=-1)
    classes = jax.random.randint(ks[3], (batch, m), 0, 5)
    valid = jnp.broadcast_to(jnp.arange(m)[None, :] < 12, (batch, m))

    def step(state, ema, images, boxes, classes, valid, anchors, strides):
        def loss_fn(params):
            vars_ = {"params": params, "batch_stats": state.batch_stats}
            (dist, cls), updates = module.apply(
                vars_, images, train=True, mutable=["batch_stats"]
            )
            total, parts = yolo_loss(dist, cls, anchors, strides, boxes,
                                     classes, valid, reg_max, loss_cfg)
            return total, (parts, updates["batch_stats"])

        (loss, (_, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state,
                                              state.params)
        params = optax.apply_updates(state.params, updates)
        new_ema = jax.tree_util.tree_map(
            lambda e, p: 0.999 * e + 0.001 * p, ema, params)
        return TrainState(state.step + 1, params, new_bs, opt_state), \
            new_ema, loss

    def loss_only(params, batch_stats, images, boxes, classes, valid,
                  anchors, strides):
        (dist, cls), _ = module.apply(
            {"params": params, "batch_stats": batch_stats}, images,
            train=True, mutable=["batch_stats"])
        total, _ = yolo_loss(dist, cls, anchors, strides, boxes, classes,
                             valid, reg_max, loss_cfg)
        return total

    def make_step_loop(k):
        def loop(state, ema, images, boxes, classes, valid, anchors,
                 strides):
            def body(carry, _):
                st, em, img = carry
                st, em, loss = step(st, em, img, boxes, classes, valid,
                                    anchors, strides)
                # chain the loss back into the input so no iteration folds
                img = img + (loss * 0.0).astype(img.dtype)
                return (st, em, img), loss

            (st, em, _), losses = jax.lax.scan(
                body, (state, ema, images), None, length=k)
            return losses[-1], st.step

        return loop

    def make_loss_loop(k):
        def loop(params, batch_stats, images, boxes, classes, valid,
                 anchors, strides):
            def body(carry, _):
                img, acc = carry
                total = loss_only(params, batch_stats, img, boxes, classes,
                                  valid, anchors, strides)
                img = img + (total * 0.0).astype(img.dtype)
                return (img, acc + total), total

            (_, acc), _ = jax.lax.scan(body, (images, 0.0), None, length=k)
            return acc

        return loop

    def timed_fetch(fn, *args) -> float:
        t0 = time.perf_counter()
        jax.tree_util.tree_map(np.asarray, jax.device_get(fn(*args)))
        return time.perf_counter() - t0

    def measure(make_loop, args):
        f1, _ = hoisted_jit(make_loop(1)).aot_compile(*args)
        fk, _ = hoisted_jit(make_loop(iters)).aot_compile(*args)
        timed_fetch(f1, *args)
        timed_fetch(fk, *args)
        per = []
        for _ in range(trials):
            t1 = timed_fetch(f1, *args)
            tk = timed_fetch(fk, *args)
            per.append((tk - t1) / (iters - 1))
        return statistics.median(per)

    step_args = (state, ema, images, boxes, classes, valid, anchors, strides)
    loss_args = (state.params, state.batch_stats, images, boxes, classes,
                 valid, anchors, strides)
    t_step = measure(make_step_loop, step_args)
    t_loss = measure(make_loss_loop, loss_args)

    print(json.dumps({
        "batch": batch, "image_size": size,
        "train_step_ms": round(t_step * 1e3, 3),
        "loss_fwd_ms": round(t_loss * 1e3, 3),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
