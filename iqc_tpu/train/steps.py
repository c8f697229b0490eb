"""Pure training steps: data-parallel pjit over the device mesh.

The reference's training loops live in torch with AMP GradScaler
(``train/train_resnet.py:358-404``) or inside Ultralytics
(``train/train_yolo.py:117-179``). Here a train step is a pure function
jitted with sharding annotations: params/opt-state replicated, batch
sharded over the mesh's data axis — GSPMD inserts the gradient psum over
ICI (SURVEY.md §2a "TPU-native equivalent"). bf16 compute with fp32 params
replaces AMP; determinism comes from jax PRNG instead of cudnn flags
(``train/utils.py:23-32``).
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from iqc_tpu.parallel.mesh import MeshSpec


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def warmup_cosine_schedule(
    base_lr: float, warmup_steps: int, total_steps: int, end_fraction: float = 0.01
):
    """Warmup + cosine decay from pure scalar ops.

    optax.warmup_cosine_decay_schedule builds a join_schedules boundaries
    array, which becomes an embedded constant in the jitted update —
    pathological on the tunnel TPU backend (ops/jit_utils.py)."""
    end_lr = base_lr * end_fraction
    w = max(warmup_steps, 1)
    span = max(total_steps - w, 1)

    def schedule(step):
        s = jnp.asarray(step, jnp.float32)
        warm = base_lr * s / w
        progress = jnp.clip((s - w) / span, 0.0, 1.0)
        cos = end_lr + (base_lr - end_lr) * 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(s < w, warm, cos)

    return schedule


def create_train_state(variables, optimizer: optax.GradientTransformation) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def softmax_cross_entropy(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    label_smoothing: float = 0.0,
    class_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Class-weighted CE with label smoothing
    (train_resnet.py:287-346 loss configuration)."""
    num_classes = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, num_classes)
    if label_smoothing > 0:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / num_classes
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    loss = -jnp.sum(onehot * logp, axis=-1)
    if class_weights is not None:
        loss = loss * class_weights[labels]
    return jnp.mean(loss)


def _device_normalize(images):
    """uint8 batches normalize on device (ImageNet mean/std built from
    scalar constants — array literals embed in the executable, which is
    pathological on the tunnel backend, see ops/jit_utils.py). Sending
    uint8 instead of host-normalized float32 cuts host->device transfer
    4x — the dominant per-step cost for 224px batches over the tunnel.
    Float inputs are assumed already normalized (backward compat)."""
    if not jnp.issubdtype(images.dtype, jnp.integer):
        return images
    from iqc_tpu.ops.image import IMAGENET_MEAN, IMAGENET_STD

    x = images.astype(jnp.float32) / 255.0
    mean = jnp.stack([jnp.float32(m) for m in IMAGENET_MEAN])
    std = jnp.stack([jnp.float32(s) for s in IMAGENET_STD])
    return (x - mean) / std


class MaskedUpdatesState(NamedTuple):
    """Per-leaf 0/1 trainable mask (scalars; broadcast against updates)."""

    mask: Any


def masked_updates() -> optax.GradientTransformation:
    """Scale the FINAL optimizer updates by a per-leaf mask held in state.

    Chained after the base optimizer this gives exact parameter freezing —
    weight decay included, which grad-masking alone would leak (torch
    ``requires_grad=False`` parity, reference ``resent_model.py:305-312``).
    The mask lives in the optimizer state, so :func:`set_update_mask` can
    swap it at an epoch boundary (gradual unfreezing,
    ``resnet_config.yaml:165-177``) WITHOUT changing the jitted step's
    structure — no recompile."""

    def init_fn(params):
        return MaskedUpdatesState(
            jax.tree_util.tree_map(
                lambda _: jnp.ones((), jnp.float32), params
            )
        )

    def update_fn(updates, state, params=None):
        del params
        return (
            jax.tree_util.tree_map(lambda u, m: u * m, updates, state.mask),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def set_update_mask(opt_state, mask_tree):
    """Replace every MaskedUpdatesState in a (possibly chained) optimizer
    state with ``mask_tree``. Pure host-side tree surgery — leaf shapes are
    unchanged so compiled steps keep their cache entries."""
    if isinstance(opt_state, MaskedUpdatesState):
        return MaskedUpdatesState(mask_tree)
    if isinstance(opt_state, tuple) and not hasattr(opt_state, "_fields"):
        return tuple(set_update_mask(s, mask_tree) for s in opt_state)
    return opt_state


def make_classifier_train_step(
    module,
    optimizer: optax.GradientTransformation,
    label_smoothing: float = 0.0,
):
    """Returns step(state, images, labels, rng, class_weights) ->
    (state, metrics). class_weights [C] is a runtime argument (pass
    jnp.ones for unweighted) — embedded array constants are pathological
    on the tunnel TPU backend (ops/jit_utils.py). Integer image batches
    are normalized on device (_device_normalize)."""

    def step(state: TrainState, images, labels, rng, class_weights):
        images = _device_normalize(images)
        def loss_fn(params):
            variables = {"params": params, "batch_stats": state.batch_stats}
            logits, updates = module.apply(
                variables, images, train=True,
                mutable=["batch_stats"], rngs={"dropout": rng},
            )
            loss = softmax_cross_entropy(
                logits, labels, label_smoothing, class_weights
            )
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        new_state = TrainState(state.step + 1, params, new_bs, opt_state)
        return new_state, {"loss": loss, "accuracy": acc}

    return step


def make_classifier_eval_step(module):
    def step(params, batch_stats, images, labels):
        images = _device_normalize(images)
        logits = module.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        preds = jnp.argmax(logits, -1)
        loss = softmax_cross_entropy(logits, labels)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return {"loss": loss, "preds": preds, "labels": labels, "probs": probs}

    return step


def shard_train_step(step_fn, spec: MeshSpec):
    """jit a train step with data-parallel shardings over the mesh:
    state replicated, batch sharded on the data axis; GSPMD derives the
    gradient all-reduce. This is the multi-chip entry validated by
    __graft_entry__.dryrun_multichip.

    Single-device meshes take the plain-jit path: on the tunnel TPU
    backend the GSPMD sharding pipeline inflates this step's compile from
    ~40 s to >8 min with zero benefit at mesh size 1 (measured,
    .scratch/train_bisect2)."""
    if spec.mesh.size == 1:
        return jax.jit(step_fn, donate_argnums=(0,))
    repl = NamedSharding(spec.mesh, P())
    batch = NamedSharding(spec.mesh, P(spec.data_axis))
    return jax.jit(
        step_fn,
        in_shardings=(repl, batch, batch, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


# -- single-transfer batch packing -------------------------------------------
#
# Each host->device transfer through the tunnel costs ~120 ms FIXED
# (measured: uploading a detection batch as 4 arrays = 493 ms/step while the
# step computes in ~100 ms). Packing the whole batch into ONE uint8 buffer
# and bitcasting in-graph makes the upload a single transfer — the same
# trick the serving path uses for outputs (models/ensemble.py packed path).
# Single-device only: a flattened buffer has no batch axis to shard.


def pack_batch_host(arrays) -> "np.ndarray":
    """Concatenate host arrays into one uint8 buffer (C-order raw bytes)."""
    import numpy as np

    return np.concatenate(
        [np.ascontiguousarray(a).reshape(-1).view(np.uint8) for a in arrays]
    )


def batch_specs(arrays):
    """[(shape, dtype), ...] spec list for unpack_batch_device."""
    import numpy as np

    return [(tuple(a.shape), np.dtype(a.dtype)) for a in arrays]


def unpack_batch_device(buf: jnp.ndarray, specs):
    """In-graph inverse of pack_batch_host. bool unpacks via uint8 != 0
    (bitcast to 1-bit bool is not a device op)."""
    import numpy as np

    out, off = [], 0
    for shape, dtype in specs:
        np_dt = np.dtype(dtype)
        is_bool = np_dt == np.bool_
        work_dt = np.dtype(np.uint8) if is_bool else np_dt
        n = int(np.prod(shape)) * work_dt.itemsize
        seg = buf[off : off + n]
        off += n
        if work_dt.itemsize == 1:
            arr = seg.reshape(shape)
        else:
            arr = jax.lax.bitcast_convert_type(
                seg.reshape(tuple(shape) + (work_dt.itemsize,)),
                jnp.dtype(work_dt),
            )
        out.append(arr != 0 if is_bool else arr)
    return out
