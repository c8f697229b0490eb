import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iqc_tpu.data.pipeline import ArrayDataset, DataLoader, balanced_sample_indices
from iqc_tpu.train.utils import (
    EarlyStopping,
    MetricsTracker,
    compute_class_weights,
    count_parameters,
    model_size_mb,
    set_global_seed,
    training_report,
)


def test_early_stopping_max_mode():
    es = EarlyStopping(patience=2, mode="max")
    assert not es.step(0.5)
    assert not es.step(0.6)
    assert not es.step(0.55)   # 1 bad epoch
    assert es.step(0.55)       # 2 bad epochs -> stop
    assert es.best == 0.6


def test_early_stopping_min_mode():
    es = EarlyStopping(patience=1, mode="min")
    es.step(1.0)
    assert es.step(1.2)


def test_metrics_tracker(tmp_path):
    mt = MetricsTracker()
    mt.update({"loss": 1.0, "accuracy": 0.5})
    mt.update({"loss": 0.5, "accuracy": 0.8})
    assert mt.best("accuracy") == 0.8
    assert mt.best("loss", "min") == 0.5
    p = tmp_path / "m.json"
    mt.export_json(str(p))
    assert p.exists()


def test_class_weights():
    labels = np.asarray([0, 0, 0, 1])
    w = compute_class_weights(labels, 3)
    assert w[1] > w[0]      # rare class weighted up
    assert w[2] == 0.0      # absent class


def test_training_report():
    rep = training_report({"val_accuracy": [0.9, 0.95], "loss": [1.0, 0.5]})
    assert rep["epochs_trained"] == 2
    assert rep["targets_met"]["accuracy"] is True
    assert rep["best_metrics"]["val_accuracy"] == 0.95


def test_param_counting():
    params = {"w": jnp.zeros((10, 10)), "b": jnp.zeros((10,))}
    assert count_parameters(params) == 110
    assert model_size_mb(params) == pytest.approx(110 * 4 / 1024 / 1024)


def test_balanced_sampling():
    labels = np.asarray([0] * 90 + [1] * 10)
    idx = balanced_sample_indices(labels, 1000, np.random.default_rng(0))
    frac_minority = np.mean(labels[idx] == 1)
    assert 0.4 < frac_minority < 0.6  # rebalanced towards 50/50


def test_dataloader_prefetch():
    rng = np.random.default_rng(0)
    ds = ArrayDataset(
        rng.integers(0, 255, (20, 8, 8, 3), dtype=np.uint8),
        rng.integers(0, 3, 20),
    )
    dl = DataLoader(ds, batch_size=4, prefetch=2, seed=1)
    batches = list(dl)
    assert len(batches) == 5
    assert batches[0]["images"].shape == (4, 8, 8, 3)
    # second epoch reshuffles but produces same count
    assert len(list(dl)) == 5


# --- yolo loss ---------------------------------------------------------------


@pytest.fixture(scope="module")
def yolo_problem():
    from iqc_tpu.ops.nms import make_anchors

    anchors, strides = make_anchors([(8, 8), (4, 4), (2, 2)], [8, 16, 32])
    a = anchors.shape[0]
    reg_max, c, m = 8, 5, 4
    return anchors, strides, a, reg_max, c, m


def test_yolo_loss_finite_and_grads(yolo_problem):
    from iqc_tpu.train.yolo_loss import YoloLossConfig, yolo_loss

    anchors, strides, a, reg_max, c, m = yolo_problem
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.normal(0, 1, (2, a, 4 * reg_max)), jnp.float32)
    cls = jnp.asarray(rng.normal(-4, 1, (2, a, c)), jnp.float32)
    gt_boxes = jnp.asarray([[[8, 8, 30, 30], [40, 12, 60, 40], [0, 0, 0, 0], [0, 0, 0, 0]]] * 2, jnp.float32)
    gt_classes = jnp.asarray([[1, 2, 0, 0]] * 2, jnp.int32)
    gt_valid = jnp.asarray([[True, True, False, False]] * 2)

    def loss_fn(d, cl):
        total, _ = yolo_loss(d, cl, anchors, strides, gt_boxes, gt_classes, gt_valid, reg_max)
        return total

    total, metrics = yolo_loss(
        dist, cls, anchors, strides, gt_boxes, gt_classes, gt_valid, reg_max
    )
    assert np.isfinite(float(total))
    assert float(metrics["num_fg"]) > 0  # anchors got assigned
    gd, gc = jax.grad(loss_fn, argnums=(0, 1))(dist, cls)
    assert np.isfinite(np.asarray(gd)).all()
    assert np.isfinite(np.asarray(gc)).all()
    assert float(jnp.abs(gc).sum()) > 0


def test_yolo_loss_lowering_is_gather_free(yolo_problem):
    """The TAL loss must lower with ZERO gather/scatter/dynamic-slice ops:
    data-dependent gathers are pathological on the target backend (see
    crop_and_resize's matmul rewrite), so assign_targets/dfl_loss use
    one-hot masked sums instead. Regression-pin the property on the
    forward+backward StableHLO."""
    from iqc_tpu.train.yolo_loss import yolo_loss

    anchors, strides, a, reg_max, c, m = yolo_problem
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.normal(0, 1, (2, a, 4 * reg_max)), jnp.float32)
    cls = jnp.asarray(rng.normal(-4, 1, (2, a, c)), jnp.float32)
    gt_boxes = jnp.asarray(
        [[[8, 8, 30, 30], [40, 12, 60, 40], [0, 0, 0, 0], [0, 0, 0, 0]]] * 2,
        jnp.float32,
    )
    gt_classes = jnp.asarray([[1, 2, 0, 0]] * 2, jnp.int32)
    gt_valid = jnp.asarray([[True, True, False, False]] * 2)

    def loss_fn(d, cl):
        total, _ = yolo_loss(d, cl, anchors, strides, gt_boxes, gt_classes,
                             gt_valid, reg_max)
        return total

    compiled = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1))).lower(
        dist, cls
    ).compile().as_text()
    # Baseline after the one-hot rewrite: 1 gather + 3 scatter-adds survive
    # optimization, all constant-index slicing artifacts (jnp basic
    # indexing and its transposes) — benign on TPU. The data-dependent
    # pattern this pins against (take_along_axis/top-k-indexed selection
    # per anchor) adds tens of computed-index gathers, so a small bound
    # catches any reintroduction.
    n_gather = compiled.count(" gather(")
    n_scatter = compiled.count(" scatter(")
    assert n_gather <= 2, f"TAL loss grew gathers: {n_gather}"
    assert n_scatter <= 4, f"TAL loss grew scatters: {n_scatter}"
    assert "dynamic-gather" not in compiled


def test_yolo_loss_no_gt(yolo_problem):
    from iqc_tpu.train.yolo_loss import yolo_loss

    anchors, strides, a, reg_max, c, m = yolo_problem
    rng = np.random.default_rng(1)
    dist = jnp.asarray(rng.normal(0, 1, (1, a, 4 * reg_max)), jnp.float32)
    cls = jnp.asarray(rng.normal(-4, 1, (1, a, c)), jnp.float32)
    gt_boxes = jnp.zeros((1, m, 4), jnp.float32)
    gt_classes = jnp.zeros((1, m), jnp.int32)
    gt_valid = jnp.zeros((1, m), bool)
    total, metrics = yolo_loss(
        dist, cls, anchors, strides, gt_boxes, gt_classes, gt_valid, reg_max
    )
    assert np.isfinite(float(total))
    assert float(metrics["num_fg"]) == 0


def test_yolo_assignment_prefers_containing_anchors(yolo_problem):
    from iqc_tpu.train.yolo_loss import YoloLossConfig, assign_targets

    anchors, strides, a, reg_max, c, m = yolo_problem
    rng = np.random.default_rng(2)
    pred_boxes = jnp.concatenate(
        [anchors - 8.0, anchors + 8.0], axis=-1
    )  # 16x16 boxes centred on anchors
    pred_scores = jnp.full((a, c), 0.5)
    gt_boxes = jnp.asarray([[10, 10, 26, 26]], jnp.float32)
    out = assign_targets(
        pred_boxes, pred_scores, anchors,
        gt_boxes, jnp.asarray([2]), jnp.asarray([True]), YoloLossConfig(),
    )
    fg = np.asarray(out["fg"])
    assert fg.any()
    # all assigned anchors lie inside the gt box
    pts = np.asarray(anchors)[fg]
    assert ((pts[:, 0] > 10) & (pts[:, 0] < 26) & (pts[:, 1] > 10) & (pts[:, 1] < 26)).all()
    assert (np.asarray(out["target_class"])[fg] == 2).all()


def test_tal_topk_exact_count_on_ties(yolo_problem):
    """Near-uniform alignments admit EXACTLY k anchors, matching a scatter
    top-k oracle (ADVICE r1: the old >=kth threshold admitted unboundedly
    many on ties)."""
    from iqc_tpu.train.yolo_loss import YoloLossConfig, assign_targets

    anchors, strides, a, reg_max, c, m = yolo_problem
    # identical predictions everywhere -> every candidate anchor ties
    pred_boxes = jnp.concatenate([anchors - 8.0, anchors + 8.0], axis=-1)
    pred_scores = jnp.full((a, c), 0.5)
    gt = jnp.asarray([[2, 2, 62, 62]], jnp.float32)  # contains many anchors
    cfg = YoloLossConfig()
    out = assign_targets(
        pred_boxes, pred_scores, anchors, gt,
        jnp.asarray([1]), jnp.asarray([True]), cfg,
    )
    fg = np.asarray(out["fg"])
    inside = (
        (np.asarray(anchors)[:, 0] > 2) & (np.asarray(anchors)[:, 0] < 62)
        & (np.asarray(anchors)[:, 1] > 2) & (np.asarray(anchors)[:, 1] < 62)
    )
    assert inside.sum() > cfg.tal_topk  # the tie pool really exceeds k
    assert fg.sum() == cfg.tal_topk

    # scatter oracle: top-k by alignment (numpy, stable order)
    iou_row = np.zeros(a)
    boxes = np.asarray(pred_boxes)
    gx1, gy1, gx2, gy2 = 2, 2, 62, 62
    ix1 = np.maximum(boxes[:, 0], gx1); iy1 = np.maximum(boxes[:, 1], gy1)
    ix2 = np.minimum(boxes[:, 2], gx2); iy2 = np.minimum(boxes[:, 3], gy2)
    inter = np.clip(ix2 - ix1, 0, None) * np.clip(iy2 - iy1, 0, None)
    union = 16 * 16 + (gx2 - gx1) * (gy2 - gy1) - inter
    iou_row = np.where(union > 0, inter / union, 0)
    align = np.where(inside, 0.5**cfg.tal_alpha * iou_row**cfg.tal_beta, 0.0)
    oracle = np.zeros(a, bool)
    oracle[np.argsort(-align, kind="stable")[: cfg.tal_topk]] = True
    # fg anchors must all come from the oracle's alignment level set
    assert np.isin(align[fg], align[oracle]).all()


def test_tal_tiny_alignments_still_assign(yolo_problem):
    """Early-training regime: score^0.5 * iou^6 ~ 1e-14 must still produce
    foreground anchors (the old absolute 1e-9 floor zeroed them all,
    killing the box/DFL gradient — ADVICE r1)."""
    from iqc_tpu.train.yolo_loss import YoloLossConfig, assign_targets

    anchors, strides, a, reg_max, c, m = yolo_problem
    # slightly offset predicted boxes -> low-but-nonzero IoU with the gt
    pred_boxes = jnp.concatenate([anchors - 1.0, anchors + 2.0], axis=-1)
    pred_scores = jnp.full((a, c), 1e-5)  # near-zero early scores
    gt = jnp.asarray([[8, 8, 40, 40]], jnp.float32)
    out = assign_targets(
        pred_boxes, pred_scores, anchors, gt,
        jnp.asarray([0]), jnp.asarray([True]), YoloLossConfig(),
    )
    assert np.asarray(out["fg"]).sum() > 0


def test_try_load_variables_corrupt_raises(tmp_path):
    """Missing file -> None (init fallback); corrupt file -> raises, never
    silently serving random weights (ADVICE r1)."""
    from iqc_tpu.train.checkpoint import save_variables, try_load_variables

    template = {"w": np.zeros((2, 2), np.float32)}
    assert try_load_variables(str(tmp_path / "missing.msgpack"), template) is None

    bad = tmp_path / "corrupt.msgpack"
    bad.write_bytes(b"this is not msgpack at all")
    with pytest.raises(ValueError, match="corrupt or incompatible"):
        try_load_variables(str(bad), template)

    # shape-incompatible counts as corrupt too
    other = tmp_path / "wrong_shape.msgpack"
    save_variables(str(other), {"w": np.zeros((3, 3), np.float32)})
    with pytest.raises(ValueError, match="corrupt or incompatible"):
        try_load_variables(str(other), template)

    # structure mismatch: extra keys in the file must NOT partially restore
    # (flax from_bytes silently ignores them — a deeper architecture would
    # otherwise "load" into a shallower model by name coincidence)
    extra = tmp_path / "extra_keys.msgpack"
    save_variables(str(extra), {"w": np.zeros((2, 2), np.float32),
                                "v": np.ones((4,), np.float32)})
    with pytest.raises(ValueError, match="structure mismatch"):
        try_load_variables(str(extra), template)


def test_ema_ramp_tracks_params_early():
    """EMA decay ramps from 0 (Ultralytics d*(1-exp(-t/2000))): after a few
    steps the EMA must be dominated by trained params, not the init
    (ADVICE r1: constant 0.9999 kept ~85% init weight at step 1600)."""
    d = 0.9999
    w = 1.0  # effective weight remaining on init after n steps
    for step in range(1, 101):
        dt = d * (1.0 - np.exp(-step / 2000.0))
        w *= dt
    assert w < 0.2  # ~0.08 after 100 steps; constant decay would give 0.99


def test_architecture_enum_maps_and_rejects():
    """`architecture: resnet50|resnet101` maps to stage sizes; unknown
    values reject exactly like the reference (train_resnet.py:230-235)."""
    from iqc_tpu.train.train_resnet import ResNetTrainer

    t = ResNetTrainer({"architecture": "resnet101", "num_classes": 2,
                       "image_size": 32, "compute_dtype": "float32"})
    assert t.config["stage_sizes"] == [3, 4, 23, 3]
    with pytest.raises(ValueError, match="Unsupported architecture"):
        ResNetTrainer({"architecture": "resnet18"})


def test_freeze_backbone_and_gradual_unfreeze():
    """Transfer-learning parity: freeze_backbone trains only stage4+head
    (reference resent_model.py:305-312, torch requires_grad=False); the
    unfreeze_schedule widens the trainable set at its epoch
    (resnet_config.yaml:165-177) — frozen params must be EXACTLY unchanged
    (weight decay included), and the mask swap must not rebuild the step."""
    import jax

    from iqc_tpu.train.train_resnet import ResNetTrainer

    rng = np.random.default_rng(0)
    images = np.concatenate([
        rng.integers(0, 60, (8, 32, 32, 3)),
        rng.integers(190, 255, (8, 32, 32, 3)),
    ]).astype(np.uint8)
    labels = np.asarray([0] * 8 + [1] * 8, np.int32)
    ds = ArrayDataset(images, labels, ["dark", "bright"])

    trainer = ResNetTrainer({
        "num_classes": 2, "image_size": 32, "batch_size": 8, "epochs": 2,
        "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
        "learning_rate": 1e-2, "weight_decay": 1e-2, "optimizer": "adamw",
        "balanced_sampling": False, "use_class_weights": False,
        "scheduler": "none", "early_stopping_patience": 100,
        "freeze_backbone": True,
        "unfreeze_schedule": [{"epoch": 1, "layers": ["layer3", "layer4"]}],
        "checkpoint_dir": "/tmp/iqc_test_freeze_ckpt",
    })
    trainer.setup_data(ds, ds)
    trainer.build(steps_per_epoch=len(trainer.train_loader))
    p0 = jax.tree_util.tree_map(np.asarray, trainer.state.params)

    assert trainer._trainable_prefixes(0) == ("head", "stage4")
    assert trainer._trainable_prefixes(1) == ("head", "stage3", "stage4")

    trainer.train_epoch(0)
    p1 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    for key in ("stem_conv", "stage1_block1", "stage2_block1", "stage3_block1"):
        for a, b in zip(jax.tree_util.tree_leaves(p0[key]),
                        jax.tree_util.tree_leaves(p1[key])):
            np.testing.assert_array_equal(a, b)  # bit-frozen, wd included
    moved = [
        float(np.abs(a - b).max())
        for key in ("stage4_block1", "head_dense1")
        for a, b in zip(jax.tree_util.tree_leaves(p0[key]),
                        jax.tree_util.tree_leaves(p1[key]))
    ]
    assert max(moved) > 0  # trainable groups actually train

    trainer.train_epoch(1)  # schedule unfreezes stage3
    p2 = jax.tree_util.tree_map(np.asarray, trainer.state.params)
    for a, b in zip(jax.tree_util.tree_leaves(p1["stage1_block1"]),
                    jax.tree_util.tree_leaves(p2["stage1_block1"])):
        np.testing.assert_array_equal(a, b)  # still frozen
    s3 = [
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(p1["stage3_block1"]),
                        jax.tree_util.tree_leaves(p2["stage3_block1"]))
    ]
    assert max(s3) > 0  # newly unfrozen group trains


# --- resnet trainer end-to-end (tiny) ---------------------------------------


def test_resnet_trainer_overfits_tiny():
    from iqc_tpu.train.train_resnet import ResNetTrainer

    rng = np.random.default_rng(0)
    # two well-separated classes: dark vs bright images
    n = 32
    images = np.concatenate(
        [
            rng.integers(0, 60, (n // 2, 32, 32, 3)),
            rng.integers(190, 255, (n // 2, 32, 32, 3)),
        ]
    ).astype(np.uint8)
    labels = np.asarray([0] * (n // 2) + [1] * (n // 2), np.int32)
    ds = ArrayDataset(images, labels, ["dark", "bright"])

    trainer = ResNetTrainer(
        {
            "num_classes": 2, "image_size": 32, "batch_size": 8, "epochs": 3,
            "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
            "learning_rate": 1e-2, "balanced_sampling": False,
            "use_class_weights": False, "scheduler": "none",
            "early_stopping_patience": 100,
            "checkpoint_dir": "/tmp/iqc_test_ckpt",
        }
    )
    trainer.setup_data(ds, ds, ds)
    trainer.build(steps_per_epoch=len(trainer.train_loader))
    report = trainer.train(epochs=3)
    assert report["epochs_trained"] == 3
    # separable problem: train accuracy should climb well beyond chance.
    # (val accuracy uses BN *running* stats, which need hundreds of steps
    # to converge — asserting on it at 12 steps tests BN lag, not learning.)
    assert trainer.metrics.history["accuracy"][-1] > 0.7
    val = trainer.evaluate(trainer.val_loader)
    assert np.isfinite(val["loss"]) and 0.0 <= val["accuracy"] <= 1.0
    assert "precision" in val and "recall" in val and "f1" in val
    test_result = trainer.test()
    assert len(test_result["confusion_matrix"]) == 2
    assert np.asarray(test_result["confusion_matrix"]).sum() == n


def test_resnet_trainer_checkpoint_roundtrip(tmp_path):
    from iqc_tpu.train.train_resnet import ResNetTrainer

    rng = np.random.default_rng(1)
    ds = ArrayDataset(
        rng.integers(0, 255, (8, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 2, 8).astype(np.int32),
        ["a", "b"],
    )
    cfg = {
        "num_classes": 2, "image_size": 32, "batch_size": 8, "epochs": 1,
        "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
        "balanced_sampling": False, "use_class_weights": False,
        "checkpoint_dir": str(tmp_path),
    }
    t1 = ResNetTrainer(cfg)
    t1.setup_data(ds)
    t1.build(steps_per_epoch=2)
    path = str(tmp_path / "ck.msgpack")
    t1.save(path, epoch=5)

    t2 = ResNetTrainer(cfg)
    t2.setup_data(ds)
    t2.build(steps_per_epoch=2)
    t2.resume(path)
    assert t2.start_epoch == 5
    w1 = jax.tree_util.tree_leaves(t1.state.params)[0]
    w2 = jax.tree_util.tree_leaves(t2.state.params)[0]
    np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_full_train_state_checkpoint_restores_optimizer(tmp_path):
    from iqc_tpu.train.train_resnet import ResNetTrainer

    rng = np.random.default_rng(2)
    ds = ArrayDataset(
        rng.integers(0, 255, (16, 32, 32, 3), dtype=np.uint8),
        rng.integers(0, 2, 16).astype(np.int32),
        ["a", "b"],
    )
    cfg = {
        "num_classes": 2, "image_size": 32, "batch_size": 8, "epochs": 1,
        "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
        "balanced_sampling": False, "use_class_weights": False,
        "checkpoint_dir": str(tmp_path),
    }
    t1 = ResNetTrainer(cfg)
    t1.setup_data(ds)
    t1.build(steps_per_epoch=2)
    t1.train_epoch(0)  # advance optimizer state
    path = str(tmp_path / "full.msgpack")
    t1.save_full(path, epoch=3)

    t2 = ResNetTrainer(cfg)
    t2.setup_data(ds)
    t2.build(steps_per_epoch=2)
    t2.resume(path)
    assert t2.start_epoch == 3
    assert int(t2.state.step) == int(t1.state.step)
    # optimizer moments restored, not re-initialized
    m1 = jax.tree_util.tree_leaves(t1.state.opt_state)
    m2 = jax.tree_util.tree_leaves(t2.state.opt_state)
    found_nonzero = False
    for a, b in zip(m1, m2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
        if np.asarray(a).size and np.abs(np.asarray(a)).sum() > 0:
            found_nonzero = True
    assert found_nonzero


def test_resnet_trainer_packed_single_device_path(monkeypatch):
    """mesh size 1 with the device corpus disabled falls back to the packed
    single-buffer upload path (one host->device transfer per step)."""
    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_resnet import ResNetTrainer

    monkeypatch.setenv("IQC_DEVICE_CORPUS_MB", "0")

    rng = np.random.default_rng(0)
    n = 16
    images = np.concatenate([
        rng.integers(0, 60, (n // 2, 32, 32, 3)),
        rng.integers(190, 255, (n // 2, 32, 32, 3)),
    ]).astype(np.uint8)
    labels = np.asarray([0] * (n // 2) + [1] * (n // 2), np.int32)
    ds = ArrayDataset(images, labels, ["dark", "bright"])

    trainer = ResNetTrainer(
        {
            "num_classes": 2, "image_size": 32, "batch_size": 8, "epochs": 2,
            "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
            "learning_rate": 1e-2, "balanced_sampling": False,
            "use_class_weights": False, "scheduler": "none",
            "early_stopping_patience": 100,
            "checkpoint_dir": "/tmp/iqc_test_ckpt_packed",
        },
        mesh_config=MeshConfig(data_parallel=1, model_parallel=1),
    )
    assert trainer.mesh.mesh.size == 1
    trainer.setup_data(ds, ds, ds)
    trainer.build(steps_per_epoch=len(trainer.train_loader))
    m = trainer.train_epoch(0)
    assert np.isfinite(m["loss"])
    # the packed jit cache was actually exercised
    assert len(trainer._packed_compiled) == 1
    m2 = trainer.train_epoch(1)
    assert len(trainer._packed_compiled) == 1  # same shape -> same executable
    assert np.isfinite(m2["loss"])


def test_resnet_trainer_device_corpus_scanned_epoch():
    """Single-device classifier training uses the HBM-resident corpus +
    one scanned dispatch per epoch."""
    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_resnet import ResNetTrainer

    rng = np.random.default_rng(0)
    n = 16
    images = np.concatenate([
        rng.integers(0, 60, (n // 2, 32, 32, 3)),
        rng.integers(190, 255, (n // 2, 32, 32, 3)),
    ]).astype(np.uint8)
    labels = np.asarray([0] * (n // 2) + [1] * (n // 2), np.int32)
    ds = ArrayDataset(images, labels, ["dark", "bright"])
    trainer = ResNetTrainer(
        {
            "num_classes": 2, "image_size": 32, "batch_size": 8, "epochs": 2,
            "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
            "learning_rate": 1e-2, "balanced_sampling": True,
            "use_class_weights": False, "scheduler": "none",
            "early_stopping_patience": 100,
            "checkpoint_dir": "/tmp/iqc_test_ckpt_corpus",
        },
        mesh_config=MeshConfig(data_parallel=1, model_parallel=1),
    )
    trainer.setup_data(ds, ds, ds)
    trainer.build(steps_per_epoch=len(trainer.train_loader))
    assert trainer._maybe_device_corpus() is not None
    m = trainer.train_epoch(0)
    assert np.isfinite(m["loss"])
    assert int(trainer.state.step) == len(trainer.train_loader)
    m2 = trainer.train_epoch(1)
    assert int(trainer.state.step) == 2 * len(trainer.train_loader)
    assert np.isfinite(m2["accuracy"])
