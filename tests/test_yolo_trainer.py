import numpy as np
import pytest

from iqc_tpu.data.yolo_dataset import (
    DetectionLoader,
    SyntheticDefectDataset,
    YoloDataset,
    mixup,
    mosaic4,
)


def test_synthetic_dataset_labels_consistent():
    ds = SyntheticDefectDataset(n=8, image_size=128, max_boxes=8)
    img, boxes, classes, valid = ds.load(0)
    assert img.shape == (128, 128, 3)
    for b, v in zip(boxes, valid):
        if v:
            assert 0 <= b[0] < b[2] <= 128
            assert 0 <= b[1] < b[3] <= 128
    # deterministic per index
    img2, *_ = ds.load(0)
    np.testing.assert_array_equal(img, img2)


def test_yolo_dataset_txt_labels(tmp_path):
    from PIL import Image

    img_dir = tmp_path / "images" / "train"
    lbl_dir = tmp_path / "labels" / "train"
    img_dir.mkdir(parents=True)
    lbl_dir.mkdir(parents=True)
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)).save(
        img_dir / "a.jpg"
    )
    (lbl_dir / "a.txt").write_text("2 0.5 0.5 0.25 0.25\n")
    ds = YoloDataset(str(img_dir), str(lbl_dir), image_size=128, max_boxes=4)
    img, boxes, classes, valid = ds.load(0)
    assert img.shape == (128, 128, 3)
    assert valid[0] and not valid[1]
    assert classes[0] == 2
    np.testing.assert_allclose(boxes[0], [48, 48, 80, 80], atol=1.0)


def test_mosaic4_remaps_boxes():
    ds = SyntheticDefectDataset(n=8, image_size=128, max_boxes=8, seed=3)
    rng = np.random.default_rng(0)
    samples = [ds.load(i) for i in range(4)]
    img, boxes, classes, valid = mosaic4(samples, 128, 16, rng)
    assert img.shape == (128, 128, 3)
    for b, v in zip(boxes, valid):
        if v:
            assert 0 <= b[0] <= b[2] <= 128.5
            assert 0 <= b[1] <= b[3] <= 128.5


def test_mixup_blends():
    ds = SyntheticDefectDataset(n=4, image_size=64, max_boxes=4, seed=1)
    rng = np.random.default_rng(0)
    a, b = ds.load(0), ds.load(1)
    img, boxes, classes, valid = mixup(a, b, rng)
    assert img.shape == (64, 64, 3)
    assert valid.sum() <= 4


def test_detection_loader_batches():
    ds = SyntheticDefectDataset(n=16, image_size=96, max_boxes=8)
    loader = DetectionLoader(ds, batch_size=4, mosaic_prob=0.5, mixup_prob=0.2, seed=0)
    batches = list(loader)
    assert len(batches) == 4
    b = batches[0]
    assert b["images"].shape == (4, 96, 96, 3)
    assert b["boxes"].shape == (4, 8, 4)
    assert b["valid"].dtype == bool


@pytest.mark.slow
def test_yolo_trainer_one_epoch_loss_decreases():
    """End-to-end: a tiny YOLOv8 must reduce its loss on the synthetic
    corpus within a few epochs (owning the loop the reference delegates)."""
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(n=16, image_size=96, max_boxes=8)
    loader = DetectionLoader(ds, batch_size=8, mosaic_prob=0.0, mixup_prob=0.0, seed=0)
    trainer = YOLOTrainer(
        {
            "num_classes": 5, "image_size": 96, "batch_size": 8, "epochs": 3,
            "width_mult": 0.125, "reg_max": 8, "max_boxes": 8,
            "compute_dtype": "float32", "learning_rate": 0.005,
            "warmup_epochs": 1, "ema_decay": 0.9,
            "checkpoint_dir": "/tmp/iqc_yolo_test",
        }
    )
    trainer.build(steps_per_epoch=len(loader))
    report = trainer.train(loader, val_loader=None, epochs=3)
    losses = trainer.metrics.history["train_loss"]
    assert len(losses) == 3
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]  # learning happens

    # validation path end-to-end (mAP computation over real predictions)
    val_loader = DetectionLoader(ds, batch_size=8, mosaic_prob=0, shuffle=False)
    val = trainer.validate(val_loader)
    assert set(val) >= {"mAP50", "mAP50_95", "precision", "recall"}
    assert 0.0 <= val["mAP50"] <= 1.0


def test_trainer_device_mosaic_single_device():
    """mesh size 1 + device_mosaic: the packed step applies in-batch mosaic
    on device (host loader serves raw samples) and still learns."""
    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(16, 64, 8, seed=0)
    trainer = YOLOTrainer(
        {
            "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 1,
            "width_mult": 0.125, "compute_dtype": "float32",
            "warmup_epochs": 0, "device_mosaic": True, "mosaic": 1.0,
        },
        mesh_config=MeshConfig(data_parallel=1, model_parallel=1),
    )
    assert trainer.uses_device_mosaic
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0)
    report = trainer.train(loader, None, epochs=1)
    assert report["epochs_trained"] == 1
    final = report["final"]
    assert np.isfinite(final["train_loss"])


def test_trainer_device_corpus_scanned_epoch():
    """Single-device + device mosaic + small dataset: the corpus uploads to
    HBM once and each epoch runs as ONE scanned dispatch."""
    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(16, 64, 8, seed=0)
    trainer = YOLOTrainer(
        {
            "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 2,
            "width_mult": 0.125, "compute_dtype": "float32",
            "warmup_epochs": 0, "device_mosaic": True,
        },
        mesh_config=MeshConfig(data_parallel=1, model_parallel=1),
    )
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0)
    trainer.build(steps_per_epoch=len(loader))
    corpus = trainer._maybe_device_corpus(loader)
    assert corpus is not None and corpus[0].shape == (16, 64, 64, 3)
    report = trainer.train(loader, None, epochs=2)
    assert report["epochs_trained"] == 2
    assert np.isfinite(report["final"]["train_loss"])
    # step counter advanced through the scan: 2 epochs x 2 steps
    assert int(trainer.state.step) == 4


def test_staged_host_epoch_matches_streaming():
    """Staged host epochs (one packed upload + one scanned dispatch per
    epoch) must produce the same training trajectory as the per-step
    streaming path — the staging only reschedules data movement, the math
    (host mosaic batches, step order, LR schedule, EMA) is identical."""
    import jax

    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_yolo import YOLOTrainer

    cfg = {
        "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 2,
        "width_mult": 0.125, "reg_max": 8, "compute_dtype": "float32",
        "warmup_epochs": 0, "device_mosaic": False, "ema_decay": 0.9,
        "learning_rate": 0.005, "checkpoint_dir": "/tmp/iqc_yolo_staged_test",
    }
    mesh = MeshConfig(data_parallel=1, model_parallel=1)

    def run(staged: bool):
        ds = SyntheticDefectDataset(16, 64, 8, seed=0)
        # host mosaic active: the staged path must carry the host-built
        # collages, not re-augment
        loader = DetectionLoader(ds, 8, mosaic_prob=0.5, mixup_prob=0.0,
                                 seed=7)
        t = YOLOTrainer({**cfg, "staged_host_epochs": staged},
                        mesh_config=mesh)
        t.train(loader, None, epochs=2)
        return t

    t_staged = run(True)
    t_stream = run(False)
    assert int(t_staged.state.step) == 4  # 2 epochs x 2 steps, scan advanced
    # The sharp check is the per-epoch mean loss: epoch 1 runs identical
    # data through identical math from identical params, so any data-
    # semantics bug (re-augmented / skipped / reordered batches) shows up
    # at O(1); XLA fusion-order noise shows up at ~1e-6 relative.
    for k in ("train_loss", "train_box_loss", "train_cls_loss"):
        np.testing.assert_allclose(
            t_staged.metrics.history[k][0], t_stream.metrics.history[k][0],
            rtol=1e-5,
        )
        # later epochs inherit the amplified update noise (~3e-4 measured)
        np.testing.assert_allclose(
            t_staged.metrics.history[k], t_stream.metrics.history[k],
            rtol=1e-2,
        )
    # Param gate is loose: the scan body and the standalone step compile
    # with different accumulation orders (~1e-7/op f32 noise, amplified to
    # ~1e-4 on near-zero weights after 4 SGD+momentum steps). A wrong-data
    # bug shifts params by O(lr)=5e-3 — an order of magnitude above this.
    for a, b in zip(
        jax.tree_util.tree_leaves(t_staged.state.params),
        jax.tree_util.tree_leaves(t_stream.state.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-4)
    for a, b in zip(
        jax.tree_util.tree_leaves(t_staged.ema_params),
        jax.tree_util.tree_leaves(t_stream.ema_params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=5e-4)


def test_device_resident_validation_matches_streaming():
    """Scanned device-resident validation == per-batch streaming validation
    (same predict+NMS math, one dispatch instead of one per batch)."""
    import os

    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(16, 64, 8, seed=0)
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0, seed=7)
    t = YOLOTrainer({
        "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 1,
        "width_mult": 0.125, "reg_max": 8, "compute_dtype": "float32",
        "warmup_epochs": 0, "device_mosaic": False, "ema_decay": 0.9,
        "checkpoint_dir": "/tmp/iqc_yolo_valres_test",
    }, mesh_config=MeshConfig(data_parallel=1, model_parallel=1))
    t.train(loader, None, epochs=1)
    val_loader = DetectionLoader(ds, 8, mosaic_prob=0, mixup_prob=0,
                                 shuffle=False)
    resident = t.validate(val_loader)
    assert id(val_loader) in t._val_cache  # scanned path actually taken
    os.environ["IQC_DEVICE_VAL_MB"] = "0"
    try:
        t._val_cache.clear()
        streaming = t.validate(val_loader)
        assert id(val_loader) not in t._val_cache  # streaming path taken
    finally:
        del os.environ["IQC_DEVICE_VAL_MB"]
    for k in ("mAP50", "mAP50_95", "precision", "recall"):
        np.testing.assert_allclose(resident[k], streaming[k], rtol=1e-5,
                                    atol=1e-7)


def test_staged_epoch_ineligible_falls_back_to_streaming():
    """Over-cap epochs stream without re-running host augmentation: the
    materialized first batch is parked and consumed by the stream loop."""
    import os

    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(16, 64, 8, seed=0)
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0, seed=7)
    t = YOLOTrainer({
        "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 1,
        "width_mult": 0.125, "reg_max": 8, "compute_dtype": "float32",
        "warmup_epochs": 0, "device_mosaic": False, "ema_decay": 0.9,
        "checkpoint_dir": "/tmp/iqc_yolo_staged_fb_test",
    }, mesh_config=MeshConfig(data_parallel=1, model_parallel=1))
    os.environ["IQC_STAGED_EPOCH_MB"] = "0.001"
    try:
        report = t.train(loader, None, epochs=1)
    finally:
        del os.environ["IQC_STAGED_EPOCH_MB"]
    assert report["epochs_trained"] == 1
    assert int(t.state.step) == 2  # both steps ran exactly once
    assert np.isfinite(report["final"]["train_loss"])


def test_yolo_freeze_layers_pins_backbone():
    """freeze_layers=N freezes the first N modules bit-exactly (reference
    transfer_learning.freeze_layers, yolo_config.yaml:160-162 — the
    Ultralytics `freeze` arg), weight decay included; later modules
    train."""
    import jax

    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(16, 64, 8, seed=0)
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0, seed=5)
    t = YOLOTrainer({
        "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 1,
        "width_mult": 0.125, "reg_max": 8, "compute_dtype": "float32",
        "warmup_epochs": 0, "device_mosaic": False, "ema_decay": 0.9,
        "learning_rate": 0.01, "weight_decay": 1e-2, "freeze_layers": 3,
        "checkpoint_dir": "/tmp/iqc_yolo_freeze_test",
    }, mesh_config=MeshConfig(data_parallel=1, model_parallel=1))
    t.build(steps_per_epoch=2)
    p0 = jax.tree_util.tree_map(np.asarray, t.state.params)
    t.train(loader, None, epochs=1)
    p1 = jax.tree_util.tree_map(np.asarray, t.state.params)
    for key in ("stem", "down2", "c2f_2"):  # first 3 in MODULE_ORDER
        for a, b in zip(jax.tree_util.tree_leaves(p0[key]),
                        jax.tree_util.tree_leaves(p1[key])):
            np.testing.assert_array_equal(a, b)
    moved = [
        float(np.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(p0["head_p3"]),
                        jax.tree_util.tree_leaves(p1["head_p3"]))
    ]
    assert max(moved) > 0


def test_staged_epoch_with_inbatch_device_mosaic():
    """device_mosaic + corpus-ineligible dataset: the staged scan applies
    in-batch device mosaic per step (the scan body is the full streaming
    step, keyed off state.step)."""
    import os

    from iqc_tpu.config import MeshConfig
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(16, 64, 8, seed=0)
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0, seed=9)
    t = YOLOTrainer({
        "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 1,
        "width_mult": 0.125, "reg_max": 8, "compute_dtype": "float32",
        "warmup_epochs": 0, "device_mosaic": True, "mosaic": 1.0,
        "ema_decay": 0.9, "checkpoint_dir": "/tmp/iqc_yolo_staged_dm_test",
    }, mesh_config=MeshConfig(data_parallel=1, model_parallel=1))
    os.environ["IQC_DEVICE_CORPUS_MB"] = "0"  # force the non-corpus path
    try:
        report = t.train(loader, None, epochs=1)
    finally:
        del os.environ["IQC_DEVICE_CORPUS_MB"]
    assert report["epochs_trained"] == 1
    assert int(t.state.step) == 2
    assert np.isfinite(report["final"]["train_loss"])


def test_frozen_modules_backbone_semantics_both_stems():
    """freeze_layers=10 means 'the whole backbone' on BOTH stem variants
    (the s2d backbone has 9 modules — no down2 — so naive first-10 would
    freeze a neck module there)."""
    from iqc_tpu.train.train_yolo import frozen_modules

    conv_keys = ["stem", "down2", "c2f_2", "down3", "c2f_3", "down4",
                 "c2f_4", "down5", "c2f_5", "sppf", "neck_td4", "neck_td3",
                 "head_p3"]
    s2d_keys = [k for k in conv_keys if k not in ("stem", "down2")] + ["stem_s2d"]
    conv_bb = {"stem", "down2", "c2f_2", "down3", "c2f_3", "down4",
               "c2f_4", "down5", "c2f_5", "sppf"}
    s2d_bb = (conv_bb - {"stem", "down2"}) | {"stem_s2d"}
    assert frozen_modules(conv_keys, 10) == conv_bb
    assert frozen_modules(s2d_keys, 10) == s2d_bb  # never a neck module
    assert frozen_modules(conv_keys, 3) == {"stem", "down2", "c2f_2"}
    assert frozen_modules(s2d_keys, 3) == {"stem_s2d", "c2f_2", "down3"}
    assert frozen_modules(conv_keys, 11) == conv_bb | {"neck_td4"}


def test_loader_without_augmentation_is_deterministic_enumeration():
    """shuffle=False + no mosaic/mixup must enumerate the dataset exactly
    (repeat iteration -> identical batches); validation metrics on fixed
    weights are then deterministic (regression: samples were drawn with
    replacement, making every validate() a random resample)."""
    ds = SyntheticDefectDataset(20, 64, 8, seed=0)
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0,
                             shuffle=False, prefetch=0)
    a = [b["images"].copy() for b in loader]
    b = [bb["images"].copy() for bb in loader]
    assert len(a) == len(b) == 2  # 20 // 8
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)
    # first batch is exactly samples 0..7 in order
    np.testing.assert_array_equal(a[0][0], ds.load(0)[0])
    np.testing.assert_array_equal(a[0][7], ds.load(7)[0])


def test_s2d_stem_variant_shapes_and_learning():
    """TPU-first space-to-depth stem (models/yolo.py stem_mode="s2d"):
    identical head output shapes to the faithful stem, lossless
    space_to_depth rearrangement, and the trainer learns with it."""
    import jax
    import jax.numpy as jnp

    from iqc_tpu.models.yolo import YOLOv8, space_to_depth

    # space_to_depth is a pure pixel rearrangement
    x = np.arange(2 * 8 * 8 * 3, dtype=np.float32).reshape(2, 8, 8, 3)
    s = np.asarray(space_to_depth(jnp.asarray(x), 4))
    assert s.shape == (2, 2, 2, 48)
    np.testing.assert_array_equal(np.sort(s.ravel()), np.sort(x.ravel()))
    # block (0:4, 0:4) of image 0 lands entirely in s[0,0,0]
    np.testing.assert_array_equal(
        np.sort(s[0, 0, 0]), np.sort(x[0, :4, :4, :].ravel())
    )

    size = 64
    for mode in ("conv", "s2d"):
        mod = YOLOv8(num_classes=5, width_mult=0.125, reg_max=8,
                     stem_mode=mode)
        v = mod.init(jax.random.PRNGKey(0),
                     jnp.zeros((1, size, size, 3), jnp.float32), train=False)
        dist, cls = mod.apply(v, jnp.zeros((2, size, size, 3)), train=False)
        a = (size // 8) ** 2 + (size // 16) ** 2 + (size // 32) ** 2
        assert dist.shape == (2, a, 32) and cls.shape == (2, a, 5), mode

    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(n=16, image_size=64, max_boxes=8, seed=0)
    loader = DetectionLoader(ds, 8, mosaic_prob=0.0, mixup_prob=0.0, seed=0)
    trainer = YOLOTrainer({
        "image_size": 64, "batch_size": 8, "max_boxes": 8, "epochs": 2,
        "width_mult": 0.125, "reg_max": 8, "compute_dtype": "float32",
        "warmup_epochs": 0, "device_mosaic": False, "ema_decay": 0.9,
        "stem_mode": "s2d", "learning_rate": 0.005,
        "checkpoint_dir": "/tmp/iqc_yolo_s2d_test",
    })
    trainer.build(steps_per_epoch=len(loader))
    assert "stem_s2d" in trainer.state.params
    assert "stem" not in trainer.state.params
    report = trainer.train(loader, None, epochs=2)
    losses = trainer.metrics.history["train_loss"]
    assert all(np.isfinite(l) for l in losses)
    assert losses[-1] < losses[0]
