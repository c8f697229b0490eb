"""Train-time augmentation wiring (VERDICT r3 missing #1).

The reference applies augmentation *in training*: ~15 Ultralytics
hyperparams for YOLO (/root/reference/train/train_yolo.py:157-171) and the
torchvision transform stack for ResNet
(/root/reference/train/train_resnet.py:132-196). These tests pin the
TPU-native wiring: on-device, inside the jitted train steps, box-aware.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from iqc_tpu.data.augmentation import (
    YoloAugHyp,
    apply_hsv,
    classifier_augment_config,
    hue_rotate,
    yolo_train_augment,
    yolo_train_augment_batch,
)


# ---------------------------------------------------------------------------
# hyperparam containers / mappers
# ---------------------------------------------------------------------------


def test_yolo_aug_hyp_from_reference_dict():
    # the reference's augmentation block verbatim (yolo_config.yaml:61-83)
    hyp = YoloAugHyp.from_dict({
        "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
        "degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0,
        "perspective": 0.0, "flipud": 0.0, "fliplr": 0.5,
        "mosaic": 1.0, "mixup": 0.0, "copy_paste": 0.0,  # ignored here
    })
    assert hyp.hsv_s == 0.7 and hyp.scale == 0.5 and hyp.fliplr == 0.5
    assert hyp.active()
    assert not YoloAugHyp(hsv_h=0, hsv_s=0, hsv_v=0, translate=0, scale=0,
                          fliplr=0).active()


def test_yolo_aug_hyp_rejects_perspective():
    with pytest.raises(ValueError):
        YoloAugHyp(perspective=0.001)


def test_classifier_augment_config_maps_reference_yaml():
    cfg = classifier_augment_config({
        "random_resize_crop": {"size": 224, "scale": [0.8, 1.0],
                               "ratio": [0.75, 1.33]},
        "random_horizontal_flip": {"probability": 0.5},
        "random_vertical_flip": {"probability": 0.1},
        "random_rotation": {"degrees": 15},
        "color_jitter": {"brightness": 0.2, "contrast": 0.2,
                         "saturation": 0.2, "hue": 0.1},
        "random_grayscale": {"probability": 0.1},
        "random_erasing": {"enabled": True, "probability": 0.25,
                           "scale": [0.02, 0.33], "ratio": [0.3, 3.3]},
        "gaussian_blur": {"enabled": True, "probability": 0.1,
                          "kernel_size": 3},
    })
    assert cfg.p_hflip == 0.5 and cfg.p_vflip == 0.1
    assert cfg.p_affine == 1.0 and cfg.max_rotate_deg == 15
    assert cfg.p_brightness == 1.0 and cfg.brightness_range == 0.2
    assert cfg.p_hue == 1.0 and cfg.hue_range == 0.1
    assert cfg.p_grayscale == 0.1
    assert cfg.p_cutout == 0.25 and 0.3 < cfg.cutout_frac < 0.5
    assert cfg.p_blur == 0.1
    # disabled blocks stay off
    assert cfg.p_noise == 0 and cfg.p_shadow == 0 and cfg.p_elastic == 0


def test_classifier_augment_config_empty_is_none():
    assert classifier_augment_config(None) is None
    assert classifier_augment_config({}) is None


# ---------------------------------------------------------------------------
# ops
# ---------------------------------------------------------------------------


def test_hue_rotate_identity_and_gray_preservation():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(hue_rotate(img, jnp.float32(0.0))), np.asarray(img),
        atol=1e-6,
    )
    # full-wheel rotation returns to the original
    np.testing.assert_allclose(
        np.asarray(hue_rotate(img, jnp.float32(1.0))), np.asarray(img),
        atol=1e-5,
    )
    # achromatic pixels are fixed points of any hue rotation
    gray = jnp.full((8, 8, 3), 0.5, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(hue_rotate(gray, jnp.float32(0.23))), 0.5, atol=1e-6
    )
    # the channel mean (luma proxy) is invariant
    out = hue_rotate(img, jnp.float32(0.3))
    np.testing.assert_allclose(
        np.asarray(jnp.mean(out, -1)), np.asarray(jnp.mean(img, -1)), atol=1e-5
    )


def test_apply_hsv_zero_gains_is_identity():
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (16, 16, 3)).astype(np.float32))
    out = apply_hsv(jax.random.PRNGKey(0), img, 0.0, 0.0, 0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(img))


def test_apply_hsv_changes_image():
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.uniform(0.2, 0.8, (16, 16, 3)).astype(np.float32))
    out = apply_hsv(jax.random.PRNGKey(3), img, 0.015, 0.7, 0.4)
    assert not np.array_equal(np.asarray(out), np.asarray(img))
    assert 0.0 <= float(jnp.min(out)) and float(jnp.max(out)) <= 1.0


# ---------------------------------------------------------------------------
# YOLO box-aware augmentation
# ---------------------------------------------------------------------------


def test_yolo_train_augment_fliplr_remaps_boxes():
    hyp = YoloAugHyp(hsv_h=0, hsv_s=0, hsv_v=0, degrees=0, translate=0,
                     scale=0, shear=0, flipud=0, fliplr=1.0)
    img = jnp.zeros((64, 64, 3), jnp.float32)
    img = img.at[:, :32].set(0.8)
    boxes = jnp.asarray([[4.0, 8.0, 20.0, 24.0]], jnp.float32)
    valid = jnp.asarray([True])
    out, b, v = yolo_train_augment(jax.random.PRNGKey(0), img, boxes, valid, hyp)
    np.testing.assert_allclose(np.asarray(b[0]), [44, 8, 60, 24], atol=0.5)
    assert bool(v[0])
    assert float(out[:, 48:].mean()) > float(out[:, :16].mean())


def test_yolo_train_augment_affine_keeps_boxes_in_bounds():
    hyp = YoloAugHyp(hsv_h=0.015, hsv_s=0.7, hsv_v=0.4, degrees=10,
                     translate=0.1, scale=0.5, shear=2.0, fliplr=0.5)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    boxes = jnp.asarray([[10, 10, 50, 50], [0, 0, 6, 6]], jnp.float32)
    valid = jnp.asarray([True, True])
    for seed in range(4):
        _, b, v = yolo_train_augment(jax.random.PRNGKey(seed), img, boxes,
                                     valid, hyp)
        b = np.asarray(b)
        assert (b[:, 0] >= 0).all() and (b[:, 2] <= 64).all()
        assert (b[:, 1] >= 0).all() and (b[:, 3] <= 64).all()
        # validity only ever shrinks (degenerate boxes drop out)
        assert (np.asarray(v) <= np.asarray(valid)).all()


def test_yolo_train_augment_batch_shapes():
    hyp = YoloAugHyp()
    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    boxes = jnp.asarray(rng.uniform(4, 28, (2, 4, 4)).astype(np.float32))
    boxes = jnp.sort(boxes.reshape(2, 4, 2, 2), axis=2).reshape(2, 4, 4)
    classes = jnp.zeros((2, 4), jnp.int32)
    valid = jnp.ones((2, 4), bool)
    out, b, c, v = yolo_train_augment_batch(
        jax.random.PRNGKey(0), imgs, boxes, classes, valid, hyp)
    assert out.shape == imgs.shape and b.shape == boxes.shape
    assert c.shape == classes.shape and v.shape == valid.shape
    # two images in the batch get independent augmentation draws
    assert not np.array_equal(np.asarray(out[0]), np.asarray(out[1]))


# ---------------------------------------------------------------------------
# trainer integration
# ---------------------------------------------------------------------------


def test_yolo_trainer_with_augmentation_trains():
    from iqc_tpu.config import MeshConfig
    from iqc_tpu.data.yolo_dataset import DetectionLoader, SyntheticDefectDataset
    from iqc_tpu.train.train_yolo import YOLOTrainer

    ds = SyntheticDefectDataset(n=8, image_size=96, max_boxes=8)
    loader = DetectionLoader(ds, batch_size=4, mosaic_prob=0.0,
                             mixup_prob=0.0, seed=0)
    trainer = YOLOTrainer({
        "num_classes": 5, "image_size": 96, "batch_size": 4, "epochs": 2,
        "width_mult": 0.125, "reg_max": 8, "max_boxes": 8,
        "compute_dtype": "float32", "warmup_epochs": 1, "ema_decay": 0.9,
        "device_mosaic": False, "staged_host_epochs": False,
        "checkpoint_dir": "/tmp/iqc_yolo_aug_test",
        "augmentation": {"hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
                         "translate": 0.1, "scale": 0.5, "fliplr": 0.5},
    }, mesh_config=MeshConfig(data_parallel=1, model_parallel=1))
    trainer.build(steps_per_epoch=len(loader))
    assert trainer.aug_hyp is not None and trainer.aug_hyp.hsv_s == 0.7
    report = trainer.train(loader, val_loader=None, epochs=2)
    losses = trainer.metrics.history["train_loss"]
    assert all(np.isfinite(l) for l in losses)
    assert np.isfinite(report["final"]["train_loss"])


def test_yolo_trainer_augmentation_changes_training():
    """Same data/seed: aug-on vs aug-off must diverge (the chain is live)."""
    from iqc_tpu.data.yolo_dataset import DetectionLoader, SyntheticDefectDataset
    from iqc_tpu.train.train_yolo import YOLOTrainer

    def one_epoch(aug):
        from iqc_tpu.config import MeshConfig

        ds = SyntheticDefectDataset(n=8, image_size=96, max_boxes=8)
        loader = DetectionLoader(ds, batch_size=4, mosaic_prob=0.0,
                                 mixup_prob=0.0, seed=0)
        t = YOLOTrainer({
            "num_classes": 5, "image_size": 96, "batch_size": 4, "epochs": 1,
            "width_mult": 0.125, "reg_max": 8, "max_boxes": 8,
            "compute_dtype": "float32", "warmup_epochs": 1, "ema_decay": 0.9,
            "device_mosaic": False, "staged_host_epochs": False,
            "checkpoint_dir": "/tmp/iqc_yolo_aug_ab",
            "augmentation": aug,
        }, mesh_config=MeshConfig(data_parallel=1, model_parallel=1))
        t.build(steps_per_epoch=len(loader))
        t.train(loader, val_loader=None, epochs=1)
        return t.metrics.history["train_loss"][0]

    base = one_epoch(None)
    augd = one_epoch({"hsv_v": 0.4, "fliplr": 0.5, "scale": 0.5,
                      "translate": 0.1})
    assert np.isfinite(base) and np.isfinite(augd)
    assert base != augd


def test_resnet_trainer_with_augmentation_trains():
    from iqc_tpu.data.pipeline import ArrayDataset
    from iqc_tpu.train.train_resnet import ResNetTrainer

    rng = np.random.default_rng(0)
    n = 16
    images = np.concatenate([
        rng.integers(0, 60, (n // 2, 32, 32, 3)),
        rng.integers(190, 255, (n // 2, 32, 32, 3)),
    ]).astype(np.uint8)
    labels = np.asarray([0] * (n // 2) + [1] * (n // 2), np.int32)
    ds = ArrayDataset(images, labels, ["dark", "bright"])

    trainer = ResNetTrainer({
        "num_classes": 2, "image_size": 32, "batch_size": 8, "epochs": 2,
        "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
        "learning_rate": 1e-2, "balanced_sampling": False,
        "use_class_weights": False, "scheduler": "none",
        "early_stopping_patience": 100,
        "checkpoint_dir": "/tmp/iqc_resnet_aug_test",
        "augmentation": {
            "random_horizontal_flip": {"probability": 0.5},
            "random_rotation": {"degrees": 15},
            "color_jitter": {"brightness": 0.2, "contrast": 0.2,
                             "saturation": 0.2, "hue": 0.1},
            "random_erasing": {"enabled": True, "probability": 0.25,
                               "scale": [0.02, 0.33]},
        },
    })
    trainer.setup_data(ds, ds)
    trainer.build(steps_per_epoch=len(trainer.train_loader))
    assert trainer._aug_cfg is not None
    assert trainer._aug_cfg.p_hflip == 0.5
    m0 = trainer.train_epoch(0)
    assert np.isfinite(m0["loss"])
    # the dark/bright separation survives photometric jitter well enough
    # for the head to start learning
    m1 = trainer.train_epoch(1)
    assert np.isfinite(m1["loss"])
    # eval path is NOT augmented: deterministic across calls
    e1 = trainer.evaluate(trainer.val_loader)
    e2 = trainer.evaluate(trainer.val_loader)
    assert e1["loss"] == e2["loss"]


def test_resnet_trainer_accepts_full_yaml_shape():
    """The reference resnet_config.yaml nests the stack under
    augmentation.train — the trainer accepts that shape directly."""
    from iqc_tpu.train.train_resnet import ResNetTrainer

    trainer = ResNetTrainer({
        "num_classes": 2, "image_size": 32, "batch_size": 8,
        "stage_sizes": [1, 1, 1, 1], "compute_dtype": "float32",
        "balanced_sampling": False, "use_class_weights": False,
        "scheduler": "none", "checkpoint_dir": "/tmp/iqc_resnet_aug_yaml",
        "augmentation": {"train": {
            "random_horizontal_flip": {"probability": 0.5},
        }},
    })
    trainer.build(steps_per_epoch=1)
    assert trainer._aug_cfg is not None and trainer._aug_cfg.p_hflip == 0.5


def test_separable_affine_matches_gather_path():
    """The axis-aligned matmul fast path agrees with the general gather
    sampler (a vanishing rotation range forces the gather branch while
    drawing a ~0 angle from the same key stream)."""
    from iqc_tpu.data.augmentation import AugmentConfig, augment_image_and_boxes

    base = dict(p_hflip=0.0, p_vflip=0.0, p_rot90=0.0, p_affine=1.0,
                max_scale=0.4, max_translate=0.1, p_brightness=0.0,
                p_contrast=0.0, p_gamma=0.0, p_saturation=0.0, p_noise=0.0,
                p_blur=0.0, p_motion_blur=0.0, p_shadow=0.0, p_fog=0.0,
                p_cutout=0.0, p_elastic=0.0)
    fast_cfg = AugmentConfig(max_rotate_deg=0.0, **base)
    slow_cfg = AugmentConfig(max_rotate_deg=1e-12, **base)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (48, 48, 3)).astype(np.float32))
    boxes = jnp.asarray([[8.0, 12.0, 30.0, 26.0]], jnp.float32)
    for seed in range(3):
        key = jax.random.PRNGKey(seed)
        fast_img, fast_b = augment_image_and_boxes(key, img, boxes, fast_cfg)
        slow_img, slow_b = augment_image_and_boxes(key, img, boxes, slow_cfg)
        # boxes transform identically (same forward corner math)
        np.testing.assert_allclose(np.asarray(fast_b), np.asarray(slow_b),
                                   atol=1e-3)
        # pixels agree to bf16 matmul precision
        np.testing.assert_allclose(np.asarray(fast_img), np.asarray(slow_img),
                                   atol=0.03)
