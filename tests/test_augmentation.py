import numpy as np
import pytest

from iqc_tpu.data.augmentation import (
    AugmentConfig,
    DEFECT_AUGMENT_CONFIGS,
    QualityControlAugmenter,
)


@pytest.fixture(scope="module")
def augmenter():
    return QualityControlAugmenter()


@pytest.fixture(scope="module")
def image(rng):
    return rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)


def test_augment_image_shape_dtype(augmenter, image):
    out = augmenter.augment_image(image, seed=0)
    assert out.shape == image.shape
    assert out.dtype == np.uint8


def test_augment_determinism(augmenter, image):
    a = augmenter.augment_image(image, seed=7)
    b = augmenter.augment_image(image, seed=7)
    c = augmenter.augment_image(image, seed=8)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_augment_changes_image(augmenter, image):
    out = augmenter.augment_image(image, seed=3)
    assert not np.array_equal(out, image)


def test_hflip_box_remap():
    aug = QualityControlAugmenter(
        AugmentConfig(
            p_hflip=1.0, p_vflip=0, p_rot90=0, p_affine=0, p_brightness=0,
            p_contrast=0, p_gamma=0, p_saturation=0, p_noise=0, p_blur=0,
            p_motion_blur=0, p_shadow=0, p_fog=0, p_cutout=0, p_elastic=0,
        )
    )
    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :32] = 200  # left half bright
    out, boxes = aug.augment_with_annotations(img, [[4, 8, 20, 24]], seed=0)
    # box mirrors horizontally: x -> 64 - x
    np.testing.assert_allclose(boxes[0], [44, 8, 60, 24], atol=0.5)
    # bright half moved right
    assert out[:, 48:].mean() > out[:, :16].mean()


def test_affine_box_stays_in_bounds():
    aug = QualityControlAugmenter(AugmentConfig(p_affine=1.0, max_rotate_deg=20))
    img = np.random.default_rng(0).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    _, boxes = aug.augment_with_annotations(img, [[10, 10, 50, 50]], seed=1)
    b = boxes[0]
    assert 0 <= b[0] <= b[2] <= 64
    assert 0 <= b[1] <= b[3] <= 64


def test_batch_expansion(augmenter, rng):
    batch = rng.integers(0, 255, (3, 64, 64, 3), dtype=np.uint8)
    out = augmenter.augment_batch(batch, n_augmentations=2, seed=0)
    assert out.shape == (6, 64, 64, 3)
    # different rounds differ
    assert not np.array_equal(out[0], out[3])


def test_defect_specific_pipelines(image):
    for cls in ("crack", "scratch", "dent", "discoloration", "contamination"):
        aug = QualityControlAugmenter.create_defect_specific_augmentations(cls)
        out = aug.augment_image(image, seed=0)
        assert out.shape == image.shape
    assert set(DEFECT_AUGMENT_CONFIGS) == {
        "crack", "scratch", "dent", "discoloration", "contamination"
    }


def test_effectiveness_analysis(augmenter, image):
    report = augmenter.analyze_augmentation_effectiveness(image, n_samples=4, seed=0)
    assert report["n_samples"] == 4
    assert report["pairwise_diversity"] >= 0
    # capped at 23% like the reference estimator (augmentation.py:580-583)
    assert 0 <= report["estimated_robustness_improvement"] <= 0.23


def test_visualization_grid(augmenter, image):
    grid = augmenter.visualize_augmentations(image, n=3, seed=0)
    assert grid.shape == (64, 64 * 4, 3)
