import numpy as np
import pytest

import jax.numpy as jnp

from iqc_tpu.ops import image as imops


def test_to_float_and_gray(small_image):
    f = imops.to_float(jnp.asarray(small_image))
    assert f.dtype == jnp.float32
    assert float(f.max()) <= 1.0
    g = imops.rgb_to_gray(f)
    assert g.shape == small_image.shape[:2]


def test_resize_bilinear(small_image):
    f = imops.to_float(jnp.asarray(small_image))
    r = imops.resize_bilinear(f, (64, 64))
    assert r.shape == (64, 64, 3)
    # mean preserved approximately under downscale
    assert abs(float(r.mean()) - float(f.mean())) < 0.02


def test_gaussian_blur_smooths():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((32, 32)), dtype=jnp.float32)
    y = imops.gaussian_blur(x, sigma=2.0)
    assert y.shape == x.shape
    assert float(jnp.var(y)) < float(jnp.var(x))
    # mean preserved (kernel normalized)
    assert abs(float(y.mean()) - float(x.mean())) < 0.02


def test_otsu_bimodal():
    rng = np.random.default_rng(1)
    a = rng.normal(0.2, 0.02, size=500)
    b = rng.normal(0.8, 0.02, size=500)
    x = jnp.asarray(np.concatenate([a, b]).reshape(50, 20), dtype=jnp.float32)
    t = float(imops.otsu_threshold(x))
    # any threshold separating the two modes is a valid Otsu maximizer
    # (the between-class variance is flat between the clusters)
    assert 0.25 < t < 0.75
    below = np.asarray(x) < t
    assert abs(np.asarray(x)[below].mean() - 0.2) < 0.05
    assert abs(np.asarray(x)[~below].mean() - 0.8) < 0.05


def test_adaptive_threshold_dark_line():
    x = np.full((40, 40), 0.8, dtype=np.float32)
    x[20, 5:35] = 0.1  # dark crack
    mask = imops.adaptive_threshold(jnp.asarray(x), block_size=11, c=2.0, invert=True)
    m = np.asarray(mask)
    assert m[20, 10:30].mean() > 0.9  # crack pixels detected
    assert m[5, 10:30].mean() < 0.1   # background clean


def test_morphology_roundtrip():
    m = np.zeros((32, 32), dtype=bool)
    m[10:20, 10:20] = True
    m[5, 5] = True  # small speck removed by opening
    opened = np.asarray(imops.binary_open(jnp.asarray(m), radius=2))
    assert not opened[5, 5]
    assert opened[14, 14]
    dil = np.asarray(imops.binary_dilate(jnp.asarray(m), radius=1))
    assert dil.sum() > m.sum()
    ero = np.asarray(imops.binary_erode(jnp.asarray(m), radius=1))
    assert ero.sum() < m.sum()


def test_fill_holes():
    m = np.zeros((24, 24), dtype=bool)
    m[4:20, 4:20] = True
    m[10:14, 10:14] = False  # hole
    filled = np.asarray(imops.fill_holes(jnp.asarray(m)))
    assert filled[11, 11]
    assert not filled[0, 0]


def test_clahe_improves_contrast():
    rng = np.random.default_rng(2)
    # low-contrast image clustered around 0.5
    x = jnp.asarray(0.45 + 0.1 * rng.random((64, 64)), dtype=jnp.float32)
    y = imops.clahe(x, clip_limit=4.0, grid=(4, 4))
    assert y.shape == x.shape
    assert float(jnp.std(y)) > float(jnp.std(x))
    assert 0.0 <= float(y.min()) and float(y.max()) <= 1.0


def test_bilateral_preserves_edges():
    x = np.zeros((32, 32), dtype=np.float32)
    x[:, 16:] = 1.0
    rng = np.random.default_rng(3)
    noisy = x + rng.normal(0, 0.05, x.shape).astype(np.float32)
    y = np.asarray(imops.bilateral_filter(jnp.asarray(noisy), d=5, sigma_color=30, sigma_space=5))
    # noise reduced on flat regions
    assert y[:, :12].std() < noisy[:, :12].std()
    # edge magnitude preserved
    assert abs(y[:, 20:].mean() - y[:, :12].mean()) > 0.8


def test_crop_and_resize_identity():
    rng = np.random.default_rng(4)
    img = jnp.asarray(rng.random((32, 32, 3)), dtype=jnp.float32)
    boxes = jnp.asarray([[0.0, 0.0, 32.0, 32.0], [8.0, 8.0, 24.0, 24.0]])
    crops = imops.crop_and_resize(img, boxes, (32, 32))
    assert crops.shape == (2, 32, 32, 3)
    # full-image crop reproduces the image closely
    np.testing.assert_allclose(np.asarray(crops[0]), np.asarray(img), atol=1e-5)
    # sub-crop centre matches source centre pixel region mean
    sub = np.asarray(crops[1])
    src = np.asarray(img[8:24, 8:24])
    assert abs(sub.mean() - src.mean()) < 0.02
