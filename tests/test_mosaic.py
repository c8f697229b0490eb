"""Device in-batch mosaic (ops/mosaic.py) vs numpy oracles."""

import numpy as np
import jax
import jax.numpy as jnp

from iqc_tpu.ops.mosaic import mosaic_batch, mixup_batch


def _np_bilinear_resize(img, oh, ow):
    """Plain (non-antialiased) separable bilinear — the device formulation."""
    ih, iw = img.shape[:2]
    out = np.zeros((oh, ow, img.shape[2]), np.float32)
    uy = np.clip((np.arange(oh) + 0.5) * ih / oh - 0.5, 0, ih - 1)
    ux = np.clip((np.arange(ow) + 0.5) * iw / ow - 0.5, 0, iw - 1)
    y0 = np.floor(uy).astype(int); y1 = np.minimum(y0 + 1, ih - 1)
    x0 = np.floor(ux).astype(int); x1 = np.minimum(x0 + 1, iw - 1)
    fy = (uy - y0)[:, None, None]
    fx = (ux - x0)[None, :, None]
    a = img[y0][:, x0] * (1 - fy) * (1 - fx)
    b = img[y0][:, x1] * (1 - fy) * fx
    c = img[y1][:, x0] * fy * (1 - fx)
    d = img[y1][:, x1] * fy * fx
    return a + b + c + d


def _batch(b=4, s=64, m=6, seed=0):
    rng = np.random.default_rng(seed)
    images = rng.integers(0, 255, (b, s, s, 3), np.uint8)
    boxes = np.zeros((b, m, 4), np.float32)
    classes = rng.integers(0, 5, (b, m)).astype(np.int32)
    valid = np.zeros((b, m), bool)
    for i in range(b):
        k = int(rng.integers(1, m))
        for j in range(k):
            x1, y1 = rng.uniform(0, s - 10, 2)
            boxes[i, j] = [x1, y1, x1 + rng.uniform(4, 10), y1 + rng.uniform(4, 10)]
            valid[i, j] = True
    return images, boxes, classes, valid


def test_mosaic_quadrants_match_numpy_bilinear():
    images, boxes, classes, valid = _batch()
    key = jax.random.PRNGKey(0)
    # antialias=True exercises the full filtered formula the oracle encodes;
    # the default (False) is the f=1 special case of the same matrix
    out_i, out_b, out_c, out_v = jax.jit(
        lambda *a: mosaic_batch(*a, prob=1.0, antialias=True)
    )(jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(classes),
      jnp.asarray(valid), key)
    out_i = np.asarray(out_i)

    # recover the traced picks/centers by replaying the PRNG usage
    b, s = images.shape[0], images.shape[1]
    k1, k2, k3 = jax.random.split(key, 3)
    picks = np.asarray(jax.random.randint(k1, (b, 3), 0, b))
    picks = np.concatenate([np.arange(b)[:, None], picks], axis=1)
    centers = np.asarray(
        jax.random.uniform(k2, (b, 2), minval=0.3 * s, maxval=0.7 * s)
    )

    for i in range(b):
        cx, cy = centers[i]
        # integer pixel rects exactly as the device mask sees them
        icx, icy = int(np.ceil(cx)), int(np.ceil(cy))
        rects = [
            (0, 0, cx, cy, 0, 0, icx, icy),
            (cx, 0, s, cy, icx, 0, s, icy),
            (0, cy, cx, s, 0, icy, icx, s),
            (cx, cy, s, s, icx, icy, s, s),
        ]
        for q, (fx0, fy0, fx1, fy1, px0, py0, px1, py1) in enumerate(rects):
            if px1 <= px0 or py1 <= py0:
                continue
            src = images[picks[i, q]].astype(np.float32)
            # device resample: antialiased triangle filter (support widened
            # by the downscale factor), rows renormalized — same formula as
            # ops/mosaic._interp_matrix
            def w_mat(f0, f1):
                span = max(f1 - f0, 1.0)
                f = max(s / span, 1.0)
                ii = np.arange(s)[:, None]
                jj = np.arange(s)[None, :]
                u = (ii - f0 + 0.5) * s / span - 0.5
                w = np.maximum(0.0, 1.0 - np.abs(u - jj) / f)
                return w / np.maximum(w.sum(1, keepdims=True), 1e-8)

            wy = w_mat(fy0, fy1)
            wx = w_mat(fx0, fx1)
            res = np.einsum("ij,jkc->ikc", wy, src)
            res = np.einsum("ikc,lk->ilc", res, wx)
            got = out_i[i, py0:py1, px0:px1]
            want = res[py0:py1, px0:px1]
            # bf16 matmuls: ~3 decimal digits
            np.testing.assert_allclose(got, want, atol=2.0)


def test_mosaic_boxes_remap_and_capacity():
    images, boxes, classes, valid = _batch(seed=3)
    key = jax.random.PRNGKey(1)
    out_i, out_b, out_c, out_v = mosaic_batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(classes),
        jnp.asarray(valid), key, prob=1.0,
    )
    s, m = images.shape[1], boxes.shape[1]
    out_b, out_v = np.asarray(out_b), np.asarray(out_v)
    assert out_b.shape == boxes.shape and out_v.shape == valid.shape
    # valid slots are compacted to the front and stay inside the canvas
    for i in range(len(out_v)):
        nv = out_v[i].sum()
        assert out_v[i, :nv].all() and not out_v[i, nv:].any()
        bb = out_b[i][out_v[i]]
        assert (bb[:, 0] >= -1e-3).all() and (bb[:, 2] <= s + 1e-3).all()
        assert (bb[:, 2] >= bb[:, 0] - 1e-3).all()


def test_mosaic_prob_zero_identity():
    images, boxes, classes, valid = _batch(seed=5)
    out = mosaic_batch(
        jnp.asarray(images), jnp.asarray(boxes), jnp.asarray(classes),
        jnp.asarray(valid), jax.random.PRNGKey(2), prob=0.0,
    )
    np.testing.assert_allclose(np.asarray(out[0]), images.astype(np.float32))
    np.testing.assert_allclose(np.asarray(out[1]), boxes)
    assert (np.asarray(out[3]) == valid).all()


def test_mixup_blends_and_unions():
    images, boxes, classes, valid = _batch(seed=7)
    out_i, out_b, out_c, out_v = mixup_batch(
        jnp.asarray(images, jnp.float32), jnp.asarray(boxes),
        jnp.asarray(classes), jnp.asarray(valid),
        jax.random.PRNGKey(3), prob=1.0,
    )
    out_i = np.asarray(out_i)
    assert out_i.shape == images.shape
    # blended pixels stay within the convex hull of the two sources
    assert out_i.min() >= 0.0 and out_i.max() <= 255.0
    # union can only grow validity
    assert np.asarray(out_v).sum() >= valid.sum()
