"""On-device data augmentation with stateless PRNG.

Replaces the reference's dual Albumentations/imgaug host pipelines
(``data_processing/augmentation.py``): every transform is a pure jax
function of (key, image) — branchless (probability gates via ``where``),
statically shaped, vmap-able over the batch, so the whole augmentation
chain fuses into the input side of the train step (BASELINE config #3).

Coverage mirrors the reference pipeline stages (``augmentation.py:76-196``):
geometric (flip / rot90 / affine rotate-scale-translate / elastic),
photometric (brightness / contrast / gamma / saturation), noise+blur
(gaussian noise, gaussian & motion blur), weather/occlusion (shadow
gradient, fog, cutout = RandomErasing), plus the reference's custom ops
(edge enhance ``:362-388``, gradient/spot lighting ``:390-451``, surface
texture noise ``:453-478``), bbox-aware variants (``:275-360``), batch xN
expansion (``:198-244``), per-defect-class pipelines (``:480-546``) and the
diversity/effectiveness analyzer with Bhattacharyya histogram distance and
the capped robustness estimator (``:548-635``).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from iqc_tpu.ops import image as imops


@dataclasses.dataclass(frozen=True)
class AugmentConfig:
    """Probabilities/ranges; defaults track config.yaml:199-204 +
    augmentation.py:76-167."""

    p_hflip: float = 0.5
    p_vflip: float = 0.2
    p_rot90: float = 0.3
    p_affine: float = 0.5
    max_rotate_deg: float = 15.0
    max_scale: float = 0.1
    max_translate: float = 0.0625
    p_brightness: float = 0.5
    brightness_range: float = 0.2
    p_contrast: float = 0.5
    contrast_range: float = 0.2
    p_gamma: float = 0.2
    p_saturation: float = 0.3
    p_noise: float = 0.3
    noise_sigma: float = 0.05
    p_blur: float = 0.2
    p_motion_blur: float = 0.1
    p_shadow: float = 0.2
    p_fog: float = 0.1
    p_cutout: float = 0.2
    cutout_frac: float = 0.2
    p_elastic: float = 0.1
    elastic_alpha: float = 8.0
    p_edge_enhance: float = 0.0
    p_texture: float = 0.0
    p_spot: float = 0.0


# ---------------------------------------------------------------------------
# primitive transforms (all: float [0,1] HWC image -> image)
# ---------------------------------------------------------------------------


def affine_grid_sample(img: jnp.ndarray, matrix: jnp.ndarray) -> jnp.ndarray:
    """Bilinear resample of [H,W,C] through an inverse 2x3 affine matrix
    (output->input mapping), edge-clamped."""
    h, w = img.shape[:2]
    ys = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2
    xs = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    sx = matrix[0, 0] * xx + matrix[0, 1] * yy + matrix[0, 2] + (w - 1) / 2
    sy = matrix[1, 0] * xx + matrix[1, 1] * yy + matrix[1, 2] + (h - 1) / 2
    return _bilinear_gather(img, sy, sx)


def _bilinear_gather(img: jnp.ndarray, sy: jnp.ndarray, sx: jnp.ndarray) -> jnp.ndarray:
    h, w = img.shape[:2]
    y0 = jnp.clip(jnp.floor(sy).astype(jnp.int32), 0, h - 1)
    x0 = jnp.clip(jnp.floor(sx).astype(jnp.int32), 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    fy = jnp.clip(sy - y0, 0.0, 1.0)[..., None]
    fx = jnp.clip(sx - x0, 0.0, 1.0)[..., None]
    g = lambda yi, xi: img[yi, xi]
    return (
        g(y0, x0) * (1 - fy) * (1 - fx)
        + g(y0, x1) * (1 - fy) * fx
        + g(y1, x0) * fy * (1 - fx)
        + g(y1, x1) * fy * fx
    )


def rotation_matrix(angle_rad: jnp.ndarray, scale: jnp.ndarray,
                    tx: jnp.ndarray, ty: jnp.ndarray) -> jnp.ndarray:
    """Inverse affine (output->input) for rotate+scale+translate."""
    c = jnp.cos(angle_rad) / scale
    s = jnp.sin(angle_rad) / scale
    return jnp.asarray([[c, s, -tx], [-s, c, -ty]])


def apply_shadow(key, img: jnp.ndarray) -> jnp.ndarray:
    """Linear half-plane shadow gradient (augmentation.py:405-430 analog)."""
    h, w = img.shape[:2]
    k1, k2, k3 = jax.random.split(key, 3)
    theta = jax.random.uniform(k1, (), minval=0.0, maxval=2 * jnp.pi)
    offset = jax.random.uniform(k2, (), minval=-0.25, maxval=0.25)
    strength = jax.random.uniform(k3, (), minval=0.3, maxval=0.6)
    yy, xx = jnp.meshgrid(
        jnp.linspace(-0.5, 0.5, h), jnp.linspace(-0.5, 0.5, w), indexing="ij"
    )
    d = xx * jnp.cos(theta) + yy * jnp.sin(theta) - offset
    shade = 1.0 - strength * jax.nn.sigmoid(d * 12.0)
    return img * shade[..., None]


def apply_fog(key, img: jnp.ndarray) -> jnp.ndarray:
    """Smooth-noise white blend (RandomFog analog)."""
    h, w = img.shape[:2]
    k1, k2 = jax.random.split(key)
    coarse = jax.random.uniform(k1, (max(h // 16, 1), max(w // 16, 1)))
    fog = jax.image.resize(coarse, (h, w), "bilinear")
    density = jax.random.uniform(k2, (), minval=0.2, maxval=0.45)
    alpha = (fog * density)[..., None]
    return img * (1 - alpha) + alpha


def apply_cutout(key, img: jnp.ndarray, frac: float) -> jnp.ndarray:
    """RandomErasing (resnet_config aug flag)."""
    h, w = img.shape[:2]
    k1, k2 = jax.random.split(key)
    ch = max(int(h * frac), 1)
    cw = max(int(w * frac), 1)
    cy = jax.random.randint(k1, (), 0, h - ch + 1)
    cx = jax.random.randint(k2, (), 0, w - cw + 1)
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :]
    hole = (yy >= cy) & (yy < cy + ch) & (xx >= cx) & (xx < cx + cw)
    return jnp.where(hole[..., None], 0.0, img)


def apply_elastic(key, img: jnp.ndarray, alpha: float) -> jnp.ndarray:
    """Elastic deformation: smooth random displacement field."""
    h, w = img.shape[:2]
    k1, k2 = jax.random.split(key)
    coarse_shape = (max(h // 8, 1), max(w // 8, 1))
    dy = jax.image.resize(jax.random.normal(k1, coarse_shape), (h, w), "bilinear") * alpha
    dx = jax.image.resize(jax.random.normal(k2, coarse_shape), (h, w), "bilinear") * alpha
    yy, xx = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32), indexing="ij"
    )
    return _bilinear_gather(img, yy + dy, xx + dx)


def apply_motion_blur(key, img: jnp.ndarray, length: int = 7) -> jnp.ndarray:
    """Directional blur via rolled averaging along a random direction."""
    theta = jax.random.uniform(key, (), minval=0.0, maxval=jnp.pi)
    dx = jnp.cos(theta)
    dy = jnp.sin(theta)
    acc = jnp.zeros_like(img)
    for i in range(length):
        t = i - length // 2
        acc = acc + jnp.roll(
            img, (jnp.round(t * dy).astype(int), jnp.round(t * dx).astype(int)), axis=(0, 1)
        )
    return acc / length


def apply_edge_enhance(img: jnp.ndarray, amount: float = 0.5) -> jnp.ndarray:
    """Unsharp-mask edge enhancement (augmentation.py:362-388)."""
    blurred = imops.gaussian_blur(img, sigma=1.0)
    return jnp.clip(img + amount * (img - blurred), 0.0, 1.0)


def apply_spot_light(key, img: jnp.ndarray) -> jnp.ndarray:
    """Radial spot lighting (augmentation.py:432-451)."""
    h, w = img.shape[:2]
    k1, k2, k3 = jax.random.split(key, 3)
    cy = jax.random.uniform(k1, (), minval=0.2, maxval=0.8)
    cx = jax.random.uniform(k2, (), minval=0.2, maxval=0.8)
    gain = jax.random.uniform(k3, (), minval=0.15, maxval=0.4)
    yy, xx = jnp.meshgrid(jnp.linspace(0, 1, h), jnp.linspace(0, 1, w), indexing="ij")
    r2 = (yy - cy) ** 2 + (xx - cx) ** 2
    light = 1.0 + gain * jnp.exp(-r2 / 0.05)
    return jnp.clip(img * light[..., None], 0.0, 1.0)


def apply_texture_noise(key, img: jnp.ndarray, strength: float = 0.05) -> jnp.ndarray:
    """Procedural surface-texture noise: band-limited multiplicative grain
    (augmentation.py:453-478)."""
    h, w = img.shape[:2]
    coarse = jax.random.normal(key, (max(h // 4, 1), max(w // 4, 1)))
    grain = jax.image.resize(coarse, (h, w), "bilinear")
    return jnp.clip(img * (1.0 + strength * grain[..., None]), 0.0, 1.0)


def saturate(img: jnp.ndarray, factor: jnp.ndarray) -> jnp.ndarray:
    gray = imops.rgb_to_gray(img)[..., None]
    return jnp.clip(gray + factor * (img - gray), 0.0, 1.0)


# ---------------------------------------------------------------------------
# composed pipeline
# ---------------------------------------------------------------------------


def _gate(key, p: float) -> jnp.ndarray:
    return jax.random.uniform(key) < p


def augment_image_and_boxes(
    key: jax.Array,
    image: jnp.ndarray,
    boxes: Optional[jnp.ndarray],
    cfg: AugmentConfig,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Full augmentation chain on one float [0,1] HWC image.

    ``boxes`` [M,4] xyxy (may be None): geometric ops remap coordinates
    (augmentation.py:275-360); photometric ops leave them unchanged.
    """
    h, w = image.shape[:2]
    keys = jax.random.split(key, 20)
    img = image
    b = boxes

    # --- geometric (box-aware) -------------------------------------------------
    do_h = _gate(keys[0], cfg.p_hflip)
    img = jnp.where(do_h, img[:, ::-1], img)
    if b is not None:
        fl = jnp.stack([w - b[:, 2], b[:, 1], w - b[:, 0], b[:, 3]], axis=-1)
        b = jnp.where(do_h, fl, b)

    do_v = _gate(keys[1], cfg.p_vflip)
    img = jnp.where(do_v, img[::-1], img)
    if b is not None:
        fl = jnp.stack([b[:, 0], h - b[:, 3], b[:, 2], h - b[:, 1]], axis=-1)
        b = jnp.where(do_v, fl, b)

    if h == w:  # rot90 requires square frames (static shapes)
        do_r = _gate(keys[2], cfg.p_rot90)
        img = jnp.where(do_r, jnp.rot90(img), img)
        if b is not None:
            rot = jnp.stack([b[:, 1], w - b[:, 2], b[:, 3], w - b[:, 0]], axis=-1)
            b = jnp.where(do_r, rot, b)

    do_a = _gate(keys[3], cfg.p_affine)
    ang = jax.random.uniform(
        keys[4], (), minval=-cfg.max_rotate_deg, maxval=cfg.max_rotate_deg
    ) * jnp.pi / 180.0
    scale = 1.0 + jax.random.uniform(keys[5], (), minval=-cfg.max_scale, maxval=cfg.max_scale)
    tx = jax.random.uniform(keys[6], (), minval=-cfg.max_translate, maxval=cfg.max_translate) * w
    ty = jax.random.uniform(keys[7], (), minval=-cfg.max_translate, maxval=cfg.max_translate) * h
    ang = jnp.where(do_a, ang, 0.0)
    scale = jnp.where(do_a, scale, 1.0)
    tx = jnp.where(do_a, tx, 0.0)
    ty = jnp.where(do_a, ty, 0.0)
    img = affine_grid_sample(img, rotation_matrix(ang, scale, tx, ty))
    if b is not None:
        # forward-transform the 4 corners, take the enclosing box
        cx0, cy0 = (w - 1) / 2, (h - 1) / 2
        corners = jnp.stack(
            [
                jnp.stack([b[:, 0], b[:, 1]], -1), jnp.stack([b[:, 2], b[:, 1]], -1),
                jnp.stack([b[:, 0], b[:, 3]], -1), jnp.stack([b[:, 2], b[:, 3]], -1),
            ],
            axis=1,
        )  # [M,4,2]
        rel = corners - jnp.asarray([cx0, cy0])
        ca, sa = jnp.cos(ang) * scale, jnp.sin(ang) * scale
        xr = ca * rel[..., 0] - sa * rel[..., 1] + cx0 + tx
        yr = sa * rel[..., 0] + ca * rel[..., 1] + cy0 + ty
        nb = jnp.stack(
            [xr.min(1), yr.min(1), xr.max(1), yr.max(1)], axis=-1
        )
        nb = jnp.stack(
            [
                jnp.clip(nb[:, 0], 0, w), jnp.clip(nb[:, 1], 0, h),
                jnp.clip(nb[:, 2], 0, w), jnp.clip(nb[:, 3], 0, h),
            ],
            axis=-1,
        )
        b = nb

    do_e = _gate(keys[8], cfg.p_elastic)
    img = jnp.where(do_e, apply_elastic(keys[9], img, cfg.elastic_alpha), img)

    # --- photometric ------------------------------------------------------------
    bright = jax.random.uniform(
        keys[10], (), minval=-cfg.brightness_range, maxval=cfg.brightness_range
    )
    img = jnp.clip(img + jnp.where(_gate(keys[10], cfg.p_brightness), bright, 0.0), 0, 1)
    contrast = 1.0 + jax.random.uniform(
        keys[11], (), minval=-cfg.contrast_range, maxval=cfg.contrast_range
    )
    c_on = jnp.where(_gate(keys[11], cfg.p_contrast), contrast, 1.0)
    img = jnp.clip((img - 0.5) * c_on + 0.5, 0, 1)
    gamma = jnp.exp(jax.random.uniform(keys[12], (), minval=-0.3, maxval=0.3))
    img = jnp.where(_gate(keys[12], cfg.p_gamma), jnp.power(jnp.clip(img, 1e-6, 1), gamma), img)
    sat = 1.0 + jax.random.uniform(keys[13], (), minval=-0.3, maxval=0.3)
    img = jnp.where(_gate(keys[13], cfg.p_saturation), saturate(img, sat), img)

    # --- noise / blur -------------------------------------------------------------
    noise = jax.random.normal(keys[14], img.shape) * cfg.noise_sigma
    img = jnp.clip(img + jnp.where(_gate(keys[14], cfg.p_noise), noise, 0.0), 0, 1)
    img = jnp.where(_gate(keys[15], cfg.p_blur), imops.gaussian_blur(img, sigma=1.2), img)
    img = jnp.where(
        _gate(keys[16], cfg.p_motion_blur), apply_motion_blur(keys[16], img), img
    )

    # --- weather / occlusion / custom ----------------------------------------------
    img = jnp.where(_gate(keys[17], cfg.p_shadow), apply_shadow(keys[17], img), img)
    img = jnp.where(_gate(keys[18], cfg.p_fog), apply_fog(keys[18], img), img)
    img = jnp.where(
        _gate(keys[19], cfg.p_cutout), apply_cutout(keys[19], img, cfg.cutout_frac), img
    )
    if cfg.p_edge_enhance > 0:
        img = jnp.where(_gate(keys[8], cfg.p_edge_enhance), apply_edge_enhance(img), img)
    if cfg.p_spot > 0:
        img = jnp.where(_gate(keys[9], cfg.p_spot), apply_spot_light(keys[9], img), img)
    if cfg.p_texture > 0:
        img = jnp.where(_gate(keys[5], cfg.p_texture), apply_texture_noise(keys[5], img), img)

    return img, b


# per-defect-class pipelines (augmentation.py:480-546)
DEFECT_AUGMENT_CONFIGS: Dict[str, AugmentConfig] = {
    "crack": AugmentConfig(p_elastic=0.3, p_contrast=0.7, max_rotate_deg=25.0,
                           p_edge_enhance=0.3),
    "scratch": AugmentConfig(p_affine=0.7, max_rotate_deg=30.0, p_motion_blur=0.25,
                             p_edge_enhance=0.2),
    "dent": AugmentConfig(p_shadow=0.4, p_spot=0.3, p_contrast=0.6),
    "discoloration": AugmentConfig(p_saturation=0.7, p_gamma=0.4, p_brightness=0.7),
    "contamination": AugmentConfig(p_texture=0.4, p_noise=0.5, p_fog=0.2),
}


class QualityControlAugmenter:
    """API parity with the reference ``QualityControlAugmenter``
    (``data_processing/augmentation.py:21-693``)."""

    def __init__(self, config: Optional[AugmentConfig] = None):
        self.config = config or AugmentConfig()
        self._jit_img = jax.jit(
            lambda key, img: augment_image_and_boxes(key, img, None, self.config)[0]
        )
        self._jit_batch = jax.jit(
            lambda keys, imgs: jax.vmap(
                lambda k, im: augment_image_and_boxes(k, im, None, self.config)[0]
            )(keys, imgs)
        )

    def augment_image(self, image: np.ndarray, seed: int = 0) -> np.ndarray:
        """Single-image augment (augmentation.py:198-214)."""
        img = imops.to_float(jnp.asarray(image))
        out = self._jit_img(jax.random.PRNGKey(seed), img)
        return np.asarray(jnp.clip(out * 255, 0, 255)).astype(np.uint8)

    def augment_with_annotations(
        self, image: np.ndarray, bboxes: Sequence[Sequence[float]], seed: int = 0
    ) -> Tuple[np.ndarray, np.ndarray]:
        """bbox-aware augment (augmentation.py:275-360); boxes are
        xyxy pixels."""
        img = imops.to_float(jnp.asarray(image))
        b = jnp.asarray(bboxes, jnp.float32).reshape(-1, 4)
        out, nb = augment_image_and_boxes(jax.random.PRNGKey(seed), img, b, self.config)
        return (
            np.asarray(jnp.clip(out * 255, 0, 255)).astype(np.uint8),
            np.asarray(nb),
        )

    def augment_batch(
        self, images: np.ndarray, n_augmentations: int = 1, seed: int = 0
    ) -> np.ndarray:
        """Batch xN expansion (augmentation.py:198-244): returns
        [N*B, H, W, C]."""
        imgs = imops.to_float(jnp.asarray(images))
        outs = []
        for i in range(n_augmentations):
            keys = jax.random.split(jax.random.PRNGKey(seed + i), imgs.shape[0])
            outs.append(self._jit_batch(keys, imgs))
        out = jnp.concatenate(outs, axis=0)
        return np.asarray(jnp.clip(out * 255, 0, 255)).astype(np.uint8)

    @staticmethod
    def create_defect_specific_augmentations(defect_class: str) -> "QualityControlAugmenter":
        """Per-class pipeline factory (augmentation.py:480-546)."""
        cfg = DEFECT_AUGMENT_CONFIGS.get(defect_class, AugmentConfig())
        return QualityControlAugmenter(cfg)

    # -- analytics (augmentation.py:548-635) --------------------------------------

    @staticmethod
    def _histogram(img: np.ndarray, bins: int = 32) -> np.ndarray:
        h, _ = np.histogram(img.reshape(-1), bins=bins, range=(0, 255))
        h = h.astype(np.float64)
        return h / max(h.sum(), 1)

    @classmethod
    def bhattacharyya_distance(cls, a: np.ndarray, b: np.ndarray) -> float:
        bc = float(np.sum(np.sqrt(cls._histogram(a) * cls._histogram(b))))
        return float(-np.log(max(bc, 1e-12)))

    def analyze_augmentation_effectiveness(
        self, original: np.ndarray, n_samples: int = 8, seed: int = 0
    ) -> Dict:
        """Diversity via pairwise Bhattacharyya histogram distance +
        robustness estimate capped at 0.23 (augmentation.py:580-583 caps
        its estimator at 23%)."""
        variants = [self.augment_image(original, seed=seed + i) for i in range(n_samples)]
        dists = []
        for i in range(n_samples):
            for j in range(i + 1, n_samples):
                dists.append(self.bhattacharyya_distance(variants[i], variants[j]))
        orig_dists = [self.bhattacharyya_distance(original, v) for v in variants]
        diversity = float(np.mean(dists)) if dists else 0.0
        robustness = min(0.23, 0.1 + diversity * 0.5)
        return {
            "n_samples": n_samples,
            "pairwise_diversity": diversity,
            "mean_distance_from_original": float(np.mean(orig_dists)),
            "estimated_robustness_improvement": robustness,
        }

    def visualize_augmentations(
        self, image: np.ndarray, n: int = 4, seed: int = 0
    ) -> np.ndarray:
        """Grid visualization (augmentation.py:637-682) as one tiled array."""
        variants = [image] + [self.augment_image(image, seed=seed + i) for i in range(n)]
        return np.concatenate(variants, axis=1)
