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
    max_shear_deg: float = 0.0   # Ultralytics `shear` hyperparam
    p_brightness: float = 0.5
    brightness_range: float = 0.2
    p_contrast: float = 0.5
    contrast_range: float = 0.2
    p_gamma: float = 0.2
    p_saturation: float = 0.3
    saturation_range: float = 0.3
    p_hue: float = 0.0           # torchvision ColorJitter(hue=...)
    hue_range: float = 0.1       # fraction of the hue wheel
    p_grayscale: float = 0.0     # torchvision RandomGrayscale
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


def _axis_interp_matrix(scale: jnp.ndarray, shift: jnp.ndarray,
                        size: int) -> jnp.ndarray:
    """[out,in] bilinear sampling matrix for a 1-D scale+shift about the
    centre: src = (out - c - shift)/scale + c. Edge-replicating (src
    clamped), matching _bilinear_gather. Lets the axis-aligned affine run
    as two matmuls on the MXU instead of a data-dependent 2-D gather
    (CLAUDE.md rule 4 — the same rewrite ops/mosaic applies)."""
    i = jax.lax.broadcasted_iota(jnp.float32, (size, size), 0)  # output
    j = jax.lax.broadcasted_iota(jnp.float32, (size, size), 1)  # source
    c = (size - 1) / 2.0
    src = jnp.clip((i - c - shift) / jnp.maximum(scale, 1e-3) + c,
                   0.0, size - 1.0)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src - j))


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


def hue_rotate(img: jnp.ndarray, fraction: jnp.ndarray) -> jnp.ndarray:
    """Hue shift by ``fraction`` of the hue wheel (torchvision ColorJitter
    hue semantics), as a rotation of RGB around the achromatic axis —
    no HSV round trip (per-pixel branching/LUTs lower badly on TPU).
    Rodrigues' formula with axis k=(1,1,1)/sqrt(3) reduces to channel
    rolls, so the whole op is three elementwise FMAs."""
    a = fraction * 2.0 * jnp.pi
    c, s = jnp.cos(a), jnp.sin(a)
    cross = (jnp.roll(img, 1, axis=-1) - jnp.roll(img, -1, axis=-1)) / jnp.sqrt(3.0)
    mean = jnp.mean(img, axis=-1, keepdims=True)
    return jnp.clip(img * c + cross * s + mean * (1.0 - c), 0.0, 1.0)


def apply_hsv(key, img: jnp.ndarray, h_gain: float, s_gain: float,
              v_gain: float) -> jnp.ndarray:
    """Ultralytics-style HSV augmentation (augment_hsv: random hue shift of
    +/-h_gain of the wheel, saturation factor in [1-s, 1+s], value factor
    in [1-v, 1+v]) — the hsv_h/hsv_s/hsv_v hyperparams the reference
    passes to model.train (/root/reference/train/train_yolo.py:158-160).
    Observable-parity reformulation: hue moves via achromatic-axis
    rotation instead of a uint8 HSV LUT (see hue_rotate)."""
    kh, ks, kv = jax.random.split(key, 3)
    if h_gain > 0:
        img = hue_rotate(img, jax.random.uniform(
            kh, (), minval=-h_gain, maxval=h_gain))
    if s_gain > 0:
        img = saturate(img, 1.0 + jax.random.uniform(
            ks, (), minval=-s_gain, maxval=s_gain))
    if v_gain > 0:
        img = jnp.clip(img * (1.0 + jax.random.uniform(
            kv, (), minval=-v_gain, maxval=v_gain)), 0.0, 1.0)
    return img


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
    keys = jax.random.split(key, 26)
    img = image
    b = boxes

    # every stage is statically gated on its probability: a p=0 op costs
    # nothing at trace time (matters inside the scanned train-step graphs
    # where the aug chain rides along every step)

    # --- geometric (box-aware) -------------------------------------------------
    if cfg.p_hflip > 0:
        do_h = _gate(keys[0], cfg.p_hflip)
        img = jnp.where(do_h, img[:, ::-1], img)
        if b is not None:
            fl = jnp.stack([w - b[:, 2], b[:, 1], w - b[:, 0], b[:, 3]], axis=-1)
            b = jnp.where(do_h, fl, b)

    if cfg.p_vflip > 0:
        do_v = _gate(keys[1], cfg.p_vflip)
        img = jnp.where(do_v, img[::-1], img)
        if b is not None:
            fl = jnp.stack([b[:, 0], h - b[:, 3], b[:, 2], h - b[:, 1]], axis=-1)
            b = jnp.where(do_v, fl, b)

    if h == w and cfg.p_rot90 > 0:  # rot90 requires square frames (static shapes)
        do_r = _gate(keys[2], cfg.p_rot90)
        img = jnp.where(do_r, jnp.rot90(img), img)
        if b is not None:
            rot = jnp.stack([b[:, 1], w - b[:, 2], b[:, 3], w - b[:, 0]], axis=-1)
            b = jnp.where(do_r, rot, b)

    if cfg.p_affine > 0:
        do_a = _gate(keys[3], cfg.p_affine)
        ang = jax.random.uniform(
            keys[4], (), minval=-cfg.max_rotate_deg, maxval=cfg.max_rotate_deg
        ) * jnp.pi / 180.0
        scale = 1.0 + jax.random.uniform(
            keys[5], (), minval=-cfg.max_scale, maxval=cfg.max_scale)
        tx = jax.random.uniform(
            keys[6], (), minval=-cfg.max_translate, maxval=cfg.max_translate) * w
        ty = jax.random.uniform(
            keys[7], (), minval=-cfg.max_translate, maxval=cfg.max_translate) * h
        shx = jnp.tan(jax.random.uniform(
            keys[20], (), minval=-cfg.max_shear_deg, maxval=cfg.max_shear_deg
        ) * jnp.pi / 180.0)
        shy = jnp.tan(jax.random.uniform(
            keys[21], (), minval=-cfg.max_shear_deg, maxval=cfg.max_shear_deg
        ) * jnp.pi / 180.0)
        ang = jnp.where(do_a, ang, 0.0)
        scale = jnp.where(do_a, scale, 1.0)
        tx = jnp.where(do_a, tx, 0.0)
        ty = jnp.where(do_a, ty, 0.0)
        shx = jnp.where(do_a, shx, 0.0)
        shy = jnp.where(do_a, shy, 0.0)
        # forward linear map (about the centre): shear o rotate-scale
        ca, sa = jnp.cos(ang) * scale, jnp.sin(ang) * scale
        f00 = ca + shx * sa
        f01 = -sa + shx * ca
        f10 = shy * ca + sa
        f11 = -shy * sa + ca
        if cfg.max_rotate_deg == 0 and cfg.max_shear_deg == 0:
            # axis-aligned scale+translate is separable: two bilinear
            # interpolation matmuls (MXU) instead of a data-dependent 2-D
            # gather — this is the path the reference's shipped YOLO config
            # takes (degrees=0, shear=0, yolo_config.yaml:67-70)
            wy = _axis_interp_matrix(scale, ty, h)
            wx = _axis_interp_matrix(scale, tx, w)
            tmp = jnp.einsum("ij,jkc->ikc", wy.astype(jnp.bfloat16),
                             img.astype(jnp.bfloat16),
                             preferred_element_type=jnp.float32)
            resampled = jnp.einsum("ikc,lk->ilc", tmp.astype(jnp.bfloat16),
                                   wx.astype(jnp.bfloat16),
                                   preferred_element_type=jnp.float32)
            # keep the un-gated image bit-exact: the identity transform
            # through the bf16 matmul would still round every pixel
            img = jnp.where(do_a, jnp.clip(resampled, 0.0, 1.0), img)
        else:
            # exact analytic inverse for the sampler (output -> input
            # coords); translation inverts through the linear map, so warp
            # and box corners follow the SAME forward transform
            det = f00 * f11 - f01 * f10  # scale^2 (1 - shx*shy): positive
            det = jnp.where(jnp.abs(det) < 1e-6, 1e-6, det)
            i00, i01 = f11 / det, -f01 / det
            i10, i11 = -f10 / det, f00 / det
            inv = jnp.stack([
                jnp.stack([i00, i01, -(i00 * tx + i01 * ty)]),
                jnp.stack([i10, i11, -(i10 * tx + i11 * ty)]),
            ])
            img = affine_grid_sample(img, inv)
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
            relx = corners[..., 0] - cx0
            rely = corners[..., 1] - cy0
            xr = f00 * relx + f01 * rely + cx0 + tx
            yr = f10 * relx + f11 * rely + cy0 + ty
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

    if cfg.p_elastic > 0:
        do_e = _gate(keys[8], cfg.p_elastic)
        img = jnp.where(do_e, apply_elastic(keys[9], img, cfg.elastic_alpha), img)

    # --- photometric ------------------------------------------------------------
    if cfg.p_brightness > 0:
        bright = jax.random.uniform(
            keys[10], (), minval=-cfg.brightness_range, maxval=cfg.brightness_range
        )
        img = jnp.clip(
            img + jnp.where(_gate(keys[10], cfg.p_brightness), bright, 0.0), 0, 1)
    if cfg.p_contrast > 0:
        contrast = 1.0 + jax.random.uniform(
            keys[11], (), minval=-cfg.contrast_range, maxval=cfg.contrast_range
        )
        c_on = jnp.where(_gate(keys[11], cfg.p_contrast), contrast, 1.0)
        img = jnp.clip((img - 0.5) * c_on + 0.5, 0, 1)
    if cfg.p_gamma > 0:
        gamma = jnp.exp(jax.random.uniform(keys[12], (), minval=-0.3, maxval=0.3))
        img = jnp.where(
            _gate(keys[12], cfg.p_gamma), jnp.power(jnp.clip(img, 1e-6, 1), gamma), img)
    if cfg.p_saturation > 0:
        sat = 1.0 + jax.random.uniform(
            keys[13], (), minval=-cfg.saturation_range, maxval=cfg.saturation_range)
        img = jnp.where(_gate(keys[13], cfg.p_saturation), saturate(img, sat), img)
    if cfg.p_hue > 0:
        frac = jax.random.uniform(
            keys[22], (), minval=-cfg.hue_range, maxval=cfg.hue_range)
        img = jnp.where(_gate(keys[23], cfg.p_hue), hue_rotate(img, frac), img)
    if cfg.p_grayscale > 0:
        img = jnp.where(
            _gate(keys[24], cfg.p_grayscale),
            jnp.broadcast_to(imops.rgb_to_gray(img)[..., None], img.shape), img)

    # --- noise / blur -------------------------------------------------------------
    if cfg.p_noise > 0:
        noise = jax.random.normal(keys[14], img.shape) * cfg.noise_sigma
        img = jnp.clip(img + jnp.where(_gate(keys[14], cfg.p_noise), noise, 0.0), 0, 1)
    if cfg.p_blur > 0:
        img = jnp.where(_gate(keys[15], cfg.p_blur), imops.gaussian_blur(img, sigma=1.2), img)
    if cfg.p_motion_blur > 0:
        img = jnp.where(
            _gate(keys[16], cfg.p_motion_blur), apply_motion_blur(keys[16], img), img
        )

    # --- weather / occlusion / custom ----------------------------------------------
    if cfg.p_shadow > 0:
        img = jnp.where(_gate(keys[17], cfg.p_shadow), apply_shadow(keys[17], img), img)
    if cfg.p_fog > 0:
        img = jnp.where(_gate(keys[18], cfg.p_fog), apply_fog(keys[18], img), img)
    if cfg.p_cutout > 0:
        img = jnp.where(
            _gate(keys[19], cfg.p_cutout), apply_cutout(keys[19], img, cfg.cutout_frac), img
        )
    if cfg.p_edge_enhance > 0:
        img = jnp.where(_gate(keys[8], cfg.p_edge_enhance), apply_edge_enhance(img), img)
    if cfg.p_spot > 0:
        img = jnp.where(_gate(keys[9], cfg.p_spot), apply_spot_light(keys[9], img), img)
    if cfg.p_texture > 0:
        img = jnp.where(_gate(keys[25], cfg.p_texture), apply_texture_noise(keys[25], img), img)

    return img, b


# ---------------------------------------------------------------------------
# train-time augmentation builders (the reference's consumed knobs)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class YoloAugHyp:
    """The ~15 Ultralytics augmentation hyperparams the reference passes to
    ``model.train`` (/root/reference/train/train_yolo.py:157-171; values
    from /root/reference/config/yolo_config.yaml:61-83). mosaic/mixup are
    handled by ops/mosaic.py / the host loader; copy_paste is 0.0 in the
    reference and unimplemented; perspective accepted but only 0.0 is
    supported (the reference ships 0.0)."""

    hsv_h: float = 0.015
    hsv_s: float = 0.7
    hsv_v: float = 0.4
    degrees: float = 0.0
    translate: float = 0.1
    scale: float = 0.5
    shear: float = 0.0
    perspective: float = 0.0
    flipud: float = 0.0
    fliplr: float = 0.5

    def __post_init__(self):
        if self.perspective:
            raise ValueError(
                "perspective augmentation is not implemented (the reference "
                "configures 0.0 — yolo_config.yaml:72)")

    @classmethod
    def from_dict(cls, raw) -> "YoloAugHyp":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: float(v) for k, v in (raw or {}).items()
                      if k in names})

    def active(self) -> bool:
        return any((self.hsv_h, self.hsv_s, self.hsv_v, self.degrees,
                    self.translate, self.scale, self.shear, self.flipud,
                    self.fliplr))


def yolo_train_augment(
    key: jax.Array,
    image: jnp.ndarray,    # [H,W,3] float [0,1]
    boxes: jnp.ndarray,    # [M,4] xyxy pixels
    valid: jnp.ndarray,    # [M] bool
    hyp: YoloAugHyp,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One image's train-time augmentation: Ultralytics random_perspective
    analog (rotate/scale/translate/shear + flips, box-aware) + HSV.
    Applied AFTER mosaic, like Ultralytics. Boxes degenerated below 2px by
    the affine lose validity (Ultralytics box_candidates wh_thr=2)."""
    kg, kh = jax.random.split(key)
    geo = AugmentConfig(
        p_hflip=hyp.fliplr, p_vflip=hyp.flipud, p_rot90=0.0,
        p_affine=1.0 if (hyp.degrees or hyp.translate or hyp.scale
                         or hyp.shear) else 0.0,
        max_rotate_deg=hyp.degrees, max_scale=hyp.scale,
        max_translate=hyp.translate, max_shear_deg=hyp.shear,
        p_brightness=0.0, p_contrast=0.0, p_gamma=0.0, p_saturation=0.0,
        p_noise=0.0, p_blur=0.0, p_motion_blur=0.0, p_shadow=0.0,
        p_fog=0.0, p_cutout=0.0, p_elastic=0.0,
    )
    img, b = augment_image_and_boxes(kg, image, boxes, geo)
    img = apply_hsv(kh, img, hyp.hsv_h, hyp.hsv_s, hyp.hsv_v)
    bw = b[:, 2] - b[:, 0]
    bh = b[:, 3] - b[:, 1]
    return img, b, valid & (bw > 2.0) & (bh > 2.0)


def yolo_train_augment_batch(key, images, boxes, classes, valid,
                             hyp: YoloAugHyp):
    """vmapped batch version; classes pass through unchanged."""
    keys = jax.random.split(key, images.shape[0])
    imgs, b, v = jax.vmap(
        lambda k, im, bx, vl: yolo_train_augment(k, im, bx, vl, hyp)
    )(keys, images, boxes, valid)
    return imgs, b, classes, v


def classifier_augment_config(train_aug: Optional[Dict]) -> Optional[AugmentConfig]:
    """Map the reference's torchvision training-transform knobs
    (/root/reference/train/train_resnet.py:132-196 consumes exactly:
    random_resize_crop, random_horizontal_flip, random_vertical_flip,
    random_rotation, color_jitter, random_erasing; the yaml additionally
    declares random_grayscale + gaussian_blur, resnet_config.yaml:100-140)
    onto an on-device AugmentConfig. None/empty -> None (no augmentation,
    today's default).

    Reformulations: RandomResizedCrop(scale=[lo,1]) becomes a centre zoom
    of up to 1/sqrt(lo) (the translate jitter covers the crop offset);
    RandomErasing's area-scale range maps to the cutout side fraction at
    the mean area."""
    if not train_aug:
        return None
    a = dict(train_aug)
    kw: Dict[str, float] = dict(
        p_hflip=0.0, p_vflip=0.0, p_rot90=0.0, p_affine=0.0,
        p_brightness=0.0, p_contrast=0.0, p_gamma=0.0, p_saturation=0.0,
        p_noise=0.0, p_blur=0.0, p_motion_blur=0.0, p_shadow=0.0,
        p_fog=0.0, p_cutout=0.0, p_elastic=0.0,
    )
    kw["p_hflip"] = float(
        (a.get("random_horizontal_flip") or {}).get("probability", 0.0))
    kw["p_vflip"] = float(
        (a.get("random_vertical_flip") or {}).get("probability", 0.0))

    degrees = float((a.get("random_rotation") or {}).get("degrees", 0.0))
    rrc = a.get("random_resize_crop") or {}
    zoom = 0.0
    if rrc:
        lo = float((rrc.get("scale") or [0.8, 1.0])[0])
        zoom = max(1.0 / max(lo, 1e-3) ** 0.5 - 1.0, 0.0)
    if degrees or zoom:
        kw["p_affine"] = 1.0
        kw["max_rotate_deg"] = degrees
        kw["max_scale"] = zoom
        kw["max_translate"] = 0.05 if rrc else 0.0

    cj = a.get("color_jitter") or {}
    if cj.get("brightness"):
        kw["p_brightness"] = 1.0
        kw["brightness_range"] = float(cj["brightness"])
    if cj.get("contrast"):
        kw["p_contrast"] = 1.0
        kw["contrast_range"] = float(cj["contrast"])
    if cj.get("saturation"):
        kw["p_saturation"] = 1.0
        kw["saturation_range"] = float(cj["saturation"])
    if cj.get("hue"):
        kw["p_hue"] = 1.0
        kw["hue_range"] = float(cj["hue"])

    kw["p_grayscale"] = float(
        (a.get("random_grayscale") or {}).get("probability", 0.0))

    re = a.get("random_erasing") or {}
    if re.get("enabled"):
        kw["p_cutout"] = float(re.get("probability", 0.25))
        scale = re.get("scale") or [0.02, 0.33]
        mean_area = (float(scale[0]) + float(scale[1])) / 2.0
        kw["cutout_frac"] = max(mean_area ** 0.5, 0.05)

    gb = a.get("gaussian_blur") or {}
    if gb.get("enabled"):
        kw["p_blur"] = float(gb.get("probability", 0.1))

    return AugmentConfig(**kw)


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
