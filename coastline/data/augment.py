"""Jittable, batched data augmentation (device-side).

The reference augments on host via torchvision — RandomHorizontalFlip(0.5),
RandomRotation(10), ColorJitter(0.1,0.1,0.1)
(`/root/reference/train_water_segmentation.py:313-321`) — and applies the
GEOMETRIC transforms to the image only, leaving the mask unrotated/unflipped
(`:56-77`), which silently misaligns labels. Here augmentation runs inside
the compiled train step, vectorized over the batch, and geometric transforms
move image and mask together by default; `image_only_geometric=True`
reproduces the reference's behavior for strict protocol parity.

Images are (N,H,W,3) floats in [0,1] (pre-normalization); masks (N,H,W).
"""

import jax
import jax.numpy as jnp


def _rotate_bilinear(img, angle_rad, order_nearest=False):
    """Rotate one (H,W,C) image about its center, zero fill (torchvision
    RandomRotation semantics: expand=False, fill=0)."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[0:h, 0:w]
    yy = yy - cy
    xx = xx - cx
    cos, sin = jnp.cos(angle_rad), jnp.sin(angle_rad)
    # inverse map: output pixel -> input coordinates
    src_x = cos * xx + sin * yy + cx
    src_y = -sin * xx + cos * yy + cy
    if order_nearest:
        sx = jnp.clip(jnp.round(src_x).astype(jnp.int32), 0, w - 1)
        sy = jnp.clip(jnp.round(src_y).astype(jnp.int32), 0, h - 1)
        out = img[sy, sx]
        inb = (src_x >= -0.5) & (src_x <= w - 0.5) & (src_y >= -0.5) & (src_y <= h - 0.5)
        return jnp.where(inb[..., None], out, 0.0)
    x0 = jnp.floor(src_x)
    y0 = jnp.floor(src_y)
    fx = (src_x - x0)[..., None]
    fy = (src_y - y0)[..., None]

    def tap(yi, xi):
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        return v * inb[..., None]

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    out = (
        tap(y0i, x0i) * (1 - fx) * (1 - fy)
        + tap(y0i, x0i + 1) * fx * (1 - fy)
        + tap(y0i + 1, x0i) * (1 - fx) * fy
        + tap(y0i + 1, x0i + 1) * fx * fy
    )
    return out


def color_jitter(rng, img, brightness=0.1, contrast=0.1, saturation=0.1):
    """Per-image brightness/contrast/saturation jitter (factor U(1-r, 1+r)).
    torchvision samples the op order randomly; fixed b->c->s order here —
    the factors commute to first order at r=0.1."""
    kb, kc, ks = jax.random.split(rng, 3)
    b = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    s = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    img = jnp.clip(img * b, 0.0, 1.0)
    # torchvision contrast: blend with mean of grayscale
    gray = (0.299 * img[..., 0] + 0.587 * img[..., 1] + 0.114 * img[..., 2])
    img = jnp.clip((img - gray.mean()) * c + gray.mean(), 0.0, 1.0)
    img = jnp.clip((img - gray[..., None]) * s + gray[..., None], 0.0, 1.0)
    return img


def make_augment_fn(
    max_rotate_deg: float = 10.0,
    flip_prob: float = 0.5,
    jitter: float = 0.1,
    image_only_geometric: bool = False,
):
    """Batched augment fn for the train step: (rng, images, masks) -> same."""

    def augment_one(rng, img, mask):
        kf, kr, kj = jax.random.split(rng, 3)
        flip = jax.random.bernoulli(kf, flip_prob)
        img = jnp.where(flip, img[:, ::-1, :], img)
        angle = jax.random.uniform(
            kr, (), minval=-max_rotate_deg, maxval=max_rotate_deg
        ) * (jnp.pi / 180.0)
        img = _rotate_bilinear(img, angle)
        if jitter:
            img = color_jitter(kj, img, jitter, jitter, jitter)
        if not image_only_geometric:
            mask = jnp.where(flip, mask[:, ::-1], mask)
            mask = _rotate_bilinear(
                mask[..., None].astype(jnp.float32), angle, order_nearest=True
            )[..., 0].astype(mask.dtype)
        return img, mask

    def augment(rng, images, masks):
        rngs = jax.random.split(rng, images.shape[0])
        return jax.vmap(augment_one)(rngs, images, masks)

    return augment
