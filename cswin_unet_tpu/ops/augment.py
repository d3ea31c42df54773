"""Device-side training augmentation — the zero-host-Python hot loop.

The reference augments on the host with scipy (rot90/flip p=0.5, else ±20°
rotation p=0.25, then zoom; ``datasets/dataset_synapse.py:12-47``), which
serializes CPU work per sample. This module reproduces the same *stochastic
semantics* as jittable, vmapped device ops so augmentation fuses into the
training step (BASELINE.json north star: "slice extraction, random
rotate/flip ... feeding HBM with zero host-side Python in the hot loop"):

  * per-sample k∈{0..3} rot90 + axis∈{0,1} flip via lax.switch/select;
  * per-sample integer-degree rotation in [-20, 20) with nearest-neighbor
    resampling and zero fill (scipy ``rotate(order=0, reshape=False,
    mode='constant')`` semantics);
  * branch probabilities exactly as the reference draws them (second draw
    only happens when the first fails).

The host path (``data/transforms.py``) remains the scipy-parity reference;
this is the fast path (``--device_augment``). Inputs are pre-resized
square slices — resizing stays on host where volumes have heterogeneous
native shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _rot90_k(img, k):
    return jax.lax.switch(
        k,
        [
            lambda x: x,
            lambda x: jnp.rot90(x, 1),
            lambda x: jnp.rot90(x, 2),
            lambda x: jnp.rot90(x, 3),
        ],
        img,
    )


def _rot_flip(img, lab, k, axis):
    img = _rot90_k(img, k)
    lab = _rot90_k(lab, k)
    img = jnp.where(axis == 0, jnp.flip(img, 0), jnp.flip(img, 1))
    lab = jnp.where(axis == 0, jnp.flip(lab, 0), jnp.flip(lab, 1))
    return img, lab


def _rotate_nearest(img, lab, angle_deg):
    """Rotate about the center by angle (degrees), nearest sampling, zero
    fill — scipy.ndimage.rotate(order=0, reshape=False) semantics."""
    H, W = img.shape
    theta = -angle_deg * jnp.pi / 180.0  # inverse map: output -> input
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    yy = jax.lax.broadcasted_iota(jnp.float32, (H, W), 0) - cy
    xx = jax.lax.broadcasted_iota(jnp.float32, (H, W), 1) - cx
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    src_y = cos * yy - sin * xx + cy
    src_x = sin * yy + cos * xx + cx
    iy = jnp.round(src_y).astype(jnp.int32)
    ix = jnp.round(src_x).astype(jnp.int32)
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    iy = jnp.clip(iy, 0, H - 1)
    ix = jnp.clip(ix, 0, W - 1)
    img_r = jnp.where(valid, img[iy, ix], 0.0)
    lab_r = jnp.where(valid, lab[iy, ix], 0)
    return img_r, lab_r


def _augment_one(img, lab, key):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    u1 = jax.random.uniform(k1)
    u2 = jax.random.uniform(k2)

    k = jax.random.randint(k3, (), 0, 4)
    axis = jax.random.randint(k4, (), 0, 2)
    angle = jax.random.randint(k5, (), -20, 20).astype(jnp.float32)

    def branch_rot_flip(_):
        return _rot_flip(img, lab, k, axis)

    def branch_maybe_rotate(_):
        return jax.lax.cond(
            u2 > 0.5,
            lambda _: _rotate_nearest(img, lab, angle),
            lambda _: (img, lab),
            None,
        )

    return jax.lax.cond(u1 > 0.5, branch_rot_flip, branch_maybe_rotate, None)


@functools.partial(jax.jit, donate_argnums=())
def augment_batch(images: jnp.ndarray, labels: jnp.ndarray, key) -> tuple:
    """Vmapped per-sample augmentation.

    images: (B, H, W) or (B, H, W, 1) float32; labels: (B, H, W) int.
    Returns the same shapes.
    """
    squeeze = images.ndim == 4
    imgs = images[..., 0] if squeeze else images
    keys = jax.random.split(key, imgs.shape[0])
    out_i, out_l = jax.vmap(_augment_one)(imgs, labels, keys)
    if squeeze:
        out_i = out_i[..., None]
    return out_i, out_l
