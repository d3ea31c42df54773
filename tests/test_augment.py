"""Device-side augmentation: semantics vs scipy, branch statistics."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy import ndimage

from cswin_unet_tpu.ops.augment import _rotate_nearest, augment_batch


def test_rotate_nearest_matches_scipy(rng):
    img = rng.standard_normal((32, 32)).astype(np.float32)
    lab = rng.integers(0, 4, (32, 32)).astype(np.int32)
    for angle in (-19, -7, 5, 13):
        want_i = ndimage.rotate(img, angle, order=0, reshape=False)
        want_l = ndimage.rotate(lab, angle, order=0, reshape=False)
        got_i, got_l = _rotate_nearest(jnp.asarray(img), jnp.asarray(lab),
                                       jnp.float32(angle))
        # nearest-neighbor ties at cell boundaries can differ by one pixel;
        # demand near-total agreement instead of bit equality
        agree_i = np.mean(np.asarray(got_i) == want_i)
        agree_l = np.mean(np.asarray(got_l) == want_l)
        assert agree_i > 0.95, (angle, agree_i)
        assert agree_l > 0.95, (angle, agree_l)


def test_augment_batch_shapes_and_labels(rng):
    imgs = rng.standard_normal((8, 16, 16, 1)).astype(np.float32)
    labs = rng.integers(0, 4, (8, 16, 16)).astype(np.int32)
    out_i, out_l = augment_batch(jnp.asarray(imgs), jnp.asarray(labs),
                                 jax.random.PRNGKey(0))
    assert out_i.shape == imgs.shape
    assert out_l.shape == labs.shape
    assert set(np.unique(np.asarray(out_l))) <= {0, 1, 2, 3}


def test_augment_branch_statistics():
    """~50% rot90+flip, ~25% rotate, ~25% identity over many samples."""
    n = 400
    base = np.random.default_rng(0).standard_normal((n, 8, 8)).astype(np.float32)
    labs = np.zeros((n, 8, 8), np.int32)
    out_i, _ = augment_batch(jnp.asarray(base), jnp.asarray(labs),
                             jax.random.PRNGKey(42))
    out = np.asarray(out_i)
    identity = np.mean([np.array_equal(out[i], base[i]) for i in range(n)])
    # P(identity) = P(no rot/flip)·P(no rotate) = 0.25, plus angle==0 draws
    assert 0.15 < identity < 0.37, identity


def test_augment_deterministic_per_key(rng):
    imgs = rng.standard_normal((4, 16, 16)).astype(np.float32)
    labs = rng.integers(0, 3, (4, 16, 16)).astype(np.int32)
    a = augment_batch(jnp.asarray(imgs), jnp.asarray(labs), jax.random.PRNGKey(7))
    b = augment_batch(jnp.asarray(imgs), jnp.asarray(labs), jax.random.PRNGKey(7))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
