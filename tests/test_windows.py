"""Window partition/merge: roundtrip + ordering vs a naive loop oracle."""

import numpy as np
import jax.numpy as jnp

from cswin_unet_tpu.ops import window_partition, window_merge


def naive_partition(x, h_sp, w_sp):
    B, H, W, C = x.shape
    out = []
    for b in range(B):
        for i in range(H // h_sp):
            for j in range(W // w_sp):
                out.append(x[b, i * h_sp : (i + 1) * h_sp, j * w_sp : (j + 1) * w_sp, :].reshape(-1, C))
    return np.stack(out)


def test_partition_matches_naive(rng):
    x = rng.standard_normal((2, 8, 6, 5)).astype(np.float32)
    for h_sp, w_sp in [(8, 1), (2, 6), (4, 3), (1, 1), (8, 6)]:
        got = np.asarray(window_partition(jnp.asarray(x), h_sp, w_sp))
        want = naive_partition(x, h_sp, w_sp)
        np.testing.assert_array_equal(got, want)


def test_roundtrip(rng):
    x = rng.standard_normal((3, 12, 8, 7)).astype(np.float32)
    for h_sp, w_sp in [(12, 2), (3, 8), (4, 4), (1, 8)]:
        w = window_partition(jnp.asarray(x), h_sp, w_sp)
        back = np.asarray(window_merge(w, h_sp, w_sp, 12, 8))
        np.testing.assert_array_equal(back, x)
