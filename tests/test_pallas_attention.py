"""Fused Pallas stripe-attention vs the XLA composition (interpret mode on
CPU; the same comparison runs compiled on real TPU in scripts/bench_impl.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cswin_unet_tpu.ops.attention import cswin_attention, cswin_attention_xla


def _case(rng, B, H, W, C, hs, ws, heads):
    q, k, v = (rng.standard_normal((B, H, W, C)).astype(np.float32) for _ in range(3))
    lk = rng.standard_normal((3, 3, 1, C)).astype(np.float32) * 0.3
    lb = rng.standard_normal(C).astype(np.float32) * 0.1
    scale = (C // heads) ** -0.5
    return [jnp.asarray(a) for a in (q, k, v, lk, lb)], scale


@pytest.mark.parametrize(
    "B,H,W,C,hs,ws,heads",
    [
        (2, 8, 8, 8, 8, 1, 1),    # vertical stripes (transposed route)
        (2, 8, 8, 8, 1, 8, 1),    # horizontal stripes
        (1, 8, 8, 16, 8, 2, 2),   # vertical, multiwindow, 2 heads
        (1, 8, 8, 16, 2, 8, 2),   # horizontal, multiwindow
        (2, 4, 4, 16, 4, 4, 4),   # full window (last stage)
    ],
)
def test_pallas_matches_xla(rng, B, H, W, C, hs, ws, heads):
    args, scale = _case(rng, B, H, W, C, hs, ws, heads)
    ref = cswin_attention_xla(*args, h_sp=hs, w_sp=ws, num_heads=heads, scale=scale)
    got = cswin_attention(*args, h_sp=hs, w_sp=ws, num_heads=heads, scale=scale,
                          impl="pallas")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_pallas_gradients_match_xla(rng):
    """custom_vjp backward (XLA composition) must agree with direct XLA grads."""
    args, scale = _case(rng, 1, 8, 8, 8, 2, 8, 2)

    def loss(impl):
        def f(q, k, v, lk, lb):
            out = cswin_attention(q, k, v, lk, lb, h_sp=2, w_sp=8, num_heads=2,
                                  scale=scale, impl=impl)
            return jnp.sum(out**2)

        return jax.grad(f, argnums=(0, 1, 2, 3, 4))(*args)

    g_ref = loss("xla")
    g_pal = loss("pallas")
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4)
