"""CSWin stripe attention: XLA composition vs a naive per-window oracle.

The oracle computes, window by window with explicit loops (numpy + torch
conv2d for the depthwise LePE conv), the spec of reference LePEAttention
(networks/cswin_unet.py:31-109): softmax(QKᵀ·scale)·V + LePE(V), where LePE
is a per-window depthwise 3x3 conv on V.
"""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from cswin_unet_tpu.ops.attention import cswin_attention_xla, depthwise_conv3x3


def naive_oracle(q, k, v, kernel_oihw, bias, h_sp, w_sp, heads, scale):
    B, H, W, C = q.shape
    d = C // heads
    out = np.zeros_like(q)
    tk = torch.from_numpy(kernel_oihw)
    tb = torch.from_numpy(bias)
    for b in range(B):
        for i in range(H // h_sp):
            for j in range(W // w_sp):
                sl = (b, slice(i * h_sp, (i + 1) * h_sp), slice(j * w_sp, (j + 1) * w_sp))
                qw = q[sl].reshape(-1, C)
                kw = k[sl].reshape(-1, C)
                vw = v[sl].reshape(-1, C)
                # LePE: depthwise conv on this window's V, zero-padded borders
                v_img = torch.from_numpy(v[sl].transpose(2, 0, 1)[None])  # 1,C,h,w
                lepe = F.conv2d(v_img, tk, tb, padding=1, groups=C)[0]
                lepe = lepe.numpy().transpose(1, 2, 0).reshape(-1, C)
                ow = np.zeros_like(qw)
                for h in range(heads):
                    qs = qw[:, h * d : (h + 1) * d] * scale
                    ks = kw[:, h * d : (h + 1) * d]
                    vs = vw[:, h * d : (h + 1) * d]
                    a = qs @ ks.T
                    a = np.exp(a - a.max(-1, keepdims=True))
                    a = a / a.sum(-1, keepdims=True)
                    ow[:, h * d : (h + 1) * d] = a @ vs + lepe[:, h * d : (h + 1) * d]
                out[sl] = ow.reshape(h_sp, w_sp, C)
    return out


def _check(rng, B, H, W, C, h_sp, w_sp, heads):
    q = rng.standard_normal((B, H, W, C)).astype(np.float32)
    k = rng.standard_normal((B, H, W, C)).astype(np.float32)
    v = rng.standard_normal((B, H, W, C)).astype(np.float32)
    kern_oihw = rng.standard_normal((C, 1, 3, 3)).astype(np.float32) * 0.3
    bias = rng.standard_normal(C).astype(np.float32) * 0.1
    scale = (C // heads) ** -0.5

    want = naive_oracle(q, k, v, kern_oihw, bias, h_sp, w_sp, heads, scale)
    # jax kernel layout: HWIO (3,3,1,C)
    kern_hwio = jnp.asarray(kern_oihw.transpose(2, 3, 1, 0))
    got = cswin_attention_xla(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        kern_hwio, jnp.asarray(bias),
        h_sp=h_sp, w_sp=w_sp, num_heads=heads, scale=scale,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-5)


def test_vertical_stripes(rng):
    _check(rng, B=2, H=8, W=8, C=8, h_sp=8, w_sp=2, heads=2)


def test_horizontal_stripes(rng):
    _check(rng, B=2, H=8, W=8, C=8, h_sp=2, w_sp=8, heads=2)


def test_full_window_last_stage(rng):
    _check(rng, B=2, H=4, W=4, C=16, h_sp=4, w_sp=4, heads=4)


def test_single_head_stripe(rng):
    _check(rng, B=1, H=8, W=4, C=6, h_sp=8, w_sp=1, heads=1)


def test_depthwise_conv_matches_torch(rng):
    x = rng.standard_normal((3, 5, 4, 6)).astype(np.float32)
    kern_oihw = rng.standard_normal((6, 1, 3, 3)).astype(np.float32)
    bias = rng.standard_normal(6).astype(np.float32)
    want = F.conv2d(
        torch.from_numpy(x.transpose(0, 3, 1, 2)),
        torch.from_numpy(kern_oihw), torch.from_numpy(bias),
        padding=1, groups=6,
    ).numpy().transpose(0, 2, 3, 1)
    got = depthwise_conv3x3(
        jnp.asarray(x), jnp.asarray(kern_oihw.transpose(2, 3, 1, 0)), jnp.asarray(bias)
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)
