"""Fused CSWin transformer BLOCK Pallas kernel (inference path).

One grid program = one batch image = one whole CSWinBlock:

    LN1 (f32 stats) -> qkv matmul (MXU) -> two stripe-attention branches
    (windowing, softmax(QKᵀ)V, LePE — all in VMEM) -> proj matmul ->
    residual -> LN2 -> MLP (matmul, exact-erf GELU, matmul) -> residual

HBM traffic collapses to one read of x + the (small) parameters and one
write of the output; the composed path (flax CSWinBlock) touches HBM ~12
times per block. Intra-block ablation at stage-1 geometry showed XLA spends
7.8 ms/block at bs128 where the matmul roofline is <1 ms — all overhead
this kernel removes.

Both stripe orientations live in one kernel (full image per program), so
the vertical branch needs no HBM transpose routing. Used only on the
deterministic (no drop-path) path; training takes the composed modules, and
the custom_vjp backward re-runs the composed forward for gradients.

Numerics mirror the flax composition: LN statistics in f32, matmul
accumulation f32 (cast to the activation dtype between ops), exact erf GELU.
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(z):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7 — far below
    bf16 resolution); Mosaic lowers neither erf nor erfc."""
    sign = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-za * za))


def _layernorm(x, scale, bias):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
    return (y * scale.astype(jnp.float32) + bias.astype(jnp.float32)).astype(x.dtype)


def _dot(a, b, bias=None):
    out = jnp.dot(a, b.astype(a.dtype), preferred_element_type=jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(a.dtype)


def _shift_img(x, di, dj):
    """(H, W, C) CIRCULAR shift: out[r, c] = x[(r-di)%H, (c-dj)%W].

    Mosaic rejects pad+concat shifts in several layouts; tpu roll is native.
    Wrapped values land exactly where the caller's out-of-bounds/window mask
    is zero, so roll+mask equals the zero-fill shift."""
    H, W, _ = x.shape
    if di:
        x = pltpu.roll(x, di % H, 0)
    if dj:
        x = pltpu.roll(x, dj % W, 1)
    return x


def _window_mask(n: int, sp: int, d: int) -> np.ndarray:
    """valid[r] = source r-d exists and lies in the same window group."""
    r = np.arange(n)
    src = r - d
    return ((src >= 0) & (src < n) & (r // sp == src // sp)).astype(np.float32)


def _iota_mask(H, W, sp_h, sp_w, di, dj):
    """In-kernel (H, W) validity mask built from iota (pallas kernels cannot
    capture traced constants): source (r-di, c-dj) exists and lies in the
    same (sp_h, sp_w) window group."""
    r = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    rs, cs = r - di, c - dj
    ok = (rs >= 0) & (rs < H) & (cs >= 0) & (cs < W)
    ok &= (r // sp_h) == (rs // sp_h)
    ok &= (c // sp_w) == (cs // sp_w)
    return ok.astype(jnp.float32)[..., None]


def _lepe_full(v_img, lk, lb, sp_h, sp_w):
    """Window-confined depthwise 3x3 on full images: shifts computed
    globally (circular roll), taps crossing a window boundary zeroed by
    masks. v_img: (G, H, W, C), windows tile (sp_h, sp_w) per image."""
    G, H, W, C = v_img.shape
    vf = v_img.astype(jnp.float32)  # tpu rotate lowers for f32, not bf16
    acc = jnp.zeros((G, H, W, C), jnp.float32)
    for di in (-1, 0, 1):
        if not _window_mask(H, sp_h, di).any():
            continue
        for dj in (-1, 0, 1):
            if not _window_mask(W, sp_w, dj).any():
                continue
            s = vf
            if di:
                s = pltpu.roll(s, di % H, 1)
            if dj:
                s = pltpu.roll(s, dj % W, 2)
            acc += s * _iota_mask(H, W, sp_h, sp_w, di, dj)[None] * lk[1 - di, 1 - dj].astype(jnp.float32)
    return acc + lb.astype(jnp.float32)


def _attn_windows(q, k, v, heads, scale):
    """q,k,v: (n, L, C) -> (n, L, C). Windows are the BATCH dim of one
    batched dot_general per head (Mosaic lowers single-batch-dim dots), so
    nothing unrolls over windows — compile time stays flat in n."""
    n, L, C = q.shape
    d = C // heads
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, :, sl] * scale
        s = jax.lax.dot_general(qh, k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
        outs.append(
            jax.lax.dot_general(p, v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        )
    out = outs[0] if heads == 1 else jnp.concatenate(outs, -1)
    return out.astype(q.dtype)


def _branch_horizontal(q, k, v, lk, lb, *, H, W, sp, heads, scale):
    """Windows (sp, W): pure reshapes. q,k,v: (G, H, W, C2); all G images'
    windows ride the same batched dot."""
    G, _, _, C2 = q.shape
    nH = H // sp
    L = sp * W

    def win(x):
        return x.reshape(G * nH, L, C2)

    out = _attn_windows(win(q), win(k), win(v), heads, scale).reshape(G, H, W, C2)
    lepe = _lepe_full(v, lk, lb, sp, W)
    return (out.astype(jnp.float32) + lepe).astype(q.dtype)


def _branch_vertical(q, k, v, lk, lb, *, H, W, sp, heads, scale):
    """Windows (H, sp). q,k,v: (G, H, W, C2).

    Computed on the TRANSPOSED image, where a (H, sp) window is sp contiguous
    rows — plain sublane reshapes, no per-image loop, any G. Within-window
    token order differs from the row-major composition ((w, h) vs (h, w)),
    which is immaterial: softmax(QKᵀ)V is invariant to a shared permutation
    of the window's tokens, and each output lands back at its own (h, w)
    via the inverse transpose."""
    G, _, _, C2 = q.shape
    nW = W // sp

    def win(x):
        return x.transpose(0, 2, 1, 3).reshape(G * nW, sp * H, C2)

    out = _attn_windows(win(q), win(k), win(v), heads, scale)
    out = out.reshape(G, W, H, C2).transpose(0, 2, 1, 3)
    lepe = _lepe_full(v, lk, lb, H, sp)
    return (out.astype(jnp.float32) + lepe).astype(q.dtype)


def _block_kernel(x_ref, n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1,
                  projk, projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b, o_ref, *,
                  H, W, C, heads, split, last_stage, scale, qkv_bias, G):
    # G images per program: the LN/qkv/proj/MLP matmuls run jointly on
    # (G·H·W, C) rows (better MXU M-dim); attention loops per image.
    x = x_ref[...].reshape(G * H * W, C)

    xn = _layernorm(x, n1s[...], n1b[...])
    qkv = _dot(xn, qkvk[...], qkvb[...] if qkv_bias else None)  # (GHW, 3C)

    q = qkv[:, :C].reshape(G, H, W, C)
    k = qkv[:, C : 2 * C].reshape(G, H, W, C)
    v = qkv[:, 2 * C :].reshape(G, H, W, C)
    if last_stage:
        att = _branch_horizontal(q, k, v, lk0[...], lb0[...],
                                 H=H, W=W, sp=H, heads=heads, scale=scale)
    else:
        half = C // 2
        h2 = heads // 2
        a0 = _branch_vertical(
            q[..., :half], k[..., :half], v[..., :half], lk0[...], lb0[...],
            H=H, W=W, sp=split, heads=h2, scale=scale,
        )
        a1 = _branch_horizontal(
            q[..., half:], k[..., half:], v[..., half:], lk1[...], lb1[...],
            H=H, W=W, sp=split, heads=h2, scale=scale,
        )
        att = jnp.concatenate([a0, a1], -1)
    att = att.reshape(G * H * W, C)

    att = _dot(att, projk[...], projb[...])
    x = x + att

    y = _layernorm(x, n2s[...], n2b[...])
    y = _dot(y, fc1k[...], fc1b[...])
    # exact-form GELU x·Φ(x); erf via the A&S approximation above
    yf = y.astype(jnp.float32)
    y = (yf * 0.5 * (1.0 + _erf(yf * (2.0**-0.5)))).astype(y.dtype)
    y = _dot(y, fc2k[...], fc2b[...])
    x = x + y

    o_ref[...] = x.reshape(G, H, W, C)


def _default_g(B: int, H: int, W: int, C: int) -> int:
    """Images per grid program. Small-image stages (3/4) batch several
    images so the per-op VPU/MXU shapes amortize fixed overhead; stage 1's
    f32 working set already fills VMEM at G=1 (G=4 there benched SLOWER:
    1704 vs 1773 slices/s). Sweep data: scripts/sweep_g.py."""
    tokens_bytes = H * W * C * 2  # bf16 activation block per image
    g = 1
    while g * 2 <= 16 and B % (g * 2) == 0 and tokens_bytes * g * 2 <= 256 * 1024:
        g *= 2
    return g


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "C", "heads", "split", "last_stage", "scale",
                     "qkv_bias", "g_images"),
)
def _fused_block_fwd(x, params, *, H, W, C, heads, split, last_stage, scale,
                     qkv_bias, g_images=None):
    B = x.shape[0]
    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb,
     n2s, n2b, fc1k, fc1b, fc2k, fc2b) = params

    G = g_images if g_images is not None else _default_g(B, H, W, C)
    while B % G:
        G //= 2

    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((G, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    param_specs = [full(p.shape) for p in params]

    kern = functools.partial(
        _block_kernel, H=H, W=W, C=C, heads=heads, split=split,
        last_stage=last_stage, scale=scale, qkv_bias=qkv_bias, G=G,
    )
    return pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[x_spec] + param_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # stage-1 f32 working set slightly exceeds the default 16 MB scoped
        # cap; v5e VMEM accommodates this comfortably
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, *params)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9))
def fused_cswin_block(x, params, H, W, C, heads, split, last_stage, scale, qkv_bias):
    """Fused block forward. ``params`` is the 16-tuple
    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
    fc1k, fc1b, fc2k, fc2b); LePE kernels are (3, 3, C_branch)."""
    return _fused_block_fwd(x, params, H=H, W=W, C=C, heads=heads, split=split,
                            last_stage=last_stage, scale=scale, qkv_bias=qkv_bias)


def composed_block(x, params, H, W, C, heads, split, last_stage, scale, qkv_bias):
    """XLA composition of the same function (VJP + validation oracle)."""
    from ..attention import cswin_attention_xla

    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb,
     n2s, n2b, fc1k, fc1b, fc2k, fc2b) = params
    B = x.shape[0]

    def ln(t, s, b):
        tf = t.astype(jnp.float32)
        mu = jnp.mean(tf, -1, keepdims=True)
        var = jnp.mean((tf - mu) ** 2, -1, keepdims=True)
        return (((tf - mu) * jax.lax.rsqrt(var + 1e-5)) * s + b).astype(t.dtype)

    xn = ln(x, n1s, n1b)
    qkv = jnp.dot(xn.reshape(B, H * W, C), qkvk.astype(x.dtype),
                  preferred_element_type=jnp.float32)
    if qkv_bias:
        qkv = qkv + qkvb
    qkv = qkv.astype(x.dtype).reshape(B, H, W, 3, C)
    q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]

    def attn(qq, kk, vv, lk, lb, h_sp, w_sp, nh):
        return cswin_attention_xla(qq, kk, vv, lk.reshape(3, 3, 1, -1), lb,
                                   h_sp=h_sp, w_sp=w_sp, num_heads=nh, scale=scale)

    if last_stage:
        att = attn(q, k, v, lk0, lb0, H, W, heads)
    else:
        half = C // 2
        a0 = attn(q[..., :half], k[..., :half], v[..., :half], lk0, lb0,
                  H, split, heads // 2)
        a1 = attn(q[..., half:], k[..., half:], v[..., half:], lk1, lb1,
                  split, W, heads // 2)
        att = jnp.concatenate([a0, a1], -1)

    att = (jnp.dot(att.reshape(B, H * W, C), projk.astype(x.dtype),
                   preferred_element_type=jnp.float32) + projb).astype(x.dtype)
    x1 = x + att.reshape(B, H, W, C)

    y = ln(x1, n2s, n2b)
    y = (jnp.dot(y.reshape(B, H * W, C), fc1k.astype(x.dtype),
                 preferred_element_type=jnp.float32) + fc1b).astype(x.dtype)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
    y = (jnp.dot(y, fc2k.astype(x.dtype),
                 preferred_element_type=jnp.float32) + fc2b).astype(y.dtype)
    return x1 + y.reshape(B, H, W, C)


def _fwd(x, params, *static):
    return fused_cswin_block(x, params, *static), (x, params)


def _bwd(*args):
    static, residuals, g = args[:-2], args[-2], args[-1]
    x, params = residuals
    _, vjp = jax.vjp(lambda a, p: composed_block(a, p, *static), x, params)
    return vjp(g)


fused_cswin_block.defvjp(_fwd, _bwd)
