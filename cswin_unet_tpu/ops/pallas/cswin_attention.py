"""Fused CSWin stripe-attention Pallas TPU kernel.

One ``pallas_call`` computes, per grid program, a tile of adjacent stripe
windows directly from the NHWC image layout:

  window partition (VMEM reshape/transpose — never materialized in HBM)
  → per-window, per-head softmax(Q·Kᵀ·scale)·V on the MXU (f32 accum)
  → + LePE (depthwise 3x3 conv inside each window, computed as 9
    shifted multiply-adds on the VPU with zero window borders)
  → window merge (inverse VMEM reshape), written back in image layout.

Compared with the XLA composition (``ops.attention.cswin_attention_xla``),
this eliminates the HBM round trips for the windowed Q/K/V copies, the
(N, heads, L, L) attention-probability tensor and the LePE tensor — the
dominant memory traffic of the op at CSWin's small head dims (d=32).

Tiling: vertical stripes (h_sp == H) tile along W, so a tile of TW windows
is the contiguous image block (H, TW·w_sp, C); horizontal stripes
(w_sp == W) tile along H likewise; the last-stage full window is the
degenerate single-tile case. Window/tile counts are static per layer, so
each layer compiles exactly one kernel.

The backward pass runs through the XLA composition via ``jax.custom_vjp``
(numerically identical function), keeping training correct while inference
uses the fused kernel; a hand-written backward kernel is a later
optimization.

Behavioral spec: reference ``LePEAttention`` (networks/cswin_unet.py:31-109).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_zero(x: jnp.ndarray, di: int, dj: int) -> jnp.ndarray | None:
    """Shift (n, h, w, C) by (di, dj) over (h, w) with zero fill —
    the zero-padded neighborhoods of a 3x3 conv confined to each window.
    Returns None when the shift moves everything out of the window
    (e.g. lateral taps of a width-1 stripe)."""
    n, h, w, c = x.shape
    if abs(di) >= h or abs(dj) >= w:
        return None
    if di:
        pad = jnp.zeros((n, abs(di), w, c), x.dtype)
        x = (
            jnp.concatenate([pad, x[:, :-di]], axis=1)
            if di > 0
            else jnp.concatenate([x[:, -di:], pad], axis=1)
        )
    if dj:
        pad = jnp.zeros((n, h, abs(dj), c), x.dtype)
        x = (
            jnp.concatenate([pad, x[:, :, :-dj]], axis=2)
            if dj > 0
            else jnp.concatenate([x[:, :, -dj:], pad], axis=2)
        )
    return x


def _kernel(q_ref, k_ref, v_ref, lk_ref, lb_ref, o_ref, *, h_sp, w_sp,
            num_heads, scale):
    _, bh, bw, C = q_ref.shape
    n = bh // h_sp  # windows per tile; the caller guarantees w_sp == bw
    L = h_sp * w_sp
    d = C // num_heads

    # Mosaic constraints shape this body: the channel (lane) dim is never
    # reshaped — heads are LANE SLICES [h·d:(h+1)·d]; window split/merge only
    # touches leading dims (pure sublane reshapes).
    qw = q_ref[0].reshape(n, h_sp, w_sp, C)
    kw = k_ref[0].reshape(n, h_sp, w_sp, C)
    vw = v_ref[0].reshape(n, h_sp, w_sp, C)

    # LePE: depthwise 3x3 inside each window (VPU, 9 shifted FMAs).
    # lax.conv inside the kernel would not lower; the taps are explicit.
    lk = lk_ref[...]  # (3, 3, C)
    acc = jnp.zeros(vw.shape, jnp.float32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            shifted = _shift_zero(vw, di, dj)
            if shifted is None:
                continue
            # shifted[i,j] = v[i-di, j-dj]; cross-correlation (conv2d
            # convention) pairs it with tap [1-di, 1-dj].
            tap = lk[1 - di, 1 - dj].astype(jnp.float32)
            acc += shifted.astype(jnp.float32) * tap
    lepe = (acc + lb_ref[...].astype(jnp.float32)).reshape(n, L, C)

    q2 = qw.reshape(n, L, C)
    k2 = kw.reshape(n, L, C)
    v2 = vw.reshape(n, L, C)

    # Windows are the BATCH dim of one batched dot_general per head (Mosaic
    # lowers single-batch-dim dots) — nothing unrolls over windows.
    head_outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q2[:, :, sl] * scale                     # (n, L, d)
        s = jax.lax.dot_general(qh, k2[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s, axis=-1).astype(qh.dtype)
        head_outs.append(
            jax.lax.dot_general(p, v2[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        )
    out = (head_outs[0] if num_heads == 1
           else jnp.concatenate(head_outs, axis=-1)) + lepe  # (n, L, C)
    o_ref[...] = out.astype(o_ref.dtype).reshape(1, bh, bw, C)


def _pick_tile(n_windows: int, L: int, C: int, itemsize: int) -> int:
    """Largest divisor of n_windows (≤ 8) whose working set stays well under
    VMEM: the kernel holds ~4 image blocks plus f32 LePE/window/score
    intermediates, so the per-tensor block is capped at 128 KB."""
    budget = 128 * 1024
    best = 1
    for t in range(1, min(n_windows, 8) + 1):
        if n_windows % t:
            continue
        if t * L * C * itemsize <= budget:
            best = t
    return best


@functools.partial(
    jax.jit, static_argnames=("h_sp", "w_sp", "num_heads", "scale")
)
def _cswin_attention_pallas_fwd(q, k, v, lepe_kernel, lepe_bias, *, h_sp,
                                w_sp, num_heads, scale):
    B, H, W, C = q.shape
    L = h_sp * w_sp
    lk = lepe_kernel.reshape(3, 3, C)

    # Pallas TPU blocks must keep the last two dims (W, C) whole (or
    # 8/128-aligned), so only tiling along H is freely available. Horizontal
    # stripes (w_sp == W) tile H directly; vertical stripes (h_sp == H) run
    # on the transposed image — branch0(x) == branch1(xᵀ)ᵀ with the LePE
    # taps transposed — letting XLA fuse the transposes into neighbors.
    if w_sp != W:
        assert h_sp == H, (h_sp, w_sp, H, W)
        out = _cswin_attention_pallas_fwd(
            q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
            v.transpose(0, 2, 1, 3),
            lepe_kernel.transpose(1, 0, 2, 3), lepe_bias,
            h_sp=w_sp, w_sp=H, num_heads=num_heads, scale=scale,
        )
        return out.transpose(0, 2, 1, 3)

    n_windows = H // h_sp
    th = _pick_tile(n_windows, L, C, q.dtype.itemsize)
    grid = (B, n_windows // th)
    block = (1, th * h_sp, W, C)
    imap = lambda b, t: (b, t, 0, 0)

    data_spec = pl.BlockSpec(block, imap, memory_space=pltpu.VMEM)
    lepe_k_spec = pl.BlockSpec((3, 3, C), lambda b, t: (0, 0, 0),
                               memory_space=pltpu.VMEM)
    lepe_b_spec = pl.BlockSpec((C,), lambda b, t: (0,),
                               memory_space=pltpu.VMEM)

    kern = functools.partial(_kernel, h_sp=h_sp, w_sp=w_sp,
                             num_heads=num_heads, scale=scale)
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[data_spec, data_spec, data_spec, lepe_k_spec, lepe_b_spec],
        out_specs=data_spec,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        # CPU backend (tests / 8-virtual-device sharding runs) interprets.
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, lk, lepe_bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def cswin_attention_pallas(q, k, v, lepe_kernel, lepe_bias, h_sp, w_sp,
                           num_heads, scale):
    return _cswin_attention_pallas_fwd(
        q, k, v, lepe_kernel, lepe_bias,
        h_sp=h_sp, w_sp=w_sp, num_heads=num_heads, scale=scale,
    )


def _fwd(q, k, v, lepe_kernel, lepe_bias, h_sp, w_sp, num_heads, scale):
    out = cswin_attention_pallas(q, k, v, lepe_kernel, lepe_bias, h_sp, w_sp,
                                 num_heads, scale)
    return out, (q, k, v, lepe_kernel, lepe_bias)


def _bwd(h_sp, w_sp, num_heads, scale, residuals, g):
    from ..attention import cswin_attention_xla

    q, k, v, lepe_kernel, lepe_bias = residuals

    def ref_fn(q, k, v, lk, lb):
        return cswin_attention_xla(q, k, v, lk, lb, h_sp=h_sp, w_sp=w_sp,
                                   num_heads=num_heads, scale=scale)

    _, vjp = jax.vjp(ref_fn, q, k, v, lepe_kernel, lepe_bias)
    return vjp(g)


cswin_attention_pallas.defvjp(_fwd, _bwd)
