"""Fused CARAFE4 + classifier tail Pallas kernel.

The model tail (reference cswin_unet.py:536-544: CARAFE4(64,64) then 1x1
conv to num_classes) is the single most expensive piece of the XLA forward
at 224²/bs128 — 20.5 ms measured (scripts/profile_tail.py), dominated by the
(B,56,56,C,up²) f32 reassembly intermediate (~411 MB of HBM traffic).

This kernel keeps the whole tail in VMEM per image:

  x (56,56,64) ─┬─ down 1x1 ─ im2col 3x3 ─ encoder matmul → enc (HW, k²·up²)
                │   softmax over the k² taps per up-position, segmented via
                │   two tiny MXU selector matmuls (sum + spread) and a
                │   global row max (valid: any per-row constant shift)
                └─ y9 = x @ (W_out·W_cls) (classes before reassembly — exact,
                    taps sum to 1; see ops.carafe.carafe_with_classifier)
  acc (HW, NC·up²) += (shift(y9)·T_sel) * (kern_tap·E_sel)   [9 taps, MXU]
  out = acc + b_out·W_cls   →  (B, 56, 56, NC·up²)

and leaves ONLY the depth-to-space pixel shuffle to XLA (a bandwidth-bound
HBM relayout of the small class-channel tensor). Exact same math as
``carafe_with_classifier``; f32 accumulation throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift2d(x, di, dj):
    """Zero-fill shift of (..., H, W, C) over (H, W):
    out[..., r, c, :] = x[..., r-di, c-dj, :]. Works for (H, W, C) and
    G-batched (G, H, W, C) layouts (shift dims counted from the end)."""
    H, W = x.shape[-3], x.shape[-2]
    ax_h, ax_w = x.ndim - 3, x.ndim - 2
    if di:
        pad = jnp.zeros(x.shape[:ax_h] + (abs(di), W) + x.shape[-1:], x.dtype)
        x = (jnp.concatenate([pad, x[..., :-di, :, :]], ax_h) if di > 0
             else jnp.concatenate([x[..., -di:, :, :], pad], ax_h))
    if dj:
        pad = jnp.zeros(x.shape[:ax_w] + (abs(dj),) + x.shape[-1:], x.dtype)
        x = (jnp.concatenate([pad, x[..., :-dj, :]], ax_w) if dj > 0
             else jnp.concatenate([x[..., -dj:, :], pad], ax_w))
    return x


def _shift2d_roll(x, di, dj):
    """Zero-fill shift of (G, H, W, C) over (H, W) via circular
    ``pltpu.roll`` + an iota validity mask — the 4-D pad+concat form
    ``_shift2d`` uses blows up Mosaic compile time at G > 1 (ROADMAP
    landmine list), while rolls are native. f32 only (bf16 dynamic
    rotates don't lower); callers cast."""
    G, H, W, C = x.shape
    if di:
        x = pltpu.roll(x, di % H, 1)
    if dj:
        x = pltpu.roll(x, dj % W, 2)
    r = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    ok = ((r - di >= 0) & (r - di < H) & (c - dj >= 0) & (c - dj < W))
    return x * ok.astype(x.dtype)[None, :, :, None]


def _kernel(x_ref, wdown, bdown, wenc, benc, wy9, sum_sel, spread_sel,
            expand_sel, tile_sel, bias_lane, o_ref, *, H, W, C, NC, UP2, G,
            emit):
    K2 = 9
    HW = H * W
    # G == 1: bf16 pad+concat shifts (cheapest, proven). G > 1: f32
    # roll+mask (concat landmine); shift inputs are cast to f32.
    if G == 1:
        shift = _shift2d
        sdt = x_ref.dtype
    else:
        shift = _shift2d_roll
        sdt = jnp.float32

    x2 = x_ref[...].reshape(G * HW, C)

    # --- kernel prediction (all G images jointly on the MXU) ---
    mid = jnp.dot(x2, wdown[...].astype(x2.dtype),
                  preferred_element_type=jnp.float32)
    mid = (mid + bdown[...].astype(jnp.float32)).astype(sdt)  # (GHW, C/4)
    cm = mid.shape[-1]
    mid_img = mid.reshape(G, H, W, cm)
    # shift (di, dj) yields mid[r-di, c-dj], which the cross-correlation
    # pairs with weight row (1-di, 1-dj) — so iterate di,dj DESCENDING to
    # match wenc's row-major (a, b, c') reshape order.
    patches = jnp.concatenate(
        [shift(mid_img, di, dj) for di in (1, 0, -1) for dj in (1, 0, -1)],
        -1,
    ).reshape(G * HW, K2 * cm).astype(x2.dtype)
    enc = jnp.dot(patches, wenc[...].astype(patches.dtype),
                  preferred_element_type=jnp.float32)
    enc = enc + benc[...].astype(jnp.float32)             # (GHW, k2*up2) f32

    # --- softmax over the k² taps for each up-position s (lane k2-major:
    # lane = k*UP2 + s). Global row max is a valid stabilizer (same constant
    # within every (row, s) group); sum/spread via constant selector matmuls.
    m = jnp.max(enc, axis=-1, keepdims=True)
    e = jnp.exp(enc - m)
    # f32 selector matmuls: tiny (144x16), keeps softmax at f32 precision.
    sums = jnp.dot(e, sum_sel[...], preferred_element_type=jnp.float32)
    denom = jnp.dot(sums, spread_sel[...],
                    preferred_element_type=jnp.float32)    # (GHW, k2*up2)
    # The global row max can sit ~88+ above every tap of one up-position
    # group under outlier activations, underflowing that group's exps to 0;
    # clamping the denominator keeps kern finite (uniform-ish taps) instead
    # of 0/0 = NaN.
    denom = jnp.maximum(denom, 1e-30)
    kern = (e / denom).astype(x2.dtype).reshape(G, H, W, K2 * UP2)

    # --- classes before reassembly ---
    y9 = jnp.dot(x2, wy9[...].astype(x2.dtype),
                 preferred_element_type=jnp.float32).astype(sdt)
    y9 = y9.reshape(G, H, W, NC)

    # --- 9-tap reassembly on s-major (up²·NC) lanes: lane = s·NC + n.
    # Both operands are expanded to that layout by constant 0/1 selector
    # matmuls (T[n, s·NC+n] = 1 tiles the class vector; E[s, s·NC+n] = 1
    # spreads the tap weights) — an MXU dot per tap beats pltpu.repeat's
    # VPU lane-relayout by ~1 ms/128 images (measured).
    acc = jnp.zeros((G, H, W, NC * UP2), jnp.float32)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            # shifted[r,c] = y9[r-di, c-dj] pairs with reference tap
            # (1-di, 1-dj) (extract_patches_3x3 order, ops/carafe.py:42-46).
            tap = (1 - di) * 3 + (1 - dj)
            ys = shift(y9, di, dj).astype(x2.dtype)
            src = jnp.dot(ys.reshape(G * HW, NC),
                          tile_sel[...].astype(ys.dtype),
                          preferred_element_type=jnp.float32)  # (GHW, UP2*NC)
            wk = kern[:, :, :, tap * UP2 : (tap + 1) * UP2]    # (G,H,W,UP2)
            wk = jnp.dot(wk.reshape(G * HW, UP2),
                         expand_sel[...].astype(wk.dtype),
                         preferred_element_type=jnp.float32)
            acc = acc + (src * wk).reshape(G, H, W, NC * UP2)

    if emit == "logits":
        o_ref[...] = acc.astype(o_ref.dtype)
        return
    # emit == "argmax": the eval pipeline needs LABELS, not logits —
    # softmax is monotone so argmax over logits is identical (reference
    # utils.py:74 softmax->argmax). Selectors are CLASS-major here
    # (lane = n·UP2 + s), so each class's up-position plane is a
    # contiguous UP2-lane slice; a first-occurrence-wins running argmax
    # (strict >, numpy/torch tie convention) costs NC compare/selects.
    # Output (G, H, W, UP2) int32 — 9x less HBM than the logits write,
    # and the eval-side softmax/argmax pass disappears.
    acc = acc + bias_lane[...].astype(jnp.float32)
    best = acc[:, :, :, :UP2]
    idx = jnp.zeros(best.shape, jnp.int32)
    for n in range(1, NC):
        v = acc[:, :, :, n * UP2 : (n + 1) * UP2]
        gt = v > best
        idx = jnp.where(gt, n, idx)
        best = jnp.where(gt, v, best)
    o_ref[...] = idx


def _sum_selector(k2: int, up2: int) -> np.ndarray:
    """(k2·up2, up2) 0/1: column s sums lanes {k·up2+s}."""
    sel = np.zeros((k2 * up2, up2), np.float32)
    for k in range(k2):
        for s in range(up2):
            sel[k * up2 + s, s] = 1.0
    return sel


@functools.partial(jax.jit, static_argnames=("up_factor", "g_images", "emit"))
def carafe_fused_pallas(x, down_kernel, down_bias, encoder_kernel,
                        encoder_bias, out_kernel, out_bias, cls_kernel=None,
                        *, up_factor=2, g_images=None, emit="logits"):
    """Whole-CARAFE fused kernel: (B, H, W, C) -> (B, up·H, up·W, NC).

    With ``cls_kernel`` the 1x1 classifier is folded into the hoisted
    out-conv (the tail configuration, NC = num_classes); without it this is
    the plain CARAFE upsampler (NC = C_out) used between decoder stages
    (reference CARAFE :222-269). Exact carafe/carafe_with_classifier math
    (ops/carafe.py:50-164, :167-229), f32 accumulation."""
    B, H, W, C = x.shape
    K2 = 9
    UP = up_factor
    UP2 = UP * UP
    cm = down_kernel.shape[-1]

    wdown = down_kernel.reshape(C, cm)
    wenc = encoder_kernel.reshape(K2 * cm, K2 * UP2)
    if cls_kernel is not None:
        w_cls = cls_kernel[0, 0]
        wy9 = out_kernel[0, 0] @ w_cls                      # (C, NC)
        bias_comb = out_bias @ w_cls                        # (NC,)
    else:
        wy9 = out_kernel[0, 0]
        bias_comb = out_bias
    NC = wy9.shape[-1]
    sum_sel = jnp.asarray(_sum_selector(K2, UP2))
    spread_sel = sum_sel.T                                   # (up2, k2*up2)
    expand = np.zeros((UP2, UP2 * NC), np.float32)
    tile = np.zeros((NC, UP2 * NC), np.float32)
    for s in range(UP2):
        for n in range(NC):
            # acc lane layout is whatever the selectors encode: s-major
            # (lane = s·NC + n) for the logits output (depth-to-space
            # epilogue order), CLASS-major (lane = n·UP2 + s) for the
            # argmax output (contiguous per-class planes).
            lane = s * NC + n if emit == "logits" else n * UP2 + s
            expand[s, lane] = 1.0
            tile[n, lane] = 1.0
    expand_sel = jnp.asarray(expand)
    tile_sel = jnp.asarray(tile)
    # per-lane class bias (traced — bias_comb may be out_bias @ W_cls)
    bias_lane = (jnp.tile(bias_comb.astype(jnp.float32), UP2)
                 if emit == "logits"
                 else jnp.repeat(bias_comb.astype(jnp.float32), UP2))

    # Images per program. Large-activation sites (>= 28x28) run G = 1 —
    # one image already fills the MXU shapes. Small sites (14x14, 7x7)
    # pack several images so the (G·HW, ·) dots amortize per-program
    # overhead; their G > 1 shifts use roll+iota-mask (``_shift2d_roll``)
    # because 4-D pad+concat shifts blow up Mosaic compile time there.
    if g_images is not None:
        G = g_images
    elif H * W >= 28 * 28:
        G = 1
    else:
        G = 1
        while G * 2 <= 16 and B % (G * 2) == 0 and H * W * C * G * 2 <= 256 * 1024:
            G *= 2
    while B % G:
        G //= 2

    full = lambda a: pl.BlockSpec(a.shape, lambda b: tuple(0 for _ in a.shape),
                                  memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((G, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    out_lanes = UP2 if emit == "argmax" else NC * UP2
    out_dtype = jnp.int32 if emit == "argmax" else x.dtype
    o_spec = pl.BlockSpec((G, H, W, out_lanes), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    consts = (wdown, down_bias, wenc, encoder_bias, wy9, sum_sel, spread_sel,
              expand_sel, tile_sel, bias_lane)

    kern = functools.partial(_kernel, H=H, W=W, C=C, NC=NC, UP2=UP2, G=G,
                             emit=emit)
    t = pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[x_spec] + [full(c) for c in consts],
        out_specs=o_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, W, out_lanes), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, *consts)

    if emit == "argmax":
        # depth-to-space on int32 labels: lane = i·UP + j.
        t = t.reshape(B, H, W, UP, UP).transpose(0, 1, 3, 2, 4)
        return t.reshape(B, H * UP, W * UP)
    # bias (taps sum to 1 ⇒ passes through reassembly) + depth-to-space.
    # Lanes are s-major: lane = (i·UP + j)·NC + n.
    t = t.reshape(B, H, W, UP, UP, NC) + bias_comb.astype(t.dtype)
    t = t.transpose(0, 1, 3, 2, 4, 5)
    return t.reshape(B, H * UP, W * UP, NC)


def carafe_tail_pallas(x, down_kernel, down_bias, encoder_kernel,
                       encoder_bias, out_kernel, out_bias, cls_kernel, *,
                       up_factor=4):
    """(B, H, W, C) -> (B, up·H, up·W, NC) logits; exact
    carafe_with_classifier math (ops/carafe.py:167-229), fused in VMEM."""
    return carafe_fused_pallas(
        x, down_kernel, down_bias, encoder_kernel, encoder_bias,
        out_kernel, out_bias, cls_kernel, up_factor=up_factor)


def carafe_tail_argmax_pallas(x, down_kernel, down_bias, encoder_kernel,
                              encoder_bias, out_kernel, out_bias, cls_kernel,
                              *, up_factor=4):
    """(B, H, W, C) -> (B, up·H, up·W) int32 LABELS: the tail kernel with
    the per-pixel class argmax fused in (softmax is monotone, so this
    equals the reference's softmax->argmax, utils.py:74). Cuts the tail's
    HBM write NC·up²/up²-fold and removes the eval-side argmax pass.
    Inference-only (no vjp)."""
    return carafe_fused_pallas(
        x, down_kernel, down_bias, encoder_kernel, encoder_bias,
        out_kernel, out_bias, cls_kernel, up_factor=up_factor, emit="argmax")


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def carafe_tail(x, down_kernel, down_bias, encoder_kernel, encoder_bias,
                out_kernel, out_bias, cls_kernel, up_factor=4):
    """Differentiable fused tail: Pallas forward, XLA-composition backward
    (identical math — ops/carafe.py:167-229)."""
    return carafe_fused_pallas(
        x, down_kernel, down_bias, encoder_kernel, encoder_bias,
        out_kernel, out_bias, cls_kernel, up_factor=up_factor)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def carafe_up(x, down_kernel, down_bias, encoder_kernel, encoder_bias,
              out_kernel, out_bias, up_factor=2):
    """Differentiable fused CARAFE upsampler (no classifier): Pallas
    forward, XLA 'fast' composition backward (identical math —
    ops/carafe.py:50-113)."""
    return carafe_fused_pallas(
        x, down_kernel, down_bias, encoder_kernel, encoder_bias,
        out_kernel, out_bias, None, up_factor=up_factor)


def _up_fwd(x, dk, db, ek, eb, ok, ob, up_factor):
    out = carafe_up(x, dk, db, ek, eb, ok, ob, up_factor)
    return out, (x, dk, db, ek, eb, ok, ob)


def _up_bwd(up_factor, residuals, g):
    from ..carafe import carafe

    def ref(x, dk, db, ek, eb, ok, ob):
        return carafe(x, dk, db, ek, eb, ok, ob,
                      kernel_size=3, up_factor=up_factor, impl="fast")

    # Same CPU DotThunk workaround as _tail_bwd.
    if jax.default_backend() == "cpu":
        dtypes = [r.dtype for r in residuals]
        residuals = tuple(r.astype(jnp.float32) for r in residuals)
        grads = jax.vjp(ref, *residuals)[1](g.astype(jnp.float32))
        return tuple(gr.astype(dt) for gr, dt in zip(grads, dtypes))
    _, vjp = jax.vjp(ref, *residuals)
    return vjp(g)


carafe_up.defvjp(_up_fwd, _up_bwd)


def _tail_fwd(x, dk, db, ek, eb, ok, ob, ck, up_factor):
    out = carafe_tail(x, dk, db, ek, eb, ok, ob, ck, up_factor)
    return out, (x, dk, db, ek, eb, ok, ob, ck)


# Tail-backward formulation: "auto" (measured route), "autodiff" (vjp of
# the C-channel composition), "nc" (vjp of the NC-channel projection-first
# composition), "manual" (hand-associated contractions,
# ops/carafe.py:carafe_tail_bwd_manual). Experiments monkeypatch this.
_TAIL_BWD_MODE = "auto"


def _tail_bwd(up_factor, residuals, g):
    # MEASURED route: the plain autodiff vjp of the C-channel composition.
    # The isolated part profile (profile_parts_bwd.py: the up-4 CARAFE vjp
    # at 7.3 ms of the 43.6 ms bs-24 step) suggested the tail backward was
    # the step's biggest piece, but neither alternative wins IN-SITU
    # (bench.py train, bs 24, real chip, 2026-08-21): autodiff-C 550.9
    # samples/s, nc replay 533.8 (its ~7x smaller cotangents run at 9/128
    # lane fill), hand-associated manual 532.1 (same lane economics on the
    # A/patches_n tap tensors). Inside the fused whole-step graph XLA
    # schedules the C-wide vjp better than the isolated chain suggested —
    # the isolated number does not transfer. Both alternatives stay
    # value+grad parity-covered (tests/test_carafe_tail.py) as measured
    # negatives behind _TAIL_BWD_MODE.
    from ..carafe import carafe_tail_bwd_manual, carafe_with_classifier
    from ..carafe import carafe_with_classifier_nc

    mode = _TAIL_BWD_MODE
    if mode == "auto":
        mode = "autodiff"

    # CPU XLA's DotThunk has no BF16 x BF16 = F32 instantiation; the
    # transposed tap-einsums the vjps emit hit exactly that combo when this
    # backward is compiled in isolation. Upcast on CPU (test backend only —
    # TPU keeps the bf16 MXU dots).
    upcast = jax.default_backend() == "cpu"
    dtypes = [r.dtype for r in residuals]
    if upcast:
        residuals = tuple(r.astype(jnp.float32) for r in residuals)
        g = g.astype(jnp.float32)

    if mode == "manual":
        grads = carafe_tail_bwd_manual(*residuals, g, up_factor=up_factor)
    else:
        comp = (carafe_with_classifier_nc if mode == "nc"
                else carafe_with_classifier)

        def ref(x, dk, db, ek, eb, ok, ob, ck):
            return comp(x, dk, db, ek, eb, ok, ob, ck,
                        kernel_size=3, up_factor=up_factor)

        grads = jax.vjp(ref, *residuals)[1](g)
    if upcast:
        return tuple(gr.astype(dt) for gr, dt in zip(grads, dtypes))
    return tuple(grads)


carafe_tail.defvjp(_tail_fwd, _tail_bwd)
