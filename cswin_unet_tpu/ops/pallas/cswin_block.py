"""Fused CSWin transformer BLOCK Pallas kernel.

One grid program = G batch images = one whole CSWinBlock:

    LN1 (f32 stats) -> qkv matmul (MXU) -> two stripe-attention branches
    (windowing, merged-window softmax(QKᵀ)V, windowed LePE — all in VMEM)
    -> proj matmul -> [drop-path] -> residual -> LN2 -> MLP (matmul,
    exact-erf GELU, matmul) -> [drop-path] -> residual

HBM traffic collapses to one read of x (+xᵀ) + the (small) parameters and
one write of the output; the composed path (flax CSWinBlock) touches HBM
~12 times per block. Intra-block ablation at stage-1 geometry showed XLA
spends 7.8 ms/block at bs128 where the matmul roofline is <1 ms
(scripts/ablate_block.py breaks down where the kernel's time goes).

Two kernel variants: ``_block_kernel_xt`` (default for dual-branch blocks)
receives the XLA-transposed image and computes the vertical branch
transpose-free; ``_block_kernel`` is the single-input fallback and the
last-stage (full-window) path. Training uses the same kernels with
per-sample drop-path multipliers as inputs; the custom_vjp backward
re-runs the XLA composition for gradients.

Numerics mirror the flax composition: LN statistics in f32, matmul
accumulation f32 (cast to the activation dtype between ops), exact erf
GELU, block-diagonal window merging is exact (masked probs are exp(-1e9)).
"""

from __future__ import annotations

import functools

import jax
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf_as(z):
    """Abramowitz-Stegun 7.1.26 rational erf (|err| <= 1.5e-7 — far below
    bf16 resolution); Mosaic lowers neither erf nor erfc."""
    sign = jnp.sign(z)
    za = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * za)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
           + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-za * za))


# Degree-16 power-basis coefficients on t = 2 z / B^2 - 1, z = x^2, for
# erf(x)/x on [0, 3.92] (scripts/fit_erf_poly.py). f32 Horner max abs err
# 1.67e-7 over the whole line — same floor as A&S 7.1.26 — with no exp and
# no divide (both multi-pass transcendentals on the VPU).
_ERF_B = 3.92
_ERF_POLY_P = (
    3.6073682140e-01, -1.8010857031e-01, 1.3408319547e-01,
    -1.0918152164e-01, 9.0626834383e-02, -7.3993784239e-02,
    5.8147685767e-02, -4.3565802707e-02, 3.0706313192e-02,
    -1.9669507476e-02, 1.1993957703e-02, -8.0981929467e-03,
    4.6074234714e-03, -1.0961954582e-03, 4.0654422314e-04,
    -9.2498532863e-04, 4.3182910118e-04,
)

# erf formulation mode: "auto", "poly", "as". Experiments monkeypatch this.
_ERF_MODE = "auto"


def _erf(z):
    """erf with |err| <= 1.7e-7. Routing (scripts/exp_sm2d.py erf, bs128
    whole-block chains): the clamped odd polynomial (pure FMAs) beats the
    A&S formula (exp + divide) everywhere the MLP is a visible share —
    stage 1 is the big win (the 4C-wide GELU hidden dominates its VPU
    time). Clamping at |x| = 3.92 is exact to f32: erfc(3.92) = 3e-8."""
    if _ERF_MODE == "as":
        return _erf_as(z)
    zc = jnp.clip(z, -_ERF_B, _ERF_B)
    t = zc * zc * (2.0 / (_ERF_B * _ERF_B)) - 1.0
    acc = t * _ERF_POLY_P[-1] + _ERF_POLY_P[-2]
    for pk in _ERF_POLY_P[-3::-1]:
        acc = acc * t + pk
    return zc * acc


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


def _shift_zero(x, di, dj):
    """Zero-fill shift of (n, h, w, C) over (h, w) via static pad+concat
    (bf16-friendly; circular rolls lower only in f32). Returns None when the
    shift leaves the window entirely."""
    n, h, w, c = x.shape
    if abs(di) >= h or abs(dj) >= w:
        return None
    if di:
        pad = jnp.zeros((n, abs(di), w, c), x.dtype)
        x = (jnp.concatenate([pad, x[:, :-di]], axis=1) if di > 0
             else jnp.concatenate([x[:, -di:], pad], axis=1))
    if dj:
        pad = jnp.zeros((n, h, abs(dj), c), x.dtype)
        x = (jnp.concatenate([pad, x[:, :, :-dj]], axis=2) if dj > 0
             else jnp.concatenate([x[:, :, -dj:], pad], axis=2))
    return x


def _lepe_flat(c: int) -> bool:
    """Measured routing for the sp_h >= 2 LePE formulation (scripts/
    exp_lepe.py, bs128 whole-block chains, xt kernel): the flattened
    row-shift form wins everywhere — stage 2 (c=64) 2.53 -> 1.95 ms/block,
    stage 3 (c=128) 1.22 -> 1.02 — the 4D form's per-tap ops on tiny
    (sp_w, c) trailing tiles cost more than the flat form's six extra
    boundary-mask FMAs. (Inside the FOLD kernel the flat form loses at
    stage 3 — 1.08 -> 1.21 — the in-kernel qkv_v transpose layout fights
    the flat reshapes; but xt+flat beats fold+anything, so fold routing
    is off and this stays unconditional.)"""
    return True


def _lepe_windows_2d(vw, lk, lb, swap=False):
    """Depthwise 3x3 LePE on WINDOWED v, computed on the FULLY-FLATTENED
    (n·L, C) view: every tap is ONE 2-D sublane concat shift of the whole
    window stack (vs the 3-D form's per-window shift whose (L, C) trailing
    tile pads L=98 -> 104 sublanes and re-issues per window). Rows pulled
    across a window boundary by the flat shift are exactly the rows whose
    in-window validity mask is zero — (i-di, j-dj) in-range implies the
    source lies in the SAME window — so masking is unchanged. Same math as
    ``_lepe_windows``."""
    n, sp_h, sp_w, c = vw.shape
    dt = vw.dtype
    L = sp_h * sp_w
    v2 = vw.reshape(n * L, c)
    rr = jax.lax.broadcasted_iota(jnp.int32, (n * L, 1), 0) % L
    ii = rr // sp_w
    jj = rr % sp_w
    acc = v2 * lk[1, 1].astype(dt)
    for di in (-1, 0, 1):
        if abs(di) >= sp_h:
            continue
        for dj in (-1, 0, 1):
            if (di == 0 and dj == 0) or abs(dj) >= sp_w:
                continue
            d = di * sp_w + dj
            if d > 0:
                s = jnp.concatenate([v2[:d] * 0, v2[:-d]], 0)
            else:
                s = jnp.concatenate([v2[-d:], v2[d:] * 0], 0)
            tap = (lk[1 - dj, 1 - di] if swap else lk[1 - di, 1 - dj]
                   ).astype(dt)
            ok = ((ii - di >= 0) & (ii - di < sp_h)
                  & (jj - dj >= 0) & (jj - dj < sp_w)).astype(dt)
            acc += s * (ok * tap)
    return (acc + lb.astype(dt)).reshape(vw.shape)


# LePE formulation mode: "auto" (measured routing), "3d", "2d". Experiments
# monkeypatch this to A/B the flat-3D vs fully-flattened-2D tap shifts.
_LEPE_MODE = "auto"

# MXU-matmul LePE mode: "auto" (measured routing), "mm", "shift".
_LEPE_MM_MODE = "auto"
# Backward-pass override: same values; "auto" defers to its own rule.
_LEPE_MM_BWD_MODE = "auto"


def _lepe_mm_route(sp_h: int, sp_w: int, c: int) -> bool:
    """Measured routing for the matmul-LePE FORWARD (post-dot-weight
    small-dots form — the round-3 pre-weighted big-dot form crashed the
    XLA:TPU compiler in-situ; bisected in scripts/exp_mm_bisect{,2}.py).

    In-situ whole-block chains (scripts/exp_lepe_mm2.py fwd, bs128, real
    chip): stage 2 (2x28, c=64) 2.296 -> 1.780 ms WIN; stage 4 full
    window (7x7, c=512) 0.657 -> 0.645 marginal win; stage 3 (7x14,
    c=128) 1.000 -> 1.317 LOSS (L=98 batched tap-dots under-fill the
    MXU); stage 1 row conv (1x56, c=32) 4.527 -> 5.002 LOSS (c=32 wastes
    3/4 of the lane width). Isolated-kernel numbers (exp_lepe_mm.py) said
    mm wins everywhere — they do not transfer in-situ; route on the
    in-situ chains only.

    Round-5 extension at the TRUE base-384 geometries (exp_lepe_mm2.py
    fwd, MM_B=32, 2026-08-21): 384-s2 (2x48, c=96 branch) 2.748 -> 2.561
    ms WIN — the sp_h == 2 stripe class keeps winning past the 224-fit
    L <= 56 cutoff (its At matrices stay narrow-banded and the c-lanes
    full), while the sp_h >= 7 classes (224-s3 L=98 measured loss;
    384-s3 L=288 dense-inflation 256x) do not. Rule: small windows
    (L <= 56) or the two-row stripe class up to L = 96."""
    if _LEPE_MM_MODE != "auto":
        return _LEPE_MM_MODE == "mm"
    L = sp_h * sp_w
    return sp_h >= 2 and (L <= 56 or (sp_h == 2 and L <= 96))


def _lepe_mm_route_bwd(sp_h: int, sp_w: int, c: int) -> bool:
    """Measured routing for the matmul-LePE BACKWARD (same shape rule the
    forward route landed on). In-situ fused-bwd chains at the train batch
    (scripts/exp_lepe_mm2.py bwd, MM_B=24, real chip, 2026-08-21): stage 2
    (2x28, L=56) 1.329 -> 1.063 ms WIN (the roll-form's f32 cotangent
    rolls + masks are the costly piece the At-dots replace); stage 3
    (7x14, L=98) 0.524 -> 0.681 ms LOSS (the L^2 At-dot batch under-fills
    the MXU past L=56, exactly as in the forward). Rule: sp_h >= 2 and
    L <= 56 — mm at the stage-2 window class, rolls elsewhere. The mm bwd
    is f32-exact vs the composed vjp (tests/test_fused_block.py interpret
    oracles); both lowerings are gate-pinned (bench.py bwd_mode_unit)."""
    if _LEPE_MM_BWD_MODE != "auto":
        return _LEPE_MM_BWD_MODE == "mm"
    return sp_h >= 2 and sp_h * sp_w <= 56


def _lepe_2d_route(sp_h: int, L: int) -> bool:
    """Measured routing for the 2-D flattened LePE (scripts/exp_sm2d.py,
    bs128 whole-block chains): wins at every dual-branch geometry — stage 1
    4.31 -> 4.19 ms, stage 2 1.89 -> 1.83, stage 3 1.06 -> 0.98, 48x48
    2.63 -> 2.49, 96x96 13.20 -> 12.84 — the per-window 3-D shifts pay both
    sublane padding (98 -> 104) and per-op issue overhead that the single
    2-D concat does not. Last-stage full windows (7x7 / 12x12) keep the 3-D
    form: sp_h == H there and the row-conv/flat split doesn't apply the
    same way (0.58 ms measured equal)."""
    if _LEPE_MODE != "auto":
        return _LEPE_MODE == "2d"
    return True


def _lepe_windows(vw, lk, lb, swap=False):
    """Depthwise 3x3 LePE on WINDOWED v (n, sp_h, sp_w, C) -> same shape.

    Window confinement is free — the window boundaries ARE the tensor
    boundaries of dims 1/2, so sp_h >= 2 uses zero-fill concat shifts in the
    activation dtype (vs the image-layout path's f32 rolls + iota masks).
    sp_h == 1 windows degenerate to a 3-tap row conv, done with f32 rolls +
    boundary masks — Mosaic rejects concat shifts when a unit dim sits next
    to the tiled dims ("offset mismatch on non-concat dimension").
    ``swap=True`` pairs shifts with transposed taps, for branches computed
    in transposed image coordinates."""
    n, sp_h, sp_w, c = vw.shape
    # Accumulate in the ACTIVATION dtype: under f32 activations (the
    # interpret-mode parity tests) this is exact; under bf16 it halves the
    # register traffic of the 9 (or 3) tap FMAs and drops the per-tap
    # upcast pass that made LePE the single costliest branch piece
    # (corrected exp_h.py: 0.4-0.66 ms/block of a 1.1-4.8 ms block). The
    # bf16 rounding of a 9-term positional-bias sum is far inside the
    # bf16 tolerance the composed-oracle comparison allows (0.06).
    dt = vw.dtype
    if _lepe_mm_route(sp_h, sp_w, c):
        return _lepe_windows_mm(vw, lk, lb, swap=swap)
    if _lepe_2d_route(sp_h, sp_h * sp_w):
        return _lepe_windows_2d(vw, lk, lb, swap=swap)
    if sp_h == 1:
        # 3-tap row conv via SUBLANE concat shifts on the 3-D view (no unit
        # dim next to the tiled dims, so Mosaic's concat lowering applies).
        # Boundary pad is DERIVED from the source (v3[:, :1] * 0), the
        # layout-match trick _hb_tile documents.
        v3 = vw.reshape(n, sp_w, c)
        acc = v3 * lk[1, 1].astype(dt)
        for dj in (-1, 1):
            tap = lk[1 - dj, 1] if swap else lk[1, 1 - dj]
            s = (jnp.concatenate([v3[:, :1] * 0, v3[:, :-1]], 1) if dj > 0
                 else jnp.concatenate([v3[:, 1:], v3[:, :1] * 0], 1))
            acc += s * tap.astype(dt)
        return (acc + lb.astype(dt)).reshape(vw.shape)
    if not _lepe_flat(c):
        acc = None
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                s = _shift_zero(vw, di, dj)
                if s is None:
                    continue
                tap = lk[1 - dj, 1 - di] if swap else lk[1 - di, 1 - dj]
                term = s * tap.astype(dt)
                acc = term if acc is None else acc + term
        return acc + lb.astype(dt)
    # sp_h >= 2, narrow c: FLATTENED row-shift formulation. The 4D
    # (n, sp_h, sp_w, c) zero-fill concat shifts run every tap on tiny
    # (sp_w, c) trailing tiles (huge per-op overhead at e.g. (28, 64));
    # here every tap is ONE sublane shift of the 3D (n, sp_h·sp_w, c) view
    # by di·sp_w + dj rows (same low-overhead layout the sp_h == 1 path
    # uses). dj == 0 taps need no mask — the derived zero pad lands exactly
    # on the rows whose source row is outside the window; dj != 0 taps mask
    # the sp_w-boundary rows via a constant iota row-validity mask folded
    # into the per-channel tap (one FMA per tap either way).
    L = sp_h * sp_w
    v2 = vw.reshape(n, L, c)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) % sp_w
    acc = v2 * lk[1, 1].astype(dt)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            d = di * sp_w + dj
            if d > 0:
                s = jnp.concatenate([v2[:, :d] * 0, v2[:, :-d]], 1)
            else:
                s = jnp.concatenate([v2[:, -d:], v2[:, d:] * 0], 1)
            tap = (lk[1 - dj, 1 - di] if swap else lk[1 - di, 1 - dj]
                   ).astype(dt)
            if dj:
                ok = ((jj - dj >= 0) & (jj - dj < sp_w)).astype(dt)
                acc += s * (ok * tap)
            else:
                acc += s * tap
    return (acc + lb.astype(dt)).reshape(vw.shape)


def _lepe_mm_taps(sp_h: int, sp_w: int):
    """The in-window 3x3 tap offsets (row conv when sp_h == 1)."""
    return [(di, dj) for di in (-1, 0, 1) if abs(di) < sp_h
            for dj in (-1, 0, 1) if abs(dj) < sp_w]


def _lepe_mm_At(sp_h: int, sp_w: int, di: int, dj: int, dt):
    """Constant 0/1 shift+boundary matrix for ONE LePE tap: At (L, L) with
    At[r, r - o] = 1 iff the tap's source pixel for row r lies inside the
    window (o = di*sp_w + dj). Built from iota so Mosaic sees no
    materialized array constant; each ROW has at most one nonzero, so
    At @ v is a per-row gather with no accumulation error — but default
    TPU matmul precision still rounds the v OPERAND to bf16, so under f32
    activations the consuming dots take Precision.HIGHEST to stay exact."""
    L = sp_h * sp_w
    rr = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    pp = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ii = rr // sp_w
    jj = rr % sp_w
    ok = ((pp == rr - (di * sp_w + dj))
          & (ii - di >= 0) & (ii - di < sp_h)
          & (jj - dj >= 0) & (jj - dj < sp_w))
    return ok.astype(dt)


def _lepe_windows_mm(vw, lk, lb, swap=False):
    """Depthwise 3x3 LePE as nt small batched MXU dots — zero shifts.

    The shift formulations (flat/2-D above) pay 9 non-8-aligned sublane
    concat shifts on the VPU: 0.746 ms at the stage-3 branch geometry
    where the whole attention core is 0.153 ms (scripts/exp_attn3.py).
    Here each tap's shift AND boundary mask live in a constant 0/1 matrix
    At (L, L): out = sum_t (At @ v2) * w_t + b. The channel weight
    multiplies AFTER the dot — the round-3 single-big-dot form
    (A (L, nt*L) @ concat of nt pre-weighted copies) fed a ref-derived
    elementwise product into a batched dot_general, which aborts the
    XLA:TPU compiler inside the fused kernel at every geometry
    ("Check failed: limits[i] <= dim(i)"; bisected in
    scripts/exp_mm_bisect.py / exp_mm_bisect2.py — a const-lk dot
    compiles, a single ref-weighted tap does not, and the post-dot
    multiply form compiles clean). FLOPs are identical
    (nt·L²·c == L·(nt·L)·c), the dense contraction still inflates FLOPs
    ~L/9x over the stencil, but rides the MXU instead of the VPU. The
    center tap is the identity gather, so it skips the dot. f32
    accumulation: taps and bias are applied in f32; the one-hot dot rows
    add no accumulation error, and under f32 activations (oracle runs)
    the dots take Precision.HIGHEST so the v operand is not bf16-rounded
    by the default TPU matmul precision."""
    n, sp_h, sp_w, c = vw.shape
    dt = vw.dtype
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
    L = sp_h * sp_w
    v2 = vw.reshape(n, L, c)
    out = None
    for di, dj in _lepe_mm_taps(sp_h, sp_w):
        w = (lk[1 - dj, 1 - di] if swap else lk[1 - di, 1 - dj]
             ).astype(jnp.float32)
        if di == 0 and dj == 0:
            term = v2.astype(jnp.float32) * w
        else:
            At = jnp.broadcast_to(
                _lepe_mm_At(sp_h, sp_w, di, dj, dt)[None], (n, L, L))
            term = jax.lax.dot_general(
                At, v2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec) * w
        out = term if out is None else out + term
    return (out + lb.astype(jnp.float32)).astype(dt).reshape(vw.shape)


def _lepe_windows_dual_mm(vw, lk0, lb0, lk1, lb1, n):
    """Branch-stacked MXU LePE (see ``_lepe_windows_mm``): the per-tap
    channel weight is where-selected per row group (rows [0, n) vertical
    branch — transposed lk0 taps; [n, 2n) horizontal — lk1) and applied
    AFTER the tap gather-dot; the constant At matrices are
    branch-independent. Same math as ``_lepe_windows_dual``."""
    n2, sp_h, sp_w, c = vw.shape
    dt = vw.dtype
    L = sp_h * sp_w
    gsel = jax.lax.broadcasted_iota(jnp.int32, (n2, 1, 1), 0) < n
    v2 = vw.reshape(n2, L, c)

    def tap(di, dj):
        tv = jnp.broadcast_to(lk0[1 - dj, 1 - di].astype(jnp.float32),
                              (n2, 1, c))
        th = jnp.broadcast_to(lk1[1 - di, 1 - dj].astype(jnp.float32),
                              (n2, 1, c))
        return jnp.where(gsel, tv, th)

    out = None
    prec = (jax.lax.Precision.HIGHEST if dt == jnp.float32 else None)
    for di, dj in _lepe_mm_taps(sp_h, sp_w):
        if di == 0 and dj == 0:
            term = v2.astype(jnp.float32) * tap(0, 0)
        else:
            At = jnp.broadcast_to(
                _lepe_mm_At(sp_h, sp_w, di, dj, dt)[None], (n2, L, L))
            term = jax.lax.dot_general(
                At, v2, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
                precision=prec) * tap(di, dj)
        out = term if out is None else out + term
    bias = jnp.where(
        gsel, jnp.broadcast_to(lb0.astype(jnp.float32), (n2, 1, c)),
        jnp.broadcast_to(lb1.astype(jnp.float32), (n2, 1, c)))
    return (out + bias).astype(dt).reshape(vw.shape)


def _lepe_windows_dual(vw, lk0, lb0, lk1, lb1, n):
    """Flat row-shift LePE on BRANCH-STACKED windows (2n, sp_h, sp_w, C):
    rows [0, n) are the vertical branch (transposed coordinates — swapped
    lk0 taps), rows [n, 2n) the horizontal branch (lk1 taps). One shift +
    FMA pass serves both branches; the per-tap channel vector is selected
    per row group (a (2n, 1, C) where — sublane-only broadcast). Same math
    as two ``_lepe_windows`` calls (flat/row-conv formulations)."""
    n2, sp_h, sp_w, c = vw.shape
    dt = vw.dtype
    gsel = jax.lax.broadcasted_iota(jnp.int32, (n2, 1, 1), 0) < n

    if _lepe_mm_route(sp_h, sp_w, c):
        return _lepe_windows_dual_mm(vw, lk0, lb0, lk1, lb1, n)

    def tap(di, dj):
        tv = jnp.broadcast_to(lk0[1 - dj, 1 - di].astype(dt), (n2, 1, c))
        th = jnp.broadcast_to(lk1[1 - di, 1 - dj].astype(dt), (n2, 1, c))
        return jnp.where(gsel, tv, th)

    bias = jnp.where(gsel, jnp.broadcast_to(lb0.astype(dt), (n2, 1, c)),
                     jnp.broadcast_to(lb1.astype(dt), (n2, 1, c)))
    if sp_h == 1:
        # 3-tap row conv (see _lepe_windows sp_h == 1).
        v3 = vw.reshape(n2, sp_w, c)
        acc = v3 * tap(0, 0)
        for dj in (-1, 1):
            s = (jnp.concatenate([v3[:, :1] * 0, v3[:, :-1]], 1) if dj > 0
                 else jnp.concatenate([v3[:, 1:], v3[:, :1] * 0], 1))
            acc += s * tap(0, dj)
        return (acc + bias).reshape(vw.shape)
    # Flattened row-shift formulation (see _lepe_windows sp_h >= 2).
    L = sp_h * sp_w
    v2 = vw.reshape(n2, L, c)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) % sp_w
    acc = v2 * tap(0, 0)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            d = di * sp_w + dj
            if d > 0:
                s = jnp.concatenate([v2[:, :d] * 0, v2[:, :-d]], 1)
            else:
                s = jnp.concatenate([v2[:, -d:], v2[:, d:] * 0], 1)
            t = tap(di, dj)
            if dj:
                ok = ((jj - dj >= 0) & (jj - dj < sp_w)).astype(dt)
                acc += s * (ok * t)
            else:
                acc += s * t
    return (acc + bias).reshape(vw.shape)


def _lepe_windows_dual_cs(vw, lkc, lbc):
    """CHANNEL-stacked dual-branch LePE: input (n, sp_h, sp_w, 2c) whose
    first c lanes are the vertical branch and last c lanes the horizontal
    branch. ``lkc`` is the PRE-MERGED (3, 3, 2c) tap kernel
    (concat(lk0ᵀ-taps, lk1) — built in XLA by ``_fused_block_fwd``, the
    vertical swap folded into the tap-grid transpose); ``lbc`` the merged
    (2c,) bias. Where the batch-stacked form (``_lepe_windows_dual``) runs
    every shift+FMA over (2n, ..., c) tensors at c/128 lane fill, this
    runs them once over (n, ..., 2c) — half the VPU issues at double the
    lane utilisation (c = 32 at stage 1: 1/4 -> 1/2 fill).

    The tap merge must happen OUTSIDE the kernel: in-kernel per-tap
    concats crash the XLA:TPU compiler at the 56x56 geometry — the 1-D
    (c,)+(c,) form SIGABRTs it, the 2-D (1, c)+(1, c) form exits 1
    (scripts/exp_cs_bisect.py: k_concat/k_slice compile clean, k_taps
    fails) — while the plain 1-D-row broadcast_to below is the
    known-good pattern the bs form uses. Same math as
    ``_lepe_windows_dual`` up to stacking."""
    n, sp_h, sp_w, c2 = vw.shape
    dt = vw.dtype

    def tap(di, dj):
        return jnp.broadcast_to(lkc[1 - di, 1 - dj].astype(dt), (n, 1, c2))

    bias = jnp.broadcast_to(lbc.astype(dt), (n, 1, c2))
    if sp_h == 1:
        # 3-tap row conv (see _lepe_windows sp_h == 1).
        v3 = vw.reshape(n, sp_w, c2)
        acc = v3 * tap(0, 0)
        for dj in (-1, 1):
            s = (jnp.concatenate([v3[:, :1] * 0, v3[:, :-1]], 1) if dj > 0
                 else jnp.concatenate([v3[:, 1:], v3[:, :1] * 0], 1))
            acc += s * tap(0, dj)
        return (acc + bias).reshape(vw.shape)
    # Flattened row-shift formulation (see _lepe_windows sp_h >= 2).
    L = sp_h * sp_w
    v2 = vw.reshape(n, L, c2)
    jj = jax.lax.broadcasted_iota(jnp.int32, (L, 1), 0) % sp_w
    acc = v2 * tap(0, 0)
    for di in (-1, 0, 1):
        for dj in (-1, 0, 1):
            if di == 0 and dj == 0:
                continue
            d = di * sp_w + dj
            if d > 0:
                s = jnp.concatenate([v2[:, :d] * 0, v2[:, :-d]], 1)
            else:
                s = jnp.concatenate([v2[:, -d:], v2[:, d:] * 0], 1)
            t = tap(di, dj)
            if dj:
                ok = ((jj - dj >= 0) & (jj - dj < sp_w)).astype(dt)
                acc += s * (ok * t)
            else:
                acc += s * t
    return (acc + bias).reshape(vw.shape)


def _ln_bwd(x, dy, scale):
    """LayerNorm backward, recomputing the f32 statistics from ``x``.
    x: (N, C) activation dtype; dy: (N, C) f32. Returns (dx f32, dscale f32,
    dbias f32)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    rstd = jax.lax.rsqrt(var + 1e-5)
    xhat = (xf - mu) * rstd
    dxhat = dy * scale.astype(jnp.float32)
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    dx = rstd * (dxhat - m1 - xhat * m2)
    dscale = jnp.sum(dy * xhat, axis=0)
    dbias = jnp.sum(dy, axis=0)
    return dx, dscale, dbias


def _wgrad(a, b):
    """dW = aᵀ @ b with f32 accumulation: a (N, M), b (N, K) -> (M, K)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _gelu_bwd(hf, dg):
    """d/dh of the exact-erf GELU h·Φ(h): Φ(h) + h·φ(h). hf, dg f32."""
    phi = 0.5 * (1.0 + _erf(hf * (2.0 ** -0.5)))
    pdf = jnp.exp(-0.5 * hf * hf) * np.float32(1.0 / np.sqrt(2.0 * np.pi))
    return dg * (phi + hf * pdf)


def _attn_windows_bwd(q, k, v, da, heads, scale, merge=None):
    """Backward of ``_attn_windows``: recompute P per head, then the
    standard softmax-attention vjp. q,k,v activation dtype (n, L, C);
    da f32 (n, L, C). Returns (dq, dk, dv) f32."""
    n, L, C = q.shape
    d = C // heads
    m = _window_merge(n, L) if merge is None else merge
    mask = None
    if m > 1:
        q = q.reshape(n // m, m * L, C)
        k = k.reshape(n // m, m * L, C)
        v = v.reshape(n // m, m * L, C)
        da = da.reshape(n // m, m * L, C)
        row = jax.lax.broadcasted_iota(jnp.int32, (m * L, m * L), 0) // L
        col = jax.lax.broadcasted_iota(jnp.int32, (m * L, m * L), 1) // L
        mask = jnp.where(row == col, 0.0, -1e9).astype(jnp.float32)[None]
    dqs, dks, dvs = [], [], []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, :, sl] * scale
        kh = k[:, :, sl]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if mask is not None:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        pb = p.astype(q.dtype)
        dah = da[:, :, sl].astype(q.dtype)
        # dP = dA Vᵀ ; dV = Pᵀ dA
        dp = jax.lax.dot_general(dah, v[:, :, sl],
                                 (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dvs.append(jax.lax.dot_general(pb, dah, (((1,), (1,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32))
        # dS = P ∘ (dP − rowsum(dP ∘ P)); masked cols have P == 0 → dS == 0
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(q.dtype)
        dqs.append(jax.lax.dot_general(dsb, kh, (((2,), (1,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)
                   * scale)
        dks.append(jax.lax.dot_general(dsb, qh, (((1,), (1,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32))
    cat = lambda xs: (xs[0] if heads == 1 else jnp.concatenate(xs, -1))
    return (cat(dqs).reshape(n, L, C), cat(dks).reshape(n, L, C),
            cat(dvs).reshape(n, L, C))


def _lepe_windows_bwd_mm(vw, da, lk, swap=False):
    """MXU-dot backward of the LePE (see ``_lepe_windows_mm``): per tap t,
    dv += (Atᵀ @ da) · w_t (channel scaling commutes with the row gather,
    so the weight multiplies AFTER the dot — the pre-multiplied form
    aborts the XLA:TPU compiler, scripts/exp_mm_bisect2.py) and
    dlk[t] = Σ (At @ v) ⊙ da. Center tap is the identity gather (no dot).
    Same returns as ``_lepe_windows_bwd``."""
    n, sp_h, sp_w, c = vw.shape
    L = sp_h * sp_w
    # Same precision rule as the forward mm form: default TPU matmul
    # precision bf16-rounds the v/da operands, so the f32-activation
    # oracle runs take Precision.HIGHEST.
    prec = (jax.lax.Precision.HIGHEST if vw.dtype == jnp.float32 else None)
    dlb = jnp.sum(da, axis=(0, 1, 2))
    v2 = vw.reshape(n, L, c)
    da2 = da.reshape(n, L, c)
    row = jax.lax.broadcasted_iota(jnp.int32, (9, c), 0)
    dlk = jnp.zeros((9, c), jnp.float32)
    dv = None
    for di, dj in _lepe_mm_taps(sp_h, sp_w):
        idx = (1 - dj, 1 - di) if swap else (1 - di, 1 - dj)
        w = lk[idx[0], idx[1]].astype(jnp.float32)
        if di == 0 and dj == 0:
            gat = v2.astype(jnp.float32)
            dvt = da2 * w
        else:
            At = _lepe_mm_At(sp_h, sp_w, di, dj, vw.dtype)
            gat = jax.lax.dot_general(
                jnp.broadcast_to(At[None], (n, L, L)), v2,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
            # Atᵀ @ da: contract At's ROW dim with da's row dim.
            dvt = jax.lax.dot_general(
                jnp.broadcast_to(At.astype(jnp.float32)[None], (n, L, L)),
                da2, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec) * w
        g = jnp.sum(gat * da2, axis=(0, 1))
        dlk = dlk + jnp.where(row == idx[0] * 3 + idx[1], 1.0, 0.0) * g[None, :]
        dv = dvt if dv is None else dv + dvt
    return dv.reshape(vw.shape), dlk, dlb


def _lepe_windows_bwd_dual_mm(vw, da, lk0, lk1, n):
    """MXU-dot backward of the branch-stacked LePE (see
    ``_lepe_windows_bwd_dual`` / ``_lepe_windows_dual_mm``). Same returns
    as ``_lepe_windows_bwd_dual``."""
    n2, sp_h, sp_w, c = vw.shape
    L = sp_h * sp_w
    prec = (jax.lax.Precision.HIGHEST if vw.dtype == jnp.float32 else None)
    dlb0 = jnp.sum(da[:n], axis=(0, 1, 2))
    dlb1 = jnp.sum(da[n:], axis=(0, 1, 2))
    v2 = vw.reshape(n2, L, c)
    da2 = da.reshape(n2, L, c)
    gsel = jax.lax.broadcasted_iota(jnp.int32, (n2, 1, 1), 0) < n
    row = jax.lax.broadcasted_iota(jnp.int32, (9, c), 0)
    dlk0 = jnp.zeros((9, c), jnp.float32)
    dlk1 = jnp.zeros((9, c), jnp.float32)
    dv = None
    for di, dj in _lepe_mm_taps(sp_h, sp_w):
        i0 = (1 - dj, 1 - di)  # vertical: transposed-coordinate taps
        i1 = (1 - di, 1 - dj)
        tap = jnp.where(
            gsel,
            jnp.broadcast_to(lk0[i0[0], i0[1]].astype(jnp.float32),
                             (n2, 1, c)),
            jnp.broadcast_to(lk1[i1[0], i1[1]].astype(jnp.float32),
                             (n2, 1, c)))
        if di == 0 and dj == 0:
            gat = v2.astype(jnp.float32)
            dvt = da2 * tap
        else:
            At = _lepe_mm_At(sp_h, sp_w, di, dj, vw.dtype)
            gat = jax.lax.dot_general(
                jnp.broadcast_to(At[None], (n2, L, L)), v2,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec)
            dvt = jax.lax.dot_general(
                jnp.broadcast_to(At.astype(jnp.float32)[None], (n2, L, L)),
                da2, (((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32, precision=prec) * tap
        prod = gat * da2
        g0 = jnp.sum(prod[:n], axis=(0, 1))
        g1 = jnp.sum(prod[n:], axis=(0, 1))
        dlk0 = dlk0 + jnp.where(row == i0[0] * 3 + i0[1], 1.0, 0.0) * g0[None, :]
        dlk1 = dlk1 + jnp.where(row == i1[0] * 3 + i1[1], 1.0, 0.0) * g1[None, :]
        dv = dvt if dv is None else dv + dvt
    return dv.reshape(vw.shape), dlk0, dlb0, dlk1, dlb1


def _lepe_windows_bwd(vw, da, lk, swap=False):
    """Backward of ``_lepe_windows``. vw activation dtype (n, sp_h, sp_w, C);
    da f32 same shape. Returns (dvw f32, dlk (9, C) f32 in row-major
    (a, b) tap order, dlb (C,) f32).

    Shifts are f32 circular rolls + in-bounds masks (the _lepe_full
    formulation) — Mosaic's concat lowering is unreliable for the
    dot-derived f32 cotangents, rolls always lower."""
    n, sp_h, sp_w, c = vw.shape
    if _lepe_mm_route_bwd(sp_h, sp_w, c):
        return _lepe_windows_bwd_mm(vw, da, lk, swap=swap)
    dlb = jnp.sum(da, axis=(0, 1, 2))
    dtaps = {}
    vf = vw.astype(jnp.float32)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (sp_h, sp_w), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (sp_h, sp_w), 1)

    def roll2(t, di, dj):
        if di:
            t = pltpu.roll(t, di % sp_h, 1)
        if dj:
            t = pltpu.roll(t, dj % sp_w, 2)
        return t

    dv = jnp.zeros(vw.shape, jnp.float32)
    for di in (-1, 0, 1):
        if abs(di) >= sp_h:
            continue
        for dj in (-1, 0, 1):
            if abs(dj) >= sp_w:
                continue
            idx = (1 - dj, 1 - di) if swap else (1 - di, 1 - dj)
            ok = ((r_i - di >= 0) & (r_i - di < sp_h)
                  & (c_i - dj >= 0) & (c_i - dj < sp_w))
            okf = ok.astype(jnp.float32)[None, :, :, None]
            dam = da * okf
            dtaps[idx] = jnp.sum(roll2(vf, di, dj) * dam, axis=(0, 1, 2))
            tap = lk[idx[0], idx[1]]
            dv = dv + roll2(dam, -di, -dj) * tap.astype(jnp.float32)
    # Assemble (9, C) tap grads without 1-row sublane concats (Mosaic
    # rejects them): row-select masks from iota + sublane broadcasts.
    row = jax.lax.broadcasted_iota(jnp.int32, (9, c), 0)
    dlk = jnp.zeros((9, c), jnp.float32)
    for (a, b), g in dtaps.items():
        dlk = dlk + jnp.where(row == a * 3 + b, 1.0, 0.0) * g[None, :]
    return dv, dlk, dlb


def _lepe_windows_bwd_dual(vw, da, lk0, lk1, n):
    """Backward of ``_lepe_windows_dual``: branch-stacked windows
    (2n, sp_h, sp_w, C) — rows [0, n) vertical (swapped lk0 taps), rows
    [n, 2n) horizontal (lk1). One roll pass per tap serves both branches;
    tap grads reduce per row group. Returns (dvw f32, dlk0 (9, C), dlb0,
    dlk1 (9, C), dlb1) — (9, C) in row-major (a, b) tap order."""
    n2, sp_h, sp_w, c = vw.shape
    if _lepe_mm_route_bwd(sp_h, sp_w, c):
        return _lepe_windows_bwd_dual_mm(vw, da, lk0, lk1, n)
    dlb0 = jnp.sum(da[:n], axis=(0, 1, 2))
    dlb1 = jnp.sum(da[n:], axis=(0, 1, 2))
    vf = vw.astype(jnp.float32)
    r_i = jax.lax.broadcasted_iota(jnp.int32, (sp_h, sp_w), 0)
    c_i = jax.lax.broadcasted_iota(jnp.int32, (sp_h, sp_w), 1)
    gsel = jax.lax.broadcasted_iota(jnp.int32, (n2, 1, 1, 1), 0) < n

    def roll2(t, di, dj):
        if di:
            t = pltpu.roll(t, di % sp_h, 1)
        if dj:
            t = pltpu.roll(t, dj % sp_w, 2)
        return t

    row = jax.lax.broadcasted_iota(jnp.int32, (9, c), 0)
    dv = jnp.zeros(vw.shape, jnp.float32)
    dlk0 = jnp.zeros((9, c), jnp.float32)
    dlk1 = jnp.zeros((9, c), jnp.float32)
    for di in (-1, 0, 1):
        if abs(di) >= sp_h:
            continue
        for dj in (-1, 0, 1):
            if abs(dj) >= sp_w:
                continue
            i0 = (1 - dj, 1 - di)  # vertical: transposed-coordinate taps
            i1 = (1 - di, 1 - dj)
            ok = ((r_i - di >= 0) & (r_i - di < sp_h)
                  & (c_i - dj >= 0) & (c_i - dj < sp_w))
            dam = da * ok.astype(jnp.float32)[None, :, :, None]
            prod = roll2(vf, di, dj) * dam
            g0 = jnp.sum(prod[:n], axis=(0, 1, 2))
            g1 = jnp.sum(prod[n:], axis=(0, 1, 2))
            dlk0 = dlk0 + jnp.where(row == i0[0] * 3 + i0[1], 1.0, 0.0) * g0[None, :]
            dlk1 = dlk1 + jnp.where(row == i1[0] * 3 + i1[1], 1.0, 0.0) * g1[None, :]
            tap = jnp.where(
                gsel,
                jnp.broadcast_to(lk0[i0[0], i0[1]].astype(jnp.float32),
                                 (n2, 1, 1, c)),
                jnp.broadcast_to(lk1[i1[0], i1[1]].astype(jnp.float32),
                                 (n2, 1, 1, c)))
            dv = dv + roll2(dam, -di, -dj) * tap
    return dv, dlk0, dlb0, dlk1, dlb1


def _hb_params(L: int, heads: int, d: int):
    """Head-block packing geometry for ``_attn_windows_hb``: returns
    (gh, S) — heads per block-dot and the 128-aligned padded segment
    width — or None where head-blocking cannot apply (single head per
    dot, or d not a divisor of the 128-lane MXU width)."""
    if d > 128 or 128 % d:
        return None
    gh = min(heads, 128 // d)
    if gh < 2:
        return None
    S = -(-L // 128) * 128
    return gh, S


def _attn_windows_hb(q, k, v, heads, scale, merge=None):
    """Head-block stripe attention: same math as ``_attn_windows`` but gh
    heads ride ONE pair of full-width MXU dots instead of gh narrow
    per-head dots whose d=32 contraction starves the 128-deep systolic
    array (and whose 32-offset lane slices force Mosaic relayouts).

    K and V are tiled block-diagonally along sublanes — segment g of
    (gh·S) sublanes holds head g's rows, everything off the head-diagonal
    zeroed — so

        S_all = Qg @ K_blkᵀ   (contraction gh·d = 128 lanes wide)
        out   = P @ V_blk     (contraction gh·S)

    computes every head's scores/outputs jointly; a per-segment softmax
    sits between. Invalid lanes (row padding, cross-window when windows
    are also merged) get -1e9 so their probabilities are exp(-1e9) == 0 —
    the exact block-diagonal scheme ``_attn_windows`` already uses for
    window merging. Outputs land directly in natural head-concatenated
    lane order; no per-head concat, no narrow lane slicing."""
    n0, L0, C2 = q.shape
    d = C2 // heads
    m = _window_merge(n0, L0) if merge is None else merge
    if m > 1:
        q = q.reshape(n0 // m, m * L0, C2)
        k = k.reshape(n0 // m, m * L0, C2)
        v = v.reshape(n0 // m, m * L0, C2)
    n, L = q.shape[0], m * L0
    gh, S = _hb_params(L, heads, d)
    ng = heads // gh
    Cg = gh * d

    blk, smask = _hb_masks(n, L, L0, Cg, d, gh, S, q.dtype)
    tile = functools.partial(_hb_tile, gh=gh, S=S, blk=blk)

    outs = []
    for g in range(ng):
        sl = slice(g * Cg, (g + 1) * Cg)
        qg = q[:, :, sl] * scale
        kb = tile(k[:, :, sl])
        vb = tile(v[:, :, sl])
        s = jax.lax.dot_general(qg, kb, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + smask
        if _sm_defer():
            # Deferred normalization: the P@V dot runs on the UNNORMALIZED
            # exp (values in [0, 1] — safe in bf16) and the per-row divide
            # moves to the (L, Cg) output — one multiply over Cg = gh·d
            # lanes instead of a divide+cast pass over the gh·S score
            # lanes (4x wider at d=32, S=128). Exact same math: the
            # denominator is a per-row constant through the linear dot.
            ps, rds = [], []
            for h in range(gh):
                seg = s[:, :, h * S : (h + 1) * S]
                e = jnp.exp(seg - jnp.max(seg, axis=-1, keepdims=True))
                rds.append(1.0 / jnp.sum(e, axis=-1, keepdims=True))
                ps.append(e.astype(q.dtype))
            p = ps[0] if gh == 1 else jnp.concatenate(ps, -1)
            ou = jax.lax.dot_general(p, vb, (((2,), (1,)), ((0,), (0,))),
                                     preferred_element_type=jnp.float32)
            rd = (rds[0] if gh == 1 else jnp.concatenate(
                [jnp.broadcast_to(r, r.shape[:2] + (d,)) for r in rds], -1))
            outs.append(ou * rd)
        else:
            p = _hb_softmax(s, gh, S).astype(q.dtype)
            outs.append(jax.lax.dot_general(
                p, vb, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
    out = outs[0] if ng == 1 else jnp.concatenate(outs, -1)
    return out.astype(q.dtype).reshape(n0, L0, C2)


def _hb_masks(n, L, L0, Cg, d, gh, S, dtype):
    """Constant masks for head-block attention: the block-diagonal K/V
    tiling keep-mask (gh·S, Cg) and the additive -1e9 score mask
    (L, gh·S) (padding + merged-window confinement)."""
    jj = jax.lax.broadcasted_iota(jnp.int32, (gh * S, Cg), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (gh * S, Cg), 1)
    blk = ((jj // S == cc // d) & (jj % S < L)).astype(dtype)
    ri = jax.lax.broadcasted_iota(jnp.int32, (L, gh * S), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (L, gh * S), 1)
    smask = jnp.where((ci % S < L) & (ri // L0 == (ci % S) // L0),
                      0.0, -1e9).astype(jnp.float32)
    return blk, smask


def _hb_tile(t, *, gh, S, blk):
    """(n, L, Cg) -> block-diagonal (n, gh·S, Cg): sublane-pad to S, stack
    gh copies, zero off the head-diagonal. The pad is DERIVED from ``t``
    (``t[:, :k] * 0``) rather than a fresh ``jnp.zeros`` — concatenating a
    freshly-materialized operand trips Mosaic's "result/input offset
    mismatch on non-concat dimension" at some G (layout mismatch between
    the zeros' natural layout and t's vpad-offset layout)."""
    L = t.shape[1]
    while t.shape[1] < S:
        k = min(S - t.shape[1], L)
        t = jnp.concatenate([t, t[:, :k] * 0], 1)
    if gh > 1:
        t = jnp.concatenate([t] * gh, 1)
    return t * blk


def _hb_softmax(s, gh, S):
    """Per-128-aligned-segment (= per-head) softmax over the lane dim of
    (n, L, gh·S) f32 scores."""
    ps = []
    for h in range(gh):
        seg = s[:, :, h * S : (h + 1) * S]
        seg = seg - jnp.max(seg, axis=-1, keepdims=True)
        e = jnp.exp(seg)
        ps.append(e / jnp.sum(e, axis=-1, keepdims=True))
    return ps[0] if gh == 1 else jnp.concatenate(ps, -1)


def _attn_windows_bwd_hb(q, k, v, da, heads, scale, merge=None):
    """Backward of ``_attn_windows_hb`` (same math as ``_attn_windows_bwd``
    — recompute P, softmax-attention vjp — but with the head-block wide
    dots: 5 full-width dots per head-group instead of 5 narrow dots per
    head). Returns (dq, dk, dv) f32."""
    n0, L0, C2 = q.shape
    d = C2 // heads
    m = _window_merge(n0, L0) if merge is None else merge
    if m > 1:
        q = q.reshape(n0 // m, m * L0, C2)
        k = k.reshape(n0 // m, m * L0, C2)
        v = v.reshape(n0 // m, m * L0, C2)
        da = da.reshape(n0 // m, m * L0, C2)
    n, L = q.shape[0], m * L0
    gh, S = _hb_params(L, heads, d)
    ng = heads // gh
    Cg = gh * d

    blk, smask = _hb_masks(n, L, L0, Cg, d, gh, S, q.dtype)
    cc = jax.lax.broadcasted_iota(jnp.int32, (L, Cg), 1)
    tile = functools.partial(_hb_tile, gh=gh, S=S, blk=blk)

    def untile(t_blk):
        # t_blk (n, gh·S, Cg) → (n, L, Cg): element (j, c) of the result
        # lives at sublane (c//d)·S + j of its head's segment.
        acc = None
        for h in range(gh):
            seg = t_blk[:, h * S : h * S + L, :]
            segm = seg * (cc // d == h).astype(seg.dtype)
            acc = segm if acc is None else acc + segm
        return acc

    dqs, dks, dvs = [], [], []
    for g in range(ng):
        sl = slice(g * Cg, (g + 1) * Cg)
        qg = q[:, :, sl] * scale
        kb = tile(k[:, :, sl])
        vb = tile(v[:, :, sl])
        s = jax.lax.dot_general(qg, kb, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + smask
        p = _hb_softmax(s, gh, S)
        pb = p.astype(q.dtype)
        dag = da[:, :, sl].astype(q.dtype)
        # dP = dA V_blkᵀ (contraction over lanes of both — no transpose)
        dp = jax.lax.dot_general(dag, vb, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        # dV_blk = Pᵀ dA, then segment-extract the head-diagonal
        dvs.append(untile(
            jax.lax.dot_general(pb, dag, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)))
        # dS = P ∘ (dP − per-segment rowsum(dP ∘ P)); masked lanes: P == 0
        dss = []
        for h in range(gh):
            seg = slice(h * S, (h + 1) * S)
            dpp = dp[:, :, seg] * p[:, :, seg]
            dss.append(p[:, :, seg]
                       * (dp[:, :, seg]
                          - jnp.sum(dpp, axis=-1, keepdims=True)))
        ds = dss[0] if gh == 1 else jnp.concatenate(dss, -1)
        dsb = ds.astype(q.dtype)
        dqs.append(jax.lax.dot_general(dsb, kb, (((2,), (1,)), ((0,), (0,))),
                                       preferred_element_type=jnp.float32)
                   * scale)
        dks.append(untile(
            jax.lax.dot_general(dsb, qg, (((1,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)))
    cat = lambda xs: (xs[0] if ng == 1 else jnp.concatenate(xs, -1))
    return (cat(dqs).reshape(n0, L0, C2), cat(dks).reshape(n0, L0, C2),
            cat(dvs).reshape(n0, L0, C2))


def _window_merge(n: int, L: int) -> int:
    """Windows to pack per dot: small stripe windows (L <= 64) leave most of
    a 128-wide MXU tile idle AND the batched dot's per-issue overhead
    dominates (measured ~1.6 ms/block at stage 1 for 56x32x56 dots). Packing
    m windows block-diagonally into one (m*L, d) dot halves/quarters the
    issue count without adding MXU tiles while m*L <= 128."""
    m = 1
    while m * 2 * L <= 128 and n % (m * 2) == 0:
        m *= 2
    return m


# Head-block routing mode: "auto" (per-geometry measured table), "on", "off".
# Experiments monkeypatch this to A/B the two attention formulations.
_HB_MODE = "auto"

# Softmax-normalization mode: "auto", "defer" (divide after the P@V dot),
# "div" (normalize the probabilities). Experiments monkeypatch this.
_SM_MODE = "auto"


def _sm_defer() -> bool:
    """Measured routing for deferred softmax normalization (scripts/
    exp_sm2d.py, bs128 whole-block chains): wins or ties every geometry —
    stage 3 1.06 -> 1.02 ms, stage 2 1.89 -> 1.86, stage 1 4.31 -> 4.27 —
    the saved divide+cast pass over the score lanes always beats the added
    (L, d) multiply. Forward-only: the backward recomputes normalized P
    (it needs P itself for the vjp dots)."""
    if _SM_MODE != "auto":
        return _SM_MODE == "defer"
    return True


def _use_hb(L_merged: int, heads: int, d: int) -> bool:
    """Measured per-geometry routing between the per-head narrow dots
    (``_attn_windows``) and the head-block wide dots (``_attn_windows_hb``).

    TPU chain timings (scripts/exp_hb.py, bs128, whole fused block):
    stage 2 fwd 2.543 -> 2.434 ms, stage 3 fwd 1.791 -> 1.673 ms, but
    stage 4 fwd 0.681 -> 0.728 ms and backwards are a wash (4.89 vs 4.92).
    The block-diagonal tiling trades 4x MXU contraction width for 4x
    FLOPs — net neutral on the dots — so the win is purely the avoided
    lane relayouts, and it only materialises when ALL heads fit one
    group (ng == 1); with ng > 1 (stage 4: 8 full-window heads, gh = 4)
    the per-group K/V re-tiling loop eats the gain."""
    hp = _hb_params(L_merged, heads, d)
    if hp is None:
        return False
    if _HB_MODE != "auto":
        return _HB_MODE == "on"
    return hp[0] == heads  # ng == 1: every head rides the single wide dot


def _attn_auto(q, k, v, heads, scale):
    n, L0, C2 = q.shape
    d = C2 // heads
    m = _window_merge(n, L0)
    if _use_hb(m * L0, heads, d):
        return _attn_windows_hb(q, k, v, heads, scale, merge=m)
    return _attn_windows(q, k, v, heads, scale, merge=m)


def _attn_bwd_auto(q, k, v, da, heads, scale):
    n, L0, C2 = q.shape
    d = C2 // heads
    m = _window_merge(n, L0)
    if _use_hb(m * L0, heads, d):
        return _attn_windows_bwd_hb(q, k, v, da, heads, scale, merge=m)
    return _attn_windows_bwd(q, k, v, da, heads, scale, merge=m)


def _attn_windows(q, k, v, heads, scale, merge=None):
    """q,k,v: (n, L, C) -> (n, L, C). Windows are the BATCH dim of one
    batched dot_general per head (Mosaic lowers single-batch-dim dots), so
    nothing unrolls over windows — compile time stays flat in n. Small
    windows are additionally packed ``merge`` per dot with block-diagonal
    -inf masking (exact: masked probabilities are exp(-1e9) == 0)."""
    n, L, C = q.shape
    d = C // heads
    m = _window_merge(n, L) if merge is None else merge
    mask = None
    if m > 1:
        q = q.reshape(n // m, m * L, C)
        k = k.reshape(n // m, m * L, C)
        v = v.reshape(n // m, m * L, C)
        row = jax.lax.broadcasted_iota(jnp.int32, (m * L, m * L), 0) // L
        col = jax.lax.broadcasted_iota(jnp.int32, (m * L, m * L), 1) // L
        mask = jnp.where(row == col, 0.0, -1e9).astype(jnp.float32)[None]
    outs = []
    for h in range(heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, :, sl] * scale
        s = jax.lax.dot_general(qh, k[:, :, sl], (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if mask is not None:
            s = s + mask
        if _sm_defer():
            # Deferred normalization (see _attn_windows_hb): divide the
            # (L, d) head output instead of the (L, L) probability tile.
            e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
            rd = 1.0 / jnp.sum(e, axis=-1, keepdims=True)
            ou = jax.lax.dot_general(
                e.astype(q.dtype), v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            outs.append(ou * rd)
        else:
            p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
            outs.append(jax.lax.dot_general(
                p, v[:, :, sl], (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32))
    out = outs[0] if heads == 1 else jnp.concatenate(outs, -1)
    return out.astype(q.dtype).reshape(n, L, C)


def _branch_horizontal(q, k, v, lk, lb, *, H, W, sp, heads, scale):
    """Windows (sp, W): pure reshapes. q,k,v: (G, H, W, C2); all G images'
    windows ride the same batched dot; LePE on the windowed v (mask-free
    zero-fill shifts)."""
    G, _, _, C2 = q.shape
    nH = H // sp
    L = sp * W

    def win(x):
        return x.reshape(G * nH, L, C2)

    vw = win(v)
    out = _attn_auto(win(q), win(k), vw, heads, scale)
    if _ABLATE_NO_LEPE_H:
        return out.reshape(G, H, W, C2)
    lepe = _lepe_windows(vw.reshape(G * nH, sp, W, C2), lk, lb)
    out = out.reshape(G * nH, sp, W, C2) + lepe
    return out.reshape(G, H, W, C2)


def _branch_vertical(q, k, v, lk, lb, *, H, W, sp, heads, scale):
    """Windows (H, sp). q,k,v: (G, H, W, C2).

    Computed on the TRANSPOSED image, where a (H, sp) window is sp contiguous
    rows — plain sublane reshapes, no per-image loop, any G. Within-window
    token order differs from the row-major composition ((w, h) vs (h, w)),
    which is immaterial: softmax(QKᵀ)V is invariant to a shared permutation
    of the window's tokens, and each output lands back at its own (h, w)
    via the inverse transpose. LePE runs in the same transposed window
    layout with transposed taps."""
    G, _, _, C2 = q.shape
    nW = W // sp

    def win(x):
        return x.transpose(0, 2, 1, 3).reshape(G * nW, sp * H, C2)

    out = _attn_auto(win(q), win(k), win(v), heads, scale)
    out = out.reshape(G, W, H, C2).transpose(0, 2, 1, 3)
    # LePE on the image-layout v: the transpose-derived windowed layout
    # breaks Mosaic's concat lowering in composition, so this branch keeps
    # the f32 roll + iota-mask formulation.
    lepe = _lepe_full(v, lk, lb, H, sp)
    return (out.astype(jnp.float32) + lepe).astype(q.dtype)


# Ablation-only switch (scripts/exp_t.py): replace the vertical-branch
# output transpose with identity (wrong math, identical shapes) to price
# the in-kernel transpose. Never set in production.
_ABLATE_SKIP_VT = False
# Ablation-only switches (scripts/exp_h.py): skip the horizontal branch
# (reuse a0 — wrong math, same shapes) / zero out LePE in either branch,
# to price each sub-computation in the full-kernel context. Never set in
# production.
_ABLATE_SKIP_H = False
_ABLATE_NO_LEPE_H = False
_ABLATE_NO_LEPE_V = False
# Skip the ENTIRE vertical branch (attention + LePE + transpose): a0 is a
# plain qkv_h slice (wrong math, same shapes). Prices windows+attn+transpose
# jointly. _ABLATE_BF16_GELU keeps the MLP activation in bf16 end-to-end
# (no f32 upcast) to price the f32 register-tile traffic of the 4C hidden.
_ABLATE_SKIP_V = False
_ABLATE_BF16_GELU = False
# Spine-deletion switches (scripts/exp_spine.py): remove whole serialized
# stages of the kernel spine (each is wrong math, same output shape) to
# localize the composition cost exp_mid.py exposed. Never set in production.
_ABLATE_NO_MLP = False
_ABLATE_NO_QKVV = False
_ABLATE_NO_PROJ = False
_ABLATE_NO_LN1 = False


# Branch-batch routing mode: "auto" (measured), "on", "off". Experiments
# monkeypatch this to A/B the stacked vs per-branch formulations.
_BB_MODE = "auto"

# Dual-LePE stacking inside the bb path: "auto" (measured route), "bs"
# (batch-stacked ``_lepe_windows_dual``), "cs" (channel-stacked
# ``_lepe_windows_dual_cs``). Experiments monkeypatch this.
_LEPE_DUAL_MODE = "auto"


def _lepe_dual_cs_route(sp_h: int, c: int) -> bool:
    """Measured routing for the channel-stacked dual LePE (bb path only —
    bb routes at the 56x56 stage-1 geometry, sp_h = 1, c = 32). In-situ
    bs128 whole-block chains (scripts/exp_s1.py, real chip, 2026-08-21,
    with the XLA-side tap merge): stage-1 block 4.602 (batch-stacked) ->
    4.380 ms (channel-stacked) — the 3-tap row conv at doubled lane fill
    and halved issue count pays 0.22 ms/block. Routed ON at the row-conv
    geometry; parity rel_err 1.2e-3 vs the composed oracle on TPU."""
    if _LEPE_DUAL_MODE != "auto":
        return _LEPE_DUAL_MODE == "cs"
    return sp_h == 1


def _use_bb(H: int, W: int) -> bool:
    """Route the two stripe branches through ONE stacked attention + LePE
    pass (``_dual_branch_bb``). Requires square images (the two branches'
    windowed shapes only coincide then — always true in every config).
    Measured (scripts/exp_bb.py, bs128 whole-block chains, xt kernel):
    stage 1 4.77 -> 4.34 ms (the one geometry whose attention runs the
    per-head narrow-dot path — halving its issue count pays); stage 2
    1.95 -> 2.02 (loses), stage 3 / 48x48 a wash (head-block attention is
    already one wide-dot pair per branch there), and 96x96 FAILS Mosaic
    compile (the 2n-stacked concat blows the scheduler at that size) —
    so the routing is exactly the 56x56 stage-1 geometry."""
    if H != W:
        return False
    if _BB_MODE != "auto":
        return _BB_MODE == "on"
    return H == 56


def _use_bb_bwd(H: int, W: int) -> bool:
    """Branch-batch routing for the hand-written backward kernel (same
    stacking, applied to the recompute + attention-vjp + LePE-bwd):
    measured OFF everywhere. scripts/exp_bb.py bwd, bs128 fwd+bwd chains:
    stage 1 10.11 -> 9.94 ms (less than the fwd-only 0.43 gain, i.e. the
    bwd side loses ~0.26), stage 2 6.30 -> 6.54, 48x48 10.55 -> 11.40 —
    the stacked f32 cotangent concats add more VMEM traffic than the
    halved issue count saves. Kept parity-covered (tests parametrize
    _BB_MODE) for re-measurement on future Mosaic."""
    if H != W:
        return False
    if _BB_MODE != "auto":
        return _BB_MODE == "on"
    return False


def _dual_branch_bb(qkv_v, qkv_h, lk0, lb0, lk1, lb1, *, G, H, W, half, h2,
                    split, scale):
    """Both stripe branches in ONE attention + ONE LePE call.

    With H == W the vertical branch's transposed-layout windows
    (G·W/split, split·H, half) and the horizontal branch's windows
    (G·H/split, split·W, half) are the same shape, so they stack on the
    window-batch dim: every dot, softmax pass and LePE tap then issues
    once over 2n windows instead of twice over n — the measured block cost
    is per-issue overhead, not FLOPs (true deletion profile in ROADMAP.md).
    Exact: stripe attention and LePE are independent per window. Returns
    (a0 image-layout vertical half, a1 image-layout horizontal half)."""
    nW = W // split
    n = G * nW
    L = split * H
    qt = qkv_v[:, :half].reshape(n, L, half)
    kt = qkv_v[:, half : 2 * half].reshape(n, L, half)
    vt = qkv_v[:, 2 * half :].reshape(n, L, half)
    qw = qkv_h[:, :half].reshape(n, L, half)
    kw = qkv_h[:, half : 2 * half].reshape(n, L, half)
    vw = qkv_h[:, 2 * half :].reshape(n, L, half)
    q2 = jnp.concatenate([qt, qw], 0)
    k2 = jnp.concatenate([kt, kw], 0)
    v2 = jnp.concatenate([vt, vw], 0)
    out = _attn_auto(q2, k2, v2, h2, scale)
    if _lepe_dual_cs_route(split, half):
        # Channel-stacked LePE: one pass over (n, split, H, 2·half) lanes
        # instead of (2n, split, H, half). When this routes, the lk0/lb0
        # slots hold the PRE-MERGED (3, 3, 2·half)/(2·half,) tap params
        # (_fused_block_fwd merges them in XLA — in-kernel tap concats
        # crash the Mosaic lowering, see _lepe_windows_dual_cs).
        vcs = jnp.concatenate([vt, vw], -1)
        lepe = _lepe_windows_dual_cs(vcs.reshape(n, split, H, 2 * half),
                                     lk0, lb0)
        o0 = out[:n].reshape(n, split, H, half) + lepe[..., :half]
        o1 = out[n:].reshape(n, split, H, half) + lepe[..., half:]
        a0 = o0.reshape(G, W, H, half).transpose(0, 2, 1, 3)
        a1 = o1.reshape(G, H, W, half)
        return a0, a1
    lepe = _lepe_windows_dual(v2.reshape(2 * n, split, H, half),
                              lk0, lb0, lk1, lb1, n)
    out = out.reshape(2 * n, split, H, half) + lepe
    a0 = out[:n].reshape(G, W, H, half).transpose(0, 2, 1, 3)
    a1 = out[n:].reshape(G, H, W, half)
    return a0, a1


def _block_body_xt(x, xt, P, dp, *, H, W, C, heads, split, scale, qkv_bias,
                   G, droppath, vh=False):
    """Dual-branch block math on VALUES (refs already read), with the
    vertical branch computed ENTIRELY in the transposed layout: ``xt`` holds
    the transposed-image rows, ``P`` the vertical half's qkv weight columns
    split out, and exactly ONE in-kernel transpose runs (the branch output).
    x: (G·H·W, C) rows; xt: (G·W·H, C). With ``xt=None`` (the fold variant)
    the vertical half's qkv is computed from the SAME LN(x) rows and
    transposed in-kernel as one joint (G, H, W, 3·half) tensor — trading the
    second HBM stream + XLA transpose pass + second LN for one more
    in-kernel transpose. With ``vh=True`` ``xt`` already holds the
    TRANSPOSED VERTICAL QKV rows (G·W·H, 3·half) — the vertical LN+dot ran
    in XLA, fused with the upstream transpose pass, so the kernel streams
    3·half qkv channels instead of C image channels and skips its second
    LN+dot entirely. Returns the block output rows."""
    (n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v, lk0, lb0, lk1, lb1,
     projk, projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b) = P
    half = C // 2
    h2 = heads // 2
    nW = W // split

    xn = x if _ABLATE_NO_LN1 else _layernorm(x, n1s, n1b)
    qkv_h = _dot(xn, wqkv_h, bqkv_h if qkv_bias else None)

    if _ABLATE_NO_QKVV:
        qkv_v = qkv_h  # ablation only: wrong math; kills LN(xt)+dot,
        # keeps the xt stream (the ref block is still DMAed in)
    elif vh:
        qkv_v = xt  # already LN(x)·wqkv_v, transposed, computed in XLA
    elif xt is None:
        qv = _dot(xn, wqkv_v, bqkv_v if qkv_bias else None)
        qkv_v = (qv.reshape(G, H, W, 3 * half).transpose(0, 2, 1, 3)
                 .reshape(G * W * H, 3 * half))
    else:
        xtn = xt if _ABLATE_NO_LN1 else _layernorm(xt, n1s, n1b)
        qkv_v = _dot(xtn, wqkv_v, bqkv_v if qkv_bias else None)

    if _ABLATE_SKIP_V:
        # ablation only: wrong math, same shapes — prices the whole
        # vertical branch (windowing + attention + LePE + transpose).
        a0 = qkv_h[:, :half].reshape(G, H, W, half)
        return _block_tail_xt(x, a0, qkv_h, P, dp, G=G, H=H, W=W, C=C,
                              half=half, h2=h2, split=split, scale=scale,
                              droppath=droppath)
    if (_use_bb(H, W)
            and not (_ABLATE_SKIP_H or _ABLATE_SKIP_VT
                     or _ABLATE_NO_LEPE_H or _ABLATE_NO_LEPE_V)):
        a0, a1 = _dual_branch_bb(qkv_v, qkv_h, lk0, lb0, lk1, lb1, G=G, H=H,
                                 W=W, half=half, h2=h2, split=split,
                                 scale=scale)
        return _block_tail_xt(x, a0, qkv_h, P, dp, G=G, H=H, W=W, C=C,
                              half=half, h2=h2, split=split, scale=scale,
                              droppath=droppath, a1=a1)
    # Vertical branch: (H, split) windows of the image are (split, H) row
    # bands of the transposed image — pure sublane reshapes, no transpose.
    qt = qkv_v[:, :half].reshape(G * nW, split * H, half)
    kt = qkv_v[:, half : 2 * half].reshape(G * nW, split * H, half)
    vt = qkv_v[:, 2 * half :].reshape(G * nW, split * H, half)
    a0t = _attn_auto(qt, kt, vt, h2, scale)
    if not _ABLATE_NO_LEPE_V:
        lepe0 = _lepe_windows(vt.reshape(G * nW, split, H, half), lk0,
                              lb0, swap=True)
        a0t = a0t.reshape(G * nW, split, H, half) + lepe0
    a0t = a0t.reshape(G, W, H, half)
    if _ABLATE_SKIP_VT and H == W:
        a0 = a0t  # ablation only: wrong math, same shapes/op-mix
    else:
        a0 = a0t.transpose(0, 2, 1, 3)  # the single in-kernel transpose

    return _block_tail_xt(x, a0, qkv_h, P, dp, G=G, H=H, W=W, C=C, half=half,
                          h2=h2, split=split, scale=scale, droppath=droppath)


def _block_tail_xt(x, a0, qkv_h, P, dp, *, G, H, W, C, half, h2, split, scale,
                   droppath, a1=None):
    """Horizontal branch + proj + residual + MLP (shared by the production
    body and the _ABLATE_SKIP_V pricing path). ``a1`` pre-computed by the
    branch-batched path skips the per-branch horizontal computation."""
    (n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v, lk0, lb0, lk1, lb1,
     projk, projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b) = P
    # Horizontal branch: (split, W) windows are row bands of the image.
    if a1 is not None:
        pass
    elif _ABLATE_SKIP_H:
        a1 = a0  # ablation only: wrong math, same shapes/op-mix
    else:
        q = qkv_h[:, :half].reshape(G, H, W, half)
        k = qkv_h[:, half : 2 * half].reshape(G, H, W, half)
        v = qkv_h[:, 2 * half :].reshape(G, H, W, half)
        a1 = _branch_horizontal(q, k, v, lk1, lb1,
                                H=H, W=W, sp=split, heads=h2, scale=scale)

    att = jnp.concatenate([a0, a1], -1).reshape(G * H * W, C)
    if not _ABLATE_NO_PROJ:
        att = _dot(att, projk, projb)
    if droppath:
        # timm DropPath: per-sample binary keep mask pre-scaled by 1/(1-p)
        att = (att.reshape(G, H * W, C) * dp[0].astype(att.dtype)
               ).reshape(G * H * W, C)
    x = x + att
    if _ABLATE_NO_MLP:
        return x

    y = _layernorm(x, n2s, n2b)
    if _ABLATE_BF16_GELU:
        # ablation only: ~1% relative gelu error (bf16 polynomial) — prices
        # the f32 register-tile traffic of the 4C-wide hidden.
        y = _dot(y, fc1k, fc1b)
        y = y * 0.5 * (1.0 + _erf(y * (2.0 ** -0.5)))
    else:
        # keep the fc1 f32 accumulator for the GELU directly (skips a
        # bf16 round-trip over the 4C-wide hidden; strictly more accurate)
        yf = jnp.dot(y, fc1k.astype(y.dtype),
                     preferred_element_type=jnp.float32) + fc1b.astype(
                         jnp.float32)
        y = (yf * 0.5 * (1.0 + _erf(yf * (2.0**-0.5)))).astype(y.dtype)
    y = _dot(y, fc2k, fc2b)
    if droppath:
        y = (y.reshape(G, H * W, C) * dp[1].astype(y.dtype)
             ).reshape(G * H * W, C)
    return x + y


def _block_kernel_xt(x_ref, xt_ref, n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v,
                     lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
                     fc1k, fc1b, fc2k, fc2b, dp0, dp1, o_ref, *,
                     H, W, C, heads, split, scale, qkv_bias, G, droppath):
    """Single dual-branch block kernel: reads refs, runs ``_block_body_xt``."""
    P = tuple(r[...] for r in (n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v,
                               lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
                               fc1k, fc1b, fc2k, fc2b))
    x = _block_body_xt(
        x_ref[...].reshape(G * H * W, C), xt_ref[...].reshape(G * W * H, C),
        P, (dp0[...], dp1[...]), H=H, W=W, C=C, heads=heads, split=split,
        scale=scale, qkv_bias=qkv_bias, G=G, droppath=droppath)
    o_ref[...] = x.reshape(G, H, W, C)


def _block_kernel_vh(x_ref, qv_ref, n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v,
                     lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
                     fc1k, fc1b, fc2k, fc2b, dp0, dp1, o_ref, *,
                     H, W, C, heads, split, scale, qkv_bias, G, droppath):
    """Hoisted-vertical-qkv block: ``qv_ref`` streams the XLA-computed
    transposed vertical qkv rows (G, W, H, 3·half) — no second LN+dot in
    kernel (see ``_block_body_xt`` vh=True)."""
    P = tuple(r[...] for r in (n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v,
                               lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
                               fc1k, fc1b, fc2k, fc2b))
    half3 = 3 * (C // 2)
    x = _block_body_xt(
        x_ref[...].reshape(G * H * W, C),
        qv_ref[...].reshape(G * W * H, half3),
        P, (dp0[...], dp1[...]), H=H, W=W, C=C, heads=heads, split=split,
        scale=scale, qkv_bias=qkv_bias, G=G, droppath=droppath, vh=True)
    o_ref[...] = x.reshape(G, H, W, C)


def _block_kernel_fold(x_ref, n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v,
                       lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
                       fc1k, fc1b, fc2k, fc2b, dp0, dp1, o_ref, *,
                       H, W, C, heads, split, scale, qkv_bias, G, droppath):
    """Single-stream dual-branch block: same math as ``_block_kernel_xt``
    but the vertical half's qkv is derived in-kernel (joint transpose of
    the (G, H, W, 3·half) qkv_v), so no xᵀ input/XLA transpose pass."""
    P = tuple(r[...] for r in (n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v,
                               lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
                               fc1k, fc1b, fc2k, fc2b))
    x = _block_body_xt(
        x_ref[...].reshape(G * H * W, C), None,
        P, (dp0[...], dp1[...]), H=H, W=W, C=C, heads=heads, split=split,
        scale=scale, qkv_bias=qkv_bias, G=G, droppath=droppath)
    o_ref[...] = x.reshape(G, H, W, C)


def _block_pair_kernel_xt(*refs, H, W, C, heads, split, scale, qkv_bias, G):
    """TWO consecutive same-geometry blocks in one pallas_call (inference).

    The stage-3 ablation (scripts/exp_ablate3.py) showed the 14x14 block is
    bound by per-call fixed cost, not by removable math — zeroing the
    attention or LePE changes nothing outside noise. Fusing block pairs
    halves the number of calls: the intermediate x never round-trips HBM,
    and the second block's transposed image is ONE in-kernel (G,H,W,C)
    dim-1/2 transpose (the same op class the vertical branch already uses).
    refs: x, xt, 18 params of block 1, 18 of block 2, out."""
    x_ref, xt_ref = refs[0], refs[1]
    o_ref = refs[-1]
    P1 = tuple(r[...] for r in refs[2:20])
    P2 = tuple(r[...] for r in refs[20:38])
    kw = dict(H=H, W=W, C=C, heads=heads, split=split, scale=scale,
              qkv_bias=qkv_bias, G=G, droppath=False)
    x1 = _block_body_xt(x_ref[...].reshape(G * H * W, C),
                        xt_ref[...].reshape(G * W * H, C), P1, None, **kw)
    x1t = (x1.reshape(G, H, W, C).transpose(0, 2, 1, 3)
           .reshape(G * W * H, C))
    x2 = _block_body_xt(x1, x1t, P2, None, **kw)
    o_ref[...] = x2.reshape(G, H, W, C)


def _block_kernel(x_ref, n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1,
                  projk, projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b,
                  dp0, dp1, o_ref, *,
                  H, W, C, heads, split, last_stage, scale, qkv_bias, G,
                  droppath):
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
    if droppath:
        # timm DropPath: per-sample binary keep mask pre-scaled by 1/(1-p)
        att = (att.reshape(G, H * W, C) * dp0[...].astype(att.dtype)
               ).reshape(G * H * W, C)
    x = x + att

    y = _layernorm(x, n2s[...], n2b[...])
    # exact-form GELU x·Φ(x); erf via the A&S approximation above. The fc1
    # f32 accumulator feeds the GELU directly (no bf16 round-trip).
    yf = jnp.dot(y, fc1k[...].astype(y.dtype),
                 preferred_element_type=jnp.float32) + fc1b[...].astype(
                     jnp.float32)
    y = (yf * 0.5 * (1.0 + _erf(yf * (2.0**-0.5)))).astype(y.dtype)
    y = _dot(y, fc2k[...], fc2b[...])
    if droppath:
        y = (y.reshape(G, H * W, C) * dp1[...].astype(y.dtype)
             ).reshape(G * H * W, C)
    x = x + y

    o_ref[...] = x.reshape(G, H, W, C)


def _block_bwd_kernel_xt(x_ref, xt_ref, do_ref, n1s, n1b, wqkv_h, bqkv_h,
                         wqkv_v, bqkv_v, lk0, lb0, lk1, lb1, projk, projb,
                         n2s, n2b, fc1k, fc1b, fc2k, fc2b,
                         wh_t, wv_t, projk_t, fc1k_t, fc2k_t, dp0, dp1,
                         dx_ref, dxt_ref, dn1s_ref, dn1b_ref, dwh_ref,
                         dbh_ref, dwv_ref, dbv_ref, dlk0_ref, dlb0_ref,
                         dlk1_ref, dlb1_ref, dprojk_ref, dprojb_ref,
                         dn2s_ref, dn2b_ref, dfc1k_ref, dfc1b_ref,
                         dfc2k_ref, dfc2b_ref, ddp0_ref, ddp1_ref, *,
                         H, W, C, heads, split, scale, qkv_bias, G, droppath):
    """Hand-written backward of ``_block_kernel_xt``: one fused recompute of
    the forward intermediates (all in VMEM) + the analytic vjp of every op.
    Param gradients are per-program partials (summed over programs by XLA).
    Numerics mirror the forward: bf16 MXU dots with f32 accumulation, f32
    softmax/LN statistics, f32 gradient accumulation throughout."""
    half = C // 2
    h2 = heads // 2
    nW = W // split
    nH = H // split
    GHW = G * H * W

    # ---- forward recompute ----
    x = x_ref[...].reshape(GHW, C)
    xn = _layernorm(x, n1s[...], n1b[...])
    qkv_h = _dot(xn, wqkv_h[...], bqkv_h[...] if qkv_bias else None)

    xt = xt_ref[...].reshape(GHW, C)
    xtn = _layernorm(xt, n1s[...], n1b[...])
    qkv_v = _dot(xtn, wqkv_v[...], bqkv_v[...] if qkv_bias else None)

    qt = qkv_v[:, :half].reshape(G * nW, split * H, half)
    kt = qkv_v[:, half : 2 * half].reshape(G * nW, split * H, half)
    vt = qkv_v[:, 2 * half :].reshape(G * nW, split * H, half)
    qw = qkv_h[:, :half].reshape(G * nH, split * W, half)
    kw = qkv_h[:, half : 2 * half].reshape(G * nH, split * W, half)
    vw = qkv_h[:, 2 * half :].reshape(G * nH, split * W, half)

    use_bb = _use_bb_bwd(H, W)
    n_bb = G * nW
    if use_bb:
        # Branch-batched recompute: see _dual_branch_bb (H == W required).
        q2 = jnp.concatenate([qt, qw], 0)
        k2 = jnp.concatenate([kt, kw], 0)
        v2 = jnp.concatenate([vt, vw], 0)
        a2 = _attn_auto(q2, k2, v2, h2, scale)
        lepe2 = _lepe_windows_dual(v2.reshape(2 * n_bb, split, H, half),
                                   lk0[...], lb0[...], lk1[...], lb1[...],
                                   n_bb)
        o2 = (a2.reshape(2 * n_bb, split, H, half).astype(jnp.float32)
              + lepe2)
        a0 = (o2[:n_bb].astype(x.dtype).reshape(G, W, H, half)
              .transpose(0, 2, 1, 3))
        a1 = o2[n_bb:].astype(x.dtype).reshape(G, H, W, half)
    else:
        a0t = _attn_auto(qt, kt, vt, h2, scale)
        lepe0 = _lepe_windows(vt.reshape(G * nW, split, H, half), lk0[...],
                              lb0[...], swap=True)
        a0t = (a0t.reshape(G * nW, split, H, half).astype(jnp.float32)
               + lepe0)
        a0 = a0t.astype(x.dtype).reshape(G, W, H, half).transpose(0, 2, 1, 3)

        a1w = _attn_auto(qw, kw, vw, h2, scale)
        lepe1 = _lepe_windows(vw.reshape(G * nH, split, W, half), lk1[...],
                              lb1[...])
        a1 = (a1w.reshape(G * nH, split, W, half).astype(jnp.float32)
              + lepe1)
        a1 = a1.astype(x.dtype).reshape(G, H, W, half)

    cat = jnp.concatenate([a0, a1], -1).reshape(GHW, C)
    att_pre = _dot(cat, projk[...], projb[...])
    att = att_pre
    if droppath:
        att = (att_pre.reshape(G, H * W, C) * dp0[...].astype(att_pre.dtype)
               ).reshape(GHW, C)
    x1 = x + att

    y = _layernorm(x1, n2s[...], n2b[...])
    h1 = _dot(y, fc1k[...], fc1b[...])
    h1f = h1.astype(jnp.float32)
    gact = (h1f * 0.5 * (1.0 + _erf(h1f * (2.0 ** -0.5)))).astype(h1.dtype)
    out2_pre = _dot(gact, fc2k[...], fc2b[...])

    # ---- backward ----
    do = do_ref[...].reshape(GHW, C).astype(jnp.float32)

    # MLP + second residual
    do2 = do
    if droppath:
        do2 = (do.reshape(G, H * W, C) * dp1[...].astype(jnp.float32)
               ).reshape(GHW, C)
        ddp1_ref[...] = jnp.sum(
            out2_pre.astype(jnp.float32).reshape(G, H * W, C)
            * do.reshape(G, H * W, C), axis=1, keepdims=True
        ).reshape(ddp1_ref.shape)
    else:
        ddp1_ref[...] = jnp.zeros(ddp1_ref.shape, jnp.float32)
    do2b = do2.astype(x.dtype)
    dfc2k_ref[...] = _wgrad(gact, do2b).reshape(dfc2k_ref.shape)
    dfc2b_ref[...] = jnp.sum(do2, axis=0).reshape(dfc2b_ref.shape)
    dg = jnp.dot(do2b, fc2k_t[...].astype(x.dtype),
                 preferred_element_type=jnp.float32)
    dh1 = _gelu_bwd(h1f, dg)
    dh1b = dh1.astype(x.dtype)
    dfc1k_ref[...] = _wgrad(y, dh1b).reshape(dfc1k_ref.shape)
    dfc1b_ref[...] = jnp.sum(dh1, axis=0).reshape(dfc1b_ref.shape)
    dy = jnp.dot(dh1b, fc1k_t[...].astype(x.dtype),
                 preferred_element_type=jnp.float32)
    dx1_ln, dn2s, dn2b = _ln_bwd(x1, dy, n2s[...])
    dn2s_ref[...] = dn2s.reshape(dn2s_ref.shape)
    dn2b_ref[...] = dn2b.reshape(dn2b_ref.shape)
    dx1 = do + dx1_ln

    # proj + drop-path + first residual
    datt = dx1
    if droppath:
        datt = (dx1.reshape(G, H * W, C) * dp0[...].astype(jnp.float32)
                ).reshape(GHW, C)
        ddp0_ref[...] = jnp.sum(
            att_pre.astype(jnp.float32).reshape(G, H * W, C)
            * dx1.reshape(G, H * W, C), axis=1, keepdims=True
        ).reshape(ddp0_ref.shape)
    else:
        ddp0_ref[...] = jnp.zeros(ddp0_ref.shape, jnp.float32)
    dattb = datt.astype(x.dtype)
    dprojk_ref[...] = _wgrad(cat, dattb).reshape(dprojk_ref.shape)
    dprojb_ref[...] = jnp.sum(datt, axis=0).reshape(dprojb_ref.shape)
    dcat = jnp.dot(dattb, projk_t[...].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    dcat = dcat.reshape(G, H, W, C)
    da0 = dcat[..., :half]
    da1 = dcat[..., half:]

    da1w = da1.reshape(G * nH, split * W, half)
    da0t = da0.transpose(0, 2, 1, 3).reshape(G * nW, split * H, half)
    if use_bb:
        # Branch-batched backward: one attention-vjp + one LePE-bwd roll
        # pass over the stacked windows, grads sliced back per branch.
        da2 = jnp.concatenate([da0t, da1w], 0)
        dv2_l, dlk0g, dlb0g, dlk1g, dlb1g = _lepe_windows_bwd_dual(
            v2.reshape(2 * n_bb, split, H, half),
            da2.reshape(2 * n_bb, split, H, half), lk0[...], lk1[...], n_bb)
        dq2, dk2, dv2 = _attn_bwd_auto(q2, k2, v2, da2, h2, scale)
        dv2 = dv2 + dv2_l.reshape(2 * n_bb, split * H, half)
        dqt, dqw = dq2[:n_bb], dq2[n_bb:]
        dkt, dkw = dk2[:n_bb], dk2[n_bb:]
        dvt, dvw = dv2[:n_bb], dv2[n_bb:]
    else:
        # horizontal branch backward
        dvw_l, dlk1g, dlb1g = _lepe_windows_bwd(
            vw.reshape(G * nH, split, W, half),
            da1w.reshape(G * nH, split, W, half), lk1[...])
        dqw, dkw, dvw = _attn_bwd_auto(qw, kw, vw, da1w, h2, scale)
        dvw = dvw + dvw_l.reshape(G * nH, split * W, half)
        # vertical branch backward (transposed coordinates; mirror of the
        # forward's single in-kernel transpose)
        dvt_l, dlk0g, dlb0g = _lepe_windows_bwd(
            vt.reshape(G * nW, split, H, half),
            da0t.reshape(G * nW, split, H, half), lk0[...], swap=True)
        dqt, dkt, dvt = _attn_bwd_auto(qt, kt, vt, da0t, h2, scale)
        dvt = dvt + dvt_l.reshape(G * nW, split * H, half)
    dlk1_ref[...] = dlk1g.reshape(dlk1_ref.shape)
    dlb1_ref[...] = dlb1g.reshape(dlb1_ref.shape)
    dqkv_h = jnp.concatenate(
        [dqw.reshape(GHW, half), dkw.reshape(GHW, half),
         dvw.reshape(GHW, half)], -1)
    dqkv_hb = dqkv_h.astype(x.dtype)
    dwh_ref[...] = _wgrad(xn, dqkv_hb).reshape(dwh_ref.shape)
    dbh_ref[...] = jnp.sum(dqkv_h, axis=0).reshape(dbh_ref.shape)
    dxn = jnp.dot(dqkv_hb, wh_t[...].astype(x.dtype),
                  preferred_element_type=jnp.float32)
    dx_h, dn1s_h, dn1b_h = _ln_bwd(x, dxn, n1s[...])

    dlk0_ref[...] = dlk0g.reshape(dlk0_ref.shape)
    dlb0_ref[...] = dlb0g.reshape(dlb0_ref.shape)
    dqkv_v = jnp.concatenate(
        [dqt.reshape(GHW, half), dkt.reshape(GHW, half),
         dvt.reshape(GHW, half)], -1)
    dqkv_vb = dqkv_v.astype(x.dtype)
    dwv_ref[...] = _wgrad(xtn, dqkv_vb).reshape(dwv_ref.shape)
    dbv_ref[...] = jnp.sum(dqkv_v, axis=0).reshape(dbv_ref.shape)
    dxtn = jnp.dot(dqkv_vb, wv_t[...].astype(x.dtype),
                   preferred_element_type=jnp.float32)
    dxt, dn1s_v, dn1b_v = _ln_bwd(xt, dxtn, n1s[...])

    dn1s_ref[...] = (dn1s_h + dn1s_v).reshape(dn1s_ref.shape)
    dn1b_ref[...] = (dn1b_h + dn1b_v).reshape(dn1b_ref.shape)

    # dx: residual chain + horizontal LN1 path (the xt/vertical LN1 path is
    # returned separately and transposed+added by XLA outside the kernel)
    dx_ref[...] = (dx1 + dx_h).astype(dx_ref.dtype).reshape(G, H, W, C)
    dxt_ref[...] = dxt.astype(dxt_ref.dtype).reshape(G, W, H, C)


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "C", "heads", "split", "scale", "qkv_bias",
                     "g_images"),
)
def _fused_block_bwd_xt(x, params, dps, dout, *, H, W, C, heads, split,
                        scale, qkv_bias, g_images=None):
    """Host wrapper for the fused dual-branch backward: splits the qkv
    weight columns exactly like the forward, runs the kernel, reassembles
    dqkvk, and reduces per-program param-grad partials."""
    B = x.shape[0]
    droppath = dps is not None
    if dps is None:
        dps = (jnp.ones((B, 1), jnp.float32), jnp.ones((B, 1), jnp.float32))
    dp0, dp1 = (jnp.broadcast_to(d.reshape(B, 1, 1), (B, 1, C))
                for d in dps)
    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb,
     n2s, n2b, fc1k, fc1b, fc2k, fc2b) = params

    G = g_images if g_images is not None else _default_g(B, H, W, C)
    while B % G:
        G //= 2
    NP = B // G
    half = C // 2
    hidden = fc1k.shape[-1]

    xt = x.transpose(0, 2, 1, 3)
    xtp = _xt_kernel_params(params, C)
    wqkv_h, wqkv_v = xtp[2], xtp[4]
    # Pre-transposed weights for the dX dots: one XLA HBM transpose beats a
    # per-program Mosaic relayout (NP of them).
    kparams = xtp + (wqkv_h.T, wqkv_v.T, projk.T, fc1k.T, fc2k.T)

    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((G, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    xt_spec = pl.BlockSpec((G, W, H, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec((G, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    pgrad = lambda *shape: (
        pl.BlockSpec((1,) + shape, lambda b, _n=len(shape): (b,) + tuple(
            0 for _ in range(_n)), memory_space=pltpu.VMEM),
        jax.ShapeDtypeStruct((NP,) + shape, jnp.float32),
    )
    out_defs = [
        (x_spec, jax.ShapeDtypeStruct(x.shape, jnp.float32)),          # dx
        (xt_spec, jax.ShapeDtypeStruct((B, W, H, C), jnp.float32)),    # dxt
        pgrad(1, C), pgrad(1, C),                                      # dn1
        pgrad(C, 3 * half), pgrad(1, 3 * half),                        # dWh
        pgrad(C, 3 * half), pgrad(1, 3 * half),                        # dWv
        pgrad(9, half), pgrad(1, half),                                # dlk0
        pgrad(9, half), pgrad(1, half),                                # dlk1
        pgrad(C, C), pgrad(1, C),                                      # dproj
        pgrad(1, C), pgrad(1, C),                                      # dn2
        pgrad(C, hidden), pgrad(1, hidden),                            # dfc1
        pgrad(hidden, C), pgrad(1, C),                                 # dfc2
        (dp_spec, jax.ShapeDtypeStruct((B, 1, C), jnp.float32)),       # ddp0
        (dp_spec, jax.ShapeDtypeStruct((B, 1, C), jnp.float32)),       # ddp1
    ]

    kern = functools.partial(
        _block_bwd_kernel_xt, H=H, W=W, C=C, heads=heads, split=split,
        scale=scale, qkv_bias=qkv_bias, G=G, droppath=droppath,
    )
    outs = pl.pallas_call(
        kern,
        grid=(NP,),
        in_specs=[x_spec, xt_spec, x_spec] + [full(p.shape) for p in kparams]
        + [dp_spec, dp_spec],
        out_specs=[d[0] for d in out_defs],
        out_shape=[d[1] for d in out_defs],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, xt, dout, *kparams, dp0, dp1)

    (dx, dxt, dn1s, dn1b, dwh, dbh, dwv, dbv, dlk0, dlb0, dlk1, dlb1,
     dprojk, dprojb, dn2s, dn2b, dfc1k, dfc1b, dfc2k, dfc2b,
     ddp0, ddp1) = outs

    dx = dx + dxt.transpose(0, 2, 1, 3)
    red = lambda t: jnp.sum(t, axis=0)
    dwh, dwv = red(dwh), red(dwv)
    dbh, dbv = red(dbh)[0], red(dbv)[0]
    # invert the column split: qkvk cols [q | k | v], each [v-half | h-half]
    dqkvk = jnp.concatenate(
        [dwv[:, :half], dwh[:, :half],
         dwv[:, half : 2 * half], dwh[:, half : 2 * half],
         dwv[:, 2 * half :], dwh[:, 2 * half :]], 1)
    dqkvb = jnp.concatenate(
        [dbv[:half], dbh[:half], dbv[half : 2 * half], dbh[half : 2 * half],
         dbv[2 * half :], dbh[2 * half :]])
    dparams = (
        red(dn1s)[0], red(dn1b)[0], dqkvk,
        dqkvb if qkv_bias else jnp.zeros_like(qkvb),
        red(dlk0).reshape(3, 3, half), red(dlb0)[0],
        red(dlk1).reshape(3, 3, half), red(dlb1)[0],
        red(dprojk), red(dprojb)[0], red(dn2s)[0], red(dn2b)[0],
        red(dfc1k), red(dfc1b)[0], red(dfc2k), red(dfc2b)[0],
    )
    dparams = tuple(g.astype(p.dtype) for g, p in zip(dparams, params))
    ddps = ((jnp.sum(ddp0, axis=2).astype(dps[0].dtype),
             jnp.sum(ddp1, axis=2).astype(dps[1].dtype))
            if droppath else None)
    return dx.astype(x.dtype), dparams, ddps


def _xt_kernel_params(params, C):
    """16-tuple model params -> the 18-tuple xt-kernel layout: the joint qkv
    weight's columns split into the horizontal/vertical branch halves
    (each [q-half | k-half | v-half]) so each branch runs ONE narrow dot on
    its own layout of x."""
    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb,
     n2s, n2b, fc1k, fc1b, fc2k, fc2b) = params
    half = C // 2
    wqkv_v = jnp.concatenate(
        [qkvk[:, :half], qkvk[:, C : C + half], qkvk[:, 2 * C : 2 * C + half]], 1)
    bqkv_v = jnp.concatenate(
        [qkvb[:half], qkvb[C : C + half], qkvb[2 * C : 2 * C + half]])
    wqkv_h = jnp.concatenate(
        [qkvk[:, half : C], qkvk[:, C + half : 2 * C], qkvk[:, 2 * C + half :]], 1)
    bqkv_h = jnp.concatenate(
        [qkvb[half : C], qkvb[C + half : 2 * C], qkvb[2 * C + half :]])
    return (n1s, n1b, wqkv_h, bqkv_h, wqkv_v, bqkv_v, lk0, lb0, lk1, lb1,
            projk, projb, n2s, n2b, fc1k, fc1b, fc2k, fc2b)


def _pair_fuse_ok(H: int, W: int, C: int) -> bool:
    """Measured routing for the inference pair kernel: currently OFF
    everywhere. scripts/exp_pair.py bs128 chain timings measured the pair
    kernel LOSING to two single-block calls (stage 3: 2.446 vs 2.317 ms;
    stage 2: 4.761 vs 4.328) — the per-block cost is not dispatch/HBM
    round-trip but in-kernel scheduling, so doubling the kernel body only
    adds the intermediate transpose. Kept (with interpret-mode parity
    coverage) as the measured negative result; flip per-geometry if a
    future Mosaic improves big-kernel scheduling."""
    return False


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "C", "heads", "split", "scale", "qkv_bias",
                     "g_images"),
)
def _fused_block_pair_fwd(x, params1, params2, *, H, W, C, heads, split,
                          scale, qkv_bias, g_images=None):
    """TWO consecutive same-geometry dual-branch blocks in ONE pallas_call
    (inference path — no drop-path). See ``_block_pair_kernel_xt``."""
    B = x.shape[0]
    G = g_images if g_images is not None else _default_g(B, H, W, C)
    while B % G:
        G //= 2

    xt = x.transpose(0, 2, 1, 3)
    kp1 = _xt_kernel_params(params1, C)
    kp2 = _xt_kernel_params(params2, C)

    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((G, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    xt_spec = pl.BlockSpec((G, W, H, C), lambda b: (b, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(
        _block_pair_kernel_xt, H=H, W=W, C=C, heads=heads, split=split,
        scale=scale, qkv_bias=qkv_bias, G=G,
    )
    return pl.pallas_call(
        kern,
        grid=(B // G,),
        in_specs=[x_spec, xt_spec] + [full(p.shape) for p in kp1 + kp2],
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(x, xt, *kp1, *kp2)


def _default_g(B: int, H: int, W: int, C: int) -> int:
    """Images per grid program. Small-image stages (3/4) batch several
    images so the window-batched dots and per-op VPU shapes amortize fixed
    overhead; stage 1's f32 working set already fills VMEM at G=1 (G=4
    there benched SLOWER: 1704 vs 1773 slices/s). The measured optimum
    tracks G·tokens ~= 400 KB (scripts/exp_g.py fwd chains, bs128:
    stage 3 G=4 1.157 / G=2 1.673 / G=8 1.428 ms; stage 4 G=8 0.578 /
    G=4 0.681 ms) — beyond it VMEM pressure wins, below it per-program
    overhead does. Large-reso stages have dozens of stripe windows per
    image already (stage 2: 14, stage 1: 56) and measure FLAT or worse
    at G>1 (stage 2 G=2: 2.487 vs 2.434 ms), so only small-window
    stages (HW <= 14x14) pack images."""
    if H * W > 196:
        return 1
    tokens_bytes = H * W * C * 2  # bf16 activation block per image
    g = 1
    while g * 2 <= 16 and B % (g * 2) == 0 and tokens_bytes * g * 2 <= 512 * 1024:
        g *= 2
    return g


# Scoped-VMEM reservation (MiB) for the fused FORWARD kernels. pallas'
# vmem_limit_bytes is emitted as a scoped_memory_configs reservation that
# XLA's scheduler must co-place with its own VMEM-resident buffers around
# the custom call — an oversized reservation starves the scheduler and
# fails the MODULE compile ("Scoped allocation ... exceeded scoped vmem
# limit"), which is how 64 MiB broke base-384 at bs32 in round 4 while bs8
# passed. Monkeypatched by scripts/exp_vmem384.py to bisect the kernel's
# true need.
_FWD_VMEM_LIMIT_MB = 64

# The 96x96 base-384 geometries need a larger scope: at bs32 XLA co-places
# the bf16[32,96,96,96] kernel output (56.6M) plus ~11M of neighboring
# buffers in the same scoped window — 64M fails the MODULE compile with
# "Scoped allocation with size 68.04M ... exceeded", while the kernel's own
# per-program working set is far smaller (G=1). Measured 2026-08-20
# (scripts/exp_vmem_probe.py): 48M FAIL, 72M OK, 96M OK. Only resos past
# 56x56 get the bump — oversized reservations starve the XLA scheduler at
# geometries that don't need them.
_FWD_VMEM_LIMIT_LARGE_MB = 96


def _fwd_vmem_limit_mb(H: int, W: int) -> int:
    return _FWD_VMEM_LIMIT_LARGE_MB if H * W > 56 * 56 else _FWD_VMEM_LIMIT_MB


def _use_xt_default(H: int, W: int) -> bool | str:
    """Measured per-geometry routing between the two dual-branch block
    formulations (scripts/exp_fold.py, bs128 long chains):

    - xt (two HBM streams: x and the XLA-transposed x; vertical qkv from
      LN(xt)) wins at large resos where the in-kernel joint transpose is
      expensive (stage 1: 4.75 vs 5.82 ms; stage 2: 2.38 vs 2.46);
    - fold (single stream, vertical qkv transposed in-kernel) won at
      stage 3 under the OLD 4D LePE (1.084 vs 1.130 ms) — but with the
      flat LePE formulation xt wins everywhere (stage 3: 1.018 xt+flat
      vs 1.075 fold+4d vs 1.208 fold+flat; scripts/exp_lepe.py), so the
      routing is xt across the board. Fold stays parity-covered for
      future re-measurement.
    - vh (vertical LN+qkv dot hoisted to XLA; kernel streams qkv_vT's
      3·half channels instead of xᵀ's C) LOSES everywhere measured
      (scripts/exp_s1.py, 2026-08-21, real chip): 224-s1 4.534 -> 5.467
      ms, 224-s2 1.881 -> 2.463, 384-s1 bs32 5.052 -> 7.803, 384-s2
      2.622 -> 3.054. The 1.5x qkv_vT stream + the extra XLA round trip
      (read x, write 3·half ch) cost more than the in-kernel LN+dot they
      replace — that compute overlaps the DMA streams anyway. Kept
      parity-covered (gate unit block_vh:224-s1) as a measured negative.
    All three are bit-exact equals."""
    return True


@functools.partial(
    jax.jit,
    static_argnames=("H", "W", "C", "heads", "split", "last_stage", "scale",
                     "qkv_bias", "g_images", "use_xt"),
)
def _fused_block_fwd(x, params, dps=None, *, H, W, C, heads, split, last_stage,
                     scale, qkv_bias, g_images=None, use_xt=None):
    if use_xt is None:
        use_xt = _use_xt_default(H, W)
    B = x.shape[0]
    droppath = dps is not None
    if dps is None:
        dps = (jnp.ones((B, 1), jnp.float32), jnp.ones((B, 1), jnp.float32))
    # Mosaic block shapes must tile (8, 128) or match the array dims on the
    # last two axes, and in-kernel broadcasts may expand sublanes OR lanes,
    # not both — so the (B, 1) per-sample multipliers ride in lane-expanded
    # to (B, 1, C); the kernel multiply then broadcasts over sublanes only.
    dp0, dp1 = (jnp.broadcast_to(d.reshape(B, 1, 1), (B, 1, C)) for d in dps)
    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb,
     n2s, n2b, fc1k, fc1b, fc2k, fc2b) = params

    G = g_images if g_images is not None else _default_g(B, H, W, C)
    while B % G:
        G //= 2

    full = lambda shape: pl.BlockSpec(shape, lambda b: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    x_spec = pl.BlockSpec((G, H, W, C), lambda b: (b, 0, 0, 0),
                          memory_space=pltpu.VMEM)
    dp_spec = pl.BlockSpec((G, 1, C), lambda b: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    common = dict(
        grid=(B // G,),
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        # stage-1 f32 working set slightly exceeds the default 16 MB scoped
        # cap; v5e VMEM accommodates this comfortably
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_fwd_vmem_limit_mb(H, W) * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )

    def _with_cs_merge(ps):
        """cs dual-LePE: merge the two branches' tap kernels in XLA
        (vertical swap folded as the tap-grid transpose) — the in-kernel
        merge crashes the Mosaic lowering (scripts/exp_cs_bisect.py). The
        lk0/lb0 slots carry the merged (3, 3, C)/(C,) params; lk1/lb1 ride
        along unused. Applied to every dual-branch FORWARD kernel variant
        (xt/fold/vh); the bwd kernel path never routes bb, so never cs."""
        if last_stage or not (_use_bb(H, W)
                              and _lepe_dual_cs_route(split, C // 2)):
            return ps
        (n1s_, n1b_, wh_, bh_, wv_, bv_, lk0_, lb0_, lk1_, lb1_,
         *rest_) = ps
        lkc = jnp.concatenate([lk0_.transpose(1, 0, 2), lk1_], -1)
        lbc = jnp.concatenate([lb0_, lb1_])
        return (n1s_, n1b_, wh_, bh_, wv_, bv_, lkc, lbc, lk1_, lb1_,
                *rest_)

    if use_xt == "fold" and not last_stage:
        fold_params = _with_cs_merge(_xt_kernel_params(params, C))
        kern = functools.partial(
            _block_kernel_fold, H=H, W=W, C=C, heads=heads, split=split,
            scale=scale, qkv_bias=qkv_bias, G=G, droppath=droppath,
        )
        return pl.pallas_call(
            kern,
            in_specs=[x_spec]
            + [full(p.shape) for p in fold_params]
            + [dp_spec, dp_spec],
            **common,
        )(x, *fold_params, dp0, dp1)

    if use_xt == "vh" and not last_stage:
        # Hoist the vertical branch's LN+qkv dot to XLA, fused with the
        # transpose pass: the kernel streams qkv_vT (3·half channels in the
        # transposed layout) instead of xᵀ (C channels) and skips its
        # in-kernel second LN+dot. Same math bit-for-bit up to the usual
        # bf16 rounding (the XLA LN is the same f32 formulation).
        half = C // 2
        vh_params = _with_cs_merge(_xt_kernel_params(params, C))
        wqkv_v, bqkv_v = vh_params[4], vh_params[5]
        xn = _layernorm(x.reshape(B * H * W, C), params[0], params[1])
        qv = _dot(xn, wqkv_v, bqkv_v if qkv_bias else None)
        qvT = (qv.reshape(B, H, W, 3 * half).transpose(0, 2, 1, 3))
        qv_spec = pl.BlockSpec((G, W, H, 3 * half), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        kern = functools.partial(
            _block_kernel_vh, H=H, W=W, C=C, heads=heads, split=split,
            scale=scale, qkv_bias=qkv_bias, G=G, droppath=droppath,
        )
        return pl.pallas_call(
            kern,
            in_specs=[x_spec, qv_spec]
            + [full(p.shape) for p in vh_params] + [dp_spec, dp_spec],
            **common,
        )(x, qvT, *vh_params, dp0, dp1)

    if use_xt and not last_stage:
        xt = x.transpose(0, 2, 1, 3)  # XLA HBM transpose, fuses upstream
        xt_params = _with_cs_merge(_xt_kernel_params(params, C))
        xt_spec = pl.BlockSpec((G, W, H, C), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM)
        kern = functools.partial(
            _block_kernel_xt, H=H, W=W, C=C, heads=heads, split=split,
            scale=scale, qkv_bias=qkv_bias, G=G, droppath=droppath,
        )
        return pl.pallas_call(
            kern,
            in_specs=[x_spec, xt_spec] + [full(p.shape) for p in xt_params]
            + [dp_spec, dp_spec],
            **common,
        )(x, xt, *xt_params, dp0, dp1)

    kern = functools.partial(
        _block_kernel, H=H, W=W, C=C, heads=heads, split=split,
        last_stage=last_stage, scale=scale, qkv_bias=qkv_bias, G=G,
        droppath=droppath,
    )
    return pl.pallas_call(
        kern,
        in_specs=[x_spec] + [full(p.shape) for p in params]
        + [dp_spec, dp_spec],
        **common,
    )(x, *params, dp0, dp1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def fused_cswin_block(x, params, dps, H, W, C, heads, split, last_stage, scale,
                      qkv_bias):
    """Fused block forward. ``params`` is the 16-tuple
    (n1s, n1b, qkvk, qkvb, lk0, lb0, lk1, lb1, projk, projb, n2s, n2b,
    fc1k, fc1b, fc2k, fc2b); LePE kernels are (3, 3, C_branch). ``dps`` is
    None (deterministic) or a pair of (B, 1) per-sample drop-path
    multipliers (mask/(1-p)) for the attention and MLP residuals."""
    return _fused_block_fwd(x, params, dps, H=H, W=W, C=C, heads=heads,
                            split=split, last_stage=last_stage, scale=scale,
                            qkv_bias=qkv_bias)


def composed_block(x, params, H, W, C, heads, split, last_stage, scale,
                   qkv_bias, dps=None):
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
    att = att.reshape(B, H, W, C)
    if dps is not None:
        att = att * dps[0][:, :, None, None].astype(att.dtype)
    x1 = x + att

    y = ln(x1, n2s, n2b)
    y = (jnp.dot(y.reshape(B, H * W, C), fc1k.astype(x.dtype),
                 preferred_element_type=jnp.float32) + fc1b).astype(x.dtype)
    y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
    y = (jnp.dot(y, fc2k.astype(x.dtype),
                 preferred_element_type=jnp.float32) + fc2b).astype(y.dtype)
    y = y.reshape(B, H, W, C)
    if dps is not None:
        y = y * dps[1][:, :, None, None].astype(y.dtype)
    return x1 + y


def _fwd(x, params, dps, *static):
    return fused_cswin_block(x, params, dps, *static), (x, params, dps)


def _bwd(*args):
    static, residuals, g = args[:-2], args[-2], args[-1]
    H, W, C, heads, split, last_stage, scale, qkv_bias = static
    x, params, dps = residuals
    if not last_stage and H >= 28:
        # Hand-written fused backward kernel: one in-VMEM recompute of the
        # forward + analytic vjp. Wins where activations are large (bs128
        # measured: stage 1 10.1 vs 18.8 ms replay, stage 2 7.3 vs 13.1);
        # at 14x14 the replay's saved-activation XLA bwd is cheaper
        # (3.2 vs 4.9 ms) because HBM traffic is no longer the constraint.
        return _fused_block_bwd_xt(
            x, params, dps, g, H=H, W=W, C=C, heads=heads, split=split,
            scale=scale, qkv_bias=qkv_bias)
    _, vjp = jax.vjp(
        lambda a, p, d: composed_block(a, p, *static, dps=d), x, params, dps
    )
    return vjp(g)


fused_cswin_block.defvjp(_fwd, _bwd)
