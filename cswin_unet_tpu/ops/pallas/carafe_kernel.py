"""Fused CARAFE reassembly + pixel-shuffle Pallas TPU kernel.

Computes out[b, u·r+i, u·w+j, c] = Σ_tap kern[b, r, w, tap·u²+(i·u+j)] ·
y[b, r+di-1, w+dj-1, c] entirely in VMEM: the zero-padded tap shifts, the
144 lane-broadcast FMAs and the pixel-shuffle interleave never touch HBM —
only y, the softmaxed kernels, and the final high-res output do.

Why: XLA executes the tap contraction at VPU rate but spends >8x the
minimum on materialized patch tensors, (C, up²) intermediates and the
shuffle transpose (34 ms of a 99 ms bs-128 forward for the final x4 stage,
scripts/profile_parts.py). The VMEM-resident form approaches the ~5 ms
compute+write floor.

Inputs are the post-hoisted-conv activations ``y`` (see ops/carafe.py: the
1x1 out-conv weight commutes below the upsample) and pre-softmaxed kernels
in the encoder's native tap-major channel layout (tap·u² + s). The backward
pass runs through the XLA formulation via custom_vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(yp_ref, k_ref, o_ref, *, up, th, ksize):
    # yp_ref: (1, H+2p, W+2p, C) zero-padded image (padding done in XLA —
    # Mosaic has no value-level dynamic_slice, so the halo band is read from
    # the padded ref with pl.ds); k_ref: (1, th, W, k²·u²);
    # o_ref: (1, th·u, W·u, C)
    pad = ksize // 2
    _, Hp, Wp, C = yp_ref.shape
    W = Wp - 2 * pad
    t = pl.program_id(1)
    u = up

    rows = yp_ref[0, pl.ds(t * th, th + 2 * pad), :, :]
    kt = k_ref[0].astype(jnp.float32)  # (th, W, k²·u²)

    shifted = [
        rows[di : di + th, dj : dj + W, :].astype(jnp.float32)
        for di in range(ksize)
        for dj in range(ksize)
    ]

    i_pieces = []
    for i in range(u):
        j_pieces = []
        for j in range(u):
            s = i * u + j
            acc = jnp.zeros((th, W, C), jnp.float32)
            for tap in range(ksize * ksize):
                w_ = kt[:, :, tap * u * u + s : tap * u * u + s + 1]  # (th, W, 1)
                acc = acc + shifted[tap] * w_
            j_pieces.append(acc)
        # (th, W, u, C) -> (th, W·u, C): j interleaves along W
        row = jnp.stack(j_pieces, axis=2).reshape(th, W * u, C)
        i_pieces.append(row)
    # (th, u, W·u, C) -> (th·u, W·u, C): i interleaves along H
    out = jnp.stack(i_pieces, axis=1).reshape(th * u, W * u, C)
    o_ref[...] = out.astype(o_ref.dtype)[None]


def _pick_th(H: int, W: int, C: int, up: int) -> int:
    """Largest divisor of H keeping the f32 working set (~16 u² pieces +
    out block + y) under a few MB."""
    budget = 4 * 1024 * 1024
    best = 1
    for th in range(1, H + 1):
        if H % th:
            continue
        work = (up * up + 2) * th * W * C * 4 + th * up * W * up * C * 4
        if work <= budget:
            best = th
    return best


@functools.partial(jax.jit, static_argnames=("up", "ksize"))
def _reassemble_fwd(y, kern_sm, *, up, ksize):
    B, H, W, C = y.shape
    p = ksize // 2
    th = _pick_th(H, W, C, up)
    grid = (B, H // th)
    yp = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))

    return pl.pallas_call(
        functools.partial(_kernel, up=up, th=th, ksize=ksize),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H + 2 * p, W + 2 * p, C), lambda b, t: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, W, kern_sm.shape[-1]),
                         lambda b, t: (b, t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th * up, W * up, C),
                               lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * up, W * up, C), y.dtype),
        interpret=jax.default_backend() == "cpu",
    )(yp, kern_sm)


def _reassemble_xla(y, kern_sm, *, up, ksize):
    """Reference formulation of the same function (for the VJP)."""
    B, H, W, C = y.shape
    k2 = ksize * ksize
    kern = kern_sm.reshape(B, H, W, k2, up * up)
    p = ksize // 2
    yp = jnp.pad(y, ((0, 0), (p, p), (p, p), (0, 0)))
    patches = jnp.stack(
        [yp[:, di : di + H, dj : dj + W, :] for di in range(ksize) for dj in range(ksize)],
        axis=-1,
    )
    out = jnp.einsum("bhwck,bhwks->bhwcs", patches, kern,
                     preferred_element_type=jnp.float32).astype(y.dtype)
    out = out.reshape(B, H, W, C, up, up)
    out = out.transpose(0, 1, 4, 2, 5, 3)
    return out.reshape(B, H * up, W * up, C)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def carafe_reassemble(y, kern_sm, up, ksize):
    """out (B, up·H, up·W, C) from y (B, H, W, C) and softmaxed kernels
    (B, H, W, k²·up²) in tap-major layout."""
    return _reassemble_fwd(y, kern_sm, up=up, ksize=ksize)


def _fwd(y, kern_sm, up, ksize):
    return carafe_reassemble(y, kern_sm, up, ksize), (y, kern_sm)


def _bwd(up, ksize, residuals, g):
    y, kern_sm = residuals
    _, vjp = jax.vjp(lambda a, b: _reassemble_xla(a, b, up=up, ksize=ksize), y, kern_sm)
    return vjp(g)


carafe_reassemble.defvjp(_fwd, _bwd)
