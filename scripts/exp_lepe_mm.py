#!/usr/bin/env python
"""Price the MXU-matmul LePE formulation against the flat VPU-shift form.

exp_attn3 showed the stage-3 attention core at 0.153 ms but the LePE pass
at 0.746 ms — 15x the DMA floor, all in non-8-aligned sublane concat
shifts. The matmul form eliminates every shift: out = A @ Vw, where
A (L, nt*L) is a constant 0/1 shift+boundary matrix (built from iota) and
Vw is nt channel-weighted copies of v stacked on sublanes. The 100x dense-
FLOP inflation rides the MXU, which is >100x faster than the shift path.

Geometries: stage 3 (7x14 windows, c=128), stage 2 (2x28, c=64),
stage 1 (1x56, c=32, 3-tap row conv).

Usage: python scripts/exp_lepe_mm.py [s3|s2|s1 ...]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import chain_time

B = 128

GEOS = {
    # name: (G, n_windows_per_program_both_branches, sp_h, sp_w, c)
    "s3": (4, 16, 7, 14, 128),
    "s2": (1, 28, 2, 28, 64),
    "s1": (1, 112, 1, 56, 32),
}


def run(name, kern, G, NW, sph, spw, c, n_in=1):
    L = sph * spw
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal(
        ((B // G) * NW, L, c)).astype(np.float32)).astype(jnp.bfloat16)
        for _ in range(n_in)]
    spec = pl.BlockSpec((NW, L, c), lambda b: (b, 0, 0),
                        memory_space=pltpu.VMEM)

    def fn(*qs):
        y = pl.pallas_call(
            kern,
            grid=(B // G,),
            in_specs=[spec] * n_in,
            out_specs=spec,
            out_shape=jax.ShapeDtypeStruct(qs[0].shape, qs[0].dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*qs)
        return y + qs[0] * 1e-6

    try:
        t = chain_time(fn, tuple(args), ca=10, cb_=40, n=4)
        print(f"lepe {name:14s}: {t*1000:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"lepe {name:14s}: FAIL {str(e)[:160]}", flush=True)


def k_flat(v_ref, o_ref, *, sph, spw, c):
    NW, L, _ = v_ref.shape
    v = v_ref[...].reshape(NW, sph, spw, c)
    out = cb._lepe_windows(v, jnp.full((3, 3, c), 0.01, jnp.float32),
                           jnp.zeros((c,), jnp.float32))
    o_ref[...] = out.reshape(NW, L, c).astype(v_ref.dtype)


def k_mm(v_ref, o_ref, *, sph, spw, c):
    NW, L, _ = v_ref.shape
    v = v_ref[...]
    out = cb._lepe_windows_mm(v.reshape(NW, sph, spw, c),
                              jnp.full((3, 3, c), 0.01, jnp.float32),
                              jnp.zeros((c,), jnp.float32))
    o_ref[...] = out.reshape(NW, L, c).astype(v_ref.dtype)


def check(sph, spw, c):
    """CPU (interpret) exactness: mm vs flat formulation."""
    rng = np.random.default_rng(1)
    n = 4
    vw = jnp.asarray(rng.standard_normal((n, sph, spw, c)).astype(np.float32))
    lk = jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32))
    lb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    for swap in (False, True):
        a = cb._lepe_windows(vw, lk, lb, swap=swap)
        b = cb._lepe_windows_mm(vw, lk, lb, swap=swap)
        err = float(jnp.max(jnp.abs(a - b)))
        print(f"  parity sph={sph} spw={spw} c={c} swap={swap}: {err:.2e}",
              flush=True)
        assert err < 1e-4


def main():
    which = sys.argv[1:] or ["s3", "s2", "s1"]
    for nm in which:
        G, NW, sph, spw, c = GEOS[nm]
        print(f"{nm}: {B // G} programs x {NW} windows of "
              f"({sph}x{spw},{c})", flush=True)
        # Pin the shift formulation for BOTH parity and the flat arm —
        # _lepe_windows routes by _LEPE_MM_MODE, and were mm ever the
        # "auto" default, the flat arm would silently price mm vs mm and
        # check() would compare mm against itself.
        saved = cb._LEPE_MM_MODE
        cb._LEPE_MM_MODE = "shift"
        try:
            check(sph, spw, c)
            run(f"{nm} flat",
                functools.partial(k_flat, sph=sph, spw=spw, c=c),
                G, NW, sph, spw, c)
        finally:
            cb._LEPE_MM_MODE = saved
        run(f"{nm} mm", functools.partial(k_mm, sph=sph, spw=spw, c=c),
            G, NW, sph, spw, c)


if __name__ == "__main__":
    main()
