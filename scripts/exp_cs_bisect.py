#!/usr/bin/env python
"""Bisect the cs (channel-stacked dual LePE) Mosaic compile crash.

The bb-path cs formulation aborts the XLA:TPU compiler at 56x56
(1-D tap concats SIGABRT; with 2-D taps the helper still exits 1).
Each variant below compiles a minimal pallas kernel that adds ONE
suspect op class, at the exact stage-1 shapes (n windows of (1, 56, 32)
per branch, bf16), so the first failing variant names the culprit:

  k_concat   lane concat (n,56,32)+(n,56,32) -> (n,56,64), pass through
  k_taps     + the 3-tap row conv with 2-D (1,64) tap vectors
  k_slice4   + 4-D (n,1,56,64) reshape and [..., :32] lane slice
  k_slice3   + 3-D (n,56,64) lane slice instead
  k_full     the production _lepe_windows_dual_cs + split adds

Usage: python scripts/exp_cs_bisect.py [variant ...]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cswin_unet_tpu.ops.pallas.cswin_block as cb

N, SPW, HALF = 112, 56, 32  # G=1 at bs... per-program window count at s1


def k_concat(vt_ref, vw_ref, o_ref):
    vt = vt_ref[...]
    vw = vw_ref[...]
    o_ref[...] = jnp.concatenate([vt, vw], -1)


def k_taps(vt_ref, vw_ref, lk0_ref, lk1_ref, o_ref):
    vt = vt_ref[...]
    vw = vw_ref[...]
    lk0 = lk0_ref[...]
    lk1 = lk1_ref[...]
    v3 = jnp.concatenate([vt, vw], -1)
    dt = v3.dtype

    def tap(di, dj):
        return jnp.concatenate(
            [lk0[1 - dj, 1 - di].reshape(1, HALF),
             lk1[1 - di, 1 - dj].reshape(1, HALF)], 1).astype(dt)

    acc = v3 * tap(0, 0)
    for dj in (-1, 1):
        s = (jnp.concatenate([v3[:, :1] * 0, v3[:, :-1]], 1) if dj > 0
             else jnp.concatenate([v3[:, 1:], v3[:, :1] * 0], 1))
        acc += s * tap(0, dj)
    o_ref[...] = acc


def k_slice4(vt_ref, vw_ref, lk0_ref, lk1_ref, o_ref):
    vt = vt_ref[...]
    vw = vw_ref[...]
    lepe = jnp.concatenate([vt, vw], -1).reshape(N, 1, SPW, 2 * HALF)
    o_ref[...] = (lepe[..., :HALF] + lepe[..., HALF:]).reshape(N, SPW, HALF)


def k_slice3(vt_ref, vw_ref, lk0_ref, lk1_ref, o_ref):
    vt = vt_ref[...]
    vw = vw_ref[...]
    lepe = jnp.concatenate([vt, vw], -1)
    o_ref[...] = lepe[:, :, :HALF] + lepe[:, :, HALF:]


def k_full(vt_ref, vw_ref, lk0_ref, lk1_ref, o_ref):
    vt = vt_ref[...]
    vw = vw_ref[...]
    lk0 = lk0_ref[...]
    lk1 = lk1_ref[...]
    vcs = jnp.concatenate([vt, vw], -1)
    lepe = cb._lepe_windows_dual_cs(
        vcs.reshape(N, 1, SPW, 2 * HALF), lk0,
        jnp.zeros((HALF,), jnp.float32), lk1, jnp.zeros((HALF,), jnp.float32))
    o_ref[...] = (lepe[..., :HALF] + lepe[..., HALF:]).reshape(N, SPW, HALF)


KS = {"k_concat": (k_concat, False, 2 * HALF),
      "k_taps": (k_taps, True, 2 * HALF),
      "k_slice4": (k_slice4, True, HALF),
      "k_slice3": (k_slice3, True, HALF),
      "k_full": (k_full, True, HALF)}


def run(name):
    kern, with_taps, cout = KS[name]
    rng = np.random.default_rng(0)
    vt = jnp.asarray(rng.standard_normal((N, SPW, HALF)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    vw = jnp.asarray(rng.standard_normal((N, SPW, HALF)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    lk = jnp.asarray(rng.standard_normal((3, 3, HALF)).astype(np.float32))
    full = lambda s: pl.BlockSpec(s, lambda: tuple(0 for _ in s),
                                  memory_space=pltpu.VMEM)
    ins = [vt, vw] + ([lk, lk] if with_taps else [])
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[full(i.shape) for i in ins],
            out_specs=full((N, SPW, cout)),
            out_shape=jax.ShapeDtypeStruct((N, SPW, cout), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024),
            interpret=jax.default_backend() == "cpu",
        )(*ins)
        ok = bool(np.isfinite(np.asarray(out, np.float32)).all())
        print(f"{name}: COMPILED finite={ok}", flush=True)
    except Exception as e:  # noqa: BLE001 — the failure IS the finding
        print(f"{name}: FAIL {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    for v in (sys.argv[1:] or list(KS)):
        run(v)
