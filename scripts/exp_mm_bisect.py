#!/usr/bin/env python
"""Bisect the in-situ MXU-LePE Mosaic crash (round-3 postmortem).

The isolated mm kernel (exp_lepe_mm.py k_mm: constant lk, v as the direct
kernel input) compiles on the real chip; the same formulation inside the
fused block kernel aborts the XLA:TPU compiler ("Check failed:
limits[i] <= dim(i)"). This script compiles a LADDER of kernels between
those two endpoints, each adding ONE in-situ ingredient, to localize which
ingredient breaks the lowering:

  a. const-lk, v direct input            (exp_lepe_mm.py k_mm — known good)
  b. lk/lb as kernel REF inputs          (dynamic weights)
  c. b + swap=True                       (vertical-branch tap order)
  d. b + v from a LANE SLICE of a packed (N, L, 3c) qkv-like input
  e. d + attention on the packed q/k/v, out + lepe  (the branch shape)
  f. dual_mm on branch-stacked windows   (_lepe_windows_dual_mm)
  g. full _block_body_xt with _LEPE_MM_MODE='mm'    (known bad)

Usage: python scripts/exp_mm_bisect.py [s3|s2|s1|s4 ...] [--steps abcdefg]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import functools

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import STAGES, mk_params

# Per-branch window geometry: (n_windows_per_program, sp_h, sp_w, c, heads)
GEOS = {
    "s1": (56, 1, 56, 32, 1),
    "s2": (14, 2, 28, 64, 2),
    "s3": (2, 7, 14, 128, 4),
    "s4": (1, 7, 7, 512, 16),
}


def _try(name, fn, *args):
    try:
        out = jax.block_until_ready(fn(*args))
        print(f"  {name}: OK {np.asarray(out).shape}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001 — the compile abort IS the finding
        msg = str(e).replace("\n", " | ")[:300]
        print(f"  {name}: FAIL {msg}", flush=True)
        return False


def call(kern, inputs, out_shape):
    specs = [pl.BlockSpec(x.shape, functools.partial(
        lambda r: (0,) * r, len(x.shape)), memory_space=pltpu.VMEM)
        for x in inputs]
    return pl.pallas_call(
        kern,
        in_specs=specs,
        out_specs=pl.BlockSpec(out_shape.shape, functools.partial(
            lambda r: (0,) * r, len(out_shape.shape)),
            memory_space=pltpu.VMEM),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=INTERPRET,
    )(*inputs)


INTERPRET = "--interpret" in sys.argv


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    steps = "abcdefg"
    for a in sys.argv[1:]:
        if a.startswith("--steps"):
            steps = a.split("=", 1)[1]
    geos = args or ["s3", "s2", "s1", "s4"]
    rng = np.random.default_rng(0)

    for nm in geos:
        NW, sph, spw, c, heads = GEOS[nm]
        L = sph * spw
        print(f"{nm}: {NW} windows ({sph}x{spw}, c={c})", flush=True)
        v = jnp.asarray(rng.standard_normal((NW, L, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        qkv = jnp.asarray(rng.standard_normal((NW, L, 3 * c)).astype(
            np.float32)).astype(jnp.bfloat16)
        lk = jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32))
        lb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
        oshape = jax.ShapeDtypeStruct((NW, L, c), jnp.bfloat16)

        if "a" in steps:
            def k_a(v_ref, o_ref):
                out = cb._lepe_windows_mm(
                    v_ref[...].reshape(NW, sph, spw, c),
                    jnp.full((3, 3, c), 0.01, jnp.float32),
                    jnp.zeros((c,), jnp.float32))
                o_ref[...] = out.reshape(NW, L, c).astype(o_ref.dtype)
            _try("a const-lk direct-v", lambda vv: call(k_a, [vv], oshape), v)

        if "b" in steps:
            def k_b(v_ref, lk_ref, lb_ref, o_ref):
                out = cb._lepe_windows_mm(
                    v_ref[...].reshape(NW, sph, spw, c),
                    lk_ref[...], lb_ref[...])
                o_ref[...] = out.reshape(NW, L, c).astype(o_ref.dtype)
            _try("b ref-lk", lambda *a: call(k_b, list(a), oshape), v, lk, lb)

        if "c" in steps:
            def k_c(v_ref, lk_ref, lb_ref, o_ref):
                out = cb._lepe_windows_mm(
                    v_ref[...].reshape(NW, sph, spw, c),
                    lk_ref[...], lb_ref[...], swap=True)
                o_ref[...] = out.reshape(NW, L, c).astype(o_ref.dtype)
            _try("c ref-lk swap", lambda *a: call(k_c, list(a), oshape),
                 v, lk, lb)

        if "d" in steps:
            def k_d(qkv_ref, lk_ref, lb_ref, o_ref):
                vv = qkv_ref[...][:, :, 2 * c:]
                out = cb._lepe_windows_mm(
                    vv.reshape(NW, sph, spw, c), lk_ref[...], lb_ref[...])
                o_ref[...] = out.reshape(NW, L, c).astype(o_ref.dtype)
            _try("d lane-sliced v", lambda *a: call(k_d, list(a), oshape),
                 qkv, lk, lb)

        if "e" in steps:
            scale = (c // heads) ** -0.5

            def k_e(qkv_ref, lk_ref, lb_ref, o_ref):
                z = qkv_ref[...]
                q, k, vv = z[:, :, :c], z[:, :, c:2 * c], z[:, :, 2 * c:]
                out = cb._attn_auto(q, k, vv, heads, scale)
                lepe = cb._lepe_windows_mm(
                    vv.reshape(NW, sph, spw, c), lk_ref[...], lb_ref[...])
                out = out.reshape(NW, sph, spw, c) + lepe
                o_ref[...] = out.reshape(NW, L, c).astype(o_ref.dtype)
            _try("e attn+lepe", lambda *a: call(k_e, list(a), oshape),
                 qkv, lk, lb)

        if "f" in steps:
            v2 = jnp.concatenate([v, v], 0)
            oshape2 = jax.ShapeDtypeStruct((2 * NW, L, c), jnp.bfloat16)

            def k_f(v_ref, lk_ref, lb_ref, o_ref):
                out = cb._lepe_windows_dual_mm(
                    v_ref[...].reshape(2 * NW, sph, spw, c),
                    lk_ref[...], lb_ref[...], lk_ref[...], lb_ref[...], NW)
                o_ref[...] = out.reshape(2 * NW, L, c).astype(o_ref.dtype)
            _try("f dual_mm", lambda *a: call(k_f, list(a), oshape2),
                 v2, lk, lb)

    if "g" in steps:
        for st in (3, 2, 1, 4):
            g = STAGES[st]
            H, W, C, heads, split, last = (g["H"], g["W"], g["C"],
                                           g["heads"], g["split"], g["last"])
            scale = (C // heads) ** -0.5
            params = mk_params(g, rng)
            x = jnp.asarray(rng.standard_normal((4, H, W, C)).astype(
                np.float32)).astype(jnp.bfloat16)
            saved = cb._LEPE_MM_MODE
            cb._LEPE_MM_MODE = "mm"
            try:
                f = jax.jit(functools.partial(
                    cb._fused_block_fwd.__wrapped__, H=H, W=W, C=C,
                    heads=heads, split=split, last_stage=last, scale=scale,
                    qkv_bias=True))
                _try(f"g full-block stage {st}", f, x, params, None)
            finally:
                cb._LEPE_MM_MODE = saved


if __name__ == "__main__":
    main()
