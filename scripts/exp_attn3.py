#!/usr/bin/env python
"""Price the stage-3 attention INTERNALS at production shapes.

The true deletion profile (ROADMAP) puts ~0.65 ms of the 1.08 ms stage-3
block in the two attention branches. This times dedicated Pallas kernels at
the exact production geometry — G=4 images/program, both branches stacked:
16 windows of (98, 128), h2=4 heads, d=32 — one sub-computation each:

  copy        bare DMA floor for the qkv working set
  full        production _attn_windows_hb
  off         production _attn_windows (per-head narrow dots)
  dots        HB tiling + both wide dots, softmax replaced by a cast
  tile        the kb/vb block-diagonal tiling alone
  softmax     the per-segment softmax alone on a precomputed score shape
  sm_global   HB with ONE global-row-max softmax + selector-matmul denoms
  sm_global_e same, exp in bf16
  lepe        production _lepe_windows at the branch window shape

Usage: python scripts/exp_attn3.py
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
G = 4                      # images per program (production stage-3 routing)
NW = 2 * G * 2             # both branches x G images x nW=2 windows
L, C2, HEADS = 98, 128, 4  # (sp*W, C/2, heads/2) at stage 3
D = C2 // HEADS
SCALE = D ** -0.5
GH, S = cb._hb_params(L, HEADS, D)  # (4, 128)


def run(name, kern, n_in=3, l=L):
    rng = np.random.default_rng(0)
    args = [jnp.asarray(rng.standard_normal(
        ((B // G) * NW, l, C2)).astype(np.float32)).astype(jnp.bfloat16)
        for _ in range(n_in)]
    spec = pl.BlockSpec((NW, l, C2), lambda b: (b, 0, 0),
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
        print(f"s3attn {name:14s}: {t*1000:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"s3attn {name:14s}: FAIL {str(e)[:140]}", flush=True)


def k_copy(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = (q_ref[...] + k_ref[...] + v_ref[...]).astype(q_ref.dtype)


def k_full(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = cb._attn_windows_hb(
        q_ref[...], k_ref[...], v_ref[...], HEADS, SCALE, merge=1)


def k_off(q_ref, k_ref, v_ref, o_ref):
    o_ref[...] = cb._attn_windows(
        q_ref[...], k_ref[...], v_ref[...], HEADS, SCALE, merge=1)


def _tiles(k, v):
    blk, smask = cb._hb_masks(NW, L, L, C2, D, GH, S, k.dtype)
    tile = functools.partial(cb._hb_tile, gh=GH, S=S, blk=blk)
    return tile(k), tile(v), smask


def k_dots(q_ref, k_ref, v_ref, o_ref):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    kb, vb, smask = _tiles(k, v)
    s = jax.lax.dot_general(q * SCALE, kb, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = (s * 1e-4).astype(q.dtype)  # softmax stub: wrong math, same shape
    out = jax.lax.dot_general(p, vb, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(q.dtype)


def k_tile(q_ref, k_ref, v_ref, o_ref):
    k, v = k_ref[...], v_ref[...]
    kb, vb, _ = _tiles(k, v)
    o_ref[...] = (kb[:, :L, :] + vb[:, :L, :]).astype(k.dtype)


def k_softmax(q_ref, k_ref, v_ref, o_ref):
    # softmax cost on a score-shaped f32 tensor fabricated from the inputs
    # by ONE cheap wide dot (priced by k_dots' dot half); output folded
    # back by summing the 4 segments.
    q, k = q_ref[...], k_ref[...]
    kb, _, smask = _tiles(k, q)
    s = jax.lax.dot_general(q * SCALE, kb, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = cb._hb_softmax(s + smask, GH, S)
    acc = sum(p[:, :, h * S : h * S + C2] for h in range(GH))
    o_ref[...] = (acc * 1e-6).astype(q.dtype) + q


def _global_softmax(s, exp_dtype):
    # ONE row max over all gh*S lanes (valid shared stabilizer), exp, then
    # per-segment denominators via a constant block-diagonal selector
    # matmul on the MXU; masked lanes are exp(-1e9) == 0 already.
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp((s - m).astype(exp_dtype))
    ii = jax.lax.broadcasted_iota(jnp.int32, (GH * S, GH * S), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (GH * S, GH * S), 1)
    sel = (ii // S == jj // S).astype(e.dtype)
    den = jax.lax.dot_general(e, sel, (((2,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return e.astype(jnp.float32) / jnp.maximum(den, 1e-30)


def _k_smg(q_ref, k_ref, v_ref, o_ref, exp_dtype):
    q, k, v = q_ref[...], k_ref[...], v_ref[...]
    kb, vb, smask = _tiles(k, v)
    s = jax.lax.dot_general(q * SCALE, kb, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    p = _global_softmax(s + smask, exp_dtype).astype(q.dtype)
    out = jax.lax.dot_general(p, vb, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(q.dtype)


def k_lepe(q_ref, k_ref, v_ref, o_ref):
    v = v_ref[...].reshape(NW, 7, L // 7, C2)
    out = cb._lepe_windows(v, jnp.full((3, 3, C2), 0.01, jnp.float32),
                           jnp.zeros((C2,), jnp.float32))
    o_ref[...] = out.reshape(NW, L, C2).astype(q_ref.dtype) + q_ref[...] * 0


def main():
    print(f"geometry: {B // G} programs x {NW} windows of ({L},{C2}), "
          f"gh={GH} S={S}", flush=True)
    run("copy", k_copy)
    run("full", k_full)
    run("off", k_off)
    run("dots", k_dots)
    run("tile", k_tile)
    run("softmax", k_softmax)
    run("sm_global", functools.partial(_k_smg, exp_dtype=jnp.float32))
    run("sm_global_e", functools.partial(_k_smg, exp_dtype=jnp.bfloat16))
    run("lepe", k_lepe)


if __name__ == "__main__":
    main()
