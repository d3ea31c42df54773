#!/usr/bin/env python
"""Fine-grained bisect of the in-situ MXU-LePE crash, round 2.

exp_mm_bisect.py localized the abort to ONE ingredient: lk/lb arriving as
kernel REF inputs (step a, const lk -> OK; step b, ref lk -> SIGABRT in the
XLA:TPU compiler). This ladder splits step b into its sub-ingredients and
prices the candidate reformulations that avoid the suspect pattern:

  b0. ref-lk, SINGLE tap (no concat): Vw = v2 * lk[1,1]; A built for nt=1
  b1. ref-lk, concat of 9 products, but NO dot (output Vw directly)
  b2. iota-built non-trivial CONST lk (tests const-ness vs ref-ness)
  b3. ref-lk reshaped to (9, c) before tap indexing
  b4. mm9: out = sum_t (A_t @ v2) * w_t -- nt SMALL dots, no concat,
      identical FLOPs to the one big dot (9*L^2*c == L*(9L)*c)
  b5. mm9 with f32 tap weights (skip the .astype(dt) on w)

Each variant also gets a parity check vs the shift-form oracle when it
compiles. Usage: python scripts/exp_mm_bisect2.py [s3|s2|s1|s4 ...]
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

GEOS = {
    "s1": (56, 1, 56, 32),
    "s2": (14, 2, 28, 64),
    "s3": (2, 7, 14, 128),
    "s4": (1, 7, 7, 512),
}

INTERPRET = "--interpret" in sys.argv


def lepe_mm_A(sp_h, sp_w, nt_L, dt):
    """The round-3 single-big-dot constant: A (L, nt*L) with
    A[r, t*L + r - o_t] = 1 (kept here verbatim after the production code
    moved to the per-tap At form — this script documents why)."""
    L = sp_h * sp_w
    taps = cb._lepe_mm_taps(sp_h, sp_w)
    rr = jax.lax.broadcasted_iota(jnp.int32, (L, nt_L), 0)
    mm = jax.lax.broadcasted_iota(jnp.int32, (L, nt_L), 1)
    tt = mm // L
    lp = mm % L
    ii = rr // sp_w
    jj = rr % sp_w
    A = None
    for ti, (di, dj) in enumerate(taps):
        ok = ((tt == ti) & (lp == rr - (di * sp_w + dj))
              & (ii - di >= 0) & (ii - di < sp_h)
              & (jj - dj >= 0) & (jj - dj < sp_w))
        A = ok if A is None else (A | ok)
    return A.astype(dt)


def lepe_mm_big(vw, lk, lb, swap=False):
    """The round-3 single-big-dot mm formulation (pre-weighted concat into
    one batched dot) — the form whose in-situ lowering crashes; kept for
    the b2 const-lk probe."""
    n, sp_h, sp_w, c = vw.shape
    dt = vw.dtype
    L = sp_h * sp_w
    taps = cb._lepe_mm_taps(sp_h, sp_w)
    v2 = vw.reshape(n, L, c)
    ws = [(lk[1 - dj, 1 - di] if swap else lk[1 - di, 1 - dj]).astype(dt)
          for di, dj in taps]
    Vw = jnp.concatenate([v2 * w for w in ws], axis=1)
    A = lepe_mm_A(sp_h, sp_w, len(taps) * L, dt)
    Ab = jnp.broadcast_to(A[None], (n,) + A.shape)
    out = jax.lax.dot_general(Ab, Vw, (((2,), (1,)), ((0,), (0,))),
                              preferred_element_type=jnp.float32)
    return (out + lb.astype(jnp.float32)).astype(dt).reshape(vw.shape)


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


def _try(name, fn, *args, oracle=None):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa: BLE001 — the compile abort IS the finding
        msg = str(e).replace("\n", " | ")[:220]
        print(f"  {name}: FAIL {msg}", flush=True)
        return None
    tag = ""
    if oracle is not None:
        o = np.asarray(oracle, np.float32)
        g = np.asarray(out, np.float32)
        rel = np.abs(g - o).max() / (np.abs(o).max() + 1e-9)
        tag = f" rel_err={rel:.2e}"
    print(f"  {name}: OK{tag}", flush=True)
    return out


def lepe_mm9(v2, lk, lb, sp_h, sp_w, swap=False, f32_taps=False):
    """Candidate: nt SMALL dots -- out = sum_t (A_t @ v2) * w_t."""
    n, L, c = v2.shape
    dt = v2.dtype
    taps = cb._lepe_mm_taps(sp_h, sp_w)
    rr = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    pp = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    ii = rr // sp_w
    jj = rr % sp_w
    out = None
    for di, dj in taps:
        w = (lk[1 - dj, 1 - di] if swap else lk[1 - di, 1 - dj])
        w = w.astype(jnp.float32) if f32_taps else w.astype(dt)
        ok = ((pp == rr - (di * sp_w + dj))
              & (ii - di >= 0) & (ii - di < sp_h)
              & (jj - dj >= 0) & (jj - dj < sp_w))
        At = jnp.broadcast_to(ok.astype(dt)[None], (n, L, L))
        term = jax.lax.dot_general(
            At, v2, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * w
        out = term if out is None else out + term
    return (out + lb.astype(jnp.float32)).astype(dt)


def main():
    geos = [a for a in sys.argv[1:] if not a.startswith("--")] or ["s3"]
    rng = np.random.default_rng(0)
    for nm in geos:
        NW, sph, spw, c = GEOS[nm]
        L = sph * spw
        print(f"{nm}: {NW} windows ({sph}x{spw}, c={c})", flush=True)
        v = jnp.asarray(rng.standard_normal((NW, L, c)).astype(np.float32)
                        ).astype(jnp.bfloat16)
        lk = jnp.asarray(rng.standard_normal((3, 3, c)).astype(np.float32))
        lb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
        oshape = jax.ShapeDtypeStruct((NW, L, c), jnp.bfloat16)
        vw = v.reshape(NW, sph, spw, c)
        oracle = cb._lepe_windows_2d(vw, lk, lb).reshape(NW, L, c)

        # b0: ref-lk, single center tap only, nt=1 "concat", one dot.
        def k_b0(v_ref, lk_ref, lb_ref, o_ref):
            v2 = v_ref[...]
            w = lk_ref[...][1, 1].astype(v2.dtype)
            Vw = v2 * w
            A = jnp.eye(L, dtype=v2.dtype)  # identity: single tap (0,0) selector
            Ab = jnp.broadcast_to(A[None], (NW, L, L))
            out = jax.lax.dot_general(
                Ab, Vw, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[...] = (out + lb_ref[...]).astype(o_ref.dtype)
        _try("b0 ref-lk single-tap dot", lambda *a: call(k_b0, list(a),
             oshape), v, lk, lb)

        # b1: ref-lk, the 9-product concat, NO dot (sum pieces instead).
        def k_b1(v_ref, lk_ref, lb_ref, o_ref):
            v2 = v_ref[...]
            taps = cb._lepe_mm_taps(sph, spw)
            ws = [lk_ref[...][1 - di, 1 - dj].astype(v2.dtype)
                  for di, dj in taps]
            Vw = jnp.concatenate([v2 * w for w in ws], axis=1)
            acc = sum(Vw[:, t * L:(t + 1) * L] for t in range(len(taps)))
            o_ref[...] = (acc.astype(jnp.float32)
                          + lb_ref[...]).astype(o_ref.dtype)
        _try("b1 concat-of-products no-dot", lambda *a: call(k_b1, list(a),
             oshape), v, lk, lb)

        # b2: CONST but non-trivial lk (iota-built) + the full mm path.
        def k_b2(v_ref, o_ref):
            ci = jax.lax.broadcasted_iota(jnp.float32, (3, 3, c), 2)
            lkc = 0.01 * (ci % 7.0) - 0.02
            out = lepe_mm_big(
                v_ref[...].reshape(NW, sph, spw, c), lkc,
                jnp.zeros((c,), jnp.float32))
            o_ref[...] = out.reshape(NW, L, c).astype(o_ref.dtype)
        _try("b2 iota-const lk full-mm", lambda vv: call(k_b2, [vv],
             oshape), v)

        # b3: ref-lk flattened to (9, c) rows before tap indexing.
        def k_b3(v_ref, lk_ref, lb_ref, o_ref):
            v2 = v_ref[...]
            lk9 = lk_ref[...].reshape(9, c)
            taps = cb._lepe_mm_taps(sph, spw)
            ws = [lk9[3 * (1 - di) + (1 - dj)].astype(v2.dtype)
                  for di, dj in taps]
            Vw = jnp.concatenate([v2 * w for w in ws], axis=1)
            A = lepe_mm_A(sph, spw, len(taps) * L, v2.dtype)
            Ab = jnp.broadcast_to(A[None], (NW,) + A.shape)
            out = jax.lax.dot_general(
                Ab, Vw, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)
            o_ref[...] = (out + lb_ref[...]).astype(o_ref.dtype)
        _try("b3 (9,c)-lk full-mm", lambda *a: call(k_b3, list(a), oshape),
             v, lk, lb, oracle=oracle)

        # b4: mm9 -- nt small dots, no concat.
        def k_b4(v_ref, lk_ref, lb_ref, o_ref):
            out = lepe_mm9(v_ref[...], lk_ref[...], lb_ref[...], sph, spw)
            o_ref[...] = out.astype(o_ref.dtype)
        _try("b4 mm9 small-dots", lambda *a: call(k_b4, list(a), oshape),
             v, lk, lb, oracle=oracle)

        # b5: mm9, f32 taps.
        def k_b5(v_ref, lk_ref, lb_ref, o_ref):
            out = lepe_mm9(v_ref[...], lk_ref[...], lb_ref[...], sph, spw,
                           f32_taps=True)
            o_ref[...] = out.astype(o_ref.dtype)
        _try("b5 mm9 f32-taps", lambda *a: call(k_b5, list(a), oshape),
             v, lk, lb, oracle=oracle)


if __name__ == "__main__":
    main()
