#!/usr/bin/env python
"""In-situ A/B of the MXU-matmul LePE INSIDE the fused block kernel.

exp_lepe_mm.py prices the formulations in isolated kernels (where mm wins
3-4x); this script prices them inside the production whole-block kernel —
the number that actually routes — and first PARITY-CHECKS the mm-routed
block against the XLA composition on the real backend. Round-3 postmortem:
the in-situ mm lowering crashed the XLA:TPU compiler at every geometry
while the isolated kernel compiled fine, and the route flipped on isolated
numbers alone.

Every timing re-jits via ``_fused_block_fwd.__wrapped__`` — the module-level
mode flags are NOT part of the jit cache key (the exp_spine bug).

Usage: python scripts/exp_lepe_mm2.py [fwd|bwd|both] [stage ...]
  stages: 1 2 3 4 21 22 23 24 (see exp_hb.STAGES)
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

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import STAGES, chain_time, mk_params

B = int(os.environ.get("MM_B", "128"))


def fresh_fwd(H, W, C, heads, split, last, scale):
    return jax.jit(functools.partial(
        cb._fused_block_fwd.__wrapped__, H=H, W=W, C=C, heads=heads,
        split=split, last_stage=last, scale=scale, qkv_bias=True))


def fresh_bwd(H, W, C, heads, split, scale):
    return jax.jit(functools.partial(
        cb._fused_block_bwd_xt.__wrapped__, H=H, W=W, C=C, heads=heads,
        split=split, scale=scale, qkv_bias=True))


def parity(st, mode):
    """Fused block (mode-routed LePE) vs XLA composition, REAL backend."""
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    scale = (C // heads) ** -0.5
    rng = np.random.default_rng(0)
    params = mk_params(g, rng)
    x = jnp.asarray(rng.standard_normal((4, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    saved = (cb._LEPE_MM_MODE, cb._LEPE_MM_BWD_MODE)
    cb._LEPE_MM_MODE = cb._LEPE_MM_BWD_MODE = mode
    try:
        got = fresh_fwd(H, W, C, heads, split, last, scale)(x, params, None)
        ref = jax.jit(lambda a, p: cb.composed_block(
            a, p, H, W, C, heads, split, last, scale, True))(x, params)
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        print(f"stage {st} parity lepe_mm={mode}: rel_err {err:.2e}",
              flush=True)
        return err < 0.02
    except Exception as e:  # noqa: BLE001 — a compile abort IS the finding
        print(f"stage {st} parity lepe_mm={mode}: FAIL {str(e)[:200]}",
              flush=True)
        return False
    finally:
        cb._LEPE_MM_MODE, cb._LEPE_MM_BWD_MODE = saved


def time_stage(st, mode, what):
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    scale = (C // heads) ** -0.5
    rng = np.random.default_rng(0)
    params = mk_params(g, rng)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    saved = (cb._LEPE_MM_MODE, cb._LEPE_MM_BWD_MODE)
    cb._LEPE_MM_MODE = cb._LEPE_MM_BWD_MODE = mode
    try:
        if what in ("fwd", "both"):
            f = fresh_fwd(H, W, C, heads, split, last, scale)

            def fwd(xx, pp):
                return f(xx, pp, None).astype(xx.dtype) + xx * 1e-6

            t = chain_time(fwd, (x, params))
            print(f"stage {st} B={B} fwd lepe_mm={mode}: {t*1000:8.3f} ms",
                  flush=True)
        if what in ("bwd", "both") and not last:
            fb = fresh_bwd(H, W, C, heads, split, scale)

            def bwd(xx, pp, dd):
                dx, _, _ = fb(xx, pp, None, dd)
                return dx.astype(xx.dtype) + xx * 1e-6

            t = chain_time(bwd, (x, params, x.astype(jnp.float32)))
            print(f"stage {st} B={B} bwd lepe_mm={mode}: {t*1000:8.3f} ms",
                  flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"stage {st} B={B} lepe_mm={mode}: FAIL {str(e)[:200]}",
              flush=True)
    finally:
        cb._LEPE_MM_MODE, cb._LEPE_MM_BWD_MODE = saved


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    stages = [int(a) for a in sys.argv[2:]] or [3, 2, 1, 4]
    # MM_SKIP_PARITY=1: skip the bs-4 parity pre-check (2 fresh compiles per
    # stage) when the mm lowering at these geometries is already gate-green
    # (bench.py check) and the tunnel's compile helper is degraded — the
    # timing chains themselves fail loudly on a broken lowering.
    skip_parity = os.environ.get("MM_SKIP_PARITY", "0") == "1"
    for st in stages:
        ok = True if skip_parity else parity(st, "mm")
        time_stage(st, "shift", what)
        if ok:
            time_stage(st, "mm", what)


if __name__ == "__main__":
    main()
