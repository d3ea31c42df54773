#!/usr/bin/env python
"""In-situ pricing of the round-5 stage-1 formulations on TPU.

Two candidates from the round-4 deletion profile (s1 = 1.37 ms dual-stream
floor + 1.26 qkv_v(xt) + 1.11 MLP + 0.50 proj + ~2.3 attention at bs128):

- ``vh``  (use_xt="vh"): hoist the vertical LN+qkv dot to XLA, fused with
  the upstream transpose pass — the kernel streams qkv_vT (3·half ch)
  instead of xᵀ (C ch) and drops its in-kernel second LN+dot.
- ``cs``  (_LEPE_DUAL_MODE="cs"): channel-stack the two c=32 branch LePEs
  inside the bb path into one c=64 pass (half the VPU issues at double
  the lane fill).

Every timing re-jits via ``_fused_block_fwd.__wrapped__`` — module-level
mode flags are NOT part of the jit cache key (the exp_spine pitfall).

Usage: python scripts/exp_s1.py [stage ...]   (default: 1 21 22 2)
Env:   S1_B=128 batch size.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import STAGES, chain_time, mk_params

B = int(os.environ.get("S1_B", "128"))


def fresh_fwd(g, use_xt):
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    scale = (C // heads) ** -0.5
    return jax.jit(functools.partial(
        cb._fused_block_fwd.__wrapped__, H=H, W=W, C=C, heads=heads,
        split=split, last_stage=last, scale=scale, qkv_bias=True,
        use_xt=use_xt))


def parity(st, use_xt, dual):
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    scale = (C // heads) ** -0.5
    rng = np.random.default_rng(0)
    params = mk_params(g, rng)
    x = jnp.asarray(rng.standard_normal((4, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    saved = cb._LEPE_DUAL_MODE
    cb._LEPE_DUAL_MODE = dual
    try:
        got = fresh_fwd(g, use_xt)(x, params, None)
        ref = jax.jit(lambda a, p: cb.composed_block(
            a, p, H, W, C, heads, split, last, scale, True))(x, params)
        got = np.asarray(got, np.float32)
        ref = np.asarray(ref, np.float32)
        err = float(np.linalg.norm(got - ref) / np.linalg.norm(ref))
        print(f"stage {st} parity xt={use_xt} dual={dual}: rel_err {err:.2e}",
              flush=True)
        return err < 0.02
    except Exception as e:  # noqa: BLE001 — a compile abort IS the finding
        print(f"stage {st} parity xt={use_xt} dual={dual}: FAIL "
              f"{str(e)[:200]}", flush=True)
        return False
    finally:
        cb._LEPE_DUAL_MODE = saved


def time_variant(st, use_xt, dual, label):
    g = STAGES[st]
    rng = np.random.default_rng(0)
    params = mk_params(g, rng)
    x = jnp.asarray(
        rng.standard_normal((B, g["H"], g["W"], g["C"])).astype(np.float32)
    ).astype(jnp.bfloat16)
    saved = cb._LEPE_DUAL_MODE
    cb._LEPE_DUAL_MODE = dual
    try:
        f = fresh_fwd(g, use_xt)

        def fwd(xx, pp):
            return f(xx, pp, None).astype(xx.dtype) + xx * 1e-6

        t = chain_time(fwd, (x, params))
        print(f"stage {st} B={B} {label}: {t*1000:8.3f} ms", flush=True)
        return t
    except Exception as e:  # noqa: BLE001
        print(f"stage {st} B={B} {label}: FAIL {str(e)[:200]}", flush=True)
        return None
    finally:
        cb._LEPE_DUAL_MODE = saved


def main():
    stages = [int(a) for a in sys.argv[1:]] or [1, 21, 22, 2]
    for st in stages:
        bb_here = cb._use_bb(STAGES[st]["H"], STAGES[st]["W"])
        variants = [(True, "bs", "xt      (prod)")]
        if parity(st, "vh", "bs"):
            variants.append(("vh", "bs", "vh          "))
        if bb_here and parity(st, True, "cs"):
            variants.append((True, "cs", "xt+cs       "))
        if bb_here and parity(st, "vh", "cs"):
            variants.append(("vh", "cs", "vh+cs       "))
        for use_xt, dual, label in variants:
            time_variant(st, use_xt, dual, label)


if __name__ == "__main__":
    main()
