#!/usr/bin/env python
"""Minimal single-compile probe for the 384/bs32 scoped-VMEM failure: one
jit of ONE fused block forward (no scan chain — the chained graphs are what
OOM the remote compile helper) at a given (limit_mb, bs, geometry). Prints
OK + a crude timing or the first 400 chars of the compile error.

Usage: python scripts/exp_vmem_probe.py <limit_mb> [bs] [s1|s2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import functools

import jax.numpy as jnp
import numpy as np

import cswin_unet_tpu.ops.pallas.cswin_block as cb
from exp_hb import mk_params

GEOS = {
    "s1": dict(H=96, W=96, C=96, heads=4, split=1, last=False),
    "s2": dict(H=48, W=48, C=192, heads=8, split=2, last=False),
}


def main():
    limit_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    bs = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    geo = GEOS[sys.argv[3] if len(sys.argv) > 3 else "s1"]
    H, W, C, heads, split, last = (geo["H"], geo["W"], geo["C"],
                                   geo["heads"], geo["split"], geo["last"])
    scale = (C // heads) ** -0.5

    cb._FWD_VMEM_LIMIT_MB = limit_mb
    cb._FWD_VMEM_LIMIT_LARGE_MB = limit_mb

    rng = np.random.default_rng(0)
    params = mk_params(dict(geo, split=split), rng)
    x = jnp.asarray(rng.standard_normal((bs, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    # +x*1e-6 forces XLA to keep an elementwise consumer around the custom
    # call, matching how the block sits inside the real model graph.
    f = jax.jit(lambda xx, pp: cb._fused_block_fwd.__wrapped__(
        xx, pp, None, H=H, W=W, C=C, heads=heads, split=split,
        last_stage=last, scale=scale, qkv_bias=True) + xx * 1e-6)

    try:
        y = f(x, params)
        y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(5):
            y = f(x, params)
        y.block_until_ready()
        dt = (time.perf_counter() - t0) / 5
        print(f"limit={limit_mb}M bs={bs} {H}x{W}x{C}: OK {dt*1000:8.3f} ms"
              f" (single-call incl dispatch)", flush=True)
    except Exception as e:  # noqa: BLE001 — the compile abort IS the finding
        print(f"limit={limit_mb}M bs={bs} {H}x{W}x{C}: FAIL {str(e)[:400]}",
              flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
