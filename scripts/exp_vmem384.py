#!/usr/bin/env python
"""Root-cause/fix experiment for the round-4 384/bs32 regression: the fused
96x96 stage-1 block fails to compile at bs32 with "Scoped allocation with
size 68.04M and limit 64.05M exceeded scoped vmem limit by 4.00M" while bs8
passes. Per-program VMEM is batch-independent (G=1 there), so the overflow
is XLA-side: pallas' vmem_limit_bytes is emitted as a scoped_memory_configs
RESERVATION the XLA scheduler must co-place with its own VMEM-resident
buffers around the custom call — a 64M reservation leaves no headroom.

This script compiles the fused 384-s1 forward at a given batch size under a
given reservation, reporting compile ok/fail + chain time, to find the
kernel's true VMEM need and the largest-batch-compatible reservation.

Usage: python scripts/exp_vmem384.py <limit_mb> [bs] [geometry]
  geometry: s1 (default, 96x96x96) | s2 (48x48x192)
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
from exp_hb import chain_time, mk_params

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

    f = jax.jit(functools.partial(
        cb._fused_block_fwd.__wrapped__, H=H, W=W, C=C, heads=heads,
        split=split, last_stage=last, scale=scale, qkv_bias=True))

    def fwd(xx, pp):
        return f(xx, pp, None).astype(xx.dtype) + xx * 1e-6

    try:
        t = chain_time(fwd, (x, params))
        print(f"limit={limit_mb}M bs={bs} {H}x{W}x{C}: OK  "
              f"{t*1000:8.3f} ms/block", flush=True)
    except Exception as e:  # noqa: BLE001 — the compile abort IS the finding
        print(f"limit={limit_mb}M bs={bs} {H}x{W}x{C}: FAIL "
              f"{str(e)[:300]}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
