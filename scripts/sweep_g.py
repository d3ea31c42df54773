#!/usr/bin/env python
"""Sweep images-per-program (G) for the fused block kernel at each stage
geometry, bs 128. Informs _default_g in ops/pallas/cswin_block.py."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cswin_unet_tpu.ops.pallas.cswin_block import _fused_block_fwd

STAGES = {
    1: dict(H=56, W=56, C=64, heads=2, split=1, last=False),
    2: dict(H=28, W=28, C=128, heads=4, split=2, last=False),
    3: dict(H=14, W=14, C=256, heads=8, split=7, last=False),
    4: dict(H=7, W=7, C=512, heads=16, split=7, last=True),
}


def build(stage):
    g = STAGES[stage]
    H, W, C, last = g["H"], g["W"], g["C"], g["last"]
    cb = C if last else C // 2
    rng = np.random.default_rng(0)

    def mk(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    params = (
        jnp.ones((C,)), jnp.zeros((C,)), mk(C, 3 * C), jnp.zeros((3 * C,)),
        mk(3, 3, cb), jnp.zeros((cb,)), mk(3, 3, cb), jnp.zeros((cb,)),
        mk(C, C), jnp.zeros((C,)), jnp.ones((C,)), jnp.zeros((C,)),
        mk(C, 4 * C), jnp.zeros((4 * C,)), mk(4 * C, C), jnp.zeros((C,)),
    )
    scale = (C // g["heads"]) ** -0.5
    return g, params, scale


def timeit(apply, params, x, ca=11, cb=31, n=3):
    def chained(p, x, k):
        def body(c, _):
            return c + 1e-6 * apply(p, c).astype(c.dtype), ()
        c, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(c)

    fa = jax.jit(lambda p, x: chained(p, x, ca))
    fb = jax.jit(lambda p, x: chained(p, x, cb))
    float(fa(params, x)); float(fb(params, x))

    def best(f):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter(); float(f(params, x)); ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fb) - best(fa)) / (cb - ca)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    stages = [int(s) for s in sys.argv[2:]] or [1, 2, 3, 4]
    for stage in stages:
        geo, params, scale = build(stage)
        H, W, C = geo["H"], geo["W"], geo["C"]
        x = jnp.asarray(
            np.random.default_rng(1).normal(size=(B, H, W, C)).astype(np.float32)
        ).astype(jnp.bfloat16)
        gs = tuple(int(v) for v in os.environ.get("SWEEP_GS", "1 2 4 8 16").split())
        for g in gs:
            if B % g:
                continue
            # VMEM guard: the kernel's f32 working set is ~8x the bf16 x
            # block; skip configs that would spill (they compile for many
            # minutes and can wedge the remote compile helper).
            if g * H * W * C * 2 * 10 > 8 * 2**20:
                print(f"stage {stage} G={g:2d}: skipped (VMEM estimate)", flush=True)
                continue
            # xt=False (in-kernel transpose fallback) hits a Mosaic compile-time
            # blowup at the 28x28 geometry; the model only uses xt=True for
            # dual-branch stages, so sweep it alone unless SWEEP_XT=all.
            if geo["last"]:
                xts = (False,)
            elif os.environ.get("SWEEP_XT") == "all":
                xts = (False, True)
            else:
                xts = (True,)
            for xt in xts:
                print(f"stage {stage} G={g:2d} xt={int(xt)}: compiling...", flush=True)
                try:
                    def apply(p, xx, g=g, xt=xt):
                        return _fused_block_fwd(
                            xx, p, H=H, W=W, C=C, heads=geo["heads"],
                            split=geo["split"], last_stage=geo["last"],
                            scale=scale, qkv_bias=True, g_images=g, use_xt=xt)
                    t = timeit(apply, params, x)
                    print(f"stage {stage} G={g:2d} xt={int(xt)}: {t*1000:7.3f} ms",
                          flush=True)
                except Exception as e:
                    print(f"stage {stage} G={g:2d} xt={int(xt)}: FAILED "
                          f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
