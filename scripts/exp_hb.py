#!/usr/bin/env python
"""A/B the head-block attention inside the fused CSWin block on TPU.

Chain-times the fused block forward (and the hand-written fused backward)
at each stage geometry with _HB_MODE = "off" (per-head narrow dots) vs
"on" (head-block wide dots). Timing uses scan-chain differencing — per-call
timers lie over the axon tunnel.

Usage: python scripts/exp_hb.py [fwd|bwd|both] [stage ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

import jax.numpy as jnp
import numpy as np
from jax import lax

import cswin_unet_tpu.ops.pallas.cswin_block as cb

STAGES = {
    1: dict(H=56, W=56, C=64, heads=2, split=1, last=False),
    2: dict(H=28, W=28, C=128, heads=4, split=2, last=False),
    3: dict(H=14, W=14, C=256, heads=8, split=7, last=False),
    4: dict(H=7, W=7, C=512, heads=16, split=7, last=True),
    # 2x-reso window patterns at REDUCED C (historical keys — round-3/4
    # measurements cite these; they are NOT the true base-384 channel
    # widths, see 31-34 below)
    23: dict(H=24, W=24, C=256, heads=8, split=12, last=False),
    24: dict(H=12, W=12, C=512, heads=16, split=12, last=True),
    22: dict(H=48, W=48, C=128, heads=4, split=2, last=False),
    21: dict(H=96, W=96, C=96, heads=4, split=1, last=False),
    # TRUE base-384 geometries (embed 96 -> stage C 96/192/384/768,
    # split [1,2,12,12]; == bench.py BLOCK_GEOMETRIES 384-s1..s4)
    31: dict(H=96, W=96, C=96, heads=4, split=1, last=False),
    32: dict(H=48, W=48, C=192, heads=8, split=2, last=False),
    33: dict(H=24, W=24, C=384, heads=16, split=12, last=False),
    34: dict(H=12, W=12, C=768, heads=32, split=12, last=True),
}


def mk_params(g, rng):
    H, W, C, last = g["H"], g["W"], g["C"], g["last"]
    cb_ = C if last else C // 2

    def mk(*shape, s=0.05):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * s)

    return (
        jnp.ones((C,)), jnp.zeros((C,)),
        mk(C, 3 * C), jnp.zeros((3 * C,)),
        mk(3, 3, cb_), jnp.zeros((cb_,)),
        mk(3, 3, cb_), jnp.zeros((cb_,)),
        mk(C, C), jnp.zeros((C,)),
        jnp.ones((C,)), jnp.zeros((C,)),
        mk(C, 4 * C), jnp.zeros((4 * C,)),
        mk(4 * C, C), jnp.zeros((C,)),
    )


def chain_time(fn, args, ca=6, cb_=16, n=3):
    def chained(k, *a):
        def body(c, _):
            return fn(c, *a[1:]), ()
        c, _ = lax.scan(body, a[0], None, length=k)
        return jnp.sum(c.astype(jnp.float32))

    fa = jax.jit(lambda *a: chained(ca, *a))
    fb = jax.jit(lambda *a: chained(cb_, *a))
    float(fa(*args)); float(fb(*args))

    def best(f):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fb) - best(fa)) / (cb_ - ca)


def run_stage(st, B, mode_fwd=True, mode_bwd=True):
    g = STAGES[st]
    H, W, C, heads, split, last = (g["H"], g["W"], g["C"], g["heads"],
                                   g["split"], g["last"])
    scale = 32 ** -0.5
    rng = np.random.default_rng(0)
    params = mk_params(g, rng)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    dout = x

    res = {}
    for mode in ("off", "on"):
        cb._HB_MODE = mode
        if mode_fwd:
            def fwd(xx, pp):
                return cb._fused_block_fwd(
                    xx, pp, None, H=H, W=W, C=C, heads=heads, split=split,
                    last_stage=last, scale=scale, qkv_bias=True
                ).astype(xx.dtype) + xx * 1e-6
            t = chain_time(fwd, (x, params))
            res[f"fwd_{mode}"] = t
            print(f"stage {st} B={B} fwd  hb={mode}: {t*1000:8.3f} ms", flush=True)
        if mode_bwd and not last:
            def bwd(xx, pp, dd):
                dx, _, _ = cb._fused_block_bwd_xt(
                    xx, pp, None, dd.astype(jnp.float32), H=H, W=W, C=C,
                    heads=heads, split=split, scale=scale, qkv_bias=True)
                return dx.astype(xx.dtype) + xx * 1e-6
            t = chain_time(bwd, (x, params, dout))
            res[f"bwd_{mode}"] = t
            print(f"stage {st} B={B} bwd  hb={mode}: {t*1000:8.3f} ms", flush=True)
    if mode_bwd and not last:
        # replay baseline: vjp of the composed block
        def replay(xx, pp, dd):
            _, vjp = jax.vjp(
                lambda a, p: cb.composed_block(a, p, H, W, C, heads, split,
                                               last, scale, True), xx, pp)
            dx, _ = vjp(dd)
            return dx.astype(xx.dtype) + xx * 1e-6
        t = chain_time(replay, (x, params, dout.astype(jnp.bfloat16)))
        res["bwd_replay"] = t
        print(f"stage {st} B={B} bwd  replay : {t*1000:8.3f} ms", flush=True)
    return res


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    stages = [int(a) for a in sys.argv[2:]] or [3, 4, 2]
    B = int(os.environ.get("HB_B", "128"))
    for st in stages:
        run_stage(st, B, mode_fwd=what in ("fwd", "both"),
                  mode_bwd=what in ("bwd", "both"))
