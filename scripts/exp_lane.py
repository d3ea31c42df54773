#!/usr/bin/env python
"""Lane-pairing experiments for the stage-1 block (C=64, half the 128-lane
VPU/tile width). exp_cum.py showed the stage-1 cost is spread: copy floor
1.46 ms, MLP +1.06, LePE+transpose +0.79, branches ~+0.5 each. The theory:
every (rows, 64) array occupies native (8,128) VMEM tiles at HALF lane
occupancy, so DMA and every VPU op run at <=50% width.

The paired view (B,H,W,C) == (B,H,W/2,2C) is the SAME HBM bytes (contiguous
trailing-dim merge), so the pallas_call boundary can stream (56,28,128)
blocks for free. These kernels price each consequence:

  copy_u       dual-stream copy, unpaired blocks (the current kernel's floor)
  copy_p       dual-stream copy, paired blocks
  unpack_p     paired stream -> in-kernel unpack to (HW,C) -> repack -> write
  mlp_u        LN2+fc1+gelu+fc2+res on (HW,64)
  mlp_p        same math on the paired view: segmented LN (block-diag
               averaging matmul) + block-diag fc weights, no unpacking
  qkv_u/qkv_p  LN1+qkv dot, unpaired vs paired block-diag

Usage: python scripts/exp_lane.py [B]
"""

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
from exp_hb import chain_time

H = W = 56
C = 64
B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
HIDDEN = 4 * C


def specs(paired):
    if paired:
        blk = (1, H, W // 2, 2 * C)
    else:
        blk = (1, H, W, C)
    return pl.BlockSpec(blk, lambda b: (b, 0, 0, 0), memory_space=pltpu.VMEM)


def full(s):
    return pl.BlockSpec(tuple(s), lambda b: tuple(0 for _ in s),
                        memory_space=pltpu.VMEM)


def run(name, kern, x, params, paired_in, paired_out, extra_streams=1):
    xs = [x] * extra_streams
    spec_in = specs(paired_in)
    spec_out = specs(paired_out)
    oshape = ((B, H, W // 2, 2 * C) if paired_out else (B, H, W, C))

    def fn(xx, *pp):
        ins = [xx] * extra_streams
        y = pl.pallas_call(
            kern, grid=(B,),
            in_specs=[spec_in] * extra_streams + [full(p.shape) for p in pp],
            out_specs=spec_out,
            out_shape=jax.ShapeDtypeStruct(oshape, xx.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(*ins, *pp)
        return y + xx * 1e-6

    try:
        t = chain_time(fn, (x, *params), ca=20, cb_=80, n=4)
        print(f"{name:12s}: {t*1000:8.3f} ms", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"{name:12s}: FAIL {str(e)[:140]}", flush=True)


def main():
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    xp = xu.reshape(B, H, W // 2, 2 * C)

    n2s = jnp.ones((C,)); n2b = jnp.zeros((C,))
    fc1k = jnp.asarray(rng.standard_normal((C, HIDDEN)).astype(np.float32) * .05)
    fc1b = jnp.zeros((HIDDEN,))
    fc2k = jnp.asarray(rng.standard_normal((HIDDEN, C)).astype(np.float32) * .05)
    fc2b = jnp.zeros((C,))
    qkvk = jnp.asarray(rng.standard_normal((C, 3 * C)).astype(np.float32) * .05)
    qkvb = jnp.zeros((3 * C,))

    # paired (block-diagonal) twins
    def bd(wm):
        k, n = wm.shape
        z = jnp.zeros_like(wm)
        return jnp.concatenate([jnp.concatenate([wm, z], 1),
                                jnp.concatenate([z, wm], 1)], 0)  # (2k, 2n)

    fc1k_p, fc2k_p = bd(fc1k), bd(fc2k)
    fc1b_p = jnp.concatenate([fc1b, fc1b])
    fc2b_p = jnp.concatenate([fc2b, fc2b])
    n2s_p = jnp.concatenate([n2s, n2s]); n2b_p = jnp.concatenate([n2b, n2b])
    qkvk_p = bd(qkvk); qkvb_p = jnp.concatenate([qkvb, qkvb])
    # segmented-mean matrix: (2C, 2C), block-diag of ones/C
    A = np.zeros((2 * C, 2 * C), np.float32)
    A[:C, :C] = 1.0 / C
    A[C:, C:] = 1.0 / C
    A = jnp.asarray(A)

    # --- kernels ---
    def k_copy(x_ref, xt_ref, o_ref):
        o_ref[...] = x_ref[...] + xt_ref[...].astype(x_ref.dtype) * jnp.bfloat16(1e-6)

    def k_unpack(x_ref, o_ref):
        v = x_ref[...].reshape(H * (W // 2), 2 * C)
        e, o = v[:, :C], v[:, C:]
        u = jnp.stack([e, o], axis=1)          # (H*W/2, 2, C)
        u = u.reshape(H * W, C)                # unpaired rows
        u = u * jnp.bfloat16(1.000244140625)   # touch in unpaired layout
        r = u.reshape(H * (W // 2), 2, C)
        r = jnp.concatenate([r[:, 0], r[:, 1]], -1)  # repack
        o_ref[...] = r.reshape(1, H, W // 2, 2 * C)

    def k_mlp_u(x_ref, n2s, n2b, f1k, f1b, f2k, f2b, o_ref):
        x = x_ref[...].reshape(H * W, C)
        y = cb._layernorm(x, n2s[...], n2b[...])
        y = cb._dot(y, f1k[...], f1b[...])
        yf = y.astype(jnp.float32)
        y = (yf * 0.5 * (1.0 + cb._erf(yf * (2.0 ** -0.5)))).astype(y.dtype)
        y = cb._dot(y, f2k[...], f2b[...])
        o_ref[...] = (x + y).reshape(1, H, W, C)

    def k_mlp_p(x_ref, A, n2s, n2b, f1k, f1b, f2k, f2b, o_ref):
        x = x_ref[...].reshape(H * (W // 2), 2 * C)
        xf = x.astype(jnp.float32)
        mu = jnp.dot(xf, A[...], preferred_element_type=jnp.float32)
        d = xf - mu
        var = jnp.dot(d * d, A[...], preferred_element_type=jnp.float32)
        y = (d * jax.lax.rsqrt(var + 1e-5) * n2s[...] + n2b[...]).astype(x.dtype)
        y = cb._dot(y, f1k[...], f1b[...])
        yf = y.astype(jnp.float32)
        y = (yf * 0.5 * (1.0 + cb._erf(yf * (2.0 ** -0.5)))).astype(y.dtype)
        y = cb._dot(y, f2k[...], f2b[...])
        o_ref[...] = (x + y).reshape(1, H, W // 2, 2 * C)

    def k_qkv_u(x_ref, n1s, n1b, qk, qb, o_ref):
        x = x_ref[...].reshape(H * W, C)
        y = cb._layernorm(x, n1s[...], n1b[...])
        q = cb._dot(y, qk[...], qb[...])
        o_ref[...] = (x + q[:, :C] + q[:, C:2*C] + q[:, 2*C:]
                      ).reshape(1, H, W, C)

    def k_qkv_p(x_ref, A, n1s, n1b, qk, qb, o_ref):
        x = x_ref[...].reshape(H * (W // 2), 2 * C)
        xf = x.astype(jnp.float32)
        mu = jnp.dot(xf, A[...], preferred_element_type=jnp.float32)
        d = xf - mu
        var = jnp.dot(d * d, A[...], preferred_element_type=jnp.float32)
        y = (d * jax.lax.rsqrt(var + 1e-5) * n1s[...] + n1b[...]).astype(x.dtype)
        q = cb._dot(y, qk[...], qb[...])  # (rows, 6C): [pix0 3C | pix1 3C]
        o_ref[...] = (x + q[:, :2*C] + q[:, 2*C:4*C] + q[:, 4*C:]
                      ).reshape(1, H, W // 2, 2 * C)

    run("copy_u", k_copy, xu, (), False, False, extra_streams=2)
    run("copy_p", k_copy, xp, (), True, True, extra_streams=2)
    run("unpack_p", k_unpack, xp, (), True, True)
    run("mlp_u", k_mlp_u, xu, (n2s, n2b, fc1k, fc1b, fc2k, fc2b), False, False)
    run("mlp_p", k_mlp_p, xp, (A, n2s_p, n2b_p, fc1k_p, fc1b_p, fc2k_p, fc2b_p),
        True, True)
    run("qkv_u", k_qkv_u, xu, (n2s, n2b, qkvk, qkvb), False, False)
    run("qkv_p", k_qkv_p, xp, (A, n2s_p, n2b_p, qkvk_p, qkvb_p), True, True)


if __name__ == "__main__":
    main()


def main2():
    """Isolate exp_cum L0's 1.46ms copy floor: params-unused vs f32 math."""
    rng = np.random.default_rng(0)
    xu = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    from exp_hb import STAGES, mk_params
    ps = mk_params(STAGES[1], rng)  # 16 f32 param arrays

    def k_copy_params(x_ref, xt_ref, *refs):
        o_ref = refs[-1]
        o_ref[...] = x_ref[...] + xt_ref[...] * jnp.bfloat16(1e-6)

    def k_copy_f32(x_ref, xt_ref, o_ref):
        x = x_ref[...].reshape(H * W, C)
        xt = xt_ref[...].reshape(W * H, C)
        acc = x.astype(jnp.float32) + xt.astype(jnp.float32) * 1e-6
        o_ref[...] = acc.astype(x_ref.dtype).reshape(1, H, W, C)

    def k_copy_params_f32(x_ref, xt_ref, *refs):
        o_ref = refs[-1]
        x = x_ref[...].reshape(H * W, C)
        xt = xt_ref[...].reshape(W * H, C)
        acc = x.astype(jnp.float32) + xt.astype(jnp.float32) * 1e-6
        o_ref[...] = acc.astype(x_ref.dtype).reshape(1, H, W, C)

    run("copy_params", k_copy_params, xu, ps, False, False, extra_streams=2)
    run("copy_f32", k_copy_f32, xu, (), False, False, extra_streams=2)
    run("copy_pf32", k_copy_params_f32, xu, ps, False, False, extra_streams=2)


if __name__ == "__main__" and os.environ.get("EXP_LANE_MAIN2"):
    main2()
