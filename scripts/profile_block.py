#!/usr/bin/env python
"""Intra-block ablation at stage-1 geometry (B,56,56,64), bs 128.

Times each sub-op of a CSWinBlock in isolation (chain-differenced) to locate
the gap between the measured 7.8 ms block time and its ~1 ms roofline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from cswin_unet_tpu.ops.attention import cswin_attention_xla

B, H, W, C = 128, 56, 56, 64
DT = jnp.bfloat16


def timeit(apply, params, shape, ca=11, cb=31, n=3, out_to_carry=None):
    x = jnp.asarray(np.random.default_rng(0).normal(size=shape).astype(np.float32)).astype(DT)

    def chained(p, x, k):
        def body(c, _):
            y = apply(p, c)
            if out_to_carry is not None:
                c2 = out_to_carry(c, y)
            else:
                c2 = c + 1e-6 * y.astype(c.dtype)
            return c2, ()
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


rng = np.random.default_rng(0)
results = {}

# LayerNorm
ln = nn.LayerNorm(epsilon=1e-5, dtype=DT)
p_ln = ln.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C)))
results["LN (B,56,56,64)"] = timeit(lambda p, x: ln.apply(p, x), p_ln, (B, H, W, C))

# qkv dense 64->192
d1 = nn.Dense(3 * C, dtype=DT)
p_d1 = d1.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C)))
results["qkv 64->192"] = timeit(
    lambda p, x: d1.apply(p, x), p_d1, (B, H, W, C),
    out_to_carry=lambda c, y: c + 1e-6 * y[..., :C].astype(c.dtype),
)

# proj dense 64->64
d2 = nn.Dense(C, dtype=DT)
p_d2 = d2.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C)))
results["proj 64->64"] = timeit(lambda p, x: d2.apply(p, x), p_d2, (B, H, W, C))

# MLP 64->256->64
class Mlp(nn.Module):
    @nn.compact
    def __call__(self, x):
        x = nn.Dense(4 * C, dtype=DT)(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(C, dtype=DT)(x)

mlp = Mlp()
p_mlp = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, H, W, C)))
results["MLP 64->256->64"] = timeit(lambda p, x: mlp.apply(p, x), p_mlp, (B, H, W, C))

# one stripe attention branch (vertical 56x1, heads=1, dim=32)
lk = jnp.asarray(rng.standard_normal((3, 3, 1, 32)).astype(np.float32) * 0.2)
lb = jnp.asarray(rng.standard_normal(32).astype(np.float32) * 0.1)

def attn_v(p, x):
    half = x[..., :32]
    return cswin_attention_xla(half, half, half, lk, lb, h_sp=56, w_sp=1,
                               num_heads=1, scale=32**-0.5)

results["attn branch v (56x1)"] = timeit(
    lambda p, x: attn_v(p, x), {}, (B, H, W, C),
    out_to_carry=lambda c, y: c + 1e-6 * jnp.concatenate([y, y], -1).astype(c.dtype),
)

def attn_h(p, x):
    half = x[..., 32:]
    return cswin_attention_xla(half, half, half, lk, lb, h_sp=1, w_sp=56,
                               num_heads=1, scale=32**-0.5)

results["attn branch h (1x56)"] = timeit(
    lambda p, x: attn_h(p, x), {}, (B, H, W, C),
    out_to_carry=lambda c, y: c + 1e-6 * jnp.concatenate([y, y], -1).astype(c.dtype),
)

total = 0.0
for k, v in results.items():
    total += v
    print(f"{k:24s}: {v*1000:6.2f} ms")
print(f"{'sum (1 of each)':24s}: {total*1000:6.2f} ms   (block measured: 7.8 ms)")
