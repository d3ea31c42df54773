#!/usr/bin/env python
"""Headline benchmark: slices/sec/chip, 224² CSWin-tiny inference.

Prints ONE JSON line:
  {"metric": "slices_per_sec_per_chip", "value": N, "unit": "slices/s",
   "vs_baseline": N / BASELINE}

Methodology: two long chains of forwards (K_a=21, K_b=41) linked by a data
dependence inside one jitted lax.scan each (execution serialized on-device,
nothing elided), timed with a single host sync; per-forward time =
(t_b − t_a) / (K_b − K_a). Differencing two long chains cancels both the
host round-trip latency and any fixed per-dispatch overhead — both of which
are large and noisy over this environment's TPU tunnel — leaving pure
device throughput, which is what "slices/sec/chip" means.

Baseline note: the reference repo records NO throughput anywhere (SURVEY.md
§6); its inference runs batch-size-1, one slice per forward (utils.py:70-74).
BASELINE is an estimate of that pipeline on an A100: a ~25 GFLOP forward at
bs=1 is launch/overhead-bound at ~15-20 ms/slice => 60 slices/s. The
BASELINE.json north star is >=5x that (300 slices/s).
"""

import json
import sys
import time

import numpy as np

A100_BS1_BASELINE = 60.0  # slices/s, estimated reference pipeline (see above)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from cswin_unet_tpu.models import CSWinUNet, CSwinUnet

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    chain_a = int(sys.argv[2]) if len(sys.argv) > 2 else 21
    chain_b = int(sys.argv[3]) if len(sys.argv) > 3 else 41
    attn_impl = sys.argv[4] if len(sys.argv) > 4 else "fused"

    model = CSwinUnet(
        backbone=CSWinUNet(
            img_size=224,
            num_classes=9,
            embed_dim=64,
            depth=(1, 2, 9, 1),
            split_size=(1, 2, 7, 7),
            num_heads=(2, 4, 8, 16),
            drop_path_rate=0.2,
            dtype=jnp.bfloat16,
            attn_impl=attn_impl,
        )
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 1))
    )

    def chained(params, x, k):
        def body(carry, _):
            pred = model.apply(params, carry)
            return carry + 1e-6 * pred[..., :1], ()

        c, _ = lax.scan(body, x, None, length=k)
        return jnp.sum(c)

    fa = jax.jit(lambda p, x: chained(p, x, chain_a))
    fb = jax.jit(lambda p, x: chained(p, x, chain_b))

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(batch, 224, 224, 1)).astype(np.float32)
    )
    float(fa(params, x))  # compile
    float(fb(params, x))

    def best_of(f, n=3):
        times = []
        for _ in range(n):
            t0 = time.perf_counter()
            float(f(params, x))
            times.append(time.perf_counter() - t0)
        return min(times)

    ta = best_of(fa)
    tb = best_of(fb)
    per_fwd = (tb - ta) / (chain_b - chain_a)
    slices_per_sec = batch / per_fwd

    print(
        json.dumps(
            {
                "metric": "slices_per_sec_per_chip",
                "value": round(slices_per_sec, 2),
                "unit": "slices/s",
                "vs_baseline": round(slices_per_sec / A100_BS1_BASELINE, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
