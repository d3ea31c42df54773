#!/bin/bash
# Probe the axon remote-compile helper's health: compile ONE tiny fresh
# program (seeded uniquely so the persistent cache can't answer) and time
# it. Healthy: < 15 s. Degraded (compile helper wedge): minutes.
cd "$(dirname "$0")/.."
SEED=${1:-$RANDOM}
timeout "${PROBE_TIMEOUT:-240}" python - "$SEED" <<'PY' 2>&1 | grep -v WARNING
import sys, time, jax, jax.numpy as jnp
s = int(sys.argv[1])
t0 = time.time()
y = jax.jit(lambda x: (x * (2 + s % 97) + 1).sum())(jnp.ones((8, 128)))
print(f"probe seed={s}: {float(y):.0f} compile+run {time.time()-t0:.1f}s")
PY
