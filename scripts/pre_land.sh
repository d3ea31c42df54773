#!/usr/bin/env bash
# MANDATORY pre-commit gate for any change touching ops/pallas/ or routing
# constants (round-3 postmortem: a route flip to a non-compiling kernel
# shipped at HEAD because the on-TPU check was not run; interpret-mode
# tests cannot see Mosaic/XLA:TPU lowering breakage).
#
# Runs, ON THE REAL TPU BACKEND:
#   1. bench.py check      — compile every Pallas entry point (production
#                            route + the alternate modes) and diff each
#                            against its XLA composition at bf16 tolerance;
#   2. bench.py infer      — the headline metric must produce a number.
#
# Usage: scripts/pre_land.sh [quick]
#   quick: skip the infer throughput run (check only).
set -euo pipefail
cd "$(dirname "$0")/.."

backend=$(python - <<'EOF'
import jax
print(jax.default_backend())
EOF
)
if [ "$backend" = "cpu" ]; then
    echo "pre_land: REFUSING to gate on cpu backend — the whole point is" >&2
    echo "the real Mosaic/XLA:TPU lowering. Run where jax sees the TPU." >&2
    exit 2
fi

echo "pre_land: backend=$backend — running kernel-parity check" >&2
python bench.py check

if [ "${1:-}" != "quick" ]; then
    echo "pre_land: headline inference bench" >&2
    python bench.py infer
fi
echo "pre_land: OK" >&2
