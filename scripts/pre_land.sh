#!/usr/bin/env bash
# MANDATORY pre-commit gate for any change touching ops/pallas/ or routing
# constants (round-3 postmortem: a route flip to a non-compiling kernel
# shipped at HEAD because the on-TPU check was not run; interpret-mode
# tests cannot see Mosaic/XLA:TPU lowering breakage).
#
# Runs, ON THE REAL TPU BACKEND:
#   quick (default): bench.py check-quick — 3 representative geometries
#       fwd+bwd, the production tail kernels, and the prod-batch-size VMEM
#       units. Minutes warm — this is the per-change gate.
#   full:  bench.py check — the full mode×geometry Mosaic-lowering matrix
#       plus bench.py infer. Cold compiles crawl through the remote tunnel;
#       run it nightly / before a routing-constant change lands, and commit
#       its log (tee'd to gate_logs/) with the change it blesses.
#
# Usage: scripts/pre_land.sh [quick|full]   (default: quick)
set -euo pipefail
cd "$(dirname "$0")/.."

tier="${1:-quick}"

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

mkdir -p gate_logs
log="gate_logs/pre_land_$(date +%Y%m%d_%H%M%S)_${tier}.log"
echo "pre_land: backend=$backend tier=$tier — kernel-parity check" >&2
{
    echo "# pre_land tier=$tier backend=$backend date=$(date -u +%FT%TZ)"
    echo "# HEAD=$(git rev-parse HEAD 2>/dev/null || echo unknown)"
} > "$log"

if [ "$tier" = "quick" ]; then
    python bench.py check-quick 2>&1 | tee -a "$log"
else
    python bench.py check 2>&1 | tee -a "$log"
    echo "pre_land: headline inference bench" >&2
    python bench.py infer 2>&1 | tee -a "$log"
fi
echo "pre_land: OK (log: $log)" >&2
