#!/bin/bash
# Round-5 measurement batch: every TPU pricing run this round needs, in
# value order, each under its own timeout so one wedge doesn't eat the
# session (the axon compile helper intermittently degrades ~50x — probe
# with scripts/probe_tunnel.sh before launching).
#
# Results land in /tmp/r5_*.log; routes are flipped BY HAND from those
# numbers (routing constants cite the specific lines).
set -u
cd "$(dirname "$0")/.."

run() { # name timeout cmd...
  local name=$1 to=$2; shift 2
  echo "=== $name ($(date -u +%H:%M:%S)) ==="
  timeout "$to" "$@" 2>&1 | grep -v WARNING | tee "/tmp/r5_${name}.log"
  echo "=== $name rc=$? ==="
}

# 1. Train: mm vs shift fused BWD at the train-fused stages (s2) and the
#    candidate flip stage (s3), at the train recipe batch.
MM_B=24 run mm_bwd_24 2700 python scripts/exp_lepe_mm2.py bwd 3 2

# 2. Train: full-step A/B of the _FUSE_TRAIN_MIN_RESO threshold (needs the
#    mm-bwd route flipped first if 1 says mm wins; re-run after flipping).
run train_route 2700 python scripts/exp_train_route.py 24 28 14

# 3. Inference stage 1: vh / cs formulations in-situ (224-s1 + s2).
S1_B=128 run s1_224 2700 python scripts/exp_s1.py 1 2

# 4. 384: vh at the 96x96/48x48 geometries (the VMEM-fix beneficiaries).
S1_B=32 run s1_384 2700 python scripts/exp_s1.py 31 32

# 5. 384: mm LePE fwd+bwd at the TRUE base-384 geometries (route table
#    extension — VERDICT r4 item 5).
MM_B=32 run mm_384 3600 python scripts/exp_lepe_mm2.py both 32 33
MM_B=32 run mm_384_s4 1800 python scripts/exp_lepe_mm2.py fwd 34
