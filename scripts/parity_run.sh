#!/usr/bin/env bash
# Quality-parity run: the reference's exact Synapse pretrain recipe
# (150 epochs, bs 24, lr 0.05, poly 0.9 — reference README.md:11,
# trainer.py:42,61-63) followed by volume evaluation and a metric diff
# against the published baseline (reference start.txt:5-12; BASELINE.md).
#
# Usage:
#   scripts/parity_run.sh /path/to/Synapse [output_dir]
#
# where /path/to/Synapse contains train_npz/*.npz and test_vol_h5/*.npy.h5
# in the reference layout. Split membership comes from the shipped verbatim
# lists (lists/lists_Synapse). Run from the repo root.
#
# Pass/fail: mean DSC within ±0.03 of 0.7950 (the task's ±0.3 envelope is
# far looser; we hold ourselves to run-to-run variance).
set -euo pipefail

ROOT=${1:?usage: parity_run.sh /path/to/Synapse [output_dir]}
OUT=${2:-./parity_synapse}
cd "$(dirname "$0")/.."

echo "== train: 150 epochs, bs 24, lr 0.05 (reference recipe) =="
python train.py \
  --dataset Synapse \
  --cfg cswin_unet_tpu/configs/cswin_tiny_224_lite.yaml \
  --root_path "$ROOT" \
  --list_dir ./lists/lists_Synapse \
  --output_dir "$OUT" \
  --max_epochs 150 --batch_size 24 --base_lr 0.05 --img_size 224

echo "== test: slice-wise volume inference, DSC/HD95 per class =="
python test.py \
  --dataset Synapse \
  --cfg cswin_unet_tpu/configs/cswin_tiny_224_lite.yaml \
  --volume_path "$ROOT" \
  --list_dir ./lists/lists_Synapse \
  --output_dir "$OUT" \
  --max_epochs 150 --img_size 224 --is_savenii

echo "== metric diff vs reference start.txt:5-12 =="
python - "$OUT" <<'EOF'
import re, sys, glob, os

# Published per-class baselines (reference start.txt:5-12 / BASELINE.md).
BASE = {
    1: (0.863615, 11.114400), 2: (0.598189, 29.964908),
    3: (0.811614, 53.332070), 4: (0.754975, 54.908476),
    5: (0.939391, 29.321815), 6: (0.659015, 13.284079),
    7: (0.911888, 13.792706), 8: (0.821477, 19.108438),
}
BASE_MEAN_DSC = sum(v[0] for v in BASE.values()) / len(BASE)  # 0.7950
BASE_MEAN_HD = sum(v[1] for v in BASE.values()) / len(BASE)   # 28.10

logs = glob.glob("test_log/test_log_/log_Synapse.txt") + glob.glob(
    os.path.join(sys.argv[1], "log.txt"))
text = ""
for f in logs:
    if os.path.exists(f):
        text += open(f).read()
got = {int(c): (float(d), float(h)) for c, d, h in re.findall(
    r"Mean class (\d+) mean_dice ([\d.]+) mean_hd95 ([\d.]+)", text)}
if not got:
    sys.exit("no 'Mean class' lines found — did test.py run?")

print(f"{'class':>5} {'DSC':>9} {'base':>9} {'Δ':>8}   {'HD95':>9} {'base':>9}")
for c in sorted(got):
    d, h = got[c]
    bd, bh = BASE.get(c, (float('nan'),) * 2)
    print(f"{c:>5} {d:9.4f} {bd:9.4f} {d - bd:+8.4f}   {h:9.3f} {bh:9.3f}")
mean_d = sum(v[0] for v in got.values()) / len(got)
mean_h = sum(v[1] for v in got.values()) / len(got)
print(f"\nmean DSC {mean_d:.4f} (baseline {BASE_MEAN_DSC:.4f}, "
      f"Δ {mean_d - BASE_MEAN_DSC:+.4f})")
print(f"mean HD95 {mean_h:.2f} (baseline {BASE_MEAN_HD:.2f})")
ok = mean_d >= BASE_MEAN_DSC - 0.03
print("PARITY:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
EOF
