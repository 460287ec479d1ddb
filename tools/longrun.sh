#!/usr/bin/env bash
# Long on-hardware training evidence (VERDICT r3 task #6): 30 epochs of
# configs/longrun_smoke.json in two halves with a REAL checkpoint-resume seam
# at epoch 15, a stepped lambda_pose schedule crossing at epochs 10 and 20
# (reference train_hrnet.py:453-465), and lr steps at 12/24.  Artifacts:
# output/longrun_smoke/train_log.jsonl (both halves append) + eval curve.
set -euo pipefail
cd "$(dirname "$0")/.."

# half 1: epochs 0..14 (total_epochs=15 in the config)
python train.py --config_json configs/longrun_smoke.json

# half 2: resume from the half-1 checkpoint, run to epoch 29
python - <<'EOF'
import json
with open("configs/longrun_smoke.json") as f:
    cfg = json.load(f)
cfg["total_epochs"] = 30
cfg["pretrain_model"] = "output/longrun_smoke/model"  # Trainer saves under <out>/model
with open("/tmp/longrun_resume.json", "w") as f:
    json.dump(cfg, f)
EOF
python train.py --config_json /tmp/longrun_resume.json
python tools/plot_longrun.py || true
