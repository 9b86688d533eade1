#!/bin/bash
# One-command golden-parity gate (VERDICT r3 #6): released pretrained model
# + real dataset -> converted weights -> CLI test -> mm-level comparison
# against the reference's published result dump.  Target: <= 0.05 mm
# mean-joint-error delta (BASELINE.json north star; PARITY.md recipe).
#
# Everything license-gated is skip-guarded: the script SKIPS (exit 0, clear
# message) when the network or dataset is unavailable, so it can sit in any
# round's run list and will complete the gate in the first environment that
# has egress + the dataset.
#
#   usage:  tools/golden_parity.sh [icvl|nyu]
#   env:    DATA_DIR   raw dataset root (icvl: Depth/ + labels.txt;
#                      nyu: the dataset/{train,test} mats + pngs)
#                      default ./exp/data/<dataset>
#           CKPT       pretrained TF checkpoint prefix (skips the fetch)
#           WORK_DIR   scratch/output dir (default ./exp/golden_parity)
#
# Reference surfaces driven: exp/scripts/fetch_<ds>_model.sh (model
# distribution), data/<ds>.py (dataset conversion), model/test_model.py
# step -1 = pretrained (our `test --init_params`).
set -euo pipefail

DS=${1:-icvl}
case "$DS" in
  icvl) GOLDEN=/root/reference/exp/result/icvl.txt; JNT=16 ;;
  nyu)  GOLDEN=/root/reference/exp/result/nyu.txt;  JNT=14 ;;
  *) echo "usage: $0 [icvl|nyu]"; exit 2 ;;
esac

ROOT="$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)"
cd "$ROOT"
export PYTHONPATH="$ROOT${PYTHONPATH:+:$PYTHONPATH}"
DATA_DIR=${DATA_DIR:-./exp/data/$DS}
WORK_DIR=${WORK_DIR:-./exp/golden_parity}
MODEL_DIR=./exp/train_cache/${DS}_training_s2_f128_daug_um_v1
mkdir -p "$WORK_DIR"

skip() { echo "[golden_parity] SKIP: $*"; exit 0; }

# ---- artifact gates ------------------------------------------------------
[ -f "$GOLDEN" ] || skip "golden dump $GOLDEN missing from the snapshot"

if [ ! -e "$DATA_DIR" ]; then
  skip "dataset not found at $DATA_DIR (license-gated manual download; \
set DATA_DIR when available)"
fi

CKPT=${CKPT:-}
if [ -z "$CKPT" ]; then
  CKPT=$(ls "$MODEL_DIR"/model.ckpt-*.index 2>/dev/null | head -1 | sed 's/\.index$//' || true)
fi
if [ -z "$CKPT" ]; then
  # probe egress before attempting the fetch (this image is zero-egress)
  if ! timeout 20 bash -c "wget -q --spider https://polybox.ethz.ch" 2>/dev/null; then
    skip "no pretrained checkpoint and no network egress \
(run exp/scripts/fetch_${DS}_model.sh elsewhere and set CKPT=...)"
  fi
  echo "[golden_parity] fetching the released $DS model..."
  bash /root/reference/exp/scripts/fetch_${DS}_model.sh
  CKPT=$(ls "$MODEL_DIR"/model.ckpt-*.index | head -1 | sed 's/\.index$//')
fi
echo "[golden_parity] checkpoint: $CKPT"

# ---- 1. dataset -> shards -------------------------------------------------
echo "[golden_parity] converting $DS testing split..."
python -m densereg_tpu.cli.main convert --dataset "$DS" --subset testing \
    --data_dir "$DATA_DIR"

# ---- 2. TF checkpoint -> msgpack ------------------------------------------
PARAMS="$WORK_DIR/${DS}_params.msgpack"
if [ ! -f "$PARAMS" ]; then
  echo "[golden_parity] converting checkpoint..."
  python tools/convert_tf_checkpoint.py --ckpt "$CKPT" --out "$PARAMS" \
      --num_stack 2 --num_fea 128 --num_joint "$JNT"
fi

# ---- 3. evaluate the released weights --------------------------------------
echo "[golden_parity] running test (pretrained weights)..."
python -m densereg_tpu.cli.main test --dataset "$DS" --data_dir "$DATA_DIR" \
    --batch_size 64 --num_stack 2 --num_fea 128 \
    --base_dir "$WORK_DIR/cache" --init_params "$PARAMS"

OURS=$(ls -t "$WORK_DIR"/cache/*/testing-*-result.txt | head -1)
echo "[golden_parity] result dump: $OURS"

# ---- 4. the gate ------------------------------------------------------------
python tools/compare_results.py "$OURS" "$GOLDEN" --max_mean_delta 0.05
echo "[golden_parity] PASS: <= 0.05 mm mean-joint-error vs $GOLDEN"
