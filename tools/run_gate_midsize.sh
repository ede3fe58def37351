#!/bin/bash
# VERDICT r3 #3: mid-size trained decode-safety gate.
#
# The r3 int8-safety chain measured decision margins + flip rate on a
# d_model=64 toy and the int8 logit delta at the 0.6B full size, then
# EXTRAPOLATED across the gap (PERFNOTES "int8 decode safety"). This
# driver trains the same hardened gate profile (1120-word vocab, 8-13
# word utterances, streaming-consistent training) at a mid d_model
# (default 256; DM=512 for the second point) and regenerates the
# margins-vs-int8-delta artifact there, interpolating the flip-rate
# trend instead of asserting it.
#
# Training + eval run on the TPU (--platform env) — the CPU box needs
# ~2.6 s per streaming chunk at d256, the tunnel ~10 ms. The tunnel has
# multi-hour outages (docs/DEBUGGING.md trap #4), so training
# checkpoints every 200 steps and the whole tool retries, resuming from
# the last train state.
#
# Usage:  tools/run_gate_midsize.sh [outdir]     # DM=256 by default
#         DM=512 tools/run_gate_midsize.sh /tmp/gate_d512
set -o pipefail
cd "$(dirname "$0")/.."
DM=${DM:-256}
OUT=${1:-/tmp/gate_d${DM}}
STEPS=${STEPS:-2500}
# d512 lesson (r5): at DM=512 the d256 recipe (4000 utts) train-memorizes
# UTTERANCES instead of word mappings — train loss 0.01 with heldout loss
# RISING (6.3->6.6) and 26% held-out WER. The capacity cure is more
# distinct utterances over the same vocab (TRAIN_UTTS=12000), which
# leaves word-level acoustic evidence unchanged while tripling the cost
# of the shortcut. WD stays available for stubborn cases.
TRAIN_UTTS=${TRAIN_UTTS:-4000}
WD=${WD:-1e-4}
mkdir -p "$OUT"

ok=0
for attempt in 1 2 3 4 5 6 7 8; do
  if python tools/train_synthetic_e2e.py \
      --out-dir "$OUT" --steps "$STEPS" --train-utts "$TRAIN_UTTS" \
      --eval-utts 50 \
      --weight-decay "$WD" --streaming-train --platform env \
      --d-model "$DM" --joint-hidden 64 \
      --vocab-size 1120 --gate-wer 0.05 --words-per-utt 8,13 \
      --surfaces python,batch --variants base,nocache --stream-sims 0.5 \
      --train-state-every 200 --resume-train-state \
      --artifact "$OUT/gate_clean.json" 2>&1 | tee -a "$OUT/clean.log"; then
    ok=1
    break
  fi
  echo "== attempt $attempt failed (tunnel flap?); retrying in 120s ==" \
    | tee -a "$OUT/clean.log"
  sleep 120
done
if [ "$ok" -ne 1 ]; then
  echo "gate_d${DM}: training/eval never completed" | tee -a "$OUT/clean.log"
  exit 1
fi

# margins + int8 delta + decision-flip rate on the trained mid-size model
for attempt in 1 2 3; do
  if python tools/parity/trained_margins.py --model-dir "$OUT/model" \
      --wav-dir "$OUT/wavs_clean" --platform env --n 20 \
      --out "artifacts/parity/trained_margins_vs_int8_delta_d${DM}.json" \
      2>&1 | tee -a "$OUT/margins.log"; then
    exit 0
  fi
  sleep 120
done
exit 1
