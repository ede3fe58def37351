#!/bin/bash
# VERDICT r2 #6 artifact driver: hardened multi-surface WER gate.
#
# Profile: 1120-word vocabulary, 8-12-word utterances (>=5 s of audio,
# many steady chunks, attention-cache saturation), 50 held-out
# utterances, four serving surfaces (python StreamingSession, lockstep
# BatchStreamingEngine with staggered attach/finalize, native C++ CLI in
# fast mode, pure-numpy exported-ONNX pipeline), granularity sweep,
# noise condition — then the sensitivity
# proof: the SAME model must FAIL the gate on every surface under the
# drop_time_carry fault injection.
#
# Reference role: tools/stt_suite/run_suite.py:117-125,554-779 (the WER
# gate the reference's TRT engines never passed). Output:
# artifacts/e2e_wer_gate_r3.json (clean + sabotage merged).
set -e
set -o pipefail   # `... | tee` must not mask the gate's exit code
cd "$(dirname "$0")/.."
OUT=${1:-/tmp/gate_r3}
mkdir -p "$OUT"

# SKIP_TRAIN=1 reuses $OUT/model from a previous run (eval-only rerun)
python tools/train_synthetic_e2e.py \
  --out-dir "$OUT" --steps 2500 --train-utts 4000 --eval-utts 50 \
  --weight-decay 1e-4 --streaming-train \
  ${SKIP_TRAIN:+--skip-train} \
  --vocab-size 1120 --gate-wer 0.05 --words-per-utt 8,13 \
  --joint-hidden 64 --surfaces python,batch,native \
  --native-eval-utts 12 --stream-sims 0.3,0.5,1.0 \
  --artifact "$OUT/gate_clean.json" 2>&1 | tee "$OUT/clean.log"

set +e
python tools/train_synthetic_e2e.py \
  --out-dir "$OUT" --skip-train --eval-utts 50 --vocab-size 1120 \
  --gate-wer 0.05 --words-per-utt 8,13 --joint-hidden 64 \
  --surfaces python,batch,native --native-eval-utts 12 \
  --stream-sims 0.5 --variants base --native-variants base \
  --noise-snr-db 0 --sabotage drop_time_carry \
  --artifact "$OUT/gate_sabotage.json" 2>&1 | tee "$OUT/sabotage.log"
SAB_RC=$?
set -e
if [ "$SAB_RC" -eq 0 ]; then
  echo "ERROR: sabotage run PASSED the gate — sensitivity proof failed" >&2
  exit 1
fi

# 4th surface: the pure-numpy exported-ONNX-graph pipeline (clean +
# sabotage inside the tool; exits nonzero if either half misbehaves)
python tools/gate_onnx_surface.py --model-dir "$OUT/model" \
  --out artifacts/e2e_wer_gate_onnx_pipeline.json 2>&1 | tee "$OUT/onnx.log"

python - "$OUT" <<'EOF'
import json, sys, os
out = sys.argv[1]
clean = json.load(open(os.path.join(out, "gate_clean.json")))
sab = json.load(open(os.path.join(out, "gate_sabotage.json")))
onnx = json.load(open("artifacts/e2e_wer_gate_onnx_pipeline.json"))
bar = clean["config"]["gate_wer"]
merged = {
    "profile": {
        "vocab_size": clean["vocab_size"], "words_per_utt": "8,13",
        "eval_utts": clean["config"]["eval_utts"],
        "gate_wer": bar,
        "surfaces": clean["config"]["surfaces"] + ",onnx_pipeline",
    },
    "clean": clean,
    "sabotage_drop_time_carry": sab,
    "onnx_pipeline": onnx,
    "verdict": {
        "clean_pass_all_surfaces": all(
            g["pass"] for g in clean["gate_per_surface"].values())
            and onnx["clean"]["wer"] <= bar,
        "sabotage_fails_all_surfaces": all(
            not g["pass"] for g in sab["gate_per_surface"].values())
            and onnx["sabotage_drop_time_carry"]["wer"] > bar,
    },
}
path = "artifacts/e2e_wer_gate_r3.json"
json.dump(merged, open(path, "w"), indent=1)
print("wrote", path)
print(json.dumps(merged["verdict"], indent=1))
EOF
