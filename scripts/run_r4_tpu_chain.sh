#!/bin/bash
# Round-4 sequential TPU work chain (single-chip; nothing else may use the
# device while this runs — host/TPU contention skews steps, see
# docs/bench_b8_pathology_r4.json).
#
#  1. resume held-out-speaker cloning (exp_cloning_heldout) from epoch 199
#     in 450-epoch chunks: the experimental plugin leaks ~80 MB host RSS
#     per epoch, so each chunk restarts the process (weights chained via
#     --checkpoint; fresh warmup+cosine per chunk = SGDR-style restarts).
#  2. re-evaluate held-out identity on the resumed model.
#  3. first end-to-end training run on real recorded speech
#     (exp_real_speech: 105 self-labeled utterances from the reference's
#     bundled wavs) + held-out-utterance eval.
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
WORK=/tmp/zvx_heldout
LOGDIR=/tmp/r4_chain
mkdir -p "$LOGDIR"

run_chunk() {
    local n=$1
    local ck
    ck=$(ls "$WORK"/model/checkpoints/*.msgpack 2>/dev/null | sort | tail -1)
    echo "=== chunk $n from $ck ==="
    ZEROVOX_PREPROCESSED_DATA_PATH="$WORK/pp" \
    PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
    python -m zerovox_tpu.cli.train \
        -c "$WORK/modelcfg.yaml" "$WORK/corpus.yaml" \
        --out-folder "$WORK/model" --accelerator tpu --devices 1 \
        --batch-size 16 --max-epochs 450 --warmup-epochs 5 \
        --num_workers 1 --checkpoint-every-n-epochs 25 \
        --checkpoint "$ck" \
        > "$LOGDIR/heldout_chunk$n.log" 2>&1
    local rc=$?
    tail -2 "$LOGDIR/heldout_chunk$n.log"
    return $rc
}

for n in 1 2 3; do
    run_chunk $n || { echo "CHUNK $n FAILED"; exit 1; }
done

echo "=== heldout eval ==="
python scripts/exp_cloning_heldout.py --work "$WORK" --accelerator tpu \
    --eval --out-json docs/convergence_cloning_r4b.json \
    > "$LOGDIR/heldout_eval.log" 2>&1 || { echo "EVAL FAILED"; exit 1; }
tail -20 "$LOGDIR/heldout_eval.log"

echo "=== real-speech train+eval ==="
python scripts/exp_real_speech.py --work /tmp/zvx_real --accelerator tpu \
    --train --eval --epochs 300 \
    --out-json docs/convergence_real_r4.json \
    > "$LOGDIR/real.log" 2>&1 || { echo "REAL FAILED"; exit 1; }
tail -25 "$LOGDIR/real.log"
echo "=== chain done ==="
