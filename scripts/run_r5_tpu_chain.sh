#!/bin/bash
# Round-5 sequential TPU work chain (single-chip; serialize everything —
# the tunnel admits one client and the 1-core host starves under
# concurrent load, docs/bench_b8_pathology_r4.json).
#
#  1. real:     (tasks #1+#7) 3x speed-perturbation-augmented corpus,
#               train in 450-epoch restart chunks (the experimental plugin
#               leaks ~80 MB host RSS/epoch) to ~1500 epochs.
#  2. voc:      (task #2) in-repo HiFi-GAN GAN training on the real-speech
#               preprocess dir (zerovox-train-vocoder) + one bench row.
#  3. realeval: (task #1) widened >=20-item cross-paired eval with CIs,
#               listening copies vocoded by the stage-2 generator.
#  4. cloning:  (task #3) extended-register cloning corpus (3 train voices
#               outside 0.55-2.10), same chunked budget as r4b, eval vs
#               docs/convergence_cloning_r4b.json.
#  5. http:     (task #5) open-loop Poisson serving saturation sweep.
#
# Usage: scripts/run_r5_tpu_chain.sh [real|voc|realeval|cloning|http|all]
set -u
cd "$(dirname "$0")/.."
REPO=$PWD
# The persistent XLA cache is a net LOSS for these runs: retrieval of the
# large (24-33 MB) train_step executables hangs indefinitely on the
# tunneled backend (observed twice, round 5: frozen client CPU, no RPC
# progress for 18+ min, while a fresh compile of the same program takes
# ~2-6 min). Fresh-compile every process instead.
export ZEROVOX_COMPILE_CACHE=0
LOGDIR=/tmp/r5_chain
mkdir -p "$LOGDIR"
WHAT="${1:-all}"
WORK=/tmp/zvx_real5
VOCDIR=/tmp/zvx_voc5

train_chunk() {
    local work=$1 n=$2 epochs=$3
    local ck ckarg=()
    ck=$(ls "$work"/model/checkpoints/*.msgpack 2>/dev/null | sort | tail -1)
    [ -n "$ck" ] && ckarg=(--checkpoint "$ck")
    echo "=== $work chunk $n (${epochs}ep) from ${ck:-scratch} ==="
    ZEROVOX_PREPROCESSED_DATA_PATH="$work/pp" \
    PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
    python -u -m zerovox_tpu.cli.train \
        -c "$work/modelcfg.yaml" "$work/corpus.yaml" \
        --out-folder "$work/model" --accelerator tpu --devices 1 \
        --batch-size 16 --max-epochs "$epochs" --warmup-epochs 5 \
        --num_workers 1 --checkpoint-every-n-epochs 25 \
        "${ckarg[@]}" \
        > "$LOGDIR/$(basename "$work")_chunk$n.log" 2>&1
    local rc=$?
    tail -2 "$LOGDIR/$(basename "$work")_chunk$n.log"
    return $rc
}

if [ "$WHAT" = real ] || [ "$WHAT" = all ]; then
    if [ ! -f "$WORK/pp/real/train.txt" ]; then
        echo "=== real-speech build+preprocess (augment 0.9,1.1) ==="
        python scripts/exp_real_speech.py --work "$WORK" \
            --build --preprocess --augment 0.9,1.1 \
            > "$LOGDIR/real_build.log" 2>&1 || { echo BUILD FAILED; exit 1; }
        tail -4 "$LOGDIR/real_build.log"
    fi
    for n in 1 2 3; do
        train_chunk "$WORK" $n 450 || { echo "REAL CHUNK $n FAILED"; exit 1; }
    done
fi

if [ "$WHAT" = voc ] || [ "$WHAT" = all ]; then
    echo "=== vocoder GAN training on $WORK/pp/real ==="
    PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
    python -u -m zerovox_tpu.cli.train_vocoder --data "$WORK/pp/real" \
        --out-folder "$VOCDIR" --max-epochs 600 --batch-size 16 \
        --checkpoint-every-n-epochs 50 --log-every-n-epochs 10 \
        > "$LOGDIR/voc_train.log" 2>&1 || { echo "VOC TRAIN FAILED"; exit 1; }
    tail -4 "$LOGDIR/voc_train.log"
    echo "=== vocoder step bench row ==="
    PYTHONPATH="$REPO${PYTHONPATH:+:$PYTHONPATH}" \
    python -u -m zerovox_tpu.cli.train_vocoder --data "$WORK/pp/real" \
        --out-folder /tmp/zvx_voc5_bench --bench --bench-steps 20 \
        --batch-size 16 > "$LOGDIR/voc_bench.log" 2>&1 \
        || echo "VOC BENCH FAILED (non-fatal)"
    tail -1 "$LOGDIR/voc_bench.log"
fi

if [ "$WHAT" = realeval ] || [ "$WHAT" = all ]; then
    echo "=== real-speech widened eval (vocoded listening) ==="
    VOCARG=()
    [ -f "$VOCDIR/generator.msgpack" ] && VOCARG=(--vocoder "$VOCDIR")
    python scripts/exp_real_speech.py --work "$WORK" --accelerator tpu \
        --eval "${VOCARG[@]}" --out-json docs/convergence_real_r5.json \
        > "$LOGDIR/real_eval.log" 2>&1 || { echo "REAL EVAL FAILED"; exit 1; }
    tail -30 "$LOGDIR/real_eval.log"
fi

if [ "$WHAT" = cloning ] || [ "$WHAT" = all ]; then
    CWORK=/tmp/zvx_heldout5
    if [ ! -f "$CWORK/pp/cloning/train.txt" ]; then
        echo "=== extended-register cloning corpus gen ==="
        python scripts/exp_cloning_heldout.py --work "$CWORK" \
            --gen --extended-registers \
            > "$LOGDIR/cloning_gen.log" 2>&1 || { echo GEN FAILED; exit 1; }
        tail -3 "$LOGDIR/cloning_gen.log"
    fi
    for n in 1 2 3; do
        train_chunk "$CWORK" $n 450 || { echo "CLONING CHUNK $n FAILED"; exit 1; }
    done
    echo "=== extended-register cloning eval ==="
    python scripts/exp_cloning_heldout.py --work "$CWORK" --accelerator tpu \
        --eval --out-json docs/convergence_cloning_r5.json \
        > "$LOGDIR/cloning_eval.log" 2>&1 || { echo "CLONING EVAL FAILED"; exit 1; }
    tail -30 "$LOGDIR/cloning_eval.log"
fi

if [ "$WHAT" = http ] || [ "$WHAT" = all ]; then
    echo "=== serving saturation sweep ==="
    python scripts/bench_http_sweep.py --rates 2,5,10,20,30,45,60 \
        --duration 15 --stream-frac 0.25 \
        --out-json docs/bench_http_r5.json \
        > "$LOGDIR/http_sweep.log" 2>&1 || { echo "HTTP SWEEP FAILED"; exit 1; }
    tail -3 "$LOGDIR/http_sweep.log"
fi
echo "=== r5 chain ($WHAT) done ==="
