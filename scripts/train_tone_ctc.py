"""Train the bundled tone-speak alignment acoustic model.

Creates zerovox_tpu/preprocess/tone_ctc_weights.npz (committed to the repo)
— the model behind `--aligner tone` (preprocess/tone_ctc.py).

The tone-speak synthesizer provides exact per-character sample boundaries,
so the model is trained FRAME-SUPERVISED (per-frame cross-entropy against
the sounding character, blank for silence) rather than with the CTC loss: a
CTC-trained model converges to peaky emissions (one spike per character),
which align correctly but smear duration targets when inter-span gaps are
split between neighbors. Frame-accurate emissions give Viterbi spans that
cover the full character extent, like a well-trained wav2vec2 aligner's.
The emission matrix keeps the CTC label contract (blank 0 + characters), so
forced_align/merge_tokens consume it unchanged.

    python scripts/train_tone_ctc.py [--steps 500] [--batch 16]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

from zerovox_tpu.preprocess.aligner import DEFAULT_LABELS
from zerovox_tpu.preprocess.tone_ctc import (
    HOP,
    SAMPLE_RATE,
    ToneCTCNet,
    extract_features,
    make_frontend,
    save_params,
)
from zerovox_tpu.utils.synthvoice import ALPHABET, render_text_with_boundaries


def random_texts(rng: np.random.Generator, n: int) -> list[str]:
    texts = []
    for _ in range(n):
        words = []
        for _ in range(rng.integers(1, 4)):
            k = rng.integers(2, 8)
            words.append("".join(rng.choice(list(ALPHABET[:26]), size=k)))
        texts.append(" ".join(words))
    return texts


def frame_labels(boundaries, T: int, hop: int, dictionary) -> np.ndarray:
    """Per-frame target: the character sounding at the frame center, else blank."""
    labels = np.zeros(T, np.int32)
    for char, s, e in boundaries:
        lo = int(np.ceil((s - hop / 2) / hop))
        hi = int(np.floor((e - hop / 2) / hop))
        labels[max(0, lo): min(T, hi + 1)] = dictionary[char]
    return labels


def build_dataset(texts, frontend, dictionary, max_T, rng):
    mels, frame_lab, frame_mask = [], [], []
    for text in texts:
        char_dur = 0.10 + 0.08 * rng.random()
        wav, bounds = render_text_with_boundaries(
            text, SAMPLE_RATE, char_dur=char_dur,
            edge_silence=0.1 + 0.2 * rng.random(),
            noise=0.005, seed=int(rng.integers(1 << 30)))
        mel = extract_features(frontend, wav)
        T = min(len(mel), max_T)
        lab = frame_labels(bounds, T, HOP, dictionary)
        mels.append(np.pad(mel[:T], ((0, max_T - T), (0, 0))))
        frame_lab.append(np.pad(lab, (0, max_T - T)))
        frame_mask.append((np.arange(max_T) < T).astype(np.float32))
    return (np.stack(mels).astype(np.float32), np.stack(frame_lab),
            np.stack(frame_mask))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    frontend = make_frontend()
    dictionary = {c: i for i, c in enumerate(DEFAULT_LABELS)}

    texts = random_texts(rng, args.samples)
    max_T = 220
    mels, labels, mask = build_dataset(texts, frontend, dictionary, max_T, rng)
    print(f"dataset: {mels.shape} mels, frame labels {labels.shape}")

    net = ToneCTCNet()
    params = net.init(jax.random.PRNGKey(args.seed),
                      jnp.zeros((1, max_T, mels.shape[-1])))["params"]
    tx = optax.adam(3e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, mel, lab, msk):
        def loss_fn(p):
            logits = net.apply({"params": p}, mel)
            ce = optax.softmax_cross_entropy_with_integer_labels(logits, lab)
            return (ce * msk).sum() / msk.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    n = len(mels)
    for it in range(args.steps):
        idx = rng.integers(0, n, size=args.batch)
        params, opt_state, loss = step(params, opt_state, mels[idx],
                                       labels[idx], mask[idx])
        if it % 50 == 0 or it == args.steps - 1:
            print(f"step {it}: frame_ce={float(loss):.4f}")

    # held-out frame accuracy
    test_texts = random_texts(rng, 16)
    tm, tl, tmask = build_dataset(test_texts, frontend, dictionary, max_T, rng)
    pred = np.asarray(jnp.argmax(net.apply({"params": params}, jnp.asarray(tm)), -1))
    acc = float(((pred == tl) * tmask).sum() / tmask.sum())
    print(f"held-out frame accuracy: {acc:.4f}")
    assert acc > 0.90, f"tone aligner failed to converge (frame acc {acc:.3f})"

    out = args.out
    if out is None:
        from zerovox_tpu.preprocess.tone_ctc import WEIGHTS_FILE

        out = WEIGHTS_FILE
    save_params(params, out)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
