"""Training data pipeline.

On-disk contract identical to the reference preprocessor's output
(reference zerovox/tts/data.py:128-225): per-corpus `train.txt` metadata
(`wav|phones|puncts|text` pipe format), per-utterance
`mel-/pitch-/energy-/duration-*.npy` + `startstop-*.json` feature files, and
`stats.json` corpus pitch/energy ranges; items with missing duration files are
skipped. Pitch/energy are log-min-max normalized to [0,1] with the merged
corpus stats (data.py:177-183).

TPU-first differences from the reference's DataLoader/collate
(data.py:43-125):

  * batches pad phoneme/mel lengths up to static **buckets**, so every batch
    shape hits a cached XLA program (no per-batch recompiles);
  * the zero-shot reference mel is a *fixed-length* random crop
    (`ref_mel_len`, default 500 = the reference's MAX_REF_LEN cap,
    data.py:28); utterances shorter than the crop are tiled (wrapped) rather
    than letting the crop length float with the batch minimum — keeping the
    speaker-encoder program static while preserving the "crop of the item's
    own target mel" training signal (data.py:72-79);
  * loading + collation runs in a background thread pool with prefetch,
    feeding `jax.device_put` (SURVEY.md §2.3 multiprocess row).
"""

from __future__ import annotations

import json
import os
import queue
import threading
from dataclasses import dataclass

import numpy as np

from zerovox_tpu.symbols import Symbols

MAX_REF_LEN = 500

PHONEME_BUCKETS = (32, 64, 96, 128, 192, 256, 384, 512)
MEL_BUCKETS = (128, 256, 384, 512, 768, 1024, 1280, 1536, 1792)


def preprocessed_data_path() -> str:
    p = os.environ.get("ZEROVOX_PREPROCESSED_DATA_PATH", "")
    if not p:
        raise Exception("ZEROVOX_PREPROCESSED_DATA_PATH env var is not set")
    return p


def _bucket(n: int, buckets) -> int:
    for b in buckets:
        if b >= n:
            return b
    return buckets[-1]


@dataclass
class Sample:
    preprocessed_path: str
    filename: str
    phonemes: list
    puncts: list
    transcript: str


class SpeechDataset:
    """Metadata index + per-item feature loading."""

    def __init__(self, filename: str, corpora, symbols: Symbols, stats: dict,
                 base_path: str | None = None):
        self._symbols = symbols
        self._stats = stats
        self.samples: list[Sample] = []

        base = base_path if base_path is not None else preprocessed_data_path()
        for corpus in corpora:
            pp = os.path.join(base, corpus["path"]["preprocessed_path"])
            meta = os.path.join(pp, filename)
            if not os.path.exists(meta):
                continue
            with open(meta, encoding="utf-8") as f:
                for line in f:
                    wav, phones, puncts, transcript = line.strip("\n").split("|")
                    basename = os.path.splitext(wav)[0]
                    dur_path = os.path.join(pp, "duration", f"duration-{basename}.npy")
                    if not os.path.exists(dur_path):
                        print(f"{dur_path} missing -> skipping sample")
                        continue
                    self.samples.append(Sample(
                        preprocessed_path=pp,
                        filename=wav,
                        phonemes=[int(p) for p in phones.split(",")],
                        puncts=[int(p) for p in puncts.split(",")],
                        transcript=transcript,
                    ))

    def __len__(self) -> int:
        return len(self.samples)

    def load_item(self, idx: int) -> dict:
        s = self.samples[idx]
        basename = os.path.splitext(s.filename)[0]
        pp = s.preprocessed_path

        mel = np.load(os.path.join(pp, "mel", f"mel-{basename}.npy")).astype(np.float32)
        with open(os.path.join(pp, "mel", f"startstop-{basename}.json")) as f:
            d = json.load(f)

        pitch = np.load(os.path.join(pp, "pitch", f"pitch-{basename}.npy")).astype(np.float32)
        energy = np.load(os.path.join(pp, "energy", f"energy-{basename}.npy")).astype(np.float32)
        duration = np.load(os.path.join(pp, "duration", f"duration-{basename}.npy")).astype(np.int32)

        st = self._stats
        pitch = np.log(pitch - (st["pitch_min"] - 1.0))
        pitch = pitch / np.log(st["pitch_max"] - st["pitch_min"] + 1.0)
        energy = np.log(energy - (st["energy_min"] - 1.0))
        energy = energy / np.log(st["energy_max"] - st["energy_min"] + 1.0)

        return {
            "phoneme": np.asarray(s.phonemes, np.int32),
            "puncts": np.asarray(s.puncts, np.int32),
            "text": s.transcript,
            "pitch": pitch.astype(np.float32),
            "energy": energy.astype(np.float32),
            "duration": duration,
            "mel": mel,
            "basename": basename,
            "preprocessed_path": pp,
            "start_hop": d["start_hop"],
            "end_hop": d["end_hop"],
        }


def collate(items: list[dict], rng: np.random.Generator,
            ref_mel_len: int = MAX_REF_LEN,
            phoneme_buckets=PHONEME_BUCKETS, mel_buckets=MEL_BUCKETS) -> tuple[dict, dict]:
    """Pad a list of items into one statically-bucketed batch (x, y)."""
    B = len(items)
    phoneme_lens = np.asarray([len(it["phoneme"]) for it in items], np.int32)
    mel_lens = np.asarray([it["mel"].shape[0] for it in items], np.int32)

    L = _bucket(int(phoneme_lens.max()), phoneme_buckets)
    T = _bucket(int(mel_lens.max()), mel_buckets)
    n_mels = items[0]["mel"].shape[1]

    phonemes = np.zeros((B, L), np.int32)
    puncts = np.zeros((B, L), np.int32)
    pitch = np.zeros((B, L), np.float32)
    energy = np.zeros((B, L), np.float32)
    duration = np.zeros((B, L), np.int32)
    mels = np.zeros((B, T, n_mels), np.float32)
    ref_mels = np.zeros((B, ref_mel_len, n_mels), np.float32)

    for i, it in enumerate(items):
        n, t = phoneme_lens[i], mel_lens[i]
        phonemes[i, :n] = it["phoneme"]
        puncts[i, :n] = it["puncts"]
        pitch[i, :n] = it["pitch"][:n]
        energy[i, :n] = it["energy"][:n]
        duration[i, :n] = it["duration"][:n]
        mels[i, :t] = it["mel"]

        # fixed-length zero-shot reference crop of the item's own mel
        if t >= ref_mel_len:
            off = rng.integers(0, t - ref_mel_len + 1)
            ref_mels[i] = it["mel"][off : off + ref_mel_len]
        else:
            reps = int(np.ceil(ref_mel_len / t))
            ref_mels[i] = np.tile(it["mel"], (reps, 1))[:ref_mel_len]

    phoneme_mask = np.arange(L)[None, :] >= phoneme_lens[:, None]
    mel_mask = np.arange(T)[None, :] >= mel_lens[:, None]

    x = {
        "phoneme": phonemes,
        "puncts": puncts,
        "phoneme_len": phoneme_lens,
        "phoneme_mask": phoneme_mask,
        "text": [it["text"] for it in items],
        "mel_len": mel_lens,
        "mel_mask": mel_mask,
        "pitch": pitch,
        "energy": energy,
        "duration": duration,
        "ref_mel": ref_mels,
        "basenames": [it["basename"] for it in items],
        "preprocessed_paths": [it["preprocessed_path"] for it in items],
        "starts": [it["start_hop"] for it in items],
        "ends": [it["end_hop"] for it in items],
    }
    y = {"mel": mels}
    return x, y


# Device-resident corpus caching is worthwhile only while the whole feature
# store fits comfortably next to params/activations in HBM (v5e: 16 GB).
DEVICE_CACHE_BYTE_LIMIT = 2 << 30


class _DeviceCorpusCache:
    """All corpus features bucket-padded + resident on device; batches are
    formed by an on-device gather from a per-step host transfer of just the
    index/crop-offset vectors (~tens of bytes).

    Why: on tunneled/remote TPU runtimes the per-step `device_put` of a
    collated batch (several MB of mel/ref-mel) is the training bottleneck —
    measured 0.37 s/step against a 23 ms device step on the round-5 real-
    speech run. A small corpus (hundreds of items, ~100 MB padded) fits in
    HBM outright, so ship it once and index it there. The reference has no
    analogue (its DataLoader feeds per-step host batches, data.py:43-125);
    this is the TPU-native replacement for the same contract.

    Semantics are bit-identical to the host `collate` path: batch order
    comes from the same `_batch_indices` rng stream and the ref-mel crop
    offsets are drawn from the same per-batch child seeds in the same
    order, so switching a run between host and cached loading (or resuming
    across the two) replays exactly the same batches.
    """

    def __init__(self, ds: "SpeechDataset", ref_mel_len: int = MAX_REF_LEN):
        import jax

        items = [ds.load_item(i) for i in range(len(ds))]
        n = len(items)
        lmax = _bucket(max(len(it["phoneme"]) for it in items), PHONEME_BUCKETS)
        tmax = _bucket(max(it["mel"].shape[0] for it in items), MEL_BUCKETS)
        n_mels = items[0]["mel"].shape[1]

        phoneme = np.zeros((n, lmax), np.int32)
        puncts = np.zeros((n, lmax), np.int32)
        pitch = np.zeros((n, lmax), np.float32)
        energy = np.zeros((n, lmax), np.float32)
        duration = np.zeros((n, lmax), np.int32)
        mel = np.zeros((n, tmax, n_mels), np.float32)
        self.phoneme_len = np.zeros(n, np.int32)
        self.mel_len = np.zeros(n, np.int32)
        for i, it in enumerate(items):
            ln, t = len(it["phoneme"]), it["mel"].shape[0]
            phoneme[i, :ln] = it["phoneme"]
            puncts[i, :ln] = it["puncts"]
            pitch[i, :ln] = it["pitch"][:ln]
            energy[i, :ln] = it["energy"][:ln]
            duration[i, :ln] = it["duration"][:ln]
            mel[i, :t] = it["mel"]
            self.phoneme_len[i] = ln
            self.mel_len[i] = t

        host = {"phoneme": phoneme, "puncts": puncts, "pitch": pitch,
                "energy": energy, "duration": duration, "mel": mel,
                "phoneme_len": self.phoneme_len, "mel_len": self.mel_len}
        self.nbytes = sum(v.nbytes for v in host.values())
        self.data = {k: jax.device_put(v) for k, v in host.items()}
        self.ref_mel_len = ref_mel_len
        self._gather = jax.jit(self._gather_impl,
                               static_argnames=("L", "T", "ref_len"))

    @staticmethod
    def _gather_impl(data, idx, ref_off, *, L, T, ref_len):
        import jax
        import jax.numpy as jnp

        plen = data["phoneme_len"][idx]
        mlen = data["mel_len"][idx]
        mel_full = data["mel"][idx]  # [B, Tmax, M]

        def crop(m, t, off):
            # matches host collate: a random offset crop when the item is
            # long enough, tiling (wrap) from the start otherwise
            rows = jnp.where(t >= ref_len,
                             off + jnp.arange(ref_len),
                             jnp.arange(ref_len) % jnp.maximum(t, 1))
            return jnp.take(m, rows, axis=0)

        x = {
            "phoneme": data["phoneme"][idx, :L],
            "puncts": data["puncts"][idx, :L],
            "phoneme_len": plen,
            "phoneme_mask": jnp.arange(L)[None, :] >= plen[:, None],
            "mel_len": mlen,
            "mel_mask": jnp.arange(T)[None, :] >= mlen[:, None],
            "pitch": data["pitch"][idx, :L],
            "energy": data["energy"][idx, :L],
            "duration": data["duration"][idx, :L],
            "ref_mel": jax.vmap(crop)(mel_full, mlen, ref_off),
        }
        return x, {"mel": mel_full[:, :T]}

    def gather(self, bidx: np.ndarray, ref_off: np.ndarray, L: int, T: int):
        return self._gather(self.data, np.asarray(bidx, np.int32),
                            np.asarray(ref_off, np.int32),
                            L=L, T=T, ref_len=self.ref_mel_len)


class SpeechDataModule:
    """Shuffled, length-bucketed, prefetching batch iterator."""

    def __init__(self, corpora, symbols: Symbols, stats: dict, num_bins: int = 256,
                 batch_size: int = 64, num_workers: int = 4, seed: int = 0,
                 ref_mel_len: int = MAX_REF_LEN, base_path: str | None = None,
                 drop_last: bool = True, device_cache: bool = False):
        self.corpora = corpora
        self._symbols = symbols
        self._stats = stats
        self.batch_size = batch_size
        self.num_workers = max(1, num_workers)
        self._seed = seed
        self._rng = np.random.default_rng(seed)
        self._ref_mel_len = ref_mel_len
        self._base_path = base_path
        # drop_last=False keeps remainder samples by padding the tail batch
        # with wrap-around duplicates (static batch shape, no recompile);
        # x["pad_items"] counts the duplicates at the END of such a batch.
        # Exporters need every sample; the training loop keeps drop_last.
        self.drop_last = drop_last
        self.device_cache = device_cache
        self._cache: _DeviceCorpusCache | None = None
        self.train_dataset: SpeechDataset | None = None

    def prepare_data(self):
        self.train_dataset = SpeechDataset("train.txt", self.corpora, self._symbols,
                                           self._stats, base_path=self._base_path)

    def steps_per_epoch(self) -> int:
        assert self.train_dataset is not None
        return max(1, len(self.train_dataset) // self.batch_size)

    def _batch_indices(self, rng):
        """Shuffle, then group size-adjacent items so bucket padding is tight.

        Returns a list of (index_array, n_pad) pairs; n_pad > 0 only on the
        tail batch when drop_last=False (wrap-around duplicate indices).
        """
        ds = self.train_dataset
        idx = rng.permutation(len(ds))
        # coarse length-sort within shuffled chunks keeps batches length-homogeneous
        chunk = self.batch_size * 32
        batches = []
        leftovers = []
        for c0 in range(0, len(idx), chunk):
            part = idx[c0 : c0 + chunk]
            lens = np.asarray([len(ds.samples[i].phonemes) for i in part])
            part = part[np.argsort(lens, kind="stable")]
            n_full = (len(part) // self.batch_size) * self.batch_size
            for b0 in range(0, n_full, self.batch_size):
                batches.append((part[b0 : b0 + self.batch_size], 0))
            leftovers.extend(part[n_full:])
        if not self.drop_last:
            for b0 in range(0, len(leftovers), self.batch_size):
                b = np.asarray(leftovers[b0 : b0 + self.batch_size])
                n_pad = self.batch_size - len(b)
                if n_pad:
                    b = np.concatenate([b, idx[:n_pad]])
                batches.append((b, n_pad))
        rng.shuffle(batches)
        return batches

    def train_dataloader(self, epoch: int | None = None):
        """Generator of (x, y) host batches with threaded prefetch.

        When `epoch` is given, batch order and ref-mel crops derive from
        a fresh rng seeded by (seed, epoch) instead of the module's
        stateful rng — so a resumed run at epoch E sees exactly the data
        order an unkilled run would have seen (Trainer passes the epoch
        index when the loader accepts one)."""
        assert self.train_dataset is not None, "call prepare_data() first"
        if self.device_cache:
            yield from self._device_dataloader(epoch)
            return
        ds = self.train_dataset
        rng = (np.random.default_rng((self._seed, epoch))
               if epoch is not None else self._rng)
        batches = self._batch_indices(rng)
        # Per-batch child seeds drawn single-threaded up front, and batches
        # yielded strictly in position order: worker threads therefore
        # cannot perturb either the ref-mel crops (a shared Generator is
        # not thread-safe) or the batch order (queue arrival is
        # timing-dependent) — the resume guarantee above holds at any
        # num_workers.
        seeds = rng.integers(np.iinfo(np.int64).max, size=len(batches))
        q: queue.Queue = queue.Queue(maxsize=self.num_workers * 2)

        def worker(batch_list):
            for pos, (bidx, n_pad) in batch_list:
                items = [ds.load_item(int(i)) for i in bidx]
                x, y = collate(items, np.random.default_rng(seeds[pos]),
                               ref_mel_len=self._ref_mel_len)
                x["pad_items"] = n_pad
                q.put((pos, (x, y)))

        n_workers = min(self.num_workers, max(1, len(batches)))
        indexed = list(enumerate(batches))
        shards = [indexed[i::n_workers] for i in range(n_workers)]
        threads = [threading.Thread(target=worker, args=(s,), daemon=True) for s in shards]
        for t in threads:
            t.start()

        pending: dict[int, tuple] = {}
        for next_pos in range(len(batches)):
            while next_pos not in pending:
                pos, item = q.get()
                pending[pos] = item
            yield pending.pop(next_pos)

    def _device_dataloader(self, epoch: int | None = None):
        """Device-cached batch generator: same (x, y) values as the host
        path above (same rng streams -> same batch order AND ref crops),
        but arrays come from an on-device gather instead of per-step
        host collate + multi-MB device_put."""
        if self._cache is None:
            cache = _DeviceCorpusCache(self.train_dataset, self._ref_mel_len)
            if cache.nbytes > DEVICE_CACHE_BYTE_LIMIT:
                print(f"device corpus cache disabled: corpus "
                      f"{cache.nbytes / 1e6:.0f} MB exceeds the "
                      f"{DEVICE_CACHE_BYTE_LIMIT / 1e6:.0f} MB HBM budget")
                self.device_cache = False
                yield from self.train_dataloader(epoch)
                return
            self._cache = cache
            print(f"device corpus cache: {len(self.train_dataset)} items, "
                  f"{cache.nbytes / 1e6:.1f} MB resident on device")
        rng = (np.random.default_rng((self._seed, epoch))
               if epoch is not None else self._rng)
        batches = self._batch_indices(rng)
        seeds = rng.integers(np.iinfo(np.int64).max, size=len(batches))
        plen, mlen = self._cache.phoneme_len, self._cache.mel_len
        ref_len = self._ref_mel_len
        for pos, (bidx, n_pad) in enumerate(batches):
            crng = np.random.default_rng(seeds[pos])
            bidx = np.asarray(bidx)
            L = _bucket(int(plen[bidx].max()), PHONEME_BUCKETS)
            T = _bucket(int(mlen[bidx].max()), MEL_BUCKETS)
            # same child-rng draw sequence as collate (one draw per
            # long-enough item, in item order)
            offs = np.zeros(len(bidx), np.int32)
            for i, t in enumerate(mlen[bidx]):
                if t >= ref_len:
                    offs[i] = crng.integers(0, int(t) - ref_len + 1)
            x, y = self._cache.gather(bidx, offs, L, T)
            x["pad_items"] = n_pad
            yield x, y
