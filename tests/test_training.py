"""Training pipeline tests: synthetic corpus -> data module -> SPMD train step
on the virtual 8-device CPU mesh; checkpoint roundtrip; decoder-only freeze."""

import json
import os

import jax
import numpy as np
import pytest
import yaml

from zerovox_tpu.config import DecoderConfig, EncoderConfig, ModelConfig, ZeroVoxConfig
from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh
from zerovox_tpu.symbols import Symbols
from zerovox_tpu.training.data import SpeechDataModule, collate
from zerovox_tpu.training.trainer import Trainer, TrainerConfig, device_batch

PHONES = "'-abcdefghijklmnopqrstuvwxyz"
PUNCTS = " ,.;:-!?\""
N_MELS = 20


def tiny_cfg():
    return ZeroVoxConfig.from_dict({
        "audio": {"num_mels": N_MELS},
        "model": {
            "max_txt_len": 64, "max_mel_len": 256,
            "phones": PHONES, "puncts": PUNCTS,
            "emb_dim": 16, "punct_emb_dim": 8,
            "encoder": {"fs2_layer": 1, "fs2_head": 2, "vp_filter_size": 8, "ve_n_bins": 8},
            "decoder": {"kind": "fastspeech2", "n_layers": 1, "n_head": 2, "conv_filter_size": 32},
            "resnet": {"layers": [1, 1, 1, 1], "num_filters": [4, 8, 8, 8]},
        },
        "training": {"learning_rate": 1e-3},
        "stats": {"pitch_min": 50.0, "pitch_max": 400.0, "energy_min": 0.1, "energy_max": 50.0},
        "lang": ["en"],
    })


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    """Synthetic preprocessed corpus matching the reference on-disk contract."""
    root = tmp_path_factory.mktemp("corpus")
    pp = root / "test_corpus"
    for d in ["mel", "pitch", "energy", "duration", "wavs"]:
        os.makedirs(pp / d)

    rng = np.random.default_rng(0)
    lines = []
    for i in range(12):
        base = f"utt{i:03d}"
        L = int(rng.integers(8, 20))
        phones = rng.integers(0, 28, size=L)
        puncts = rng.integers(0, 10, size=L)
        durations = rng.integers(2, 8, size=L).astype(np.int64)
        T = int(durations.sum())
        mel = rng.normal(size=(T, N_MELS)).astype(np.float32)
        pitch = rng.uniform(60, 390, size=L).astype(np.float32)
        energy = rng.uniform(0.2, 45, size=L).astype(np.float32)

        np.save(pp / "mel" / f"mel-{base}.npy", mel)
        np.save(pp / "pitch" / f"pitch-{base}.npy", pitch)
        np.save(pp / "energy" / f"energy-{base}.npy", energy)
        np.save(pp / "duration" / f"duration-{base}.npy", durations)
        with open(pp / "mel" / f"startstop-{base}.json", "w") as f:
            json.dump({"start_hop": 0, "end_hop": T}, f)
        lines.append(f"{base}.wav|{','.join(map(str, phones))}|{','.join(map(str, puncts))}|text {i}")

    with open(pp / "train.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(pp / "stats.json", "w") as f:
        json.dump({"pitch": [50.0, 400.0], "energy": [0.1, 50.0]}, f)

    return str(root)


@pytest.fixture(scope="module")
def datamodule(corpus_dir):
    cfg = tiny_cfg()
    corpora = [{"language": "en", "path": {"preprocessed_path": "test_corpus"}}]
    dm = SpeechDataModule(
        corpora, Symbols(PHONES, PUNCTS),
        stats={"pitch_min": 50.0, "pitch_max": 400.0, "energy_min": 0.1, "energy_max": 50.0},
        batch_size=8, num_workers=2, base_path=corpus_dir, ref_mel_len=64,
    )
    dm.prepare_data()
    return dm


class TestDataModule:
    def test_dataset_loads_all(self, datamodule):
        assert len(datamodule.train_dataset) == 12

    def test_item_contract(self, datamodule):
        it = datamodule.train_dataset.load_item(0)
        assert it["mel"].shape[0] == int(it["duration"].sum())
        assert len(it["phoneme"]) == len(it["pitch"]) == len(it["duration"])
        # pitch/energy normalized into [0, 1]
        assert 0 <= it["pitch"].min() and it["pitch"].max() <= 1.0
        assert 0 <= it["energy"].min() and it["energy"].max() <= 1.0

    def test_collate_buckets(self, datamodule):
        items = [datamodule.train_dataset.load_item(i) for i in range(4)]
        x, y = collate(items, np.random.default_rng(0), ref_mel_len=64)
        assert x["phoneme"].shape[1] in (32, 64)
        assert y["mel"].shape[1] in (128, 256)
        assert x["ref_mel"].shape == (4, 64, N_MELS)
        # mask True at padded positions
        for i in range(4):
            n = x["phoneme_len"][i]
            assert not x["phoneme_mask"][i, :n].any()
            assert x["phoneme_mask"][i, n:].all()

    def test_dataloader_order_invariant_to_worker_count(self, corpus_dir):
        """The epoch-seeded batch sequence (order AND ref-mel crops) must be
        identical at any num_workers — thread scheduling may not perturb
        what a resumed run replays (train_dataloader docstring guarantee)."""
        corpora = [{"language": "en", "path": {"preprocessed_path": "test_corpus"}}]
        stats = {"pitch_min": 50.0, "pitch_max": 400.0,
                 "energy_min": 0.1, "energy_max": 50.0}
        seqs = []
        for nw in (1, 4):
            dm = SpeechDataModule(corpora, Symbols(PHONES, PUNCTS), stats=stats,
                                  batch_size=4, num_workers=nw,
                                  base_path=corpus_dir, ref_mel_len=64)
            dm.prepare_data()
            seqs.append(list(dm.train_dataloader(epoch=3)))
        assert len(seqs[0]) == len(seqs[1]) > 1
        for (x0, y0), (x1, y1) in zip(*seqs):
            np.testing.assert_array_equal(x0["phoneme"], x1["phoneme"])
            np.testing.assert_array_equal(x0["ref_mel"], x1["ref_mel"])
            np.testing.assert_array_equal(y0["mel"], y1["mel"])

    def test_dataloader_yields_batches(self, datamodule):
        batches = list(datamodule.train_dataloader())
        assert len(batches) == 1  # 12 samples, batch 8 -> one full batch
        x, y = batches[0]
        assert x["phoneme"].shape[0] == 8

    def test_device_cache_matches_host_path_exactly(self, corpus_dir):
        """The device-resident gather path must replay the host collate
        path bit-exactly: same epoch-seeded batch order, same bucket
        shapes, same ref-mel crop offsets (same child-rng streams) — the
        guarantee that lets a run switch loader modes between restart
        chunks without perturbing what it trains on."""
        corpora = [{"language": "en", "path": {"preprocessed_path": "test_corpus"}}]
        stats = {"pitch_min": 50.0, "pitch_max": 400.0,
                 "energy_min": 0.1, "energy_max": 50.0}
        kw = dict(batch_size=4, num_workers=2, base_path=corpus_dir,
                  ref_mel_len=64)
        host = SpeechDataModule(corpora, Symbols(PHONES, PUNCTS), stats=stats, **kw)
        host.prepare_data()
        dev = SpeechDataModule(corpora, Symbols(PHONES, PUNCTS), stats=stats,
                               device_cache=True, **kw)
        dev.prepare_data()
        for epoch in (0, 3):
            hb = list(host.train_dataloader(epoch=epoch))
            db = list(dev.train_dataloader(epoch=epoch))
            assert len(hb) == len(db) > 1
            for (hx, hy), (dx, dy) in zip(hb, db):
                for k in ("phoneme", "puncts", "phoneme_len", "phoneme_mask",
                          "mel_len", "mel_mask", "pitch", "energy",
                          "duration", "ref_mel"):
                    np.testing.assert_array_equal(
                        np.asarray(hx[k]), np.asarray(dx[k]), err_msg=k)
                np.testing.assert_array_equal(np.asarray(hy["mel"]),
                                              np.asarray(dy["mel"]))

    def test_device_cache_train_step(self, corpus_dir):
        """A jitted train step consumes device-cached batches unchanged."""
        corpora = [{"language": "en", "path": {"preprocessed_path": "test_corpus"}}]
        stats = {"pitch_min": 50.0, "pitch_max": 400.0,
                 "energy_min": 0.1, "energy_max": 50.0}
        dm = SpeechDataModule(corpora, Symbols(PHONES, PUNCTS), stats=stats,
                              batch_size=8, base_path=corpus_dir,
                              ref_mel_len=64, device_cache=True)
        dm.prepare_data()
        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, warmup_epochs=1, batch_size=8,
                             out_folder="/tmp/zvx_test_devcache", seed=0)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        batch = device_batch(next(iter(dm.train_dataloader(epoch=0))))
        state = trainer.init_state(batch)
        state2, losses = trainer._train_step(
            state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(losses["loss"]))


class TestTrainer:
    def test_train_steps_reduce_loss(self, datamodule):
        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, warmup_epochs=1, batch_size=8,
                             out_folder="/tmp/zvx_test_out", seed=0)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)

        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)

        rng = jax.random.PRNGKey(0)
        losses0 = None
        state2 = state
        from zerovox_tpu.parallel.mesh import shard_batch

        sb = shard_batch(batch, mesh)
        for i in range(5):
            state2, losses = trainer._train_step(state2, sb, rng)
            if losses0 is None:
                losses0 = {k: float(v) for k, v in losses.items()}
        lossN = {k: float(v) for k, v in losses.items()}

        assert np.isfinite(losses0["loss"]) and np.isfinite(lossN["loss"])
        assert lossN["loss"] < losses0["loss"]  # learning happens
        assert int(state2.step) == 5

    def test_punct_fold_train_step(self, datamodule):
        """punct_emb_dim: 0 folds punctuation additively into the phone
        embedding so d_model == emb_dim (MXU lane alignment for new
        trainings, configs/tts_medium_tpu.yaml); the full SPMD train step
        must run and learn with the folded layout."""
        cfg = tiny_cfg()
        mcfg = dict(cfg.model.__dict__)
        mcfg["punct_emb_dim"] = 0
        cfg = ZeroVoxConfig(audio=cfg.audio, model=ModelConfig(**mcfg),
                            training=cfg.training, stats=cfg.stats,
                            langs=cfg.langs)
        assert cfg.model.emb_size == cfg.model.emb_dim

        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, warmup_epochs=1, batch_size=8,
                             out_folder="/tmp/zvx_test_fold", seed=0)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        # folded layout: punct table rows are emb_dim wide
        ptab = state.params["phoneme_encoder"]["encoder"]["punct_embed"]["embedding"]
        assert ptab.shape[-1] == cfg.model.emb_dim

        from zerovox_tpu.parallel.mesh import shard_batch

        sb = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(0)
        state2, l0 = trainer._train_step(state, sb, rng)
        for _ in range(4):
            state2, lN = trainer._train_step(state2, sb, rng)
        assert np.isfinite(float(l0["loss"]))
        assert float(lN["loss"]) < float(l0["loss"])

    def test_packed_speaker_train_step(self, datamodule):
        """packed_speaker: 2x2 lane-packed speaker-encoder stage 1 — the
        full SPMD train step must run and learn, with a param tree
        identical to the unpacked layout (checkpoint-interchangeable)."""
        import dataclasses

        cfg = tiny_cfg()
        cfgp = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, packed_speaker=True))

        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, warmup_epochs=1, batch_size=8,
                             out_folder="/tmp/zvx_test_sepacked", seed=0)
        batch = device_batch(next(iter(datamodule.train_dataloader())))

        trainer0 = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        trainerp = Trainer(cfgp, tcfg, steps_per_epoch=1, mesh=mesh)
        state0 = trainer0.init_state(batch)
        statep = trainerp.init_state(batch)
        t0 = jax.tree.map(lambda a: a.shape, state0.params)
        tp = jax.tree.map(lambda a: a.shape, statep.params)
        assert t0 == tp

        from zerovox_tpu.parallel.mesh import shard_batch

        sb = shard_batch(batch, mesh)
        rng = jax.random.PRNGKey(0)
        statep, l0 = trainerp._train_step(statep, sb, rng)
        for _ in range(4):
            statep, lN = trainerp._train_step(statep, sb, rng)
        assert np.isfinite(float(l0["loss"]))
        assert float(lN["loss"]) < float(l0["loss"])

    def test_decoder_only_freezes_encoder(self, datamodule):
        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, batch_size=8, out_folder="/tmp/zvx_test_out2",
                             train_decoder_only=True, seed=0)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)

        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        from zerovox_tpu.parallel.mesh import shard_batch

        p_enc_before = np.asarray(jax.tree.leaves(state.params["phoneme_encoder"])[0])
        p_dec_before = np.asarray(jax.tree.leaves(state.params["mel_decoder"])[0])
        state2, _ = trainer._train_step(state, shard_batch(batch, mesh), jax.random.PRNGKey(0))

        p_enc_after = np.asarray(jax.tree.leaves(state2.params["phoneme_encoder"])[0])
        p_dec_after = np.asarray(jax.tree.leaves(state2.params["mel_decoder"])[0])
        np.testing.assert_array_equal(p_enc_before, p_enc_after)
        assert np.any(p_dec_before != p_dec_after)

    def test_checkpoint_roundtrip(self, tmp_path):
        from zerovox_tpu.training.checkpointing import (
            load_checkpoint_meta,
            load_native_checkpoint,
            save_native_checkpoint,
        )

        variables = {"params": {"a": np.arange(6, dtype=np.float32).reshape(2, 3)},
                     "batch_stats": {"b": np.ones(4, np.float32)}}
        p = tmp_path / "ck.msgpack"
        save_native_checkpoint(p, variables, meta={"epoch": 3, "loss": 1.5})
        loaded = load_native_checkpoint(p)
        np.testing.assert_array_equal(loaded["params"]["a"], variables["params"]["a"])
        meta = load_checkpoint_meta(p)
        assert meta["epoch"] == 3


    def test_orbax_roundtrip_full_trainstate(self, datamodule, tmp_path):
        """save_orbax/restore_orbax roundtrip the FULL TrainState (params +
        optimizer state) — the sharded multi-host checkpoint path."""
        from zerovox_tpu.training.checkpointing import restore_orbax, save_orbax

        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, batch_size=8,
                             out_folder=str(tmp_path / "out"), seed=0)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        from zerovox_tpu.parallel.mesh import shard_batch

        state, _ = trainer._train_step(state, shard_batch(batch, mesh),
                                       jax.random.PRNGKey(0))

        ckdir = tmp_path / "orbax"
        save_orbax(ckdir, state, step=7)

        abstract = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state)
        restored = restore_orbax(ckdir, abstract)
        assert int(restored.step) == int(state.step)
        for a, b in zip(jax.tree.leaves(state.params),
                        jax.tree.leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # optimizer state roundtrips too
        for a, b in zip(jax.tree.leaves(state.opt_state),
                        jax.tree.leaves(restored.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_fit_profile_dir_writes_trace(self, datamodule, tmp_path):
        """fit() with profile_dir captures a jax.profiler trace of the first
        trained steps (zerovox-train --profile; SURVEY §5 tracing)."""
        import os

        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        prof = tmp_path / "trace"
        tcfg = TrainerConfig(max_epochs=1, warmup_epochs=1, batch_size=8,
                             out_folder=str(tmp_path / "m"), seed=0,
                             profile_dir=str(prof), profile_steps=2)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=4, mesh=mesh)
        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        trainer.fit(lambda: iter([batch] * 4), state)

        found = [os.path.join(r, f) for r, _, fs in os.walk(prof) for f in fs]
        assert found, "no profiler trace files written"

    def test_fit_writes_checkpoints_without_per_step_sync(self, datamodule, tmp_path):
        """fit() epoch driver: loss falls, msgpack checkpoints + meta appear,
        and per-step logging is gated (host step counter, no int(state.step)
        in the loop — VERDICT r1 weak #4)."""
        import os

        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=3, warmup_epochs=1, batch_size=8,
                             out_folder=str(tmp_path / "m"), seed=0)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)

        state = trainer.fit(lambda: iter([batch]), state)
        ckpts = sorted(os.listdir(tmp_path / "m" / "checkpoints"))
        assert [c for c in ckpts if c.endswith(".msgpack")] == [
            "0000.msgpack", "0001.msgpack", "0002.msgpack"]
        assert trainer._host_step == 3

    def test_resume_matches_unkilled_run(self, datamodule, tmp_path):
        """--resume semantics: a run killed after epoch 1 and resumed from
        its orbax TrainState (params + Adam moments + step) must end epoch 2
        with exactly the params of an unkilled 3-epoch run. Exercises the
        epoch-seeded loader (train_dataloader(epoch)) so data order is a
        function of the epoch index, not process history."""
        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])

        def mk_trainer(out):
            tcfg = TrainerConfig(max_epochs=3, warmup_epochs=1, batch_size=8,
                                 out_folder=str(out), seed=0,
                                 checkpoint_format="orbax")
            return Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)

        loader = datamodule.train_dataloader

        # run A: 3 epochs straight through
        trainer_a = mk_trainer(tmp_path / "a")
        state_a = trainer_a.init_state(device_batch(next(iter(loader(0)))))
        state_a = trainer_a.fit(loader, state_a)

        # run B: killed after epoch 1's checkpoint (max_epochs mutated after
        # construction so the LR schedule is still built for 3 epochs)
        trainer_b = mk_trainer(tmp_path / "b")
        state_b = trainer_b.init_state(device_batch(next(iter(loader(0)))))
        trainer_b.tcfg.max_epochs = 2
        trainer_b.fit(loader, state_b)

        # "new process": fresh trainer + resume
        trainer_c = mk_trainer(tmp_path / "b")
        state_c = trainer_c.init_state(device_batch(next(iter(loader(0)))))
        state_c, start_epoch = trainer_c.resume_from(state_c)
        assert start_epoch == 2
        assert trainer_c._host_step == 2  # one step/epoch, two epochs done
        state_c = trainer_c.fit(loader, state_c, start_epoch=start_epoch)

        assert int(state_c.step) == int(state_a.step) == 3
        for a, c in zip(jax.tree.leaves(state_a.params),
                        jax.tree.leaves(state_c.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-6, atol=1e-7)
        # Adam moments continued, not reset
        for a, c in zip(jax.tree.leaves(state_a.opt_state),
                        jax.tree.leaves(state_c.opt_state)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(c),
                                       rtol=1e-5, atol=1e-7)

    def test_checkpoint_every_n_epochs(self, datamodule, tmp_path):
        """checkpoint_every_n_epochs gates per-epoch saves (and the bulk
        param device_get each save costs); the last epoch always saves."""
        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=5, batch_size=8,
                             out_folder=str(tmp_path / "m"), seed=0,
                             checkpoint_every_n_epochs=3)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        trainer.fit(lambda: iter([batch]), state)
        ckpts = sorted(f for f in os.listdir(tmp_path / "m" / "checkpoints")
                       if f.endswith(".msgpack"))
        assert ckpts == ["0002.msgpack", "0004.msgpack"]

    def test_orbax_keep_checkpoints_prunes(self, datamodule, tmp_path):
        """keep_checkpoints applies to the orbax format too (max_to_keep)."""
        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=3, batch_size=8,
                             out_folder=str(tmp_path / "m"), seed=0,
                             checkpoint_format="orbax", keep_checkpoints=2)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        trainer.fit(lambda: iter([batch]), state)
        kept = sorted(
            d for d in os.listdir(tmp_path / "m" / "checkpoints" / "orbax")
            if d.isdigit())
        assert kept == ["1", "2"]

    def test_fit_orbax_format(self, datamodule, tmp_path):
        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, batch_size=8,
                             out_folder=str(tmp_path / "m"), seed=0,
                             checkpoint_format="orbax")
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        trainer.fit(lambda: iter([batch]), state)
        import os

        assert os.path.isdir(tmp_path / "m" / "checkpoints" / "orbax" / "0")


class TestOptimizer:
    def test_mu_free_lowering_matches_adamw(self):
        """make_optimizer's b1==0 mu-free lowering must produce the exact
        optax.adamw(b1=0) trajectory — same clipping, bias correction, eps
        placement, weight decay, and lr — while storing no first moment."""
        import jax
        import jax.numpy as jnp
        import optax

        from zerovox_tpu.training.optim import ScaleByNuState, make_optimizer

        lr, wd, eps, clip = 1e-2, 1e-2, 1e-9, 1.0
        tx_fast = make_optimizer(lr, weight_decay=wd, betas=(0.0, 0.99),
                                 eps=eps, grad_clip=clip)
        tx_ref = optax.chain(
            optax.clip_by_global_norm(clip),
            optax.adamw(learning_rate=lr, b1=0.0, b2=0.99, eps=eps,
                        weight_decay=wd),
        )

        rng = np.random.default_rng(11)
        params = {
            "w": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32)),
            "b": jnp.asarray(rng.normal(size=(16,)).astype(np.float32)),
        }
        p_fast, p_ref = params, params
        s_fast, s_ref = tx_fast.init(p_fast), tx_ref.init(p_ref)

        # no mu anywhere in the lowered state; params-sized leaves halve
        def f32_bytes(tree):
            return sum(x.size * 4 for x in jax.tree.leaves(tree)
                       if hasattr(x, "size") and x.dtype == jnp.float32)
        assert any(isinstance(s, ScaleByNuState)
                   for s in jax.tree.leaves(s_fast, is_leaf=lambda x: isinstance(x, ScaleByNuState)))
        assert f32_bytes(s_fast) * 2 <= f32_bytes(s_ref) + 8

        for step in range(5):
            grads = jax.tree.map(
                lambda p: jnp.asarray(
                    rng.normal(size=p.shape).astype(np.float32)) * (step + 1),
                params)
            u_fast, s_fast = tx_fast.update(grads, s_fast, p_fast)
            u_ref, s_ref = tx_ref.update(grads, s_ref, p_ref)
            p_fast = optax.apply_updates(p_fast, u_fast)
            p_ref = optax.apply_updates(p_ref, u_ref)
            for a, b in zip(jax.tree.leaves(p_fast), jax.tree.leaves(p_ref)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=0, atol=1e-7)

    def test_bf16_nu_tracks_f32_trajectory(self):
        """--optim-dtype bf16: nu stored in bf16 (half the optimizer HBM
        stream), updates computed in f32 — the parameter trajectory must
        track the f32-state optimizer within bf16's ~0.4%% denominator
        rounding, with no drift blow-up over many steps."""
        import jax
        import jax.numpy as jnp
        import optax

        from zerovox_tpu.training.optim import ScaleByNuState, make_optimizer

        lr, eps = 1e-2, 1e-9
        tx32 = make_optimizer(lr, betas=(0.0, 0.99), eps=eps)
        tx16 = make_optimizer(lr, betas=(0.0, 0.99), eps=eps,
                              state_dtype="bf16")

        rng = np.random.default_rng(5)
        params = {"w": jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))}
        p32, p16 = params, params
        s32, s16 = tx32.init(p32), tx16.init(p16)

        nu_leaves = [s.nu for s in jax.tree.leaves(
            s16, is_leaf=lambda x: isinstance(x, ScaleByNuState))
            if isinstance(s, ScaleByNuState)]
        assert nu_leaves and all(
            x.dtype == jnp.bfloat16 for x in jax.tree.leaves(nu_leaves))

        for step in range(30):
            grads = jax.tree.map(
                lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)),
                params)
            u32, s32 = tx32.update(grads, s32, p32)
            u16, s16 = tx16.update(grads, s16, p16)
            p32 = optax.apply_updates(p32, u32)
            p16 = optax.apply_updates(p16, u16)
        # cumulative |param| drift stays at the rounding-noise scale
        # (~0.2%/step uncorrelated -> well under 2% after 30 steps)
        a, b = np.asarray(p32["w"]), np.asarray(p16["w"])
        assert np.max(np.abs(a - b)) < 0.02 * np.max(np.abs(a))

    def test_nonzero_b1_keeps_full_adamw(self):
        """betas[0] != 0 must route to the full optax.adamw path."""
        from zerovox_tpu.training.optim import ScaleByNuState, make_optimizer
        import jax
        import jax.numpy as jnp

        tx = make_optimizer(1e-3, betas=(0.9, 0.99))
        state = tx.init({"w": jnp.ones((4,))})
        assert not any(isinstance(s, ScaleByNuState)
                       for s in jax.tree.leaves(
                           state, is_leaf=lambda x: isinstance(x, ScaleByNuState)))


class TestLossSemantics:
    def test_masked_loss_matches_reference_formula(self):
        """Verify loss vs a direct masked_select-style computation."""
        from zerovox_tpu.models.zerovox import zerovox_loss

        rng = np.random.default_rng(7)
        B, L, T, M = 2, 6, 10, 4
        pred = {
            "mel": rng.normal(size=(B, T, M)).astype(np.float32),
            "pitch": rng.normal(size=(B, L)).astype(np.float32),
            "energy": rng.normal(size=(B, L)).astype(np.float32),
            "log_duration": rng.normal(size=(B, L)).astype(np.float32),
        }
        batch = {
            "mel": rng.normal(size=(B, T, M)).astype(np.float32),
            "pitch": rng.normal(size=(B, L)).astype(np.float32),
            "energy": rng.normal(size=(B, L)).astype(np.float32),
            "duration": rng.integers(1, 5, size=(B, L)).astype(np.int32),
            "phoneme_mask": np.asarray([[False] * 4 + [True] * 2, [False] * 6]),
            "mel_mask": np.asarray([[False] * 7 + [True] * 3, [False] * 10]),
        }
        out = zerovox_loss(pred, batch)

        keep_m = ~batch["mel_mask"]
        mel_ref = np.abs(pred["mel"] - batch["mel"])[keep_m].mean()
        keep_p = ~batch["phoneme_mask"]
        pitch_ref = ((pred["pitch"] - batch["pitch"]) ** 2)[keep_p].mean()
        dur_ref = ((pred["log_duration"] - np.log(batch["duration"] + 1.0)) ** 2)[keep_p].mean()

        np.testing.assert_allclose(float(out["mel_loss"]), mel_ref, rtol=1e-5)
        np.testing.assert_allclose(float(out["pitch_loss"]), pitch_ref, rtol=1e-5)
        np.testing.assert_allclose(float(out["duration_loss"]), dur_ref, rtol=1e-5)
        np.testing.assert_allclose(
            float(out["loss"]),
            10 * float(out["mel_loss"]) + 2 * float(out["pitch_loss"])
            + 2 * float(out["energy_loss"]) + float(out["duration_loss"]),
            rtol=1e-6,
        )


class TestMixedPrecision:
    def test_bf16_mixed_train_step(self, datamodule):
        """bf16-mixed forward/backward with f32 master weights: loss finite,
        params stay f32 and still learn."""
        import jax.numpy as jnp

        cfg = tiny_cfg()
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tcfg = TrainerConfig(max_epochs=1, batch_size=8, out_folder="/tmp/zvx_bf16",
                             precision="bf16-mixed", seed=0)
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)

        batch = device_batch(next(iter(datamodule.train_dataloader())))
        state = trainer.init_state(batch)
        from zerovox_tpu.parallel.mesh import shard_batch

        sb = shard_batch(batch, mesh)
        l0 = None
        for _ in range(4):
            state, losses = trainer._train_step(state, sb, jax.random.PRNGKey(0))
            if l0 is None:
                l0 = float(losses["loss"])
        lN = float(losses["loss"])
        assert np.isfinite(l0) and np.isfinite(lN)
        assert lN < l0
        # master weights and batch stats remain f32
        assert jax.tree.leaves(state.params)[0].dtype == jnp.float32
        for leaf in jax.tree.leaves(state.batch_stats):
            assert leaf.dtype == jnp.float32


class TestRemat:
    def test_remat_same_param_tree_and_step(self, tmp_path):
        """model.remat=True (per-FFT-block jax.checkpoint) must keep the
        param tree identical to the non-remat model (checkpoints stay
        interchangeable) and run a full train step with finite loss."""
        import dataclasses

        import jax

        from zerovox_tpu.config import ZeroVoxConfig
        from zerovox_tpu.models.zerovox import ZeroVox
        from zerovox_tpu.parallel.mesh import MeshConfig, make_mesh, shard_batch
        from zerovox_tpu.training.trainer import Trainer, TrainerConfig, device_batch

        cfg = ZeroVoxConfig.from_dict({
            "audio": {"num_mels": 20},
            "model": {
                "max_txt_len": 32, "max_mel_len": 64,
                "emb_dim": 16, "punct_emb_dim": 8,
                "encoder": {"fs2_layer": 2, "fs2_head": 2, "vp_filter_size": 8,
                            "ve_n_bins": 8},
                "decoder": {"kind": "fastspeech2", "n_layers": 2, "n_head": 2,
                            "conv_filter_size": 32},
                "resnet": {"layers": [1, 1, 1, 1], "num_filters": [8, 8, 8, 8]},
            },
        })
        cfg_r = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, remat=True))

        rng = np.random.default_rng(0)
        B, L, T = 4, 12, 48
        dur = rng.integers(2, 4, size=(B, L)).astype(np.int32)
        mel_len = np.minimum(dur.sum(1), T)
        batch = {
            "phoneme": rng.integers(0, 28, (B, L)).astype(np.int32),
            "puncts": rng.integers(0, 10, (B, L)).astype(np.int32),
            "phoneme_mask": np.zeros((B, L), bool),
            "pitch": rng.uniform(0, 1, (B, L)).astype(np.float32),
            "energy": rng.uniform(0, 1, (B, L)).astype(np.float32),
            "duration": dur,
            "mel_mask": np.arange(T)[None, :] >= mel_len[:, None],
            "ref_mel": rng.normal(size=(B, 32, 20)).astype(np.float32),
            "mel": rng.normal(size=(B, T, 20)).astype(np.float32),
        }

        v_plain = ZeroVox(cfg).init({"params": jax.random.PRNGKey(0)}, batch, train=False)
        v_remat = ZeroVox(cfg_r).init({"params": jax.random.PRNGKey(0)}, batch, train=False)
        assert (jax.tree_util.tree_structure(v_plain)
                == jax.tree_util.tree_structure(v_remat))
        for a, b in zip(jax.tree.leaves(v_plain), jax.tree.leaves(v_remat)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        mesh = make_mesh(MeshConfig(data=1), devices=jax.devices()[:1])
        trainer = Trainer(cfg_r, TrainerConfig(max_epochs=1, batch_size=B,
                                               out_folder=str(tmp_path)),
                          steps_per_epoch=1, mesh=mesh)
        state = trainer.init_state(device_batch(batch))
        state, losses = trainer._train_step(state, shard_batch(device_batch(batch), mesh),
                                            jax.random.PRNGKey(0))
        assert np.isfinite(float(losses["loss"]))


def test_resolve_optim_dtype(monkeypatch):
    """auto -> bf16 on accelerator backends at EVERY batch size (the round-3
    batch>=32 gate guarded a contention artifact, not a real pathology —
    docs/PERFORMANCE.md round-4 addendum); f32 on CPU; explicit specs pass
    through."""
    import jax

    from zerovox_tpu.cli.train import resolve_optim_dtype

    assert resolve_optim_dtype("f32", 64) == "f32"
    assert resolve_optim_dtype("bf16", 8) == "bf16"
    assert resolve_optim_dtype("auto", 8) == "f32"  # tests run on CPU
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_optim_dtype("auto", 8) == "bf16"
    assert resolve_optim_dtype("auto", 64) == "bf16"
