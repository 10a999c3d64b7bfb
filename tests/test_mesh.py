"""Mesh / sharding tests: data-parallel batch placement, tensor-parallel
param sharding rules, replication."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from zerovox_tpu.config import ZeroVoxConfig
from zerovox_tpu.models.zerovox import ZeroVox
from zerovox_tpu.parallel.mesh import (
    MeshConfig,
    make_mesh,
    param_sharding_rules,
    replicate,
    shard_batch,
)


def tiny_cfg():
    return ZeroVoxConfig.from_dict({
        "audio": {"num_mels": 20},
        "model": {
            "max_txt_len": 32, "max_mel_len": 64,
            "emb_dim": 48, "punct_emb_dim": 16,  # emb_size 64 divisible by model axis
            "encoder": {"fs2_layer": 1, "fs2_head": 2, "vp_filter_size": 8, "ve_n_bins": 8},
            "decoder": {"kind": "fastspeech2", "n_layers": 1, "n_head": 2,
                        "conv_filter_size": 64},
            "resnet": {"layers": [1, 1, 1, 1], "num_filters": [8, 8, 8, 8]},
        },
    })


def _example_batch(B=8, L=12, T=48, n_mels=20):
    rng = np.random.default_rng(0)
    dur = rng.integers(2, 4, size=(B, L)).astype(np.int32)
    mel_len = np.minimum(dur.sum(1), T)
    return {
        "phoneme": rng.integers(0, 28, (B, L)).astype(np.int32),
        "puncts": rng.integers(0, 10, (B, L)).astype(np.int32),
        "phoneme_mask": np.zeros((B, L), bool),
        "pitch": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "energy": rng.uniform(0, 1, (B, L)).astype(np.float32),
        "duration": dur,
        "mel_mask": np.arange(T)[None, :] >= mel_len[:, None],
        "ref_mel": rng.normal(size=(B, 32, n_mels)).astype(np.float32),
        "mel": rng.normal(size=(B, T, n_mels)).astype(np.float32),
    }


class TestMesh:
    def test_make_mesh_shapes(self):
        mesh = make_mesh(MeshConfig(data=4, model=2), devices=jax.devices()[:8])
        assert mesh.shape == {"data": 4, "model": 2}

    def test_mesh_mismatch_raises(self):
        with pytest.raises(ValueError):
            make_mesh(MeshConfig(data=3, model=2), devices=jax.devices()[:8])

    def test_shard_batch_places_on_data_axis(self):
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        batch = shard_batch(_example_batch(), mesh)
        sh = batch["mel"].sharding
        assert sh.spec == P("data")
        assert len(batch["mel"].devices()) == 8

    def test_replicate(self):
        mesh = make_mesh(MeshConfig(data=8), devices=jax.devices()[:8])
        tree = replicate({"w": jnp.ones((4, 4))}, mesh)
        assert tree["w"].sharding.spec == P()


class TestTensorParallel:
    def test_param_rules_and_forward(self):
        """4x2 data x model mesh: wide matmul kernels shard over `model`,
        and the training forward compiles and runs under those shardings."""
        mesh = make_mesh(MeshConfig(data=4, model=2), devices=jax.devices()[:8])
        cfg = tiny_cfg()
        model = ZeroVox(cfg)
        batch = _example_batch()

        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            variables = model.init({"params": jax.random.PRNGKey(0)}, batch, train=False)

        rules = param_sharding_rules(variables["params"], mesh)
        # at least one FFN kernel is sharded over the model axis
        flat = jax.tree_util.tree_flatten_with_path(rules)[0]
        sharded = ["/".join(str(getattr(k, "key", k)) for k in path)
                   for path, s in flat if s.spec != P()]
        assert any("w_1" in n for n in sharded), sharded

        # place params per rules
        params = jax.tree.map(jax.device_put, variables["params"], rules)
        stats = replicate(variables["batch_stats"], mesh)
        dbatch = shard_batch(batch, mesh)

        @jax.jit
        def fwd(p, s, b):
            out, _ = model.apply({"params": p, "batch_stats": s}, b, train=True,
                                 rngs={"dropout": jax.random.PRNGKey(0)},
                                 mutable=["batch_stats"])
            from zerovox_tpu.models.zerovox import zerovox_loss

            return zerovox_loss(out, b)["loss"]

        loss = fwd(params, stats, dbatch)
        assert np.isfinite(float(loss))


class TestTensorParallelTrainer:
    def test_trainer_tp_step_and_moment_sharding(self, tmp_path):
        """Trainer on a 4x2 data x model mesh: params AND Adam moments of the
        wide matmul kernels shard over `model`, and one full jitted train
        step (fwd + bwd + update) executes with finite loss."""
        from zerovox_tpu.training.trainer import Trainer, TrainerConfig, device_batch

        mesh = make_mesh(MeshConfig(data=4, model=2), devices=jax.devices()[:8])
        cfg = tiny_cfg()
        batch = _example_batch()
        tcfg = TrainerConfig(max_epochs=1, batch_size=8, out_folder=str(tmp_path))
        trainer = Trainer(cfg, tcfg, steps_per_epoch=1, mesh=mesh)
        state = trainer.init_state(device_batch(batch))

        def specs_with_model_axis(tree):
            leaves = jax.tree_util.tree_flatten_with_path(tree)[0]
            return ["/".join(str(getattr(k, "key", k)) for k in path)
                    for path, x in leaves
                    if hasattr(x, "sharding")
                    and getattr(x.sharding, "spec", P()) != P()
                    and "model" in str(x.sharding.spec)]

        assert any("w_1" in n for n in specs_with_model_axis(state.params))
        # Adam mu/nu inherit the param placement (created from placed params)
        assert any("w_1" in n for n in specs_with_model_axis(state.opt_state))

        state, losses = trainer._train_step(state, shard_batch(device_batch(batch), mesh),
                                            jax.random.PRNGKey(0))
        assert np.isfinite(float(losses["loss"]))
        # updated params keep their tensor-parallel sharding
        assert any("w_1" in n for n in specs_with_model_axis(state.params))
