"""Device mesh + sharding: the framework's "communication backend".

The reference has no distributed code of its own — it delegates data-parallel
training to Lightning's DDP (`--devices N`, reference utils/train_tts.py:47,
298-300) over NCCL. The TPU-native equivalent (SURVEY.md §2.3, §5) is a thin
layer over `jax.sharding`: pick a mesh, annotate shardings, and let XLA insert
the collectives over ICI (within a slice) / DCN (across slices via
`jax.distributed.initialize`).

Axes:
  * ``data``  — batch sharding; the default (and for a ~40 M-param acoustic
    model, usually the only profitable) training strategy.
  * ``model`` — optional tensor-parallel axis for the FFN/attention matmuls;
    exposed because params are pytrees and annotating them is cheap, even
    though this model rarely needs it (SURVEY.md §2.3).

Multi-host: call ``initialize_distributed()`` before ``make_mesh`` on each
host; ``jax.devices()`` then spans the full slice and the same code runs DP
over ICI/DCN unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshConfig:
    data: int = -1  # -1: all remaining devices
    model: int = 1


def initialize_distributed(strict: bool = True, **kwargs) -> None:
    """Multi-host init: after this, jax.devices() spans every process's
    devices and the same mesh/sharding code runs DP over ICI/DCN unchanged.

    kwargs pass through to jax.distributed.initialize (coordinator_address,
    num_processes, process_id, local_device_ids, ...); on TPU pods they are
    auto-detected from the environment. strict=False tolerates an
    already-initialized runtime (idempotent re-init); real failures always
    raise — silently continuing single-host after a failed multi-host init
    corrupts training (each host would train on its own copy)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if strict or "already initialized" not in str(e).lower():
            raise


def process_local_batch_to_global(batch: dict, mesh: Mesh) -> dict:
    """Multi-process batch placement: each process contributes its local
    batch rows; the returned arrays are global jax.Arrays sharded over the
    mesh's `data` axis (the multi-host analogue of shard_batch)."""
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.make_array_from_process_local_data(sharding, np.asarray(x))
        return x

    return jax.tree.map(put, batch)


def make_mesh(cfg: MeshConfig | None = None, devices=None) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    model = max(1, cfg.model)
    data = cfg.data if cfg.data > 0 else n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} does not cover {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_spec() -> P:
    """Batch dict entries shard their leading (batch) axis over `data`."""
    return P("data")


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh, batch axis sharded over `data`.
    In a multi-process runtime the batch is treated as this process's local
    shard (see process_local_batch_to_global)."""
    if jax.process_count() > 1:
        return process_local_batch_to_global(batch, mesh)
    sharding = NamedSharding(mesh, P("data"))

    def put(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return jax.device_put(x, sharding)
        return x

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def param_sharding_rules(params, mesh: Mesh):
    """NamedShardings for the param tree. Data-parallel training replicates
    params; when the mesh has a nontrivial `model` axis, the widest matmul
    kernels (FFN conv filters, attention projections) shard their output
    features over it (simple 1D tensor parallelism)."""
    tp = mesh.shape["model"] > 1

    def rule(path, x):
        if not tp or x.ndim < 2:
            return NamedSharding(mesh, P())
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        # shard FFN hidden and attention head projections on their wide axis
        if any(k in name for k in ("w_1", "w_qs", "w_ks", "w_vs")) and x.shape[-1] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        if any(k in name for k in ("w_2", "fc")) and x.ndim >= 2 and x.shape[-2] % mesh.shape["model"] == 0:
            return NamedSharding(mesh, P(*([None] * (x.ndim - 2) + ["model", None])))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)
