"""Native checkpoint save/restore.

Per-epoch checkpoints with metadata (epoch, loss, step), mirroring the
reference's Lightning per-epoch .ckpt discipline (utils/train_tts.py:280-291)
but as self-contained msgpack files (flax.serialization) that need no torch.
The msgpack path is the portable inference artifact
(`checkpoints/NNNN.msgpack`, discovered by ZeroVoxTTS.load_model alongside
torch .ckpt files). save_orbax/restore_orbax checkpoint the FULL TrainState
(params + optimizer state, sharding-aware) for multi-host or resumable
training; Trainer uses them when TrainerConfig.checkpoint_format="orbax".
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
from flax import serialization


def save_native_checkpoint(path, variables: dict, meta: dict | None = None) -> None:
    host_vars = jax.tree.map(np.asarray, variables)
    blob = serialization.msgpack_serialize(host_vars)
    tmp = str(path) + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    if meta is not None:
        with open(str(path) + ".json", "w") as f:
            json.dump(meta, f)


def load_native_checkpoint(path) -> dict:
    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())


def load_checkpoint_meta(path) -> dict | None:
    meta_path = str(path) + ".json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return json.load(f)
    return None


# ------------------------------------------------------------------- orbax


def save_orbax(ckpt_dir, state: Any, step: int, keep: int = 0) -> None:
    """Sharded (multi-host-safe) checkpoint of a full TrainState.

    keep > 0 prunes to the newest `keep` steps (TrainerConfig.keep_checkpoints
    semantics for the orbax format; 0 keeps all, the reference's
    save_top_k=max_epochs discipline)."""
    import orbax.checkpoint as ocp

    options = ocp.CheckpointManagerOptions(max_to_keep=keep if keep > 0 else None)
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir), options=options) as mngr:
        mngr.save(step, args=ocp.args.StandardSave(state))
        mngr.wait_until_finished()


def restore_orbax(ckpt_dir, abstract_state: Any, step: int | None = None) -> Any:
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        step = step if step is not None else mngr.latest_step()
        return mngr.restore(step, args=ocp.args.StandardRestore(abstract_state))


def latest_orbax_step(ckpt_dir) -> int | None:
    """Newest saved step label (= epoch in the Trainer's convention), or
    None when the directory holds no checkpoints."""
    import orbax.checkpoint as ocp

    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(os.path.abspath(ckpt_dir)) as mngr:
        return mngr.latest_step()
