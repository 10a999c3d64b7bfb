"""Checkpoint surgery: add/remove vocoder weights in an acoustic checkpoint
so a single self-contained inference artifact can be shipped (surface parity
with reference utils/edit_meldec_in_checkpoint.py:48-94).

Works on native .msgpack checkpoints (embedding the converted HiFi-GAN params
under a "meldec" key) and on torch .ckpt files (embedding the raw torch
state dict under "_meldec.*" keys exactly like the reference, so edited torch
checkpoints stay loadable by the reference implementation too).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="checkpoint to add/remove/replace meldec in")
    parser.add_argument("--meldec", type=str, default=None,
                        help="meldec model dir or hub name; omit to remove the meldec")
    args = parser.parse_args(argv)

    if args.checkpoint.endswith(".msgpack"):
        _edit_native(args.checkpoint, args.meldec)
    else:
        _edit_torch(args.checkpoint, args.meldec)
    print(f"{args.checkpoint} written.")


def _load_meldec_state_dict(meldec_spec):
    from zerovox_tpu import hub
    from zerovox_tpu.checkpoint import load_torch_checkpoint
    from zerovox_tpu.models.hifigan import HifiGanConfig

    if os.path.isdir(str(meldec_spec)):
        gen_path = os.path.join(meldec_spec, "generator.ckpt")
        cfg_path = os.path.join(meldec_spec, "config.json")
    else:
        gen_path = hub.download_model_file(model=str(meldec_spec), relpath="generator.ckpt")
        cfg_path = hub.download_model_file(model=str(meldec_spec), relpath="config.json")

    cfg = HifiGanConfig()
    if os.path.exists(cfg_path):
        import json

        with open(cfg_path) as f:
            cfg = HifiGanConfig.from_dict(json.load(f))
    return load_torch_checkpoint(gen_path), cfg


def _edit_native(path, meldec_spec):
    from zerovox_tpu.checkpoint import _SD, convert_hifigan_generator
    from zerovox_tpu.training.checkpointing import (
        load_native_checkpoint,
        save_native_checkpoint,
    )

    print(f"loading {path} ...")
    variables = load_native_checkpoint(path)
    if meldec_spec:
        sd, cfg = _load_meldec_state_dict(meldec_spec)
        print("adding meldec params")
        variables["meldec"] = {"generator": convert_hifigan_generator(_SD(sd), cfg)}
    else:
        if variables.pop("meldec", None) is not None:
            print("removing meldec params")
    save_native_checkpoint(path, variables)


def _edit_torch(path, meldec_spec):
    import torch

    print(f"loading {path} ...")
    checkpoint = torch.load(path, map_location="cpu", weights_only=False)
    state_dict = checkpoint["state_dict"]

    if meldec_spec:
        sd, _ = _load_meldec_state_dict(meldec_spec)
        for key, val in sd.items():
            mkey = "_meldec." + key
            print(f"adding meldec key {mkey}")
            state_dict[mkey] = torch.as_tensor(val)
    else:
        for key in list(state_dict):
            if key.startswith("_meldec."):
                print(f"removing {key}")
                del state_dict[key]

    torch.save(checkpoint, path)


if __name__ == "__main__":
    main()
