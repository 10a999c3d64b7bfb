"""`zerovox-serve`: production HTTP TTS server with dynamic micro-batching.

New capability beyond the reference (whose only entry point is the
interactive demo, zerovox/demo.py): concurrent requests are grouped into
single `tts_batch` TPU programs (zerovox_tpu/serving/), voices are
precomputed speaker embeddings addressed by name, and the bucket programs
are precompiled at startup so the first request is already warm.

    zerovox-serve --model <dir> --meldec-model <dir> --port 8000
    curl -X POST localhost:8000/tts \
         -d '{"text": "Hello there.", "voice": "en_sarah"}' -o out.wav
    # streaming (chunked-transfer WAV, first audio after one vocoder window):
    curl -N -X POST localhost:8000/tts \
         -d '{"text": "...", "voice": "en_sarah", "stream": true}' -o out.wav
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from zerovox_tpu.hub import DEFAULT_MELDEC_MODEL_NAME


def get_args(argv=None):
    p = argparse.ArgumentParser(
        prog="zerovox-serve", description="HTTP TTS server (dynamic batching)")
    p.add_argument("--model", help="TTS model: path to model dir or hub name")
    p.add_argument("--random-model", action="store_true",
                   help="randomly initialized model (offline smoke test)")
    p.add_argument("--meldec-model", default=DEFAULT_MELDEC_MODEL_NAME,
                   help=f"vocoder model, default: {DEFAULT_MELDEC_MODEL_NAME}")
    p.add_argument("--infer-device", default="tpu", choices=["tpu", "cpu"])
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--voice", action="append", default=[], metavar="NAME=WAV",
                   help="register a voice from a reference wav (repeatable); "
                        "bare bundled names (see zerovox-demo --refaudio) "
                        "also work. Default: all bundled reference voices")
    p.add_argument("--max-batch", type=int, default=8,
                   help="micro-batch ceiling = largest precompiled tts_batch "
                        "program")
    p.add_argument("--max-delay-ms", type=float, default=20.0,
                   help="how long the first request of a window waits for "
                        "co-riders")
    p.add_argument("--no-warmup", action="store_true",
                   help="skip startup precompilation (first requests compile)")
    p.add_argument("--verbose", action="store_true")
    return p.parse_args(argv)


def build_voices(synth, voice_args, verbose=False):
    from zerovox_tpu.serving import VoiceRegistry
    from zerovox_tpu.synthesize import ZeroVoxTTS

    sr = synth.cfg.audio.sampling_rate
    reg = VoiceRegistry()
    specs = voice_args or ZeroVoxTTS.available_speakerrefs()
    for spec in specs:
        if "=" in spec:
            name, path = spec.split("=", 1)
        else:
            name, path = os.path.splitext(os.path.basename(spec))[0], spec
        wav = ZeroVoxTTS.get_speakerref(path, sr)
        if verbose:
            print(f"voice {name!r}: {len(wav) / sr:.1f}s reference")
        reg.add_from_wav(name, synth, wav)
    return reg


def main(argv=None):
    args = get_args(argv)

    if args.infer_device == "cpu":
        import jax

        jax.config.update("jax_platforms", "cpu")

    from zerovox_tpu.serving import make_server
    from zerovox_tpu.synthesize import ZeroVoxTTS
    from zerovox_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    if args.random_model:
        synth = ZeroVoxTTS.from_random(verbose=args.verbose)
    else:
        if not args.model:
            raise SystemExit("--model is required (or use --random-model)")
        _, synth = ZeroVoxTTS.load_model(
            args.model, meldec_model=args.meldec_model, verbose=args.verbose)

    voices = build_voices(synth, args.voice, verbose=args.verbose)
    print(f"{len(voices.names())} voices: {', '.join(voices.names())}")

    if not args.no_warmup:
        # precompile batch programs for every size the batcher can emit, so
        # production requests never hit a compile (warmup also absorbs the
        # first-transfer cost on tunneled backends)
        sizes = sorted({1, args.max_batch, max(1, args.max_batch // 2)})
        print(f"warming up tts_batch programs for batch sizes {sizes}...")
        synth.warmup(spkemb=voices.get(None), batch_sizes=tuple(sizes))
        # also compile the streaming chunk programs at the default window
        for _ in synth.tts_stream("This is a warmup utterance.",
                                  voices.get(None)):
            pass

    srv = make_server(synth, voices, host=args.host, port=args.port,
                      max_batch=args.max_batch,
                      max_delay_ms=args.max_delay_ms,
                      quiet=not args.verbose)
    host, port = srv.server_address[:2]
    print(f"serving on http://{host}:{port}  "
          f"(POST /tts, GET /health, GET /voices)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        print("shutting down...")
        srv.shutdown_serving()


if __name__ == "__main__":
    main()
