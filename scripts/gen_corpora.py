#!/usr/bin/env python3
"""Generate per-speaker corpus yamls from a template.

Parity with the reference's shell template generators
(configs/corpora/de_hui/gen_hui.sh, de_cv/gen_cv.sh — sed loops over speaker
lists producing one corpus yaml per speaker). Usage:

    python scripts/gen_corpora.py --template template.yaml \
        --speakers speakers.txt --out-dir configs/corpora/de_hui

The template may use {speaker} placeholders in any string value, e.g.:

    dataset: "LJSpeech"
    language: "de"
    speaker: "{speaker}"
    path:
      corpus_path: "/data/hui/{speaker}"
      preprocessed_path: "hui_{speaker}"
"""

import argparse
import os

import yaml


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--template", required=True, help="corpus yaml template with {speaker} placeholders")
    p.add_argument("--speakers", required=True, help="file with one speaker name per line")
    p.add_argument("--out-dir", required=True)
    args = p.parse_args()

    with open(args.template) as f:
        template = f.read()
    with open(args.speakers) as f:
        speakers = [s.strip() for s in f if s.strip() and not s.startswith("#")]

    os.makedirs(args.out_dir, exist_ok=True)
    for speaker in speakers:
        text = template.replace("{speaker}", speaker)
        yaml.safe_load(text)  # validate
        out = os.path.join(args.out_dir, f"{speaker}.yaml")
        with open(out, "w") as f:
            f.write(text)
    print(f"wrote {len(speakers)} corpus configs to {args.out_dir}")


if __name__ == "__main__":
    main()
