#!/usr/bin/env python3
"""End-to-end regression test — port of the reference's runtest.sh:1-106.

Transcribes a clip two ways — (1) whole-file streaming in 1 s chunks and
(2) fine-grained streaming (-I 0.1, hundreds of tiny encoder calls, which
exercises the KV ring folds exactly like the reference's cache-compaction
stress) — and asserts that expected key phrases appear in both outputs.
Substring (not exact) matching, for the same reason as runtest.sh:5-8:
near-tied tokens flip under accelerator FP differences.

Requires REAL model weights (-d). Exits 0 pass / 1 fail / 77 skipped.

Usage: python tools/runtest.py -d MODEL_DIR [-i FILE.wav] [--phrase P ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Default clip + phrases: the bundled JFK sample; phrases span the clip.
DEFAULT_CLIP = "/root/reference/samples/jfk.wav"
DEFAULT_PHRASES = [
    "fellow americans",
    "ask not what your country can do for you",
    "what you can do for your country",
]


def transcribe(params, cfg, tokenizer, audio, interval):
    from voxtral_tpu.runtime import StreamConfig, VoxStream
    s = VoxStream(params, cfg, tokenizer=tokenizer,
                  stream_cfg=StreamConfig(interval=interval))
    sr = cfg.audio.sample_rate
    step = sr if interval >= 1.0 else int(sr * interval)
    for i in range(0, len(audio), step):
        s.feed(audio[i:i + step])
    s.finish()
    return "".join(s.get()).strip()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--model-dir", required=False)
    ap.add_argument("-i", "--input", default=DEFAULT_CLIP)
    ap.add_argument("--phrase", action="append", default=None)
    args = ap.parse_args(argv)

    if not args.model_dir or not os.path.exists(
            os.path.join(args.model_dir, "consolidated.safetensors")):
        print("SKIP: real model weights required (-d MODEL_DIR)",
              file=sys.stderr)
        return 77
    phrases = args.phrase or DEFAULT_PHRASES

    import jax.numpy as jnp
    from voxtral_tpu.audio import load_audio
    from voxtral_tpu.config import voxtral_4b
    from voxtral_tpu.tokenizer import Tokenizer
    from voxtral_tpu.weights import load_params

    cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
    params = load_params(
        os.path.join(args.model_dir, "consolidated.safetensors"), cfg)
    tokenizer = Tokenizer(os.path.join(args.model_dir, "tekken.json"))
    audio = load_audio(args.input, cfg.audio.sample_rate)

    failures = 0
    for name, interval in (("batch-ish (1s chunks)", 2.0),
                           ("fine streaming (-I 0.1)", 0.1)):
        text = transcribe(params, cfg, tokenizer, audio, interval)
        print(f"--- {name} ---\n{text}\n", file=sys.stderr)
        low = text.lower()
        for p in phrases:
            ok = p.lower() in low
            print(f"  [{'PASS' if ok else 'FAIL'}] {p!r}", file=sys.stderr)
            failures += 0 if ok else 1
    print(f"{'PASSED' if failures == 0 else f'{failures} FAILURES'}")
    return 0 if failures == 0 else 1


if __name__ == "__main__":
    sys.exit(main())
