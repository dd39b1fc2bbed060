#!/usr/bin/env python3
"""Multi-clip transcription benchmark — port of the reference's benchmark.py
protocol (benchmark.py:1-224): run a suite of clips N times through the
streaming engine, collect per-clip engine stats, report overall_rtf,
weighted_step_ms, and the short/long split. RTF = processing / audio time
(lower is better; the reference's exit bar is <= 0.40, SPEED.md:284-287).

Default suite: the reference's bundled mini-suite clips
(/root/reference/samples + samples/benchmark/night1968) or any WAV paths
given on the command line (non-WAV formats are decoded through ffmpeg
when it is installed, as the reference does for its OGG samples).
Without a real model dir, --random-init measures throughput with
synthetic weights (tokens are meaningless but timing is weight-value
independent).

Usage:
  python tools/benchmark.py -d MODEL_DIR [-n REPEATS] [clips...]
  python tools/benchmark.py --random-init 0 [-n 1] [clips...]
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SHORT_S = 30.0            # short/long split like the reference suite


def default_suite():
    cands = []
    for pat in ("/root/reference/samples/benchmark/**/*.wav",
                "/root/reference/samples/*.wav"):
        cands += sorted(glob.glob(pat, recursive=True))
    return cands[:5]


def run_clip(params, cfg, tokenizer, path, interval, sc_kwargs):
    from voxtral_tpu.audio import load_audio
    from voxtral_tpu.runtime import StreamConfig, VoxStream

    audio = load_audio(path, cfg.audio.sample_rate)
    s = VoxStream(params, cfg, tokenizer=tokenizer,
                  stream_cfg=StreamConfig(interval=interval, **sc_kwargs))
    sr = cfg.audio.sample_rate
    t0 = time.perf_counter()
    for i in range(0, len(audio), sr):
        s.feed(audio[i:i + sr])
        s.get()
    s.finish()
    text = "".join(s.get())
    wall = time.perf_counter() - t0
    st = s.stats()
    return {
        "clip": os.path.basename(path),
        "audio_s": len(audio) / sr,
        "wall_s": wall,
        "rtf": wall / max(len(audio) / sr, 1e-9),
        "steps": st["generated"],
        "step_ms": st["decoder_ms"] / max(st["generated"], 1),
        # fused backend (default on TPU): the step time INCLUDES the
        # encoder/mel phases (one program covers mel->decode), unlike the
        # reference's decoder-only stats contract (voxtral.c:1358-1370) —
        # the report labels which meaning step_ms carries
        "step_includes_encoder": bool(st.get("step_ms_includes_encoder")),
        "text": text.strip(),
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("-d", "--model-dir", default=None)
    ap.add_argument("--random-init", type=int, default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("-n", "--repeats", type=int, default=1)
    ap.add_argument("-I", "--interval", type=float, default=2.0)
    ap.add_argument("--json", action="store_true")
    ap.add_argument("clips", nargs="*")
    args = ap.parse_args(argv)

    clips = args.clips or default_suite()
    if not clips:
        print("no clips found", file=sys.stderr)
        return 2

    from voxtral_tpu import cli as vcli
    cargs = argparse.Namespace(
        model_dir=args.model_dir, random_init=args.random_init,
        tiny=args.tiny, parity=False, verbosity=1)
    params, cfg, tokenizer = vcli.build(cargs)

    # untimed warmup: the streaming engine JIT-compiles one program per
    # shape bucket on first use — the reference's C binary has no such
    # cost, so a timed cold run would compare compiles against its RTF
    print("warmup (compiling shape buckets)...", file=sys.stderr)
    run_clip(params, cfg, tokenizer, clips[0], args.interval, {})

    results = []
    for rep in range(args.repeats):
        for clip in clips:
            r = run_clip(params, cfg, tokenizer, clip, args.interval, {})
            results.append(r)
            print(f"  {r['clip']:40s} {r['audio_s']:6.1f}s  rtf {r['rtf']:.4f}"
                  f"  {r['step_ms']:.1f} ms/step", file=sys.stderr)

    tot_audio = sum(r["audio_s"] for r in results)
    tot_wall = sum(r["wall_s"] for r in results)
    tot_steps = sum(r["steps"] for r in results)
    w_step = sum(r["step_ms"] * r["steps"] for r in results) / max(tot_steps, 1)
    short = [r for r in results if r["audio_s"] <= SHORT_S]
    long_ = [r for r in results if r["audio_s"] > SHORT_S]

    def avg_step(rs):
        n = sum(r["steps"] for r in rs)
        return sum(r["step_ms"] * r["steps"] for r in rs) / max(n, 1)

    report = {
        "overall_rtf": round(tot_wall / max(tot_audio, 1e-9), 4),
        "weighted_step_ms": round(w_step, 2),
        "step_ms_kind": ("full_step_incl_encoder"
                         if any(r["step_includes_encoder"] for r in results)
                         else "decoder_only"),
        "short_step_ms": round(avg_step(short), 2) if short else None,
        "long_step_ms": round(avg_step(long_), 2) if long_ else None,
        "clips": len(results), "audio_s": round(tot_audio, 1),
    }
    print(json.dumps(report))
    return 0


if __name__ == "__main__":
    sys.exit(main())
