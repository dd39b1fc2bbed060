"""Command-line interface, mirroring the reference CLI (main.c:27-43):

  python -m voxtral_tpu.cli -d MODEL_DIR (-i file.wav | --stdin) [options]

  -d DIR        model dir with consolidated.safetensors + tekken.json
  -i FILE.wav   transcribe a WAV file (fed through the streaming engine in
                <=1 s chunks, like main.c:107-119)
  --stdin       stream raw PCM s16le 16 kHz mono from stdin (WAV header
                auto-detected and skipped, main.c:304-381)
  --batch       one-shot batch pipeline instead of the streaming engine
  -I SECONDS    processing interval (default 2.0)
  --delay MS    transcription delay 80..2400 ms (default 480)
  --alt CUTOFF  report up to 4 alternative tokens within CUTOFF
  --continuous  live mode: watchdog auto-restarts (implied by --stdin)
  --monitor     live pipeline symbols on stderr
  --debug / --silent   verbosity
  --parity      f32 compute (bit-parity mode) instead of bf16
  --backend fused|bucketed   streaming backend (fused = B=1 fleet,
                default on TPU)
  --kv int8     int8 KV rings for the fused backend; --enc-kv int4
                additionally nibble-packs the ENCODER rings — together
                the benchmark headline serving configuration (SPEED.md)
  --random-init SEED   synthetic random weights (no model dir needed);
                combine with --tiny for the miniature config

Transcription text goes to stdout (streamed); everything else to stderr.
"""

from __future__ import annotations

import argparse
import os
import struct
import sys
import time

import numpy as np


def log(args, level, msg):
    if args.verbosity >= level:
        print(msg, file=sys.stderr, flush=True)


def drain(stream, args, out=sys.stdout):
    """Print pending tokens; alt format `[best|alt1|alt2]` (main.c:49-105)."""
    if args.alt is not None:
        for piece, alts in stream.get_alt():
            if alts:
                out.write("[" + "|".join([piece] + alts) + "]")
            else:
                out.write(piece)
    else:
        for piece in stream.get():
            out.write(piece)
    out.flush()


def build(args):
    import jax.numpy as jnp
    from voxtral_tpu.config import tiny_config, voxtral_4b
    from voxtral_tpu.tokenizer import Tokenizer

    if args.parity:
        import jax
        jax.config.update("jax_default_matmul_precision", "highest")
        dtype = jnp.float32
    else:
        dtype = jnp.bfloat16

    if args.tiny:
        cfg = tiny_config()
        cfg = cfg.with_dtype(jnp.float32 if args.parity else dtype)
    else:
        cfg = voxtral_4b(param_dtype=dtype, compute_dtype=dtype)

    tokenizer = None
    if args.model_dir:
        tok_path = os.path.join(args.model_dir, "tekken.json")
        if os.path.exists(tok_path):
            t0 = time.time()
            tokenizer = Tokenizer(tok_path)
            log(args, 2, f"tokenizer loaded in {time.time()-t0:.1f}s "
                f"({tokenizer.vocab_size} tokens)")

    t0 = time.time()
    if args.random_init is not None:
        from voxtral_tpu.weights import random_params, random_params_device
        if args.tiny:
            params = random_params(cfg, seed=args.random_init)
        else:
            params = random_params_device(cfg, seed=args.random_init)
        log(args, 1, f"random params initialized in {time.time()-t0:.1f}s")
    else:
        from voxtral_tpu.weights import load_params
        path = os.path.join(args.model_dir, "consolidated.safetensors")
        params = load_params(path, cfg)
        log(args, 1, f"model loaded in {time.time()-t0:.1f}s")
    from voxtral_tpu.utils import device_memory_gb
    mem = device_memory_gb()
    if mem:
        # the reference prints its GPU memory gauge after load
        # (voxtral.c:281-283)
        log(args, 1, f"device memory: {mem.get('hbm_used_gb', '?')} / "
            f"{mem.get('hbm_limit_gb', '?')} GiB")
    return params, cfg, tokenizer


def run_file(args, params, cfg, tokenizer):
    from voxtral_tpu.audio import load_audio
    from voxtral_tpu.runtime import StreamConfig, VoxStream

    audio = load_audio(args.input, cfg.audio.sample_rate)
    log(args, 1, f"audio: {len(audio)/cfg.audio.sample_rate:.1f}s")

    if args.batch:
        from voxtral_tpu.models import transcribe_tokens_batch
        t0 = time.time()
        tokens, _ = transcribe_tokens_batch(params, cfg, audio,
                                            delay_tokens=args.delay // 80)
        dt = time.time() - t0
        text = tokenizer.decode(tokens).strip() if tokenizer else str(tokens)
        print(text)
        log(args, 1, f"batch: {len(tokens)} tokens in {dt:.2f}s "
            f"(RTF {dt/(len(audio)/16000):.3f})")
        return

    s = VoxStream(params, cfg, tokenizer=tokenizer, stream_cfg=StreamConfig(
        interval=args.interval, delay_tokens=args.delay // 80,
        continuous=args.continuous, monitor=args.monitor,
        n_alt=4 if args.alt is not None else 1,
        alt_cutoff=args.alt if args.alt is not None else 0.0,
        backend=args.backend, kv_dtype=args.kv,
        enc_kv_dtype=args.enc_kv))
    sr = cfg.audio.sample_rate
    t0 = time.time()
    for i in range(0, len(audio), sr):            # <=1 s chunks
        s.feed(audio[i:i + sr])
        drain(s, args)
    s.finish()
    drain(s, args)
    print(flush=True)
    st = s.stats()
    dt = time.time() - t0
    if st.get("step_ms_includes_encoder"):
        # fused backend: one program covers mel->decode, so encoder/
        # prefill phases are not separately timed (stats() reports None)
        log(args, 1, f"Encoder: {st['mel_frames']} mel -> "
            f"{st['generated']} steps (fused into the step)")
        log(args, 1, f"Decoder: {st['text_tokens']} text tokens "
            f"({st['generated']} steps) in {st['decoder_ms']:.0f} ms "
            f"({st['ms_per_step']:.1f} ms/step incl. encoder)")
    else:
        log(args, 1, f"Encoder: {st['mel_frames']} mel -> "
            f"{st['generated']} steps ({st['encoder_ms']:.0f} ms)")
        log(args, 1, f"Decoder: {st['text_tokens']} text tokens "
            f"({st['generated']} steps) in {st['decoder_ms']:.0f} ms "
            f"(prefill {st['prefill_ms']:.0f} ms "
            f"+ {st['ms_per_step']:.1f} ms/step)")
    log(args, 1, f"RTF: {dt / max(st['audio_s'], 1e-9):.3f}")


def run_stdin(args, params, cfg, tokenizer):
    from voxtral_tpu.runtime import StreamConfig, VoxStream

    s = VoxStream(params, cfg, tokenizer=tokenizer, stream_cfg=StreamConfig(
        interval=args.interval, delay_tokens=args.delay // 80,
        continuous=True, monitor=args.monitor,
        n_alt=4 if args.alt is not None else 1,
        alt_cutoff=args.alt if args.alt is not None else 0.0,
        backend=args.backend, kv_dtype=args.kv,
        enc_kv_dtype=args.enc_kv))

    stdin = sys.stdin.buffer
    first = stdin.read(4)
    if first == b"RIFF":
        # skip WAV header: read until "data" chunk id (main.c:304-340);
        # a header truncated mid-walk is a hard error (the audio bytes
        # never arrive), reported instead of a silent exit / struct.error
        stdin.read(8)
        while True:
            cid = stdin.read(4)
            sz = stdin.read(4)
            if len(cid) < 4 or len(sz) < 4:
                log(args, 1, "stdin: truncated WAV header, no data chunk")
                return
            (size,) = struct.unpack("<I", sz)
            if cid == b"data":
                break
            stdin.read(size + (size & 1))
        first = b""
    buf = first
    chunk_bytes = int(cfg.audio.sample_rate * 0.25) * 2   # 250 ms
    while True:
        data = stdin.read(chunk_bytes)
        if not data:
            break
        buf += data
        n = len(buf) // 2
        if n == 0:
            continue
        samples = np.frombuffer(buf[:n * 2], dtype="<i2").astype(np.float32) / 32768.0
        buf = buf[n * 2:]
        s.feed(samples)
        drain(s, args)
    s.finish()
    drain(s, args)
    print(flush=True)


def run_mic(args, params, cfg, tokenizer):
    from voxtral_tpu.audio.mic import mic_loop
    from voxtral_tpu.runtime import StreamConfig, VoxStream

    s = VoxStream(params, cfg, tokenizer=tokenizer, stream_cfg=StreamConfig(
        interval=args.interval, delay_tokens=args.delay // 80,
        continuous=True, monitor=args.monitor,
        n_alt=4 if args.alt is not None else 1,
        alt_cutoff=args.alt if args.alt is not None else 0.0,
        backend=args.backend, kv_dtype=args.kv,
        enc_kv_dtype=args.enc_kv))
    mic_loop(s, lambda st: drain(st, args), rate=cfg.audio.sample_rate,
             log=lambda m: log(args, 1, m))
    print(flush=True)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="voxtral_tpu")
    ap.add_argument("-d", "--model-dir", default=None)
    ap.add_argument("-i", "--input", default=None, help="WAV file")
    ap.add_argument("--stdin", action="store_true")
    ap.add_argument("--from-mic", action="store_true",
                    help="live microphone (arecord/ffmpeg backend)")
    ap.add_argument("--batch", action="store_true")
    ap.add_argument("-I", "--interval", type=float, default=2.0)
    ap.add_argument("--delay", type=int, default=480)
    ap.add_argument("--alt", type=float, default=None)
    ap.add_argument("--continuous", action="store_true")
    ap.add_argument("--monitor", action="store_true")
    ap.add_argument("--debug", action="store_true")
    ap.add_argument("--silent", action="store_true")
    ap.add_argument("--parity", action="store_true")
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--random-init", type=int, default=None, metavar="SEED")
    ap.add_argument("--profile", default=None, metavar="DIR",
                    help="write a jax.profiler trace of the run to DIR")
    ap.add_argument("--backend", default="auto",
                    choices=("auto", "fused", "bucketed"),
                    help="streaming engine backend: fused = B=1 fleet "
                         "(device mel, one program per chunk; default on "
                         "TPU), bucketed = general ragged-slice path")
    ap.add_argument("--kv", default="float", choices=("float", "int8"),
                    help="KV ring storage for the fused backend: float "
                         "keeps weight precision (default); int8 halves "
                         "ring HBM/traffic like the serving fleet - "
                         "measured 10.7x vs 3.7x real-time on a 12-min "
                         "stream at the full 8192 window (SPEED.md)")
    ap.add_argument("--enc-kv", default=None,
                    choices=("float", "int8", "int4"),
                    help="ENCODER KV ring storage override for the fused "
                         "backend (default: follow --kv). int4 nibble-"
                         "packs the encoder rings - with --kv int8 this "
                         "is the benchmark headline serving config "
                         "(SPEED.md round 4); encoder-only (the decoder's "
                         "per-token unpack measured slower)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the TPU site plugin "
                         "overrides JAX_PLATFORMS, so an env var is not "
                         "enough)")
    args = ap.parse_args(argv)
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    args.verbosity = 2 if args.debug else (0 if args.silent else 1)
    args.delay = max(80, min(2400, args.delay))
    if not args.input and not args.stdin and not args.from_mic:
        ap.error("need -i FILE, --stdin, or --from-mic")
    if not args.model_dir and args.random_init is None:
        ap.error("need -d MODEL_DIR or --random-init SEED")

    params, cfg, tokenizer = build(args)
    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)
    try:
        if args.from_mic:
            run_mic(args, params, cfg, tokenizer)
        elif args.stdin:
            run_stdin(args, params, cfg, tokenizer)
        else:
            run_file(args, params, cfg, tokenizer)
    except BrokenPipeError:
        # downstream closed stdout (e.g. | head) — exit quietly like any
        # well-behaved pipe citizen
        import os
        import sys
        try:
            sys.stdout.close()
        except Exception:
            pass
        os._exit(0)
    finally:
        if args.profile:
            import jax
            jax.profiler.stop_trace()
            log(args, 1, f"profiler trace written to {args.profile}")


if __name__ == "__main__":
    main()
