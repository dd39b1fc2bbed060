#!/usr/bin/env python3
"""Multi-host DP throughput harness (BASELINE.json configs: audio-s/s at
1 chip / 1 host / >=2 hosts, >=85% DP scaling efficiency).

Run ONE copy per host/process:

  python tools/bench_multihost.py --coordinator HOST0:9911 \
      --num-processes 2 --process-id N [--streams-per-host 16] [--cpu]

Every process drives the same global FleetManager in lockstep (the
multi-host contract, runtime/manager.py); process 0 prints the one-line
JSON with aggregate audio-s/s and the per-host scaling-efficiency figure
relative to a supplied --single-host-baseline (audio-s/s measured by
bench.py on one host).

Without TPU pod hardware this runs on CPU (--cpu, gloo collectives) to
validate the code path; the CPU numbers are NOT performance claims — the
real measurement slot is documented in SPEED.md's multi-chip roadmap
entry."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", required=True)
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("--streams-per-host", type=int, default=16)
    ap.add_argument("--chunk-tokens", type=int, default=20)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--kv", default="int8", choices=["int8", "float"])
    ap.add_argument("--q8", action="store_true", default=True)
    ap.add_argument("--no-q8", dest="q8", action="store_false")
    ap.add_argument("--cpu", action="store_true",
                    help="CPU backend + gloo (code-path validation only)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny_config instead of 4B (CPU validation)")
    ap.add_argument("--single-host-baseline", type=float, default=None,
                    help="audio-s/s of the 1-host config, for the "
                         "scaling-efficiency figure")
    args = ap.parse_args()

    from voxtral_tpu.parallel.distributed import (
        global_mesh, init_distributed)
    init_distributed(args.coordinator, args.num_processes, args.process_id,
                     platform="cpu" if args.cpu else None)
    import jax
    import numpy as np

    from voxtral_tpu.config import tiny_config, voxtral_4b
    from voxtral_tpu.runtime.manager import FleetManager

    if args.tiny:
        cfg = tiny_config()
        from voxtral_tpu.weights import random_params
        params = random_params(cfg, seed=0)
    else:
        import jax.numpy as jnp

        from voxtral_tpu.weights import random_params_device
        cfg = voxtral_4b(param_dtype=jnp.bfloat16, compute_dtype=jnp.bfloat16)
        params = random_params_device(cfg, seed=0)
        if args.q8:
            from voxtral_tpu.quant import quantize_params
            params = quantize_params(params)

    batch = args.streams_per_host * args.num_processes
    mesh = global_mesh(n_data=jax.device_count(), n_model=1)
    log(f"[p{args.process_id}] mesh data={jax.device_count()} "
        f"global batch={batch} ({args.streams_per_host}/host)")

    dec_ring = 2048 if not args.tiny else 256
    with FleetManager(params, cfg, batch=batch,
                      chunk_tokens=args.chunk_tokens, dec_ring=dec_ring,
                      kv_dtype=args.kv, continuous=True, mesh=mesh) as mgr:
        sids = [mgr.attach() for _ in range(mgr.local_batch)]
        chunk = mgr.chunk_samp
        rng = np.random.RandomState(10 + args.process_id)

        def feed_all():
            for sid in sids:
                mgr.feed(sid, ((rng.rand(chunk) - 0.5) * 0.2)
                         .astype(np.float32))

        t0 = time.perf_counter()
        for _ in range(args.warmup + 2):   # covers prompt replay + compile
            feed_all()
            mgr.poll()
        log(f"[p{args.process_id}] warmup+compile: "
            f"{time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        for _ in range(args.iters):
            feed_all()
            mgr.poll()
        dt = time.perf_counter() - t0
    audio_s = batch * args.chunk_tokens * 0.08 * args.iters
    rate = audio_s / dt
    log(f"[p{args.process_id}] {rate:.1f} audio-s/s aggregate "
        f"({rate / args.num_processes:.1f}/host)")
    if args.process_id == 0:
        extra = {"hosts": args.num_processes,
                 "chips": jax.device_count(),
                 "streams": batch,
                 "per_host_audio_s_per_s": round(rate / args.num_processes, 2),
                 "backend": "cpu" if args.cpu else "tpu"}
        if args.single_host_baseline:
            extra["scaling_efficiency"] = round(
                rate / args.num_processes / args.single_host_baseline, 3)
        print(json.dumps({
            "metric": f"audio_seconds_per_second_{args.num_processes}hosts",
            "value": round(rate, 2), "unit": "audio_s/s", "extra": extra}))


if __name__ == "__main__":
    main()
