"""Worker process for tests/test_multihost.py: one of N processes serving
a DP fleet over a global mesh on CPU (gloo collectives).

Usage: python multihost_worker.py <pid> <nprocs> <port> <outfile> [mode]

Each process owns batch/nprocs stream rows; audio for GLOBAL stream g is
deterministic from seed 100+g, so the pytest parent can reproduce the same
streams on a plain single-process manager and assert token equality.

mode "churn" (asymmetric lifecycle agreement): host 0 runs a full slot
churn — finish global row 0, drain, detach, attach a NEW stream into the
reused slot (seed 100+REBORN_SEED) — while every other row keeps feeding
2 more seconds of live audio. Polls stay in lockstep across processes
(loop exits agree via any_across_hosts), so this pins the deferred-reset
agreement + forced-replay projection when only ONE host churns.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4
SECONDS = 2.0
REBORN_SEED = 9          # global "stream id" of the churned-in replacement
EXTRA_SECONDS = 2.0      # live audio rows 1-3 keep feeding during the churn


def stream_audio(gsid: int, seconds: float = SECONDS):
    import numpy as np
    rng = np.random.RandomState(100 + gsid)
    n = int(16000 * seconds)
    return ((rng.rand(n) - 0.5) * 0.2).astype(np.float32)


def churn_flow(mgr, np, any_across_hosts):
    """Asymmetric lifecycle: host 0 churns global row 0 while every other
    row keeps feeding live audio; every process polls in lockstep."""
    sids = [mgr.attach() for _ in range(mgr.local_batch)]
    extra = {}          # sid -> live audio still to feed, 0.5 s per poll
    for sid in sids:
        g = mgr.row_lo + sid
        mgr.feed(sid, stream_audio(g))
        if g == 0:
            mgr.finish(sid)
        else:
            extra[sid] = stream_audio(1000 + g, EXTRA_SECONDS)

    def feed_tick():
        for sid in list(extra):
            a, extra[sid] = extra[sid][:8000], extra[sid][8000:]
            mgr.feed(sid, a)
            if not len(extra[sid]):
                mgr.finish(sid)
                del extra[sid]

    # phase 1: drain until global row 0 is finished (agreed across hosts)
    while True:
        feed_tick()
        mgr.poll()
        p0 = bool(mgr.row_lo == 0 and not mgr.is_finished(0))
        if not any_across_hosts(np.array([p0]))[0]:
            break
    out = {}
    reborn = None
    if mgr.row_lo == 0:
        out["0"] = list(mgr.slots[0].all_ids)     # capture before detach
        mgr.detach(0)
        reborn = mgr.attach()
        assert reborn == 0, reborn                # the freed slot is reused
        mgr.feed(reborn, stream_audio(REBORN_SEED))
        mgr.finish(reborn)
    # phase 2: the reborn stream rides in while the rest of the fleet
    # drains; exit once every live local stream everywhere is finished
    while True:
        feed_tick()
        mgr.poll()
        pending = bool(extra) or not all(
            mgr.is_finished(s) for s in range(mgr.local_batch)
            if mgr.slots[s].active)
        if not any_across_hosts(np.array([pending]))[0]:
            break
    for sid in range(mgr.local_batch):
        g = mgr.row_lo + sid
        key = str(REBORN_SEED) if (g == 0 and reborn is not None) else str(g)
        out[key] = list(mgr.slots[sid].all_ids)
    return out


def main():
    pid, nprocs, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
    mode = sys.argv[5] if len(sys.argv) > 5 else "basic"
    pipeline = int(sys.argv[6]) if len(sys.argv) > 6 else 1
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2")
    import jax  # noqa: E402  (after XLA_FLAGS)
    from voxtral_tpu.parallel.distributed import (
        any_across_hosts, global_mesh, init_distributed)
    init_distributed(f"localhost:{port}", nprocs, pid, platform="cpu")

    import numpy as np

    from voxtral_tpu.config import tiny_config
    from voxtral_tpu.runtime.manager import FleetManager
    from voxtral_tpu.weights import random_params

    cfg = tiny_config()
    params = random_params(cfg, seed=0)
    mesh = global_mesh(n_data=jax.device_count(), n_model=1)

    with FleetManager(params, cfg, batch=BATCH, chunk_tokens=8,
                      dec_ring=256, continuous=True, kv_dtype="int8",
                      mesh=mesh, pipeline_steps=pipeline) as mgr:
        if mode == "churn":
            out = churn_flow(mgr, np, any_across_hosts)
        else:
            sids = [mgr.attach() for _ in range(mgr.local_batch)]
            for sid in sids:
                mgr.feed(sid, stream_audio(mgr.row_lo + sid))
                mgr.finish(sid)
            while True:
                mgr.poll()
                pending = not all(mgr.is_finished(s) for s in sids)
                if not any_across_hosts(np.array([pending]))[0]:
                    break
            out = {str(mgr.row_lo + sid): mgr.slots[sid].all_ids
                   for sid in sids}
    with open(outfile, "w") as f:
        json.dump({"process": pid, "row_lo": mgr.row_lo,
                   "row_hi": mgr.row_hi, "streams": out}, f)


if __name__ == "__main__":
    main()
