"""Worker process for tests/test_multihost.py: one of N processes serving
a DP fleet over a global mesh on CPU (gloo collectives).

Usage: python multihost_worker.py <pid> <nprocs> <port> <outfile>

Each process owns batch/nprocs stream rows; audio for GLOBAL stream g is
deterministic from seed 100+g, so the pytest parent can reproduce the same
streams on a plain single-process manager and assert token equality.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 4
SECONDS = 2.0


def stream_audio(gsid: int):
    import numpy as np
    rng = np.random.RandomState(100 + gsid)
    n = int(16000 * SECONDS)
    return ((rng.rand(n) - 0.5) * 0.2).astype(np.float32)


def main():
    pid, nprocs, port, outfile = (int(sys.argv[1]), int(sys.argv[2]),
                                  int(sys.argv[3]), sys.argv[4])
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
                      mesh=mesh) as mgr:
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
