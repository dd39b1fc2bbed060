"""Multi-host DP integration: two OS processes (localhost coordinator, CPU
gloo collectives, 2 virtual devices each) serve one global 4-stream fleet
and must reproduce the single-process manager's tokens exactly.

This is the testable half of the BASELINE.json "streams DP across 2 hosts"
configuration: the code path (jax.distributed init, global mesh, host-local
row feeding, across-host control agreement) runs for real; only the DCN
hardware numbers need a real slice."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from voxtral_tpu.config import tiny_config
from voxtral_tpu.runtime.manager import FleetManager
from voxtral_tpu.weights import random_params

import multihost_worker as mw


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_dp_matches_single_process(tmp_path):
    # expected: plain single-process manager over the same 4 streams
    cfg = tiny_config()
    params = random_params(cfg, seed=0)
    with FleetManager(params, cfg, batch=mw.BATCH, chunk_tokens=8,
                      dec_ring=256, continuous=True,
                      kv_dtype="int8") as ref:
        sids = [ref.attach() for _ in range(mw.BATCH)]
        for g, sid in enumerate(sids):
            ref.feed(sid, mw.stream_audio(g))
            ref.finish(sid)
        while not all(ref.is_finished(s) for s in sids):
            ref.poll()
        want = {g: ref.slots[sid].all_ids for g, sid in enumerate(sids)}

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"out{p}.json") for p in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)     # worker forces cpu itself
    procs = [subprocess.Popen(
        [sys.executable, worker, str(p), "2", str(port), outs[p]],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(2)]
    logs = [p.communicate(timeout=840) for p in procs]
    for p, (so, se) in zip(procs, logs):
        assert p.returncode == 0, (
            f"worker {p.args} failed:\n{se.decode()[-3000:]}")

    got = {}
    rows = []
    for path in outs:
        with open(path) as f:
            d = json.load(f)
        rows.append((d["row_lo"], d["row_hi"]))
        for k, v in d["streams"].items():
            got[int(k)] = v
    # the two processes partitioned the batch disjointly and completely
    assert sorted(rows) == [(0, 2), (2, 4)]
    assert sorted(got) == list(range(mw.BATCH))
    for g in range(mw.BATCH):
        assert got[g] == want[g], f"stream {g}: multihost tokens diverge"


@pytest.mark.parametrize("pipeline", [1, 2])
def test_two_process_asymmetric_churn_matches_solo(tmp_path, pipeline):
    """Slot churn on ONE host of a 2-process DP fleet (finish -> detach ->
    attach a new stream into the reused slot) while the other host's rows
    keep feeding live audio: the deferred-reset agreement and forced-replay
    projection must keep every process's compiled-call sequence in lockstep,
    and every stream — original, reborn, and the siblings that lived through
    the churn — must match its solo single-process run exactly. Runs in
    both serial and pipelined (pipeline_steps=2) poll modes: the agreed
    collective sequence must survive pipelining + asymmetric churn."""
    cfg = tiny_config()
    params = random_params(cfg, seed=0)

    def solo(audio):
        with FleetManager(params, cfg, batch=1, chunk_tokens=8,
                          dec_ring=256, continuous=True,
                          kv_dtype="int8") as m:
            sid = m.attach()
            m.feed(sid, audio)
            m.finish(sid)
            while not m.is_finished(sid):
                m.poll()
            return list(m.slots[sid].all_ids)

    want = {0: solo(mw.stream_audio(0)),
            mw.REBORN_SEED: solo(mw.stream_audio(mw.REBORN_SEED))}
    for g in (1, 2, 3):
        want[g] = solo(np.concatenate([
            mw.stream_audio(g),
            mw.stream_audio(1000 + g, mw.EXTRA_SECONDS)]))

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    outs = [str(tmp_path / f"churn{p}.json") for p in range(2)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [subprocess.Popen(
        [sys.executable, worker, str(p), "2", str(port), outs[p], "churn",
         str(pipeline)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for p in range(2)]
    logs = [p.communicate(timeout=840) for p in procs]
    for p, (so, se) in zip(procs, logs):
        assert p.returncode == 0, (
            f"worker {p.args} failed:\n{se.decode()[-3000:]}")

    got = {}
    for path in outs:
        with open(path) as f:
            d = json.load(f)
        for k, v in d["streams"].items():
            got[int(k)] = v
    assert sorted(got) == sorted(want)
    for g in sorted(want):
        assert got[g] == want[g], (
            f"stream {g}: tokens diverge across the asymmetric churn")


def test_host_row_range_partition():
    """host_row_range math on a single-process mesh degenerates to the full
    batch (and asserts on indivisible batches)."""
    import jax

    from voxtral_tpu.parallel.distributed import host_row_range
    from voxtral_tpu.parallel.sharding import make_mesh
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(4, 1)
    assert host_row_range(mesh, 8) == (0, 8)
    with pytest.raises(AssertionError):
        host_row_range(mesh, 6)


def test_fetch_local_rows_roundtrip():
    """fetch_local_rows reassembles rows from addressable shards whatever
    slice of the batch is requested."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from voxtral_tpu.parallel.distributed import fetch_local_rows
    from voxtral_tpu.parallel.sharding import make_mesh
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    mesh = make_mesh(4, 1)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    g = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    np.testing.assert_array_equal(fetch_local_rows(g, 0, 8), x)
    np.testing.assert_array_equal(fetch_local_rows(g, 2, 6), x[2:6])
