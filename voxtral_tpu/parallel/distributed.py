"""Multi-host (multi-process) runtime: jax.distributed entry + global mesh
+ host-local row plumbing for DP serving across hosts.

The reference is single-process (SURVEY.md §2.4); this realizes the
BASELINE.json multi-host configuration ("8 streams DP across 2 hosts",
>=85% scaling efficiency): every process runs the SAME jitted fleet step
over a global ('data', 'model') mesh, each host feeding only its own rows
of the stream batch (audio in) and reading only its own rows of the token
output. Weight reads are amortized across the whole global batch; the only
cross-host traffic XLA inserts is for TP (none when n_model divides into a
host) — DP streams are embarrassingly parallel by construction, matching
the reference's independent-stream semantics (voxtral.c:1242).

Host-side control decisions (is any stream ready? does any slot need a
watchdog reset?) are agreed via tiny boolean all-gathers so every process
executes an identical sequence of compiled calls — the multi-process SPMD
contract. See runtime/manager.py for the serving loop that uses this.

CPU testing: two local processes with JAX_PLATFORMS=cpu +
jax_cpu_collectives_implementation=gloo exercise the full path without TPU
hardware (tests/test_multihost.py)."""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxtral_tpu.parallel.sharding import DATA, MODEL


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int, *, platform: str | None = None):
    """Join the multi-process runtime. Call once, before any jax computation.

    platform="cpu" forces the CPU backend with gloo cross-process
    collectives (the localhost test configuration); on real TPU pods leave
    it None — jax.distributed.initialize picks up the TPU topology."""
    if platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(n_data: int | None = None, n_model: int = 1) -> Mesh:
    """('data', 'model') mesh over the GLOBAL device list (all processes).
    Unlike sharding.make_mesh (local devices), this is the multi-host entry:
    jax.devices() enumerates every chip in the slice."""
    devices = jax.devices()
    if n_data is None:
        assert len(devices) % n_model == 0, (len(devices), n_model)
        n_data = len(devices) // n_model
    n = n_data * n_model
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(arr, (DATA, MODEL))


def host_row_range(mesh: Mesh, batch: int) -> tuple[int, int]:
    """[lo, hi) global stream-batch rows owned by THIS process under a
    P('data', ...) sharding over `mesh`.

    Requires: batch divisible by the data axis; each data index's model
    shards all live on one process (TP inside a host — ICI, not DCN); this
    process's data indices contiguous (the natural mesh layout). These are
    asserted, not silently worked around."""
    dev = mesh.devices                       # [n_data, n_model]
    n_data = dev.shape[0]
    assert batch % n_data == 0, (batch, n_data)
    rows_per = batch // n_data
    me = jax.process_index()
    mine = []
    for d in range(n_data):
        procs = {x.process_index for x in dev[d]}
        assert len(procs) == 1, (
            f"data index {d} spans processes {procs}: shard the model axis "
            "within a host (ICI), not across hosts")
        if procs == {me}:
            mine.append(d)
    if not mine:
        return (0, 0)
    assert mine == list(range(mine[0], mine[-1] + 1)), (
        f"process {me} owns non-contiguous data indices {mine}")
    return (mine[0] * rows_per, (mine[-1] + 1) * rows_per)


def put_local_rows(mesh: Mesh, spec: P, local_rows: np.ndarray,
                   global_batch: int):
    """Host-local rows [local_B, ...] -> global jax.Array [global_B, ...]
    sharded by `spec` (leading axis on 'data'). Single-process meshes take
    the full batch (local_B == global_B)."""
    sh = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        assert local_rows.shape[0] == global_batch
        return jax.device_put(local_rows, sh)
    shape = (global_batch,) + local_rows.shape[1:]
    return jax.make_array_from_process_local_data(sh, local_rows, shape)


def fetch_local_rows(garr, lo: int, hi: int) -> np.ndarray:
    """This host's rows [lo, hi) of a global array's leading axis, as
    numpy. Works whatever output sharding GSPMD picked, as long as the
    rows are addressable here (they are, for data-sharded state/outputs)."""
    if garr.is_fully_addressable:
        return np.asarray(garr)[lo:hi]
    out = None
    got = np.zeros(hi - lo, bool)
    for sh in garr.addressable_shards:
        idx = sh.index[0] if sh.index else slice(None)
        s0 = idx.start or 0
        data = np.asarray(sh.data)
        s1 = s0 + data.shape[0]
        a, b = max(s0, lo), min(s1, hi)
        if a >= b:
            continue
        if out is None:
            out = np.zeros((hi - lo,) + data.shape[1:], data.dtype)
        out[a - lo:b - lo] = data[a - s0:b - s0]
        got[a - lo:b - lo] = True
    assert out is not None and got.all(), (
        f"rows [{lo},{hi}) not fully addressable on process "
        f"{jax.process_index()}")
    return out


def any_across_hosts(flags: np.ndarray) -> np.ndarray:
    """Elementwise OR of a small host-local bool vector across processes
    (the control-plane agreement primitive; single-process: identity)."""
    if jax.process_count() == 1:
        return np.asarray(flags, bool)
    from jax.experimental import multihost_utils
    gathered = multihost_utils.process_allgather(
        np.asarray(flags, bool))             # [n_proc, len(flags)]
    return np.asarray(gathered).any(axis=0)
