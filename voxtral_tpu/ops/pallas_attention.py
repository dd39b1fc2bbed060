"""Fused Pallas TPU kernel for sliding-window GQA attention over ring KV.

This is the TPU analogue of the reference's fused Metal attention kernels
(decoder_attention voxtral_shaders.metal:292, encoder_attention :460): one
kernel computes scores + position mask + softmax + probs@V entirely in VMEM.
The XLA oracle (ops/attention.py) materializes [H, S, P] f32 scores in HBM
and issues ~15 ops per layer; fused, each (stream, 128-lane KV block) grid
cell reads its K/V ring slice from HBM exactly once and writes only the
[S, q_lanes] output.

Layout contract (matches models/*.py state): heads are MERGED into the last
axis. A 128-lane KV block covers `128 // hd` KV heads; its q block covers
`group * 128` lanes (group = H // Hkv q-heads per KV head).

Int8 KV rings: rings may be int8 with per-(slot, kv-head) f32 scales laid
out [B, Hkv, P]. Dequantization never materializes: K scales multiply the
SCORE columns (q . k_j * ks_j), V scales fold into the probability columns
before the PV matmul ((e_j * vs_j) @ v). This halves decode-attention HBM
traffic — at production batch the ring reads rival the Q8 weight reads.

Two shape regimes, both window-masked by LOGICAL position (ring slots are
addressed pos % ring and masked via the slot->position table, never
shifted):
- decode:  S queries (small, e.g. 1), GQA group > 1, hd = 128
- encoder: S queries (chunk), MHA group == 1, hd = 64 (2 heads per block)

extra_kv: the current chunk's accumulated K/V rides as Sx additional
bf16/f32 columns with their own position row (see models/decoder.py rule 3)
so the ring stays loop-invariant inside a decode scan.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _attend_block(q_mat, k_blk, v_blk, mask, xk_blk, xv_blk, x_mask,
                  scale, ks_row, vs_row):
    """q_mat: [R, hd] f32; k_blk/v_blk: [P, hd] (any dtype, incl. int8) OR
    an (lo, hi) int32 pair of [P, hd/2] halves from an int4-packed ring
    (quant.py:unpack_int4 — lanes [0, hd/2) and [hd/2, hd)); mask: [R, P]
    bool; xk/xv: [Sx, hd] or None; x_mask: [R, Sx]; ks_row/vs_row: [P] f32
    per-slot scales or None. Returns [R, hd] f32."""
    # MXU operands stay low-precision (f32 matmul is several times slower
    # and would upcast the whole ring slice); accumulation is f32 via
    # preferred_element_type. The oracle rounds probs to V's dtype too.
    mxu_dt = q_mat.dtype

    def kq(q_mat, k):
        if isinstance(k, tuple):        # packed halves: two half-width dots
            lo, hi = k
            hh = lo.shape[1]
            return (jax.lax.dot_general(
                        q_mat[:, :hh], lo.astype(mxu_dt),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    + jax.lax.dot_general(
                        q_mat[:, hh:], hi.astype(mxu_dt),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32))
        return jax.lax.dot_general(q_mat, k.astype(mxu_dt),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    s1 = kq(q_mat, k_blk) * scale
    if ks_row is not None:
        s1 = s1 * ks_row[None, :]
    s1 = jnp.where(mask, s1, _NEG)

    def pv(e, v):
        if isinstance(v, tuple):        # packed halves: concat restores
            o = [jax.lax.dot_general(e.astype(mxu_dt), h.astype(mxu_dt),
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 for h in v]            # the original lane order
            return jnp.concatenate(o, axis=1)
        return jax.lax.dot_general(e.astype(mxu_dt), v.astype(mxu_dt),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    if xk_blk is not None:
        s2 = jax.lax.dot_general(q_mat, xk_blk.astype(mxu_dt),
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32) * scale
        s2 = jnp.where(x_mask, s2, _NEG)
        m = jnp.maximum(jnp.max(s1, -1, keepdims=True),
                        jnp.max(s2, -1, keepdims=True))
        m = jnp.maximum(m, _NEG / 2)          # fully-masked row guard
        e1 = jnp.where(mask, jnp.exp(s1 - m), 0.0)
        e2 = jnp.where(x_mask, jnp.exp(s2 - m), 0.0)
        denom = jnp.maximum(
            jnp.sum(e1, -1, keepdims=True) + jnp.sum(e2, -1, keepdims=True),
            1e-30)
        if vs_row is not None:
            e1 = e1 * vs_row[None, :]
        return (pv(e1, v_blk) + pv(e2, xv_blk)) / denom
    m = jnp.maximum(jnp.max(s1, -1, keepdims=True), _NEG / 2)
    e1 = jnp.where(mask, jnp.exp(s1 - m), 0.0)
    denom = jnp.maximum(jnp.sum(e1, -1, keepdims=True), 1e-30)
    if vs_row is not None:
        e1 = e1 * vs_row[None, :]
    return pv(e1, v_blk) / denom


def _kernel(refs, *, window, group, hd, has_extra, has_scales, packed):
    """Grid (B, Hkv*hd//blk). Ref order: q, k, v, sp, qp,
    [ks, vs,] [xk, xv, xp,] out. Block shapes:
    q/out [1, S, group*blk]; k/v [1, P, blk] (or [1, P, blk/2] int4-packed
    bytes); xk/xv [1, Sx, blk];
    sp [1, 1, P] / qp [1, 1, S] / xp [1, 1, Sx]; ks/vs [1, 1, sub, P].
    Every cell fetches ONLY its own rows — a full-table spec with a
    constant index_map is re-DMA'd per grid cell (measured ~5x kernel
    slowdown at B=24 from position+scale table refetches)."""
    it = iter(refs)
    q_ref, k_ref, v_ref, sp_ref, qp_ref = (next(it) for _ in range(5))
    ks_ref = vs_ref = xk_ref = xv_ref = xp_ref = None
    if has_scales:
        ks_ref, vs_ref = next(it), next(it)
    if has_extra:
        xk_ref, xv_ref, xp_ref = next(it), next(it), next(it)
    o_ref = next(it)

    kv_w = hd // 2 if packed else hd    # ring lanes per kv sub-head
    sub = k_ref.shape[2] // kv_w        # kv sub-heads in this lane block
    scale = 1.0 / math.sqrt(hd)
    qp = qp_ref[0, 0, :]                                 # [S]
    sp = sp_ref[0, 0, :]                                 # [P]
    lo = qp - (window - 1)
    mask = ((sp[None, :] >= 0) & (sp[None, :] <= qp[:, None])
            & (sp[None, :] >= lo[:, None]))              # [S, P]
    x_mask = None
    if has_extra:
        xp = xp_ref[0, 0, :]
        x_mask = ((xp[None, :] >= 0) & (xp[None, :] <= qp[:, None])
                  & (xp[None, :] >= lo[:, None]))        # [S, Sx]
    q_all = q_ref[0]                                     # [S, group*blk]

    k_halves = v_halves = None
    if packed:
        # Unpack the WHOLE lane block once per grid cell, then slice per
        # sub-head: the shift/convert ops run on full-lane-width
        # [P, rblk] arrays instead of sub x [P, hd/2] slices (hd/2 = 32
        # encoder lanes would waste 3/4 of each 128-lane VPU op), and the
        # cast to the MXU dtype happens once at full width. Elementwise,
        # so slice-after-unpack == unpack-after-slice.
        from voxtral_tpu.quant import unpack_int4
        mxu_dt = q_all.dtype
        k_halves = tuple(h.astype(mxu_dt) for h in unpack_int4(k_ref[0]))
        v_halves = tuple(h.astype(mxu_dt) for h in unpack_int4(v_ref[0]))

    for j in range(sub):                # static unroll over kv sub-heads
        if packed:
            sl = slice(j * kv_w, (j + 1) * kv_w)
            k_blk = (k_halves[0][:, sl], k_halves[1][:, sl])
            v_blk = (v_halves[0][:, sl], v_halves[1][:, sl])
        else:
            k_blk = k_ref[0, :, j * hd:(j + 1) * hd]     # [P, hd]
            v_blk = v_ref[0, :, j * hd:(j + 1) * hd]
        ks_row = vs_row = None
        if has_scales:
            ks_row = ks_ref[0, 0, j, :]                  # [P] f32
            vs_row = vs_ref[0, 0, j, :]
        xk_blk = xv_blk = None
        if has_extra:
            xk_blk = xk_ref[0, :, j * hd:(j + 1) * hd]   # [Sx, hd]
            xv_blk = xv_ref[0, :, j * hd:(j + 1) * hd]
        s = q_all.shape[0]
        if s == 1 and group > 1 and hd % 128 == 0:
            # Decode fast path: the kv head's `group` q heads are CONTIGUOUS
            # lanes, so a single-row q block reshapes to [group, hd] rows —
            # ONE [group, P] dot instead of `group` M=1 dots (M=1 MXU passes
            # are latency-bound; this was the kernel's dominant cost).
            # Gated on hd % 128 == 0: the [1, group*hd] -> [group, hd]
            # reshape keeps lanes 128-aligned only then (Mosaic rejects
            # sub-lane shape casts, e.g. the hd=32 tiny-test config).
            c0 = j * group * hd
            q_mat = q_all[0, c0:c0 + group * hd].reshape(group, hd)
            o = _attend_block(q_mat, k_blk, v_blk, mask, xk_blk, xv_blk,
                              x_mask, scale, ks_row, vs_row)   # [group, hd]
            o_ref[0, :, c0:c0 + group * hd] = (
                o.reshape(1, group * hd).astype(o_ref.dtype))
            continue
        for g in range(group):          # static unroll over grouped q heads
            # kv head (n*sub + j)'s g-th grouped q head is block-relative
            # head j*group + g (q heads are contiguous per kv head)
            c0 = (j * group + g) * hd
            q_mat = q_all[:, c0:c0 + hd]                      # [S, hd]
            o = _attend_block(q_mat, k_blk, v_blk, mask, xk_blk, xv_blk,
                              x_mask, scale, ks_row, vs_row)
            o_ref[0, :, c0:c0 + hd] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("window", "heads", "kv_heads",
                                             "head_dim", "p_limit",
                                             "kv_packed", "interpret"))
def ring_gqa_attention(q, k_ring, v_ring, slot_pos, q_pos, *,
                       window: int, heads: int, kv_heads: int, head_dim: int,
                       k_scale=None, v_scale=None,
                       extra_k=None, extra_v=None, extra_pos=None,
                       p_limit: int | None = None,
                       kv_packed: bool | None = None,
                       interpret: bool = False):
    """Batched fused ring attention.

    q: [B, S, heads*head_dim]; k_ring/v_ring: [B, P, kv_heads*head_dim]
    (bf16/f32, or int8 with k_scale/v_scale [B, kv_heads, P] f32; with
    kv_packed, [B, P, kv_heads*head_dim/2] int4-PACKED bytes — see
    quant.py:quantize_kv_int4 — unpacked in-kernel, scales required);
    slot_pos: [B, P] int32 (logical position per slot, negative = invalid);
    q_pos: [B, S] int32; extra_k/v: [B, Sx, kv_heads*head_dim] float with
    extra_pos [B, Sx]. Returns [B, S, heads*head_dim] in q.dtype.

    p_limit (static): only slots [0, p_limit) are read — the K/V/scale/pos
    BlockSpecs shrink on the slot axis, so slots beyond the limit are never
    DMA'd from HBM. Caller must guarantee every slot >= p_limit is invalid
    (slot_pos < 0). The rings fill as a prefix (the lockstep cursor wraps
    only after phys slots), so early-stream attention cost scales with the
    ACTUAL context length, not the ring capacity — the TPU analogue of the
    reference's grow-as-you-go cache (voxtral_decoder.c:251-348) without its
    dynamic shapes.
    """
    b, s, qd = q.shape
    p_full = k_ring.shape[1]
    p = p_full if p_limit is None else min(p_limit, p_full)
    assert qd == heads * head_dim
    half_lane = k_ring.shape[-1] * 2 == kv_heads * head_dim
    if kv_packed is None:
        # half-width ring == nibble-packed int4 (the ring layout contract
        # admits no other half-lane ring today)
        kv_packed = half_lane
    elif kv_packed != half_lane:
        # an explicit caller choice that contradicts the ring width is a
        # layout bug, not a mode request — decoding a future genuinely
        # half-width ring as nibbles (or vice versa) must fail loudly
        raise ValueError(
            f"kv_packed={kv_packed} but ring lane width "
            f"{k_ring.shape[-1]} vs kv_dim {kv_heads * head_dim} "
            f"implies packed={half_lane}")
    assert not kv_packed or k_scale is not None, \
        "int4-packed rings require scales"
    assert not kv_packed or k_ring.dtype == jnp.int8, k_ring.dtype
    group = heads // kv_heads
    assert 128 % head_dim == 0, head_dim
    kv_dim = kv_heads * head_dim
    # Lane width of one KV block. Swept on v5e (tools/profile_attn_blk.py,
    # B=16, int8 rings + scales): decoder shape (kv_dim 1024, ring 2088)
    # fastest at 512 (141 us/layer vs 146 @256); encoder shape (kv_dim 2048,
    # ring 1104, S=80) fastest at 1024 (325 us/layer vs 365 @256); 2048
    # fails to compile. Fall back to halves, or the whole (sub-128) head
    # axis — a lane block equal to the full array dim is always lowerable.
    import os
    _env_blk = int(os.environ.get("VOX_ATTN_BLK", "0"))
    for blk in ((_env_blk,) if _env_blk else (1024 if kv_dim >= 2048 else 512,
                                              512, 256, 128)):
        if kv_dim % blk == 0:
            break
    else:
        blk = kv_dim
    n_blocks = kv_dim // blk
    has_extra = extra_k is not None
    has_scales = k_scale is not None
    qlanes = group * blk

    rblk = blk // 2 if kv_packed else blk     # ring lane block (bytes)
    in_specs = [
        pl.BlockSpec((1, s, qlanes), lambda i, n: (i, 0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, rblk), lambda i, n: (i, 0, n),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, p, rblk), lambda i, n: (i, 0, n),
                     memory_space=pltpu.VMEM),
        # per-cell row slices ([1,1,...] leading blocks); see _kernel doc
        pl.BlockSpec((1, 1, p), lambda i, n: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, s), lambda i, n: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    sub = blk // head_dim
    args = [q, k_ring, v_ring, slot_pos.reshape(b, 1, p_full),
            jnp.asarray(q_pos, jnp.int32).reshape(b, 1, s)]
    if has_scales:
        # [B, Hkv, P] -> [B, n_blocks, sub, P]: each cell reads only its
        # own sub-heads' scale rows
        in_specs += [pl.BlockSpec((1, 1, sub, p), lambda i, n: (i, n, 0, 0),
                                  memory_space=pltpu.VMEM)] * 2
        args += [k_scale.reshape(b, n_blocks, sub, p_full),
                 v_scale.reshape(b, n_blocks, sub, p_full)]
    if has_extra:
        sx = extra_k.shape[1]
        in_specs += [
            pl.BlockSpec((1, sx, blk), lambda i, n: (i, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sx, blk), lambda i, n: (i, 0, n),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sx), lambda i, n: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [extra_k, extra_v,
                 jnp.asarray(extra_pos, jnp.int32).reshape(b, 1, sx)]

    def kernel(*refs):
        _kernel(refs, window=window, group=group, hd=head_dim,
                has_extra=has_extra, has_scales=has_scales,
                packed=kv_packed)

    return pl.pallas_call(
        kernel,
        grid=(b, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, s, qlanes), lambda i, n: (i, 0, n),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, qd), q.dtype),
        # the default 16 MB scoped-VMEM cap rejects bf16 rings at the
        # larger chunk buckets (e.g. VoxStream S=128, ring 1408: ~17.6 MB);
        # v5e has 128 MB and bigger blocks measured no slower (SPEED.md)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def slot_buckets(phys: int, floor: int = 256) -> list[int]:
    """Static prefix-read sizes for a ring with `phys` physical slots:
    doubling sizes from `floor`, then phys itself. Near-duplicates of phys
    (within one 128-slot block) are dropped."""
    out = [v for v in (floor, 2 * floor, 4 * floor, 8 * floor, 16 * floor,
                       32 * floor) if v < phys - 128]
    return out + [phys]


def _pallas_dispatch(q, k_ring, v_ring, slot_pos, q_pos, *,
                     window, heads, kv_heads, head_dim, k_scale, v_scale,
                     xk, xv, xp, n_valid_slots, interpret):
    """Prefix-bucket dispatch onto the fused kernel (single device / one
    shard_map shard). See ring_attention for the n_valid_slots contract."""
    kv_packed = k_ring.shape[-1] * 2 == kv_heads * head_dim

    def run(p_limit):
        return ring_gqa_attention(
            q, k_ring, v_ring, slot_pos, q_pos, window=window,
            heads=heads, kv_heads=kv_heads, head_dim=head_dim,
            k_scale=k_scale, v_scale=v_scale, extra_k=xk, extra_v=xv,
            extra_pos=xp, p_limit=p_limit, kv_packed=kv_packed,
            interpret=interpret)

    phys = k_ring.shape[1]
    if n_valid_slots is None:
        return run(None)
    buckets = slot_buckets(phys)
    if isinstance(n_valid_slots, int):
        nv = min(n_valid_slots, phys)
        return run(next(v for v in buckets if v >= nv))
    if len(buckets) == 1:
        return run(buckets[0])
    nv = jnp.minimum(jnp.asarray(n_valid_slots, jnp.int32), phys)
    idx = jnp.searchsorted(jnp.asarray(buckets, jnp.int32), nv,
                           side="left")
    return jax.lax.switch(idx, [functools.partial(run, v)
                                for v in buckets])


def _shard_mapped_attention(mesh, da, ma, q, k_ring, v_ring, slot_pos,
                            q_pos, *, window, heads, kv_heads, head_dim,
                            k_scale, v_scale, xk, xv, xp, n_valid_slots,
                            interpret):
    """TP/DP execution of the fused kernel: GSPMD cannot auto-partition a
    pallas_call, so under a multi-device mesh the kernel runs inside
    shard_map — streams sharded over the data axis, (kv-)heads over the
    model axis (the merged trailing head axis of q/rings/output and the head
    axis of the scale tables). Each shard runs the same prefix-bucket
    dispatch on its local heads; no collectives are needed (attention is
    head-local; the psum after the row-sharded wo matmul stays GSPMD's
    job)."""
    from jax.sharding import PartitionSpec as P
    m = mesh.shape[ma]
    assert kv_heads % m == 0, \
        f"kv_heads {kv_heads} not divisible by model axis {m}"
    lh, lhkv = heads // m, kv_heads // m
    has_scales, has_extra = k_scale is not None, xk is not None
    nv_traced = (n_valid_slots is not None
                 and not isinstance(n_valid_slots, int))
    args = [q, k_ring, v_ring, slot_pos, q_pos]
    specs = [P(da, None, ma), P(da, None, ma), P(da, None, ma),
             P(da, None), P(da, None)]
    if has_scales:
        args += [k_scale, v_scale]
        specs += [P(da, ma, None)] * 2
    if has_extra:
        args += [xk, xv, jnp.asarray(xp, jnp.int32)]
        specs += [P(da, None, ma), P(da, None, ma), P(da, None)]
    if nv_traced:
        args.append(jnp.asarray(n_valid_slots, jnp.int32))
        specs.append(P())

    def inner(*ops):
        it = iter(ops)
        q_, k_, v_, sp_, qp_ = (next(it) for _ in range(5))
        ks_ = vs_ = xk_ = xv_ = xp_ = None
        if has_scales:
            ks_, vs_ = next(it), next(it)
        if has_extra:
            xk_, xv_, xp_ = next(it), next(it), next(it)
        nv_ = next(it) if nv_traced else n_valid_slots
        return _pallas_dispatch(
            q_, k_, v_, sp_, qp_, window=window, heads=lh, kv_heads=lhkv,
            head_dim=head_dim, k_scale=ks_, v_scale=vs_, xk=xk_, xv=xv_,
            xp=xp_, n_valid_slots=nv_, interpret=interpret)

    return jax.shard_map(inner, mesh=mesh, in_specs=tuple(specs),
                         out_specs=P(da, None, ma), check_vma=False)(*args)


def ring_attention(q, k_ring, v_ring, slot_pos, q_pos, *,
                   window: int, heads: int, kv_heads: int, head_dim: int,
                   k_scale=None, v_scale=None, extra_kv=None,
                   n_valid_slots=None,
                   force_pallas: bool | None = None):
    """Backend dispatcher used by the models.

    On TPU (or when rings are int8, which only the fused kernel supports)
    runs the Pallas kernel; on CPU runs it in interpreter mode for int8 or
    falls back to the XLA oracle for float rings. Trace-time static choice.
    When traced under parallel.sharding.use_tp_mesh(mesh) with >1 device,
    the kernel runs inside shard_map (see _shard_mapped_attention).

    n_valid_slots: optional upper bound (int or traced scalar, shared by all
    streams — the lockstep cursor guarantees this) on the number of ring
    slots that can hold valid entries. A traced bound selects one of a few
    static prefix sizes via lax.switch, so early-stream steps never DMA the
    empty ring tail; slots beyond the bound MUST be invalid (slot_pos < 0).
    """
    on_tpu = jax.default_backend() == "tpu"
    use_pallas = force_pallas if force_pallas is not None \
        else (on_tpu or k_scale is not None)
    if k_scale is not None and not use_pallas:
        # the oracle has no scale support — silently attending over raw
        # int8 codes would be numerically wrong but shape-correct
        raise ValueError("int8 rings (k_scale/v_scale) require the fused "
                         "kernel; cannot run with force_pallas=False")
    xk = xv = xp = None
    if extra_kv is not None:
        xk, xv, xp = extra_kv
    if use_pallas:
        from voxtral_tpu.parallel.sharding import active_tp_mesh
        ctx = active_tp_mesh()
        if ctx is not None:
            mesh, da, ma = ctx
            if mesh.shape[da] * mesh.shape[ma] > 1:
                return _shard_mapped_attention(
                    mesh, da, ma, q, k_ring, v_ring, slot_pos, q_pos,
                    window=window, heads=heads, kv_heads=kv_heads,
                    head_dim=head_dim, k_scale=k_scale, v_scale=v_scale,
                    xk=xk, xv=xv, xp=xp, n_valid_slots=n_valid_slots,
                    interpret=not on_tpu)
        return _pallas_dispatch(
            q, k_ring, v_ring, slot_pos, q_pos, window=window, heads=heads,
            kv_heads=kv_heads, head_dim=head_dim, k_scale=k_scale,
            v_scale=v_scale, xk=xk, xv=xv, xp=xp,
            n_valid_slots=n_valid_slots, interpret=not on_tpu)
    from voxtral_tpu.ops.attention import ring_decode_attention
    b, s, qd = q.shape
    p = k_ring.shape[1]

    def one(qb, kb, vb, spb, qpb, *ex):
        out = ring_decode_attention(
            qb.reshape(s, heads, head_dim),
            kb.reshape(p, kv_heads, head_dim),
            vb.reshape(p, kv_heads, head_dim),
            slot_pos=spb, q_pos=qpb, window=window,
            extra_kv=None if not ex else
            (ex[0].reshape(-1, kv_heads, head_dim),
             ex[1].reshape(-1, kv_heads, head_dim), ex[2]))
        return out.reshape(s, qd)

    qp2 = jnp.asarray(q_pos, jnp.int32).reshape(b, s)
    if extra_kv is None:
        return jax.vmap(one)(q, k_ring, v_ring, slot_pos, qp2)
    return jax.vmap(one)(q, k_ring, v_ring, slot_pos, qp2, xk, xv, xp)
