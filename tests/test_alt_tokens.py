"""Alt-token parity vs a full-vocab oracle (voxtral.c:955-1010).

The reference builds alternatives by softmaxing the FULL vocab and
repeatedly scanning all non-special tokens for the next-highest probability,
accepting while 1 - p_i/p_best <= cutoff. Our device path collects top-k
masked candidates (models/decoder.py:alt_candidates) and the host walks the
cutoff (runtime/alts.py:select_alts). These tests pin exact agreement with
an oracle transcription of the reference scan, on random logits WITH exact
ties, with >k near-ties above the cutoff, and with specials boosted into
the top region — the cases a truncated top-k gets wrong.
"""

import jax.numpy as jnp
import numpy as np

from voxtral_tpu.models.decoder import alt_candidates
from voxtral_tpu.runtime.alts import select_alts


def oracle_fill_alts(logits: np.ndarray, best_token: int, n_alt: int,
                     cutoff: float, n_special: int) -> list[int]:
    """Literal transcription of the reference's stream_fill_alts
    (voxtral.c:955-1010): f32 softmax over the whole vocab, repeated scan
    over i >= TOKEN_TEXT_MIN with strict `>` (first index wins ties),
    break on 1 - p/p_best > cutoff, at most n_alt - 1 alternatives."""
    p = logits.astype(np.float32)
    p = np.exp(p - p.max(), dtype=np.float32)
    p = (p / p.sum(dtype=np.float32)).astype(np.float32)
    best_prob = p[best_token]
    if best_prob <= 0:
        return []
    used = {best_token}
    out = []
    while len(out) < n_alt - 1:
        best_idx, best_p = -1, -1.0
        for i in range(n_special, len(p)):
            if i in used:
                continue
            if p[i] > best_p:
                best_p = p[i]
                best_idx = i
        if best_idx < 0:
            break
        r = 1.0 - best_p / best_prob
        if r > cutoff:
            break
        used.add(best_idx)
        out.append(best_idx)
    return out


def _ours(logits: np.ndarray, best_token: int, n_alt: int, cutoff: float,
          n_special: int) -> list[int]:
    vals, idxs, best = alt_candidates(
        jnp.asarray(logits, jnp.float32)[None],
        jnp.asarray([best_token], jnp.int32), n_special, max(n_alt - 1, 1))
    return select_alts(float(best[0]), np.asarray(vals[0]),
                       np.asarray(idxs[0]), n_alt, cutoff)


def _check(logits, n_alt, cutoff, n_special=100):
    best = int(np.argmax(logits))
    want = oracle_fill_alts(logits, best, n_alt, cutoff, n_special)
    got = _ours(logits, best, n_alt, cutoff, n_special)
    assert got == want, (got, want, n_alt, cutoff)


def test_random_logits_match_oracle():
    rng = np.random.RandomState(0)
    for trial in range(20):
        logits = rng.randn(512).astype(np.float32) * 2.0
        for n_alt in (2, 3, 4):
            for cutoff in (0.0, 0.5, 0.95, 1.0):
                _check(logits, n_alt, cutoff)


def test_exact_ties_break_by_lowest_index():
    """Groups of exactly-tied logits: both scans must pick lowest index
    first (the reference's strict `>`; lax.top_k ties break the same way)."""
    rng = np.random.RandomState(1)
    logits = rng.randn(512).astype(np.float32)
    logits[[200, 300, 150, 450]] = 5.0       # 4-way tie at the top
    logits[[210, 310]] = 4.0                 # another tie below
    for n_alt in (2, 3, 4):
        for cutoff in (0.0, 0.9, 1.0):
            _check(logits, n_alt, cutoff)


def test_tie_with_best_token():
    """An alternative exactly tied with the best token has r == 0 and always
    qualifies (even at cutoff 0)."""
    rng = np.random.RandomState(2)
    logits = rng.randn(512).astype(np.float32)
    logits[120] = 6.0                        # best (argmax: lowest index)
    logits[400] = 6.0                        # exact tie
    _check(logits, 4, 0.0)
    got = _ours(logits, 120, 4, 0.0, 100)
    assert got[:1] == [400]


def test_many_near_ties_beyond_topk_window():
    """>7 candidates above the cutoff — the case a fixed top-8 source
    truncated (VERDICT round 1, coverage #22). With n_alt=4 only 3 are
    taken, but the ORDER must come from the full vocab, not a window."""
    rng = np.random.RandomState(3)
    logits = rng.randn(2048).astype(np.float32) * 0.1
    near = rng.choice(np.arange(100, 2048), size=24, replace=False)
    logits[near] = 8.0 - np.arange(24) * 1e-3   # 24 near-ties at the top
    for n_alt in (2, 4):
        _check(logits, n_alt, 0.95)


def test_specials_crowding_the_top():
    """Specials occupying the top-k region must not displace real
    candidates: the reference scan never looks below TOKEN_TEXT_MIN."""
    rng = np.random.RandomState(4)
    logits = rng.randn(512).astype(np.float32)
    logits[:100] = 10.0 - np.arange(100) * 1e-4   # all specials on top
    logits[257] = 9.0                             # best real candidates
    logits[258] = 8.9
    logits[259] = 8.8
    best = int(np.argmax(logits))                 # a special (id 0)
    want = oracle_fill_alts(logits, best, 4, 1.0, 100)
    got = _ours(logits, best, 4, 1.0, 100)
    assert got == want == [257, 258, 259]


def test_candidate_exhaustion():
    """Fewer real candidates than n_alt - 1: the -inf mask padding must
    read as exhaustion (the reference's best_idx < 0 break), not as a
    candidate."""
    logits = np.full(103, -2.0, np.float32)       # vocab 103, specials 100
    logits[101] = 3.0                             # best
    logits[102] = 2.5
    # candidates: only 102 and 100 (2 < n_alt - 1 = 3)
    _check(logits, 4, 1.0, n_special=100)
    got = _ours(logits, 101, 4, 1.0, 100)
    assert got == [102, 100]
