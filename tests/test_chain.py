"""Chain sweep tests: native C++ vs Python sweep equality on random hits."""

import numpy as np
import pytest

from damapper_tpu.ops.chain import ChainState
from damapper_tpu.ops.seeds import SeedHits


def random_hits(rng, n, nreads=3, nctg=2, span=20000):
    aread = np.sort(rng.integers(0, nreads, n).astype(np.int32))
    bread = rng.integers(0, nctg, n).astype(np.int32)
    apos = rng.integers(20, span, n).astype(np.int32)
    bpos = rng.integers(20, span, n).astype(np.int32)
    # cluster some hits along diagonals to form real chains
    m = n // 2
    base_a = rng.integers(100, span - 3000)
    base_b = rng.integers(100, span - 3000)
    apos[:m] = base_a + np.sort(rng.integers(0, 2500, m))
    bpos[:m] = apos[:m] - base_a + base_b + rng.integers(-40, 40, m)
    # dedup: real pipeline hits are unique in (aread, bread, apos, bpos)
    rows = np.stack([aread, bread, apos, bpos], axis=1)
    rows = np.unique(rows, axis=0)
    aread, bread, apos, bpos = rows.T.astype(np.int32)
    diag = apos - bpos
    order = np.lexsort((apos, bread, aread))
    return SeedHits(aread[order], bread[order], apos[order], diag[order])


def dump(state):
    out = []
    for ar, cands in enumerate(state.cands):
        for c in cands:
            out.append((ar, c.score, c.bread, c.comp, c.afirst, c.alast,
                        c.bfirst, c.blast, c.length, tuple(c.jumps)))
    return out


@pytest.mark.parametrize("seed", range(8))
def test_native_matches_python(seed):
    rng = np.random.default_rng(900 + seed)
    hits = random_hits(rng, 4000)
    s1 = ChainState(3, kmer=20)
    s1.process_hits(hits, bstart=5, comp=1, native=False)
    s2 = ChainState(3, kmer=20)
    s2.process_hits(hits, bstart=5, comp=1, native=True)
    assert dump(s1) == dump(s2)


def test_native_multi_pass_accumulation(tmp_path):
    rng = np.random.default_rng(1234)
    h1 = random_hits(rng, 3000)
    h2 = random_hits(rng, 3000)
    s1 = ChainState(3, kmer=14)
    s2 = ChainState(3, kmer=14)
    for h, comp in ((h1, 0), (h2, 1)):
        s1.process_hits(h, bstart=0, comp=comp, native=False)
        s2.process_hits(h, bstart=0, comp=comp, native=True)
    assert dump(s1) == dump(s2)


@pytest.mark.parametrize("seed", range(6))
def test_device_matches_python(seed):
    """The batched XLA sweep (ops.chain_jax) must produce identical
    candidates to the sequential host sweep."""
    rng = np.random.default_rng(700 + seed)
    hits = random_hits(rng, 3000)
    s1 = ChainState(3, kmer=20)
    s1.process_hits(hits, bstart=5, comp=1, native=False)
    s2 = ChainState(3, kmer=20)
    s2.process_hits(hits, bstart=5, comp=1, device=True)
    assert dump(s1) == dump(s2)


def test_device_oversized_group_fallback(monkeypatch):
    """Groups above the device capacity route to the native sweep; the mix
    must still match the pure host result (order included)."""
    from damapper_tpu.ops import chain_jax
    monkeypatch.setattr(chain_jax, "_MAXC", 256)
    rng = np.random.default_rng(4321)
    hits = random_hits(rng, 5000, nreads=2, nctg=2)
    s1 = ChainState(2, kmer=14)
    s1.process_hits(hits, bstart=0, comp=0, native=False)
    s2 = ChainState(2, kmer=14)
    s2.process_hits(hits, bstart=0, comp=0, device=True)
    assert dump(s1) == dump(s2)


def test_device_multi_pass_accumulation():
    rng = np.random.default_rng(777)
    h1 = random_hits(rng, 2500)
    h2 = random_hits(rng, 2500)
    s1 = ChainState(3, kmer=14)
    s2 = ChainState(3, kmer=14)
    for h, comp in ((h1, 0), (h2, 1)):
        s1.process_hits(h, bstart=0, comp=comp, native=False)
        s2.process_hits(h, bstart=0, comp=comp, device=True)
    assert dump(s1) == dump(s2)


def _two_expired_chains():
    """One (aread, bread) group where BOTH chain heads expire before the
    group's last hit: chain A (early, low apos), chain B (later), plus a
    lone tail hit > MAX_GAP past B.  The reference builds its expired list
    by PREPENDING each expiring node (map.c:1790-1794), so candidate
    creation order must be [B, A] (LIFO) — which, with the prepend-built
    candidate stack, puts A first in the reporter's walk.  The order picks
    which of two equal-span LAs survives Handle_Redundancies (the 50k-read
    trace-parity edge, read 5749)."""
    apos_a = np.arange(40, 40 + 5 * 60, 60, np.int32)          # chain A
    apos_b = np.arange(2000, 2000 + 5 * 60, 60, np.int32)      # chain B
    tail = np.array([apos_b[-1] + 1500], np.int32)             # expires B
    apos = np.concatenate([apos_a, apos_b, tail])
    diag = np.concatenate([np.full(5, -100, np.int32),
                           np.full(5, -250, np.int32),
                           np.array([5000], np.int32)])
    n = len(apos)
    return SeedHits(np.zeros(n, np.int32), np.zeros(n, np.int32),
                    apos, diag)


@pytest.mark.parametrize("backend", ["python", "native", "device"])
def test_expired_chains_emit_lifo(backend):
    hits = _two_expired_chains()
    st = ChainState(1, kmer=20)
    if backend == "device":
        st.process_hits(hits, bstart=0, comp=0, device=True)
    else:
        st.process_hits(hits, bstart=0, comp=0, native=backend == "native")
    cands = st.cands[0]
    assert len(cands) == 2
    # reference reporter order: earlier-expired chain first (LIFO creation
    # + prepend-built candidate stack)
    assert cands[0].alast < cands[1].alast, \
        f"expired-chain candidate order not LIFO: {[c.alast for c in cands]}"
