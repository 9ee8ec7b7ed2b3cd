"""K-mer index build: native C++ builder vs the pure-python path.

Both implement tuple_thread + lex_sort (map.c:447-822); they must agree
exactly — same codes, same (read, rpos) order — with and without soft-mask
tracks, and under -t culling.
"""

import numpy as np
import pytest

from damapper_tpu.io import db as dbio
from damapper_tpu.io import fasta
from damapper_tpu.ops import kmers
from tests import helpers


def _make_db(tmp_path, seed=3, nreads=12, minl=500, maxl=6000):
    rng = np.random.default_rng(seed)
    entries = [fasta.FastaEntry(f"r{i}", helpers.sim_genome(
        rng, int(rng.integers(minl, maxl)))) for i in range(nreads)]
    dbio.create_db(str(tmp_path / "x.db"), entries)
    db = dbio.DazzDB.open(str(tmp_path / "x.db"))
    db.trim()
    db.load_bases()
    return db


def _attach_mask(db, rng):
    anno = np.zeros(db.nreads + 1, np.int64)
    chunks, total = [], 0
    for r in range(db.nreads):
        L = int(db.reads["rlen"][r])
        ivs = []
        p = 0
        while p + 60 < L and rng.random() < 0.8:
            b = p + int(rng.integers(10, 200))
            e = b + int(rng.integers(5, 300))
            if e >= L:
                break
            ivs.extend((b, e))
            p = e
        flat = np.asarray(ivs, np.int32)
        anno[r] = total
        chunks.append(flat)
        total += len(flat)
    anno[db.nreads] = total
    data = (np.concatenate(chunks) if chunks else np.zeros(0, np.int32))
    db.tracks["m"] = (anno, data, np.diff(anno).astype(np.int32))


@pytest.mark.parametrize("masked", [False, True])
@pytest.mark.parametrize("suppress", [0, 6])
def test_native_matches_python(tmp_path, monkeypatch, masked, suppress):
    db = _make_db(tmp_path)
    if masked:
        _attach_mask(db, np.random.default_rng(5))

    nat = kmers._native_index(db, 14)
    if nat is None:
        pytest.skip("native kmer builder unavailable")
    nat_idx = kmers.sort_kmers(db, 14, suppress)

    monkeypatch.setattr(kmers, "_native_index", lambda db, k, s=None: None)
    py_idx = kmers.sort_kmers(db, 14, suppress)

    assert len(nat_idx.code) == len(py_idx.code)
    assert np.array_equal(nat_idx.code, py_idx.code)
    assert np.array_equal(nat_idx.read, py_idx.read)
    assert np.array_equal(nat_idx.rpos, py_idx.rpos)
    if masked and not suppress:
        # the mask must actually remove k-mers (non-vacuous)
        saved = db.tracks.pop("m")
        full = kmers.sort_kmers(db, 14, 0)
        db.tracks["m"] = saved
        assert len(py_idx.code) < len(full.code)


def test_masked_extraction_windows(tmp_path):
    """Masked windows: a k-mer is emitted iff its k bases lie entirely in
    one unmasked window (map.c:500-530)."""
    db = _make_db(tmp_path, seed=9, nreads=3, minl=300, maxl=400)
    k = 10
    _attach_mask(db, np.random.default_rng(11))
    code, read, rpos = kmers.extract_kmers(db, k)
    track = db.tracks["m"]
    for r in range(db.nreads):
        L = int(db.reads["rlen"][r])
        anno, data, _ = track
        seg = data[int(anno[r]):int(anno[r + 1])]
        masked = np.zeros(L, bool)
        for j in range(0, len(seg), 2):
            masked[seg[j]:seg[j + 1]] = True
        want = {p + k - 1 for p in range(L - k + 1)
                if not masked[p:p + k].any()}
        got = set(rpos[read == r].tolist())
        assert got == want


def test_scratch_reuse_identical(tmp_path):
    """Recycled scratch buffers must not leak state between builds."""
    db1 = _make_db(tmp_path, seed=21)
    db2 = _make_db(tmp_path, seed=22, nreads=7)   # overwrites x.db; smaller
    if kmers._native_index(db1, 14) is None:
        pytest.skip("native kmer builder unavailable")
    scratch = {}
    a1 = kmers.sort_kmers(db1, 14, 0, scratch=scratch)
    a1_codes = a1.code.copy()
    a2 = kmers.sort_kmers(db2, 14, 0, scratch=scratch)
    fresh = kmers.sort_kmers(db2, 14, 0)
    assert np.array_equal(a2.code, fresh.code)
    assert np.array_equal(a2.read, fresh.read)
    assert np.array_equal(a2.rpos, fresh.rpos)
    # rebuilding db1 into the same scratch reproduces the original
    b1 = kmers.sort_kmers(db1, 14, 0, scratch=scratch)
    assert np.array_equal(b1.code, a1_codes)


@pytest.mark.parametrize("kmer", [28, 20])
def test_pair_radix_path_matches_python(tmp_path, monkeypatch, kmer):
    """k=28 -> idx_bits=8, so any real index exceeds the rank-packing bound
    and takes the (key, payload) pair radix; must equal the python sort."""
    db = _make_db(tmp_path, seed=31)
    _attach_mask(db, np.random.default_rng(7))
    nat = kmers._native_index(db, kmer)
    if nat is None:
        pytest.skip("native kmer builder unavailable")
    nat_idx = kmers.sort_kmers(db, kmer, 0)
    monkeypatch.setattr(kmers, "_native_index", lambda db, k, s=None: None)
    py_idx = kmers.sort_kmers(db, kmer, 0)
    assert np.array_equal(nat_idx.code, py_idx.code)
    assert np.array_equal(nat_idx.read, py_idx.read)
    assert np.array_equal(nat_idx.rpos, py_idx.rpos)


def test_locate_ranges_matches_searchsorted():
    from damapper_tpu.ops import seeds
    rng = np.random.default_rng(13)
    keys = np.sort(rng.integers(0, 500, 10_000).astype(np.uint64))
    q = np.unique(rng.integers(0, 520, 300).astype(np.uint64))
    lo, hi = seeds._locate_ranges(keys, q)
    assert np.array_equal(lo, np.searchsorted(keys, q, side="left"))
    assert np.array_equal(hi, np.searchsorted(keys, q, side="right"))
