"""Tests for exact trace computation (damapper_tpu.ops.trace).

Validity oracle: decode the emitted indel script into a column-by-column
alignment (the same walk Print_Alignment does, reference align.c:3336) and
check endpoints, monotonicity, and difference counts; edit distances are
cross-checked against a plain O(nm) Levenshtein DP.
"""

import numpy as np
import pytest

from damapper_tpu.io import db as dbio
from damapper_tpu.ops import trace as T
from damapper_tpu.ops.wave import PathRec
from tests import helpers


def levenshtein(a, b):
    n, m = len(a), len(b)
    prev = np.arange(m + 1)
    for i in range(1, n + 1):
        cur = np.empty(m + 1, np.int64)
        cur[0] = i
        sub = prev[:-1] + (b != a[i - 1])
        for j in range(1, m + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[m])


def decode_script(aseq, bseq, path):
    """Walk the indel script; return (#columns, #diffs) and assert the
    alignment is structurally valid (align.h:79-87 encoding)."""
    i = path.abpos + 1          # 1-based next A position
    j = path.bbpos + 1
    diffs = 0
    cols = 0

    def pair():
        nonlocal i, j, diffs, cols
        assert i <= path.aepos and j <= path.bepos, "pair out of range"
        if aseq[i - 1] != bseq[j - 1]:
            diffs += 1
        i += 1
        j += 1
        cols += 1

    for c in path.trace:
        if c < 0:
            k = -c
            assert k >= i, f"A-dash position {k} behind cursor {i}"
            while i < k:
                pair()
            # dash before A[k]: consume one B char
            assert j <= path.bepos
            j += 1
            diffs += 1
            cols += 1
        else:
            assert c >= j, f"B-dash position {c} behind cursor {j}"
            while j < c:
                pair()
            assert i <= path.aepos
            i += 1
            diffs += 1
            cols += 1
    while i <= path.aepos:
        pair()
    assert i - 1 == path.aepos and j - 1 == path.bepos, \
        f"script endpoint mismatch: ({i - 1},{j - 1}) vs " \
        f"({path.aepos},{path.bepos})"
    return cols, diffs


def sim_pair(rng, n=300, err=0.15):
    g = helpers.sim_genome(rng, n)
    r, *_ = helpers.sim_read(rng, g, min_len=n - 1, max_len=n - 1, err=err)
    # sim_read may complement; use the raw fragment instead
    a = dbio.seq_to_numeric(g)
    out = []
    for ch in g:
        x = rng.random()
        if x < err:
            e = rng.random()
            if e < .5:
                out.append("ACGT"[rng.integers(0, 4)])
                out.append(ch)
            elif e < .75:
                pass
            else:
                out.append("ACGT"[("ACGT".index(ch) + 1) % 4])
        else:
            out.append(ch)
    b = dbio.seq_to_numeric("".join(out))
    return a, b


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("mode", [T.GREEDIEST, T.UPPERMOST, T.LOWERMOST])
def test_iter_np_optimal_and_valid(seed, mode):
    rng = np.random.default_rng(seed)
    a, b = sim_pair(rng, n=120)
    out = []
    dmax = max(len(a), len(b))
    d = T.iter_np(a, b, 0, 0, mode, dmax, out)
    path = PathRec(abpos=0, bbpos=0, aepos=len(a), bepos=len(b))
    path.trace = out
    path.diffs = d
    _, diffs = decode_script(a, b, path)
    assert diffs == d
    assert d == levenshtein(a, b)


def test_iter_np_dmax_exceeded():
    rng = np.random.default_rng(7)
    a = rng.integers(0, 2, 60).astype(np.uint8)
    b = 3 - a        # every position differs
    with pytest.raises(T.TraceError):
        T.iter_np(a, b, 0, 0, T.GREEDIEST, 4, [])


@pytest.mark.parametrize("mode", [T.GREEDIEST, T.UPPERMOST, T.LOWERMOST])
def test_compute_trace_pts_from_pipeline(golden_small, mode):
    """Recompute exact traces for real pipeline .las records."""
    reads_db, ref_db, recs, tspace = golden_small
    checked = 0
    for o in recs[:8]:
        aseq = reads_db.read_seq(o.aread)       # damapper: A record = read
        bseq = ref_db.read_seq(o.bread)
        if o.flags & 0x1:                       # COMP: B coords are on rc
            bseq = dbio.complement_numeric(bseq)
        path = PathRec(abpos=o.abpos, bbpos=o.bbpos,
                       aepos=o.aepos, bepos=o.bepos)
        path.trace = [int(v) for v in o.trace]
        T.compute_trace_pts(path, aseq, bseq, tspace, mode)
        _, diffs = decode_script(aseq, bseq, path)
        assert diffs == path.diffs
        checked += 1
    assert checked


@pytest.mark.parametrize("seed", [0, 3])
def test_compute_alignment_tasks(seed):
    rng = np.random.default_rng(100 + seed)
    a, b = sim_pair(rng, n=240)
    lev = levenshtein(a, b)

    path = PathRec(abpos=3, bbpos=2, aepos=len(a) - 2, bepos=len(b) - 1)
    sub_lev = levenshtein(a[3:len(a) - 2], b[2:len(b) - 1])

    work = T.AlignWork()
    T.compute_alignment(path, a, b, T.DIFF_ONLY, 100, work)
    assert path.diffs == sub_lev

    # PLUS_ALIGN reuses the DIFF_ONLY midpoint
    T.compute_alignment(path, a, b, T.PLUS_ALIGN, 100, work)
    _, diffs = decode_script(a, b, path)
    assert diffs == sub_lev

    # DIFF_ALIGN from scratch
    path2 = PathRec(abpos=3, bbpos=2, aepos=len(a) - 2, bepos=len(b) - 1)
    T.compute_alignment(path2, a, b, T.DIFF_ALIGN, 100)
    assert path2.diffs == sub_lev
    _, diffs = decode_script(a, b, path2)
    assert diffs == sub_lev

    # DIFF_TRACE emits (diff, b) trace-point pairs that sum correctly
    path3 = PathRec(abpos=3, bbpos=2, aepos=len(a) - 2, bepos=len(b) - 1)
    T.compute_alignment(path3, a, b, T.DIFF_TRACE, 100)
    assert path3.diffs == sub_lev
    tr = path3.trace
    assert sum(tr[1::2]) == path3.bepos - path3.bbpos
    assert sum(tr[0::2]) >= sub_lev

    # the trace points must round-trip through compute_trace_irr-style
    # segment alignment: each segment must be alignable
    path4 = PathRec(abpos=3, bbpos=2, aepos=len(a) - 2, bepos=len(b) - 1)
    path4.trace = tr
    T.compute_trace_pts(path4, a, b, 100, T.GREEDIEST)
    _, diffs = decode_script(a, b, path4)
    assert diffs == path4.diffs


def test_compute_trace_mid_valid(golden_small):
    reads_db, ref_db, recs, tspace = golden_small
    o = recs[0]
    aseq = reads_db.read_seq(o.aread)
    bseq = ref_db.read_seq(o.bread)
    if o.flags & 0x1:
        bseq = dbio.complement_numeric(bseq)
    path = PathRec(abpos=o.abpos, bbpos=o.bbpos,
                   aepos=o.aepos, bepos=o.bepos)
    path.trace = [int(v) for v in o.trace]
    ptsd = T.compute_trace_pts(
        PathRec(abpos=o.abpos, bbpos=o.bbpos, aepos=o.aepos, bepos=o.bepos,
                trace=[int(v) for v in o.trace]),
        aseq, bseq, tspace, T.GREEDIEST).diffs
    T.compute_trace_mid(path, aseq, bseq, tspace, T.GREEDIEST)
    _, diffs = decode_script(aseq, bseq, path)
    assert diffs == path.diffs
    # MID is near-optimal: never worse than 1.2x PTS on this data
    assert path.diffs <= ptsd * 1.2 + 2
