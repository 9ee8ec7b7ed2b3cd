"""Tests for the gap improver (Gap_Improver equivalent)."""

import numpy as np
import pytest

from damapper_tpu.io import db as dbio
from damapper_tpu.ops import trace as T
from damapper_tpu.ops.gap import gap_improver
from damapper_tpu.ops.wave import COMP_FLAG, PathRec
from tests.test_trace import decode_script, levenshtein


def gap_metric(path):
    """#gap groups + #substitutions: the cost Gap_Improver minimizes
    (its DP passes count, align.c:5754 'passes < Gaps+Hamm')."""
    groups = 0
    prev = None
    for v in path.trace:
        if v != prev:
            groups += 1
            prev = v
    subs = path.diffs - len(path.trace)
    return groups + subs


def test_gap_improver_consolidates_scattered_gaps():
    """Construct a case where the greedy O(np) trace scatters an indel pair
    that a diagonal shift would merge; the improver must not worsen it."""
    rng = np.random.default_rng(5)
    a = rng.integers(0, 4, 200).astype(np.uint8)
    # b: insert 2bp at 50, delete 2bp at 60 -> nearby opposite gaps
    b = np.concatenate([a[:50], rng.integers(0, 4, 2).astype(np.uint8),
                        a[50:60], a[62:]])
    out = []
    d = T.iter_np(a, b, 0, 0, T.GREEDIEST, 50, out)
    path = PathRec(abpos=0, bbpos=0, aepos=len(a), bepos=len(b))
    path.trace = out
    path.diffs = d
    before = gap_metric(path)
    gap_improver(a, b, path)
    _, diffs = decode_script(a, b, path)
    assert diffs == path.diffs
    assert gap_metric(path) <= before


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_gap_improver_keeps_validity_random(seed):
    rng = np.random.default_rng(200 + seed)
    from tests.test_trace import sim_pair
    a, b = sim_pair(rng, n=400, err=0.2)
    out = []
    d = T.iter_np(a, b, 0, 0, T.GREEDIEST, max(len(a), len(b)), out)
    path = PathRec(abpos=0, bbpos=0, aepos=len(a), bepos=len(b))
    path.trace = out
    path.diffs = d
    before = gap_metric(path)
    gap_improver(a, b, path)
    _, diffs = decode_script(a, b, path)
    assert diffs == path.diffs
    # the consolidation metric (gap groups + substitutions) never worsens
    assert gap_metric(path) <= before


def test_gap_improver_on_pipeline_traces(golden_small):
    reads_db, ref_db, recs, tspace = golden_small
    for o in recs[:6]:
        aseq = reads_db.read_seq(o.aread)
        bseq = ref_db.read_seq(o.bread)
        if o.flags & COMP_FLAG:
            bseq = dbio.complement_numeric(bseq)
        path = PathRec(abpos=o.abpos, bbpos=o.bbpos, aepos=o.aepos,
                       bepos=o.bepos, trace=[int(v) for v in o.trace])
        T.compute_trace_pts(path, aseq, bseq, tspace, T.GREEDIEST)
        before = gap_metric(path)
        gap_improver(aseq, bseq, path)
        _, diffs = decode_script(aseq, bseq, path)
        assert diffs == path.diffs
        assert gap_metric(path) <= before
