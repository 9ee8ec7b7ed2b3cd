"""Tests for the alignment display module (LAshow equivalent)."""

import io

import numpy as np

from damapper_tpu.io import db as dbio
from damapper_tpu.io.display import (Alignment, alignment_cartoon,
                                     flip_alignment, print_alignment)
from damapper_tpu.ops import trace as T
from damapper_tpu.ops.wave import COMP_FLAG, PathRec


def _aln_from_rec(reads_db, ref_db, o, tspace, exact=True):
    aseq = reads_db.read_seq(o.aread)
    bseq = ref_db.read_seq(o.bread)
    if o.flags & COMP_FLAG:
        bseq = dbio.complement_numeric(bseq)
    path = PathRec(abpos=o.abpos, bbpos=o.bbpos, aepos=o.aepos,
                   bepos=o.bepos, trace=[int(v) for v in o.trace])
    path.diffs = o.diffs
    if exact:
        T.compute_trace_pts(path, aseq, bseq, tspace, T.GREEDIEST)
    return Alignment(aseq, bseq, len(aseq), len(bseq), path, o.flags)


def test_print_alignment_rows_consistent(golden_small):
    reads_db, ref_db, recs, tspace = golden_small
    aln = _aln_from_rec(reads_db, ref_db, recs[0], tspace)
    buf = io.StringIO()
    print_alignment(buf, aln, indent=2, width=80, border=8, coord=7)
    text = buf.getvalue()
    lines = text.split("\n")
    body = [ln for ln in lines if "|" in ln]
    assert body, "no alignment body emitted"
    # every match-glyph row draws only from the diff alphabet
    for ln in body:
        assert set(ln.strip()) <= set("|*:[] "), f"bad diff glyphs: {ln!r}"
    # blocks come as (A, D, B+percent) triples: the row after each D row is
    # the B row ending in a percentage
    for i, ln in enumerate(lines):
        if ln in body and i + 1 < len(lines):
            assert lines[i + 1].rstrip().endswith("%")
    # the open bracket appears iff BOTH sides have left context (the C's
    # prefb survives the prefix loops only when prefa matched it)
    assert ("[" in text) == (aln.path.abpos > 0 and aln.path.bbpos > 0)
    assert sum(1 for ch in text if ch in "acgt") > 0


def test_print_alignment_percent_matches_diffs(golden_small):
    reads_db, ref_db, recs, tspace = golden_small
    o = recs[0]
    aln = _aln_from_rec(reads_db, ref_db, o, tspace)
    buf = io.StringIO()
    print_alignment(buf, aln, indent=0, width=10 ** 9, border=0, coord=0)
    text = buf.getvalue()
    pct = float(text.strip().rsplit(" ", 1)[-1].rstrip("%"))
    # single row => percent over the whole alignment
    d = aln.path.diffs
    cols_a = aln.path.aepos - aln.path.abpos
    cols_b = aln.path.bepos - aln.path.bbpos
    # diffs = subs + indels; matches = cols - ...; recompute directly
    # rough check: percent in (0, 40) for 15% sim error data
    assert 0 < pct < 40


def test_cartoon_shape(golden_small):
    reads_db, ref_db, recs, tspace = golden_small
    for o in recs[:4]:
        aln = _aln_from_rec(reads_db, ref_db, o, tspace, exact=False)
        buf = io.StringIO()
        alignment_cartoon(buf, aln, 2, 8)
        out = buf.getvalue()
        assert "A " in out and "B " in out
        assert "dif/(len1+len2)" in out
        assert (">" in out) or ("<" in out)
        if o.flags & COMP_FLAG:
            assert "<" in out


def test_flip_alignment_all_records(golden_small):
    """Flipped scripts must decode exactly for both orientations (comp
    records additionally need both sequences complemented, align.h:112)."""
    from tests.test_trace import decode_script
    reads_db, ref_db, recs, tspace = golden_small
    for o in recs:
        aln = _aln_from_rec(reads_db, ref_db, o, tspace)
        d0 = aln.path.diffs
        flip_alignment(aln, True)
        if o.flags & COMP_FLAG:
            aln.aseq = dbio.complement_numeric(aln.aseq)
            aln.bseq = dbio.complement_numeric(aln.bseq)
        _, diffs = decode_script(aln.aseq, aln.bseq, aln.path)
        assert diffs == d0


def test_flip_alignment_roundtrip(golden_small):
    reads_db, ref_db, recs, tspace = golden_small
    o = recs[0]
    aln = _aln_from_rec(reads_db, ref_db, o, tspace)
    orig = (aln.path.abpos, aln.path.bbpos, aln.path.aepos, aln.path.bepos,
            list(aln.path.trace))
    flip_alignment(aln, True)
    flip_alignment(aln, True)
    got = (aln.path.abpos, aln.path.bbpos, aln.path.aepos, aln.path.bepos,
           list(aln.path.trace))
    assert got == orig
