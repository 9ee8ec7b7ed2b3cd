"""Differential tests: Python wave oracle vs the reference Local_Alignment."""

import pathlib
import subprocess

import numpy as np
import pytest

from damapper_tpu.io import db as dbio
from damapper_tpu.ops import wave
from damapper_tpu.ops.spec import new_align_spec
from tests import helpers

REF = pathlib.Path("/root/reference")


def build_la_driver():
    helpers.BIN.mkdir(parents=True, exist_ok=True)
    exe = helpers.BIN / "la_driver"
    src = helpers.REPO / "tests" / "la_driver.c"
    if not exe.exists() or exe.stat().st_mtime < src.stat().st_mtime:
        subprocess.run(
            ["gcc", "-O2", "-Wno-unused-result", "-I", str(REF),
             "-o", str(exe), str(src),
             str(REF / "align.c"), str(REF / "DB.c"), str(REF / "QV.c"),
             "-lm", "-lpthread"],
            check=True, capture_output=True)
    return exe


def run_reference_la(spec_args, flags, low, hgh, anti, a_num, b_num):
    exe = build_la_driver()
    ave_corr, tspace, reach, freq = spec_args
    inp = "%g %d %d %g %g %g %g\n%d %d %d %d\n%s\n%s\n" % (
        ave_corr, tspace, int(reach), *freq, flags, low, hgh, anti,
        dbio.numeric_to_seq(a_num, upper=True),
        dbio.numeric_to_seq(b_num, upper=True))
    r = subprocess.run([str(exe)], input=inp, capture_output=True, text=True,
                       check=True)
    lines = r.stdout.splitlines()
    out = {}
    for i in (0, 2):
        tag, *vals = lines[i].split()
        trace = [int(x) for x in lines[i + 1].split()]
        abpos, bbpos, aepos, bepos, diffs, tlen = map(int, vals)
        assert len(trace) == tlen
        out[tag] = dict(abpos=abpos, bbpos=bbpos, aepos=aepos, bepos=bepos,
                        diffs=diffs, trace=trace)
    return out["A"], out["B"]


def _check_case(rng, glen, rlen, err, flags=0, tspace=100):
    genome = helpers.sim_genome(rng, glen)
    a_num = dbio.seq_to_numeric(genome)
    # b = noisy copy of a window of a
    start = int(rng.integers(0, glen - rlen))
    b_str, s, e, _ = None, start, start + rlen, None
    frag = genome[s:e]
    out = []
    truth = []  # positions in b matching positions in a
    bpos = 0
    for i, ch in enumerate(frag):
        r = rng.random()
        if r < err:
            t = rng.random()
            if t < 0.55:
                out.append("ACGT"[rng.integers(0, 4)])
                out.append(ch)
                truth.append((s + i, bpos + 1))
                bpos += 2
            elif t < 0.80:
                pass
            else:
                out.append("ACGT"[(("ACGT".index(ch)) + 1) % 4])
                bpos += 1
        else:
            out.append(ch)
            truth.append((s + i, bpos))
            bpos += 1
    b_num = dbio.seq_to_numeric("".join(out))

    if not truth:
        return
    apos, bp = truth[len(truth) // 2]
    apos += 1
    bp += 1
    if flags & wave.COMP_FLAG:
        # complement b; seed coords flip in b
        b_num = dbio.complement_numeric(b_num)
        bp = len(b_num) - bp
        # damapper never uses COMP this way for A-paths; skip coord fix
    diag = apos - bp
    anti = apos + bp

    freq = np.bincount(a_num, minlength=4)[:4] / len(a_num)
    spec_args = (0.85, tspace, True, tuple(freq))
    spec = new_align_spec(0.85, tspace, freq, True)

    ra, rb = run_reference_la(spec_args, flags, diag, diag, anti, a_num, b_num)
    pa, pb = wave.local_alignment(a_num, b_num, spec, diag, diag, anti,
                                  -1, -1, flags)

    got_a = dict(abpos=pa.abpos, bbpos=pa.bbpos, aepos=pa.aepos,
                 bepos=pa.bepos, diffs=pa.diffs, trace=list(pa.trace))
    got_b = dict(abpos=pb.abpos, bbpos=pb.bbpos, aepos=pb.aepos,
                 bepos=pb.bepos, diffs=pb.diffs, trace=list(pb.trace))
    assert got_a == ra, f"A path mismatch (seed diag={diag} anti={anti})"
    assert got_b == rb, f"B path mismatch (seed diag={diag} anti={anti})"


def test_spec_tables_match_reference_semantics():
    spec = new_align_spec(0.85, 100, [0.25, 0.25, 0.25, 0.25], True)
    # all-match window is suffix positive
    assert spec.table[0x7FFF] >= 0
    # all-mismatch is not
    assert spec.table[0] < 0
    assert spec.ave_path == int(60 * (1 - 1.0 * 0.15))


@pytest.mark.parametrize("seed", range(12))
def test_wave_matches_reference_random(seed):
    rng = np.random.default_rng(100 + seed)
    _check_case(rng, glen=8000, rlen=3000, err=0.15)


@pytest.mark.parametrize("seed", range(6))
def test_wave_matches_reference_low_error(seed):
    rng = np.random.default_rng(200 + seed)
    _check_case(rng, glen=5000, rlen=2500, err=0.05)


@pytest.mark.parametrize("seed", range(6))
def test_wave_matches_reference_boundary(seed):
    """Seeds near sequence boundaries exercise the 4-sentinel clipping and
    REACH logic."""
    rng = np.random.default_rng(300 + seed)
    _check_case(rng, glen=3000, rlen=2900, err=0.15)


@pytest.mark.parametrize("seed", range(4))
def test_wave_matches_reference_high_error(seed):
    """High error exercises early trim termination (TRIM_MLAG) and the
    fshort/rshort double-pass refinement."""
    rng = np.random.default_rng(400 + seed)
    _check_case(rng, glen=6000, rlen=2000, err=0.30)


@pytest.mark.parametrize("tspace", [50, 100, 126])
def test_wave_trace_spacings(tspace):
    rng = np.random.default_rng(77)
    _check_case(rng, glen=6000, rlen=2500, err=0.15, tspace=tspace)


def test_find_extension_prefix_suffix():
    """Find_Extension (align.c:3006): forward and reverse one-sided
    extensions from a mid-alignment anchor reconstruct the two halves of
    the full local alignment."""
    import numpy as np
    from damapper_tpu.io import db as dbio
    from damapper_tpu.ops.spec import new_align_spec
    from damapper_tpu.ops.wave import find_extension, local_alignment
    from tests import helpers

    rng = np.random.default_rng(77)
    genome = helpers.sim_genome(rng, 8000)
    a = dbio.seq_to_numeric(genome)
    # b: noisy copy of a window of a
    frag = genome[1000:5000]
    out = []
    for ch in frag:
        r = rng.random()
        if r < 0.12:
            e = rng.random()
            if e < 0.5:
                out.append("ACGT"[rng.integers(0, 4)])
                out.append(ch)
            elif e < 0.75:
                pass
            else:
                out.append("ACGT"[("ACGT".index(ch) + 1) % 4])
        else:
            out.append(ch)
    b = dbio.seq_to_numeric("".join(out))

    spec = new_align_spec(.85, 100, [.25, .25, .25, .25], True)
    # anchor on an exact 16-mer shared near the middle of b
    bpos = len(b) // 2
    apos = None
    while apos is None:
        kmer = b[bpos:bpos + 16].tobytes()
        hay = a.tobytes()
        idx = hay.find(kmer, 1000 + bpos - 400)
        if 0 <= idx <= 1000 + bpos + 400:
            apos = idx
        else:
            bpos += 7
    diag, anti = apos - bpos, apos + bpos

    suf = find_extension(a, b, spec, diag, anti, prefix=False)
    pre = find_extension(a, b, spec, diag, anti, prefix=True)

    assert (suf.abpos, suf.bbpos) == ((anti + diag) // 2, (anti - diag) // 2)
    assert (pre.aepos, pre.bepos) == ((anti + diag) // 2, (anti - diag) // 2)
    # the suffix must reach (close to) the end of b, the prefix its start
    assert suf.bepos > len(b) - 60
    assert pre.bbpos < 60
    # trace b-advances must sum to the aligned b span
    assert sum(suf.trace[1::2]) == suf.bepos - suf.bbpos
    assert sum(pre.trace[1::2]) == pre.bepos - pre.bbpos
    # stitched extensions cover what the two-sided Local_Alignment covers
    full, _ = local_alignment(a, b, spec, diag, diag, anti, -1, -1, 0)
    assert abs(pre.abpos - full.abpos) <= 120
    assert abs(suf.aepos - full.aepos) <= 120
