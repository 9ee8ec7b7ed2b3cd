import numpy as np

from damapper_tpu.io import las as lasio


def _mk(aread, bread, abpos, aepos, bbpos, bepos, flags=0, tr=()):
    return lasio.LA(aread, bread, flags, abpos, aepos, bbpos, bepos,
                    diffs=sum(tr[0::2]), trace=np.array(tr, np.int32))


def test_las_roundtrip(tmp_path):
    recs = [
        _mk(0, 1, 5, 210, 3, 198, lasio.START_FLAG | lasio.BEST_FLAG,
            (4, 95, 7, 100)),
        _mk(0, 1, 220, 300, 210, 290, lasio.NEXT_FLAG, (6, 80)),
        _mk(2, 0, 0, 90, 10, 100, lasio.START_FLAG | lasio.COMP_FLAG, (5, 90)),
    ]
    p = str(tmp_path / "x.las")
    lasio.write_las(p, recs, 100)
    got, tspace = lasio.read_las(p)
    assert tspace == 100
    assert lasio.las_equal(recs, got)


def test_las_roundtrip_16bit(tmp_path):
    recs = [_mk(0, 1, 5, 400, 3, 390, lasio.START_FLAG, (300, 387))]
    p = str(tmp_path / "w.las")
    lasio.write_las(p, recs, 400)  # tspace > 125 -> 16-bit traces
    got, tspace = lasio.read_las(p)
    assert got[0].trace.tolist() == [300, 387]


def test_sort_chain_preserving(tmp_path):
    c1a = _mk(1, 5, 50, 100, 0, 50, lasio.START_FLAG)
    c1b = _mk(1, 5, 110, 200, 60, 150, lasio.NEXT_FLAG)
    c2 = _mk(1, 3, 10, 40, 0, 30, lasio.START_FLAG)
    c3 = _mk(0, 9, 0, 40, 0, 30, lasio.START_FLAG)
    out = lasio.sort_las([c1a, c1b, c2, c3], map_order=True)
    assert [o.aread for o in out] == [0, 1, 1, 1]
    assert out[1] is c2 and out[2] is c1a and out[3] is c1b
    # pile order: aread, then bread
    out = lasio.sort_las([c1a, c1b, c2, c3], map_order=False)
    assert out[1] is c2 and out[2] is c1a


def test_check_las(tmp_path):
    # abpos=5, aepos=210, tspace=100 -> interior points at 100,200 -> 3 segments
    good = lasio.LA(0, 0, lasio.START_FLAG, 5, 210, 3, 206, diffs=12,
                    trace=np.array([4, 95, 7, 100, 1, 8], np.int32))
    p = str(tmp_path / "g.las")
    lasio.write_las(p, [good], 100)
    assert lasio.check_las(p) == []
    bad = lasio.LA(0, 0, lasio.START_FLAG, 5, 210, 3, 207, diffs=12,
                   trace=np.array([4, 95, 7, 100, 1, 8], np.int32))
    lasio.write_las(p, [bad], 100)
    assert lasio.check_las(p) != []


def test_extra_records_roundtrip(tmp_path):
    """EXTRA metadata records (DB.c:2148-2322): write/read round-trip and
    the EXACT/SUM reduction semantics across block files."""
    import numpy as np
    from damapper_tpu.io.tracks import (DB_EXACT, DB_SUM, DazzExtra,
                                        read_all_extras, read_extra,
                                        write_extra)

    p = tmp_path / ".test.trk.anno"
    payload = b"\x01\x02\x03\x04"       # stand-in anno body
    e1 = DazzExtra("coverage", [40], accum=DB_SUM)
    e2 = DazzExtra("params", [1.5, -2.25], accum=DB_EXACT)
    with open(p, "wb") as fp:
        fp.write(payload)
        write_extra(fp, e1)
        write_extra(fp, e2)
    got = read_all_extras(str(p), len(payload))
    assert got == [e1, e2]
    assert got[1].vtype == 1            # DB_REAL inferred

    # reduction: SUM accumulates, EXACT must agree
    with open(p, "rb") as fp:
        fp.seek(len(payload))
        acc = read_extra(fp)
        read_extra(fp)
    with open(p, "rb") as fp:
        fp.seek(len(payload))
        acc = read_extra(fp, into=acc)
    assert list(acc.value) == [80]

    bad = DazzExtra("params", [9.0, 9.0], accum=DB_EXACT)
    with open(p, "wb") as fp:
        write_extra(fp, bad)
    with open(p, "rb") as fp:
        try:
            read_extra(fp, into=e2)
            assert False, "EXACT mismatch must raise"
        except ValueError as ex:
            assert "does not agree" in str(ex)


def test_truncated_files_fail_fast(tmp_path):
    """Guarded batch I/O (FFREAD discipline DB.h:136-224): truncated .las
    and .idx files must raise corruption errors, not yield partial data."""
    import numpy as np
    import pytest
    from damapper_tpu.io import db as dbio, fasta
    from damapper_tpu.io import las as lasio
    from tests import helpers

    rng = np.random.default_rng(8)
    reads = [helpers.sim_genome(rng, 2000) for _ in range(3)]
    dbio.create_db(str(tmp_path / "rd.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)])

    # truncated .las: header-only, then mid-record
    recs = [lasio.LA(0, 0, 0, 0, 100, 0, 100, 5,
                     np.array([5, 100], np.int32))]
    p = tmp_path / "x.las"
    lasio.write_las(str(p), recs, 100)
    raw = p.read_bytes()
    for cut in (8, 20, len(raw) - 1):
        p.write_bytes(raw[:cut])
        with pytest.raises(IOError):
            lasio.read_las(str(p))

    # truncated .idx: drop the tail of the read records
    idx = tmp_path / ".rd.idx"
    iraw = idx.read_bytes()
    idx.write_bytes(iraw[:len(iraw) - 16])
    with pytest.raises(IOError):
        dbio.DazzDB.open(str(tmp_path / "rd.db"))
