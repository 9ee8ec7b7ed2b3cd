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
