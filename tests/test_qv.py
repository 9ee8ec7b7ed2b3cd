"""Round-trip tests for the QV Huffman codec + .qvs pseudo-track."""

import io

import numpy as np
import pytest

from damapper_tpu.io import qv


def sim_entry(rng, rlen, delchar=7, subchar=12):
    """Simulate PacBio-like QV streams: skewed distributions with dominant
    deletion/substitution values and 'n' tags at delchar positions."""
    del_qv = np.minimum(rng.geometric(0.25, rlen) + delchar - 1,
                        50).astype(np.uint8)
    is_run = rng.random(rlen) < 0.6
    del_qv[is_run] = delchar
    del_tag = rng.choice(np.frombuffer(b"acgt", np.uint8), rlen)
    del_tag[del_qv == delchar] = ord("n")
    ins_qv = np.minimum(rng.geometric(0.2, rlen), 60).astype(np.uint8)
    mrg_qv = np.minimum(rng.geometric(0.3, rlen) + 3, 40).astype(np.uint8)
    sub_qv = np.minimum(rng.geometric(0.25, rlen), 45).astype(np.uint8)
    sub_qv[rng.random(rlen) < 0.7] = subchar
    return del_qv, del_tag, ins_qv, mrg_qv, sub_qv


def test_bitstream_roundtrip():
    rng = np.random.default_rng(0)
    hist = np.zeros(256, np.int64)
    data = rng.choice([3, 7, 7, 7, 12, 12, 200], 5000).astype(np.uint8)
    np.add.at(hist, data, 1)
    s = qv.make_scheme(hist)
    w = qv.BitWriter()
    qv.encode(s, data, w)
    buf = w.finish()
    rd = qv.BitReader(io.BytesIO(buf))
    got = qv.decode(s, rd, len(data))
    assert np.array_equal(got, data)


def test_escape_codes_roundtrip():
    """A near-degenerate histogram forces codes past HUFF_CUTOFF and the
    255-escape path."""
    rng = np.random.default_rng(1)
    hist = np.zeros(256, np.int64)
    # exponential degeneracy: symbol i has count 2^i-ish -> very long codes
    for i in range(30):
        hist[i] = 1 << i
    hist[255] = 1
    s = qv.make_scheme(hist)
    assert s.type == 2
    data = rng.choice(np.arange(30), 2000).astype(np.uint8)
    data[100] = 255
    w = qv.BitWriter()
    qv.encode(s, data, w)
    rd = qv.BitReader(io.BytesIO(w.finish()))
    assert np.array_equal(qv.decode(s, rd, len(data)), data)


def test_run_encoding_roundtrip():
    rng = np.random.default_rng(2)
    data = np.full(4000, 9, np.uint8)
    mask = rng.random(4000) < 0.1
    data[mask] = rng.integers(0, 30, mask.sum())
    # include a run longer than 255 to hit the 16-bit escape
    data[1000:1400] = 9
    hist = np.zeros(256, np.int64)
    np.add.at(hist, data[data != 9], 1)
    hist[0] += 1
    run_hist = np.ones(256, np.int64)
    s = qv.make_scheme(hist)
    r = qv.make_scheme(run_hist)
    w = qv.BitWriter()
    qv.encode_run(s, r, data, 9, w)
    rd = qv.BitReader(io.BytesIO(w.finish()))
    got = qv.decode_run(s, r, rd, len(data), 9)
    assert np.array_equal(got, data)


@pytest.mark.parametrize("lossy", [False, True])
def test_entry_roundtrip(lossy):
    rng = np.random.default_rng(3)
    entries = [sim_entry(rng, int(rng.integers(500, 3000)))
               for _ in range(20)]
    sc = qv.QVScanner()
    for e in entries:
        sc.scan(*e)
    coding = sc.create(lossy=lossy, prefix="@Sim")
    assert coding.delChar >= 0        # 'n' tags present -> run coding on

    buf = io.BytesIO()
    offs = []
    for e in entries:
        offs.append(buf.tell())
        qv.compress_entry(buf, coding, *e, lossy=lossy)
    raw = buf.getvalue()
    total = sum(len(e[0]) for e in entries)
    assert len(raw) < total * 5       # compresses the 5 streams

    buf.seek(0)
    for e, off in zip(entries, offs):
        buf.seek(off)
        d, t, i, m, s = qv.uncompress_entry(buf, coding, len(e[0]))
        assert np.array_equal(d, e[0])
        assert np.array_equal(t, e[1])
        if lossy:
            assert np.array_equal(i, (e[2] >> 1) << 1)
            assert np.array_equal(m, (e[3] >> 2) << 2)
        else:
            assert np.array_equal(i, e[2])
            assert np.array_equal(m, e[3])
        assert np.array_equal(s, e[4])


def test_coding_serialization_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    entries = [sim_entry(rng, 1500) for _ in range(10)]
    sc = qv.QVScanner()
    for e in entries:
        sc.scan(*e)
    coding = sc.create(prefix="@Movie/1")
    p = tmp_path / "coding.bin"
    with open(p, "wb") as fp:
        qv.write_qvcoding(fp, coding)
    with open(p, "rb") as fp:
        c2 = qv.read_qvcoding(fp)
    assert c2.delChar == coding.delChar
    assert c2.subChar == coding.subChar
    assert c2.prefix == coding.prefix
    for a, b in ((coding.delScheme, c2.delScheme),
                 (coding.insScheme, c2.insScheme),
                 (coding.mrgScheme, c2.mrgScheme),
                 (coding.subScheme, c2.subScheme)):
        assert a.type == b.type
        assert np.array_equal(a.codelens, b.codelens)
        assert np.array_equal(a.codebits, b.codebits)


def test_qvs_track_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    entries = [sim_entry(rng, int(rng.integers(800, 2500)))
               for _ in range(8)]
    root = str(tmp_path / "reads")
    offs = qv.write_qvs(root, entries)
    coding, fp = qv.open_qvs(root)
    try:
        for e, off in zip(entries, offs):
            d, t, i, m, s = qv.load_qventry(fp, coding, off, len(e[0]))
            assert np.array_equal(d, e[0])
            assert np.array_equal(t, e[1])
            assert np.array_equal(i, e[2])
            assert np.array_equal(m, e[3])
            assert np.array_equal(s, e[4])
    finally:
        fp.close()
