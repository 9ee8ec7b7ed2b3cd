import numpy as np
import pytest

from damapper_tpu.io import db as dbio
from damapper_tpu.io import fasta
from tests import helpers


def test_2bit_roundtrip():
    rng = np.random.default_rng(0)
    for n in [1, 2, 3, 4, 5, 17, 1000]:
        num = rng.integers(0, 4, n).astype(np.uint8)
        assert np.array_equal(dbio.uncompress_bases(dbio.compress_bases(num), n), num)


def test_seq_numeric_roundtrip():
    s = "ACGTacgtTTTA"
    num = dbio.seq_to_numeric(s)
    assert dbio.numeric_to_seq(num, upper=True) == s.upper()


def test_stub_roundtrip(tmp_path):
    stub = dbio.DBStub(nfiles=1, nreads=[10], fname=["x"], prolog=["p"],
                       all=1, cutoff=0, bsize=123456, nblocks=2,
                       ublocks=[0, 5, 10], tblocks=[0, 5, 10])
    p = str(tmp_path / "x.db")
    dbio.write_stub(p, stub)
    got = dbio.read_stub(p)
    assert got == stub


def test_create_open_dam(tmp_path):
    genome, reads = helpers.sim_dataset(seed=1, glen=5000, nreads=3)
    entries = [fasta.FastaEntry("chr1", genome[:3000]),
               fasta.FastaEntry("chr2", genome[3000:])]
    dam = str(tmp_path / "ref.dam")
    dbio.create_dam(dam, entries, bsize=10**9)
    db = dbio.DazzDB.open(dam)
    assert db.isdam and db.nreads == 2
    assert db.totlen == 5000 and db.maxlen == 3000
    db.trim()
    db.load_bases()
    assert dbio.numeric_to_seq(db.read_seq(0), upper=True) == genome[:3000]
    assert dbio.numeric_to_seq(db.read_seq(1), upper=True) == genome[3000:]
    # sentinels
    assert db.seq[0] == 4
    assert db.seq[int(db.reads["boff"][0]) + 3000] == 4


def test_dam_contig_split(tmp_path):
    entries = [fasta.FastaEntry("s", "ACGT" + "N" * 5 + "GGCC")]
    dam = str(tmp_path / "r.dam")
    dbio.create_dam(dam, entries)
    db = dbio.DazzDB.open(dam)
    assert db.nreads == 2
    assert list(db.reads["fpulse"]) == [0, 9]
    assert list(db.reads["origin"]) == [0, 1]


def test_create_open_db_blocks(tmp_path):
    genome, reads = helpers.sim_dataset(seed=2, glen=20000, nreads=8)
    entries = [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)]
    p = str(tmp_path / "reads.db")
    dbio.create_db(p, entries, bsize=20000)
    stub = dbio.read_stub(p)
    assert stub.nblocks >= 1
    whole = dbio.DazzDB.open(p)
    assert whole.nreads == 8
    # open block 1
    b1 = dbio.DazzDB.open(str(tmp_path / "reads.1"))
    assert b1.part == 1
    assert b1.nreads == stub.ublocks[1] - stub.ublocks[0]
    b1.load_bases()
    assert dbio.numeric_to_seq(b1.read_seq(0), upper=True) == reads[0].upper()


def test_trim(tmp_path):
    entries = [fasta.FastaEntry("a", "ACGT" * 100),      # 400
               fasta.FastaEntry("b", "AC" * 10),         # 20
               fasta.FastaEntry("c", "GT" * 300)]        # 600
    p = str(tmp_path / "t.db")
    dbio.create_db(p, entries, cutoff=100)
    db = dbio.DazzDB.open(p)
    assert db.cutoff == 100
    db.trim()
    assert db.nreads == 2
    assert db.totlen == 1000


def test_complement_inplace(tmp_path):
    entries = [fasta.FastaEntry("a", "AACGTT"), fasta.FastaEntry("b", "GGGT")]
    p = str(tmp_path / "c.db")
    dbio.create_db(p, entries)
    db = dbio.DazzDB.open(p)
    db.trim()
    db.load_bases()
    db.complement_inplace()
    assert dbio.numeric_to_seq(db.read_seq(0), upper=True) == "AACGTT"  # palindrome
    assert dbio.numeric_to_seq(db.read_seq(1), upper=True) == "ACCC"


def test_reference_binary_accepts_our_db(tmp_path):
    """The reference damapper must be able to open and map DBs we write."""
    genome, reads = helpers.sim_dataset(seed=3, glen=50000, nreads=20)
    dbio.create_dam(str(tmp_path / "ref.dam"),
                    [fasta.FastaEntry("genome", genome)])
    dbio.create_db(str(tmp_path / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)])
    out = helpers.run_reference_damapper(tmp_path, "ref.dam", "reads.db",
                                         ["-k16", "-T1"])
    assert out.exists()
    from damapper_tpu.io import las as lasio
    recs, tspace = lasio.read_las(str(out))
    assert tspace == 100
    assert len(recs) > 0, "reference found no alignments on our DBs"
    assert lasio.check_las(str(out)) == []
    # most reads should be mapped
    mapped = {o.aread for o in recs}
    assert len(mapped) >= 15


def test_arrow_pseudo_track(tmp_path):
    """Round-trip the .arw pulse-width companion (Open/Load_Arrow
    DB.c:1458-1647)."""
    import numpy as np
    import pytest
    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta

    rng = np.random.default_rng(9)
    entries = []
    pulses = []
    for i in range(5):
        n = int(rng.integers(50, 300))
        entries.append(fasta.FastaEntry(
            f"r{i}", "".join("ACGT"[c] for c in rng.integers(0, 4, n))))
        pulses.append(rng.integers(0, 4, n).astype(np.uint8))
    path = str(tmp_path / "reads.db")
    dbio.create_db(path, entries)
    dbio.write_arrow(path, pulses)

    db = dbio.DazzDB.open(path)
    assert db.allarr & dbio.DB_ARROW
    tr = dbio.open_arrow(db)
    for i, pw in enumerate(pulses):
        got = tr.load(i)
        assert np.array_equal(got, pw)
        s = tr.load(i, ascii=True)
        assert s == dbio.letter_arrow(pw)
    tr.close()

    allp = dbio.load_all_arrows(db)
    for got, pw in zip(allp, pulses):
        assert np.array_equal(got, pw)

    # the reference refuses arrow access after trimming (NB: trim() is a
    # no-op for cutoff<=0 all-wells DBs, Trim_DB DB.c:916, so force it)
    db.trimmed = True
    with pytest.raises(ValueError):
        dbio.open_arrow(db)


def test_dbsplit_repartition(tmp_path):
    """DBsplit equivalent: re-partition with new -s/-x and map correctly
    against the new block structure."""
    import numpy as np
    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta
    from tests import helpers

    rng = np.random.default_rng(31)
    genome = helpers.sim_genome(rng, 60_000)
    entries = [fasta.FastaEntry(f"c{i}", genome[i * 20_000:(i + 1) * 20_000])
               for i in range(3)]
    path = str(tmp_path / "ref.dam")
    dbio.create_dam(path, entries, bsize=200_000_000)
    assert dbio.read_stub(path).nblocks == 1
    n = dbio.dbsplit(path, bsize=25_000)
    # blocks fill until >= bsize: [c0,c1][c2] (DBsplit accumulate rule)
    assert n == dbio.read_stub(path).nblocks == 2
    # cutoff repartition drops short contigs from the trimmed view
    entries2 = entries + [fasta.FastaEntry("tiny", genome[:900])]
    path2 = str(tmp_path / "ref2.dam")
    dbio.create_dam(path2, entries2, bsize=200_000_000)
    dbio.dbsplit(path2, bsize=25_000, cutoff=1000)
    db = dbio.DazzDB.open(path2)
    db.trim()
    assert db.nreads == 3


def test_dbshow_fasta(tmp_path, capsys):
    import numpy as np
    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta
    from tests import helpers

    rng = np.random.default_rng(32)
    seqs = [helpers.sim_genome(rng, 130) for _ in range(3)]
    path = str(tmp_path / "r.db")
    dbio.create_db(path, [fasta.FastaEntry(f"r{i}", s)
                          for i, s in enumerate(seqs)])
    import io as _io
    buf = _io.StringIO()
    dbio.dbshow(path, [2], width=60, out=buf)
    out = buf.getvalue().splitlines()
    assert out[0].startswith(">")
    assert "".join(out[1:]) == seqs[1].lower()
