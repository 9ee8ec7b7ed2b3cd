"""Device-resident index/matching (ops.device_index) parity vs the host path.

The host path (ops.kmers / ops.seeds) is itself golden-tested against the
reference binary, so array equality here extends the same parity contract to
the device implementation.
"""

import numpy as np
import pytest

from damapper_tpu.io import db as dbio
from damapper_tpu.io import fasta
from damapper_tpu.ops import device_index as dix
from damapper_tpu.ops.kmers import sort_kmers
from damapper_tpu.ops.seeds import match_seeds
from tests import helpers


def make_dbs(tmp_path, seed=5, glen=30_000, nreads=8):
    rng = np.random.default_rng(seed)
    genome = helpers.sim_genome(rng, glen)
    entries = [fasta.FastaEntry("ctg0", genome[:glen // 2]),
               fasta.FastaEntry("ctg1", genome[glen // 2:])]
    reads = [helpers.sim_read(rng, genome, min_len=1500, max_len=4000)[0]
             for _ in range(nreads)]
    dbio.create_dam(str(tmp_path / "ref.dam"), entries, bsize=glen)
    dbio.create_db(str(tmp_path / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)])
    ref = dbio.DazzDB.open(str(tmp_path / "ref.dam"))
    ref.trim()
    ref.load_bases()
    rd = dbio.DazzDB.open(str(tmp_path / "reads.db"))
    rd.trim()
    rd.load_bases()
    return ref, rd


def assert_index_equal(dev: dix.DeviceKmerIndex, host, label=""):
    h = dev.to_host()
    assert len(h) == len(host), f"{label}: count {len(h)} != {len(host)}"
    np.testing.assert_array_equal(h.code, host.code, err_msg=label)
    np.testing.assert_array_equal(h.read, host.read, err_msg=label)
    np.testing.assert_array_equal(h.rpos, host.rpos, err_msg=label)


@pytest.mark.parametrize("kmer", [14, 20, 32])
def test_device_index_matches_host(tmp_path, kmer):
    ref, rd = make_dbs(tmp_path)
    for db, label in ((ref, "ref"), (rd, "reads")):
        dev = dix.device_sort_kmers(db, kmer)
        host = sort_kmers(db, kmer)
        assert_index_equal(dev, host, f"{label} k={kmer}")


def test_device_index_suppress(tmp_path):
    ref, rd = make_dbs(tmp_path, seed=7)
    for t in (2, 5):
        dev = dix.device_sort_kmers(rd, 12, suppress=t)
        host = sort_kmers(rd, 12, suppress=t)
        assert_index_equal(dev, host, f"-t{t}")


def test_device_index_complemented(tmp_path):
    ref, rd = make_dbs(tmp_path, seed=9)
    ref.complement_inplace()
    dev = dix.device_sort_kmers(ref, 20)
    host = sort_kmers(ref, 20)
    assert_index_equal(dev, host, "comp")


def test_device_match_matches_host(tmp_path):
    ref, rd = make_dbs(tmp_path, seed=11, glen=40_000, nreads=10)
    k = 16
    adev = dix.device_sort_kmers(rd, k)
    bdev = dix.device_sort_kmers(ref, k)
    ahost = sort_kmers(rd, k)
    bhost = sort_kmers(ref, k)
    for mem in (0, 1 << 34):
        hd = dix.device_match_seeds(adev, bdev, mem, 1000)
        hh = match_seeds(ahost, bhost, mem, 1000)
        assert len(hd) == len(hh)
        np.testing.assert_array_equal(hd.aread, hh.aread)
        np.testing.assert_array_equal(hd.bread, hh.bread)
        np.testing.assert_array_equal(hd.apos, hh.apos)
        np.testing.assert_array_equal(hd.diag, hh.diag)


def test_device_match_governor(tmp_path):
    """-M memory governor: device histogram must drive the same limit and
    the same surviving hit set as the host path."""
    rng = np.random.default_rng(3)
    # repetitive genome so some k-mer groups are large
    unit = helpers.sim_genome(rng, 400)
    genome = unit * 40
    entries = [fasta.FastaEntry("ctg0", genome)]
    reads = [helpers.sim_read(rng, genome, min_len=1200, max_len=2500)[0]
             for _ in range(6)]
    dbio.create_dam(str(tmp_path / "ref.dam"), entries, bsize=10 ** 9)
    dbio.create_db(str(tmp_path / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)])
    ref = dbio.DazzDB.open(str(tmp_path / "ref.dam"))
    ref.trim()
    ref.load_bases()
    rd = dbio.DazzDB.open(str(tmp_path / "reads.db"))
    rd.trim()
    rd.load_bases()
    k = 14
    adev = dix.device_sort_kmers(rd, k)
    bdev = dix.device_sort_kmers(ref, k)
    ahost = sort_kmers(rd, k)
    bhost = sort_kmers(ref, k)
    db_bytes = rd.sizeof() + ref.sizeof()
    # a tight budget that actually engages the histogram-derived limit
    mem = db_bytes + 16 * (len(ahost) + 2 * len(bhost)) + (64 << 10)
    hd = dix.device_match_seeds(adev, bdev, mem, db_bytes)
    hh = match_seeds(ahost, bhost, mem, db_bytes)
    assert len(hd) == len(hh) > 0
    np.testing.assert_array_equal(hd.aread, hh.aread)
    np.testing.assert_array_equal(hd.apos, hh.apos)
    np.testing.assert_array_equal(hd.diag, hh.diag)


def test_device_index_masked(tmp_path):
    """Soft-mask track intervals must suppress the same windows."""
    ref, rd = make_dbs(tmp_path, seed=13)
    # synthesize a mask track over the reads db: one interval per read
    n = rd.nreads
    anno = np.zeros(n + 1, np.int64)
    chunks = []
    total = 0
    rng = np.random.default_rng(0)
    for i in range(n):
        rl = int(rd.reads["rlen"][i])
        b = int(rng.integers(0, max(1, rl // 2)))
        e = min(rl, b + int(rng.integers(50, 400)))
        chunks.append(np.array([b, e], np.int32))
        anno[i] = total
        total += 2   # anno is in int units (open_mask_track db.py:422)
    anno[n] = total
    rd.tracks["dust"] = (anno, np.concatenate(chunks),
                         np.full(n, 2, np.int32))
    dev = dix.device_sort_kmers(rd, 18)
    host = sort_kmers(rd, 18)
    assert_index_equal(dev, host, "masked")


def test_device_match_sharded(tmp_path):
    """dp x ref sharded matching on the 8-device CPU mesh must reproduce
    the host hit list exactly (order included)."""
    import jax
    import numpy as _np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    ref, rd = make_dbs(tmp_path, seed=17, glen=40_000, nreads=10)
    k = 16
    adev = dix.device_sort_kmers(rd, k)
    bdev = dix.device_sort_kmers(ref, k)
    ahost = sort_kmers(rd, k)
    bhost = sort_kmers(ref, k)

    devs = jax.devices()[:8]
    mesh = Mesh(_np.array(devs).reshape(4, 2), ("dp", "ref"))
    a_sh = dix.shard_index(adev, mesh, "dp")
    b_sh = dix.shard_index(bdev, mesh, "ref")
    for mem in (0, 1 << 34):
        hd = dix.device_match_seeds_sharded(a_sh, b_sh, mesh, mem, 1000)
        hh = match_seeds(ahost, bhost, mem, 1000)
        assert len(hd) == len(hh) > 0
        np.testing.assert_array_equal(hd.aread, hh.aread)
        np.testing.assert_array_equal(hd.bread, hh.bread)
        np.testing.assert_array_equal(hd.apos, hh.apos)
        np.testing.assert_array_equal(hd.diag, hh.diag)


def test_device_match_comp_frame(tmp_path):
    """comp_frame matching (reads-revcomp index x FORWARD ref index) must
    be bit-identical with the classic complement pass (reads-fwd index x
    complemented ref index) — the mapper builds ONE ref index per block
    on this equivalence (damapper.c:851-861 without the second
    Sort_Kmers)."""
    ref, rd = make_dbs(tmp_path, seed=13, glen=40_000, nreads=10)
    k = 16
    b_fwd = dix.device_sort_kmers(rd, k)
    b_rc = dix.device_sort_kmers(rd, k, comp=True)
    a_fwd = dix.device_sort_kmers(ref, k)
    # classic: complement the ref and match reads-fwd against it
    refc = dbio.DazzDB.open(str(tmp_path / "ref.dam"))
    refc.trim()
    refc.load_bases()
    refc.complement_inplace()
    a_cmp = dix.device_sort_kmers(refc, k)
    for mem in (0, 1 << 34):
        hd = dix.device_match_seeds(b_rc, a_fwd, mem, 1000,
                                    comp_frame=True)
        hh = dix.device_match_seeds(b_fwd, a_cmp, mem, 1000)
        assert len(hd) == len(hh)
        np.testing.assert_array_equal(hd.aread, hh.aread)
        np.testing.assert_array_equal(hd.bread, hh.bread)
        np.testing.assert_array_equal(hd.apos, hh.apos)
        np.testing.assert_array_equal(hd.diag, hh.diag)


def test_device_match_comp_frame_sharded(tmp_path):
    """Sharded comp_frame: inverted tie keys must reproduce the exact
    reference hit order across ref shards."""
    import jax
    from jax.sharding import Mesh

    if len(jax.devices()) < 4:
        pytest.skip("needs a 4-device mesh (CPU conftest provides 8)")
    devs = np.array(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, ("dp", "ref"))
    ref, rd = make_dbs(tmp_path, seed=17, glen=40_000, nreads=10)
    k = 16
    b_rc = dix.shard_index(dix.device_sort_kmers(rd, k, comp=True),
                           mesh, "dp")
    a_fwd = dix.shard_index(dix.device_sort_kmers(ref, k), mesh, "ref")
    refc = dbio.DazzDB.open(str(tmp_path / "ref.dam"))
    refc.trim()
    refc.load_bases()
    refc.complement_inplace()
    hh = dix.device_match_seeds(
        dix.device_sort_kmers(rd, k), dix.device_sort_kmers(refc, k),
        0, 1000)
    hd = dix.device_match_seeds_sharded(b_rc, a_fwd, mesh, 0, 1000,
                                        comp_frame=True)
    assert len(hd) == len(hh)
    np.testing.assert_array_equal(hd.aread, hh.aread)
    np.testing.assert_array_equal(hd.bread, hh.bread)
    np.testing.assert_array_equal(hd.apos, hh.apos)
    np.testing.assert_array_equal(hd.diag, hh.diag)


def test_device_match_pair(tmp_path):
    """device_match_seeds_pair (one combined join for both orientations)
    must return hit lists bit-identical to the two separate calls."""
    ref, rd = make_dbs(tmp_path, seed=21, glen=40_000, nreads=10)
    k = 16
    b_fwd = dix.device_sort_kmers(rd, k)
    b_rc = dix.device_sort_kmers(rd, k, comp=True)
    a_fwd = dix.device_sort_kmers(ref, k)
    for mem in (0, 1 << 34):
        hf1 = dix.device_match_seeds(b_fwd, a_fwd, mem, 1000)
        hc1 = dix.device_match_seeds(b_rc, a_fwd, mem, 1000,
                                     comp_frame=True)
        hf2, hc2 = dix.device_match_seeds_pair(b_fwd, b_rc, a_fwd, mem,
                                               1000)
        for one, two in ((hf1, hf2), (hc1, hc2)):
            assert len(one) == len(two)
            np.testing.assert_array_equal(one.aread, two.aread)
            np.testing.assert_array_equal(one.bread, two.bread)
            np.testing.assert_array_equal(one.apos, two.apos)
            np.testing.assert_array_equal(one.diag, two.diag)


def test_unpack_seq_scan_matches_single_shot():
    """The Gbp-scale chunked unpack (lax.scan with carried interval-map
    cummax state) must reproduce _unpack_seq exactly, including sentinel
    restoration at read boundaries and in the padded tail."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    cap = 4096                      # 8 chunks at CL=512
    # synthetic read layout: [sentinel] read [sentinel] read ... with the
    # tail left unoccupied (pure padding)
    starts, ends = [], []
    pos = 1
    seq = np.full(cap, 0, np.uint8)
    while pos < 3000:
        ln = int(rng.integers(40, 600))
        starts.append(pos)
        ends.append(min(pos + ln, 3000))
        seq[pos:pos + ln] = rng.integers(0, 4, ln)
        pos += ln + 1
    rcap = 256
    s = np.zeros(rcap, np.int32)
    e = np.zeros(rcap, np.int32)
    s[:len(starts)] = starts
    e[:len(ends)] = ends
    packed = jnp.asarray(dix.pack_seq(seq[:3000], cap))
    ref = np.asarray(dix._unpack_seq(packed, jnp.asarray(s),
                                     jnp.asarray(e)))
    got = np.asarray(dix._unpack_seq_scan(packed, jnp.asarray(s),
                                          jnp.asarray(e), 512))
    np.testing.assert_array_equal(ref, got)
    # reads spanning chunk boundaries must carry the covering interval
    assert (ref == 4).any() and (ref != 4).any()


def test_build_index_tight_sort_matches_full(tmp_path):
    """The tight-prefix sort inside _build_index (trailing sentinel pad
    is pre-sorted) must be array-equal with the full-cap sort, both
    orientations, with and without suppression."""
    import jax.numpy as jnp

    db, _ = make_dbs(tmp_path, seed=5, glen=30_000)
    seq_dev = dix.device_upload_seq(db)
    cap = seq_dev.shape[0]
    rcap = dix._bucket(db.nreads, lo=1 << 8)
    boffs = np.full(rcap, cap - 1, np.int32)
    boffs[:db.nreads] = db.reads["boff"]
    eoffs = np.full(rcap, cap - 1, np.int32)
    eoffs[:db.nreads] = db.reads["boff"] + db.reads["rlen"]
    mb = np.zeros(0, np.uint8)
    n = cap - 14 + 1
    tight = len(db.seq) + 64          # well under the 4096-min bucket cap
    for comp in (False, True):
        for sup in (0, 3):
            full = dix._build_index(seq_dev, jnp.asarray(boffs),
                                    jnp.asarray(eoffs), jnp.asarray(mb),
                                    14, sup, comp, None)
            tt = dix._build_index(seq_dev, jnp.asarray(boffs),
                                  jnp.asarray(eoffs), jnp.asarray(mb),
                                  14, sup, comp, tight)
            for a, b in zip(full, tt):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_join_modes_agree():
    """Every selectable join strategy (sort, scan, sortg, bsearch, merge
    incl. its pre-merged qsplit path) must produce identical b-ranges on
    sorted inputs with duplicate keys, sentinel padding and all-ones
    edge keys."""
    import jax.numpy as jnp

    rng = np.random.default_rng(17)

    def mk(nreal, cap, maxk):
        hi = rng.integers(0, maxk, nreal).astype(np.uint32)
        lo = rng.integers(0, 4, nreal).astype(np.uint32)
        o = np.lexsort((lo, hi))
        H = np.full(cap, 0xFFFFFFFF, np.uint32)
        L = np.full(cap, 0xFFFFFFFF, np.uint32)
        H[:nreal], L[:nreal] = hi[o], lo[o]
        return jnp.asarray(H), jnp.asarray(L), nreal

    qh, ql, _ = mk(700, 1024, 90)
    bh, bl, bn = mk(1500, 2048, 90)
    base = None
    for mode in ("sort", "scan", "sortg", "bsearch", "merge"):
        got = dix._join_ranges(bh, bl, jnp.int32(bn), qh, ql, mode)
        got = tuple(np.asarray(x) for x in got)
        if base is None:
            base = got
        else:
            for a, b in zip(base, got):
                np.testing.assert_array_equal(a, b, err_msg=mode)
    # the pair path's qsplit pre-merge: q = concat of two sorted halves
    q2h = jnp.concatenate([qh, qh])
    q2l = jnp.concatenate([ql, ql])
    ref = dix._join_ranges(bh, bl, jnp.int32(bn), q2h, q2l, "sort")
    got = dix._join_ranges(bh, bl, jnp.int32(bn), q2h, q2l, "merge",
                           qsplit=1024)
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg="merge qsplit")
