"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np


def test_dryrun_multichip_8():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_entry_compiles():
    import jax
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    trima = np.asarray(out[0])
    # the demo seeds are exact 512bp copies: wave must extend a long way
    assert (trima > 512).all()


def test_mesh_shapes():
    from damapper_tpu.parallel.mesh import make_mesh
    m = make_mesh(8)
    assert m.shape["dp"] * m.shape["ref"] == 8
    m = make_mesh(8, ref_shards=4)
    assert m.shape["ref"] == 4 and m.shape["dp"] == 2


def test_sharded_wave_engine_matches_unsharded(tmp_path):
    """The dp-sharded engine must produce the same .las as single-device
    (8-device CPU mesh, conftest)."""
    import numpy as np
    import jax
    from jax.sharding import Mesh
    from damapper_tpu.io import db as dbio, fasta, las as lasio
    from damapper_tpu.pipeline.mapper import DamapperConfig, run_damapper
    from tests import helpers

    rng = np.random.default_rng(21)
    glen = 40_000
    genome = helpers.sim_genome(rng, glen)
    entries = [fasta.FastaEntry("ctg0", genome)]
    reads = [helpers.sim_read(rng, genome, min_len=2000, max_len=5000)[0]
             for _ in range(8)]
    dbio.create_dam(str(tmp_path / "ref.dam"), entries)
    dbio.create_db(str(tmp_path / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)])

    outs = {}
    for name, mesh in (("single", None),
                       ("dp8", Mesh(np.array(jax.devices()), ("dp",)))):
        out = tmp_path / name
        out.mkdir()
        cfg = DamapperConfig(wave_backend="jax", mesh=mesh)
        a, _ = run_damapper(str(tmp_path / "ref.dam"),
                            str(tmp_path / "reads.db"), cfg,
                            out_dir=str(out))
        outs[name], _ = lasio.read_las(a)
    assert lasio.las_equal(outs["single"], outs["dp8"])
