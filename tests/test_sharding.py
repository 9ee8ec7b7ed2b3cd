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
