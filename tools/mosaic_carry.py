"""Mosaic while-loop structural costs: carry width, 3D small-minor
arrays, minor-axis concats — the wave-body patterns the op-class bench
does not cover.  Usage: python tools/mosaic_carry.py [niter]
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from damapper_tpu.utils.cache import enable_compile_cache

enable_compile_cache(str(pathlib.Path(__file__).resolve().parent.parent
                         / "tests" / "data" / "xla_cache"))

i32 = jnp.int32


def bench(name, G, W, niter, mk_init, body_fn):
    def kernel(n_ref, o_ref, *unused):
        n = n_ref[0, 0]
        init = mk_init()

        def cond(c):
            return c[0] < n

        def body(c):
            i, st = c
            return (i + 1, body_fn(st))

        i, st = jax.lax.while_loop(cond, body, (jnp.int32(0), init))
        o_ref[...] = (st[0] if isinstance(st, (tuple, list)) else st)[:, :W]

    @jax.jit
    def run(n):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, W), i32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=120 * 1024 * 1024),
        )(n)

    n1 = jnp.full((1, 1), niter, i32)
    n5 = jnp.full((1, 1), 5 * niter, i32)
    for a in (n1, n5):
        np.asarray(run(a))
    t0 = time.time()
    np.asarray(run(n1))
    t1 = time.time()
    np.asarray(run(n5))
    t2 = time.time()
    per_iter = ((t2 - t1) - (t1 - t0)) / (4 * niter)
    rec = {"name": name, "G": G, "W": W,
           "us_per_iter": round(1e6 * per_iter, 3)}
    print(json.dumps(rec), flush=True)


def main():
    niter = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    for G in (8, 32, 128):
        W = 128

        # 1. carry of 60 (G, W) arrays, each touched with free elemwise
        def mk60():
            return tuple(jnp.full((G, W), k, i32) for k in range(60))

        def body60(st):
            return tuple(x + 1 for x in st)

        bench("carry60", G, W, niter, mk60, body60)

        # 2. one (G, W, 4) 3D small-minor array, masked where-write
        def mk3d():
            return (jnp.zeros((G, W), i32), jnp.zeros((G, W, 4), i32))

        def body3d(st):
            x, r = st
            x = x + 1
            r = jnp.where((x[:, :, None] & 7) == 0, r + 1, r)
            return (x, r)

        bench("3d_minor4", G, W, niter, mk3d,
              lambda st: body3d(st))

        # 3. minor-axis concat (G, W)+(G, W) -> (G, 2W) each iteration
        def mkcc():
            return (jnp.zeros((G, W), i32), jnp.ones((G, W), i32))

        def bodycc(st):
            a, b = st
            w = jnp.concatenate([a, b], axis=1)
            w = w + 1
            return (w[:, :W], w[:, W:])

        bench("concat2w", G, W, niter, mkcc, bodycc)

        # 4. the dbuf pattern: (G, 192, 4) masked one-hot write
        def mkdb():
            return (jnp.zeros((G, W), i32), jnp.zeros((G, 192, 4), i32))

        def bodydb(st):
            x, db = st
            x = x + 1
            at = x[:, 0:1] & 127
            diota = jax.lax.broadcasted_iota(i32, (1, 192), 1)
            mask = (diota == at).astype(i32)[:, :, None]
            row = jnp.max(x, axis=1, keepdims=True)[:, :, None]
            db = jnp.where(mask != 0, jnp.broadcast_to(row, db.shape), db)
            return (x, db)

        bench("dbuf_write", G, W, niter, mkdb, bodydb)

        # 5. dbuf SoA form: 4 separate (G, 192) planes
        def mkdbs():
            return (jnp.zeros((G, W), i32),) + tuple(
                jnp.zeros((G, 192), i32) for _ in range(4))

        def bodydbs(st):
            x = st[0] + 1
            at = x[:, 0:1] & 127
            diota = jax.lax.broadcasted_iota(i32, (1, 192), 1)
            mask = diota == at
            row = jnp.max(x, axis=1, keepdims=True)
            return (x,) + tuple(jnp.where(mask, row, d) for d in st[1:])

        bench("dbuf_soa", G, W, niter, mkdbs, bodydbs)


if __name__ == "__main__":
    main()
