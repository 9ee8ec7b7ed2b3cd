"""Microbenchmark: the Mosaic while-loop iteration floor.

Measures the wall-clock of ONE pallas kernel that runs a lax.while_loop
of NITER iterations whose body is NOPS chained int32 VPU ops on a
(G, W) array, across shapes.  This isolates the per-op issue cost and
the per-iteration loop overhead that bound the wave phase machine
(ops/wave_pallas.py) — the wave body is ~600 such ops.

Usage: python tools/mosaic_floor.py [niter] [nops]
Writes JSONL records to tools/mosaic_floor.jsonl.
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


def bench(G, W, niter, nops, variant="mix"):
    def kernel(x_ref, n_ref, o_ref):
        x = x_ref[...]
        n = n_ref[0, 0]

        def cond(c):
            i, x = c
            return i < n

        def body(c):
            i, x = c
            # a wave-body-like op mix: adds, selects, rolls, compares
            for j in range(nops // 4):
                if variant == "add":
                    x = x + 1
                    x = x ^ 3
                    x = x + 7
                    x = x ^ 5
                else:
                    x = x + 1
                    x = jnp.where(x > 100000, x - 100000, x)
                    x = jnp.roll(x, 1, axis=1)
                    x = jnp.maximum(x, x ^ 2)
            return (i + 1, x)

        i, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
        o_ref[...] = x

    @jax.jit
    def run(x, n):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((G, W), jnp.int32),
        )(x, n)

    x = jnp.zeros((G, W), jnp.int32)
    n = jnp.full((1, 1), niter, jnp.int32)
    r = run(x, n)
    r.block_until_ready()
    t0 = time.time()
    r = run(x, n)
    np.asarray(r)
    dt = time.time() - t0
    per_iter = dt / niter
    per_op = per_iter / nops
    rec = {"G": G, "W": W, "niter": niter, "nops": nops,
           "variant": variant, "total_s": round(dt, 4),
           "us_per_iter": round(1e6 * per_iter, 3),
           "ns_per_op": round(1e9 * per_op, 2)}
    print(json.dumps(rec), flush=True)
    with open(pathlib.Path(__file__).parent / "mosaic_floor.jsonl",
              "a") as fh:
        fh.write(json.dumps(rec) + "\n")


def main():
    niter = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    nops = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    for (g, w) in ((8, 64), (8, 128), (16, 128), (8, 256), (32, 128),
                   (64, 128), (128, 128)):
        bench(g, w, niter, nops)
    # pure-add variant: no rolls (rolls may cost more than elementwise)
    bench(8, 128, niter, nops, "add")
    bench(64, 128, niter, nops, "add")


if __name__ == "__main__":
    main()
