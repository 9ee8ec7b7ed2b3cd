"""Per-op-class Mosaic cost: which wave-body patterns scale with G?

For each op-class, runs a while-loop kernel whose body applies the
pattern REPS times, at several (G, W) shapes, and prints ns per
pattern-application.  Informs the wave phase-machine redesign: the
total body cost is the op-class mix, not a uniform per-op constant.

Usage: python tools/mosaic_ops.py [niter] [reps]
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


def mk_patterns(G, W, reps):
    iota1 = None

    def elemwise(x, s):
        for _ in range(reps):
            x = jnp.maximum(x + 1, x ^ 3)
        return x, s

    def roll(x, s):
        for _ in range(reps):
            x = jnp.roll(x, 1, axis=1) + 1
        return x, s

    def reduce_row(x, s):
        # (G, W) -> (G, 1) max, then broadcast back (the rmax+b2 pattern)
        for _ in range(reps):
            m = jnp.max(x, axis=1, keepdims=True)
            x = x + m
        return x, s

    def reduce_scal(x, s):
        # (G, W) -> (G,) -> (G, 1): the SCALARS pattern
        for _ in range(reps):
            m = jnp.max(x, axis=1)
            s = s + m
            x = x + s[:, None]
        return x, s

    def onehot_grab(x, s):
        # rsum(where(slots == sel, arr, 0)) value-grab
        slots = jax.lax.broadcasted_iota(i32, (1, W), 1)
        for _ in range(reps):
            sel = jnp.sum(jnp.where(slots == (s[:, None] & (W - 1)), x, 0),
                          axis=1)
            s = s + sel
        return x, s

    def scal_arith(x, s):
        # pure (G,) scalar chains
        for _ in range(reps):
            s = jnp.maximum(s + 1, s ^ 3)
        return x, s

    def cond_body(x, s):
        # lax.cond with a cheap branch pair
        for _ in range(reps):
            x = jax.lax.cond((s > 0).any(), lambda a: a + 1,
                             lambda a: a - 1, x)
        return x, s

    def butterfly(x, s):
        # log2(W) masked-roll scan (the revcummax pattern)
        idx = jax.lax.broadcasted_iota(i32, (G, W), 1)
        for _ in range(max(1, reps // 7)):
            out = x
            sft = 1
            while sft < W:
                sh = jnp.roll(out, -sft, axis=1)
                out = jnp.maximum(out, jnp.where(idx + sft < W, sh,
                                                 -(1 << 30)))
                sft *= 2
            x = out
        return x, s

    return {"elemwise": elemwise, "roll": roll, "reduce_row": reduce_row,
            "reduce_scal": reduce_scal, "onehot_grab": onehot_grab,
            "scal_arith": scal_arith, "cond": cond_body,
            "butterfly": butterfly}


def bench(G, W, niter, reps, name, fn):
    def kernel(x_ref, s_ref, n_ref, ox, os_):
        x = x_ref[...]
        s = s_ref[...][:, 0]
        n = n_ref[0, 0]

        def cond(c):
            i, x, s = c
            return i < n

        def body(c):
            i, x, s = c
            x, s = fn(x, s)
            return (i + 1, x, s)

        i, x, s = jax.lax.while_loop(cond, body, (jnp.int32(0), x, s))
        ox[...] = x
        os_[...] = s[:, None]

    @jax.jit
    def run(x, s, n):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec((1, 1), memory_space=pltpu.SMEM)],
            out_specs=(pl.BlockSpec(memory_space=pltpu.VMEM),
                       pl.BlockSpec(memory_space=pltpu.VMEM)),
            out_shape=(jax.ShapeDtypeStruct((G, W), i32),
                       jax.ShapeDtypeStruct((G, 1), i32)),
        )(x, s, n)

    x = jnp.ones((G, W), i32)
    s = jnp.ones((G, 1), i32)
    n = jnp.full((1, 1), niter, i32)
    # force a real device->host pull: on the axon backend
    # block_until_ready returns at dispatch, so np.asarray is the only
    # reliable sync.  The pull itself costs ~26ms tunnel latency, so time
    # two iteration counts and use the slope.
    n5 = jnp.full((1, 1), 5 * niter, i32)
    for arg in (n, n5):
        np.asarray(run(x, s, arg)[1])
    t0 = time.time()
    np.asarray(run(x, s, n)[1])
    t1 = time.time()
    np.asarray(run(x, s, n5)[1])
    t2 = time.time()
    dt = ((t2 - t1) - (t1 - t0)) / 4
    eff_reps = max(1, reps // 7) if name == "butterfly" else reps
    rec = {"G": G, "W": W, "pat": name,
           "ns_per_app": round(1e9 * dt / (niter * eff_reps), 1)}
    print(json.dumps(rec), flush=True)
    return rec


def main():
    niter = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 28
    recs = []
    for (g, w) in ((8, 128), (32, 128), (128, 128), (8, 64), (32, 64)):
        pats = mk_patterns(g, w, reps)
        for name, fn in pats.items():
            recs.append(bench(g, w, niter, reps, name, fn))
    with open(pathlib.Path(__file__).parent / "mosaic_ops.jsonl",
              "a") as fh:
        for r in recs:
            fh.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
