"""Floor measurements for the join's building blocks on the attached chip.

The match join is sort-bound: this tool times, at real join shapes,
 - lax.sort (3 operands, 3 keys) at the "sort" main-join size,
 - lax.sort at the "scan" single-image size,
 - the 1-key restore sort,
 - cumsum / cummax passes,
 - a bitonic MERGE of two pre-sorted key arrays (log n compare-exchange
   stages instead of a full sort's log^2) — the candidate replacement:
   both join inputs (reads index, ref index) are already sorted.

Usage: python tools/sort_floor.py [nq_millions] [m_millions]
"""

import os
import pathlib
import sys
import time

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(str(REPO / "tests" / "data" / "xla_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax import lax  # noqa: E402


def _force(out):
    """block_until_ready is a no-op on the axon tunnel: force completion
    with a 1-element device->host fetch per output leaf."""
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf[:1])


def timeit(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _force(out)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = fn_j(*args)
        _force(out)
        best = min(best, time.time() - t0)
    print(f"{label}: {best:.3f}s", flush=True)
    return out, best


def bitonic_merge(hi, lo, pay):
    """Merge a BITONIC 3-plane key sequence (keys (hi, lo, pay)
    lexicographic, ascending ++ descending), n a power of two >= 256.

    TPU-tiling-aware: compare-exchange stages run only while the stride
    is >= 128 (every reshape keeps a >=128 minor dim — smaller strides
    would tile-pad 8x-32x); after the stride-128 stage each contiguous
    128-block is bitonic and ordered relative to its neighbors, so one
    batched lax.sort along the 128-wide minor axis finishes the job."""
    n = hi.shape[0]
    s = n // 2
    while s >= 128:
        def halves(x):
            x2 = x.reshape(n // (2 * s), 2 * s)
            return x2[:, :s], x2[:, s:]
        ha, hb = halves(hi)
        la, lb = halves(lo)
        pa, pb = halves(pay)
        swap = ((ha > hb) | ((ha == hb)
                            & ((la > lb) | ((la == lb) & (pa > pb)))))
        hi = jnp.concatenate([jnp.where(swap, hb, ha),
                              jnp.where(swap, ha, hb)], 1).reshape(n)
        lo = jnp.concatenate([jnp.where(swap, lb, la),
                              jnp.where(swap, la, lb)], 1).reshape(n)
        pay = jnp.concatenate([jnp.where(swap, pb, pa),
                               jnp.where(swap, pa, pb)], 1).reshape(n)
        s //= 2
    h2, l2, p2 = lax.sort((hi.reshape(-1, 128), lo.reshape(-1, 128),
                           pay.reshape(-1, 128)), dimension=1, num_keys=3)
    return h2.reshape(n), l2.reshape(n), p2.reshape(n)


def main():
    nq = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 140
    nq *= 1_000_000
    m *= 1_000_000
    rng = np.random.default_rng(0)

    def keys(n):
        hi = jnp.asarray(rng.integers(0, 1 << 29, n, np.uint32))
        lo = jnp.asarray(rng.integers(0, 1 << 32, n, np.uint32,
                                      endpoint=False))
        return hi, lo

    import gc

    # "sort" main join: q + q+1 images + b = 2nq + m rows (nq = BOTH
    # orientations' query rows)
    n1 = 2 * nq + m
    h, l = keys(n1)
    p = jnp.arange(n1, dtype=jnp.int32)
    out, _ = timeit(f"lax.sort 3key n={n1/1e6:.0f}M",
                    lambda a, b, c: lax.sort((a, b, c), num_keys=3), h, l, p)
    del h, l, p, out
    gc.collect()

    # "scan" main join: one q image: nq + m rows
    n2 = nq + m
    h, l = keys(n2)
    p = jnp.arange(n2, dtype=jnp.int32)
    out, _ = timeit(f"lax.sort 3key n={n2/1e6:.0f}M",
                    lambda a, b, c: lax.sort((a, b, c), num_keys=3), h, l, p)
    del out
    gc.collect()

    # restore sort: 1 key + 2 payloads at n2
    c2 = jnp.arange(n2, dtype=jnp.int32)
    out, _ = timeit(f"lax.sort 1key 3op n={n2/1e6:.0f}M",
                    lambda a, b, c: lax.sort((a, b, c), num_keys=1),
                    p, c2, c2)
    del out
    gc.collect()

    # scan passes at n2
    out, _ = timeit(f"cumsum n={n2/1e6:.0f}M", lambda a: jnp.cumsum(a), c2)
    del out
    out, _ = timeit(f"cummax n={n2/1e6:.0f}M", lambda a: lax.cummax(a), c2)
    del h, l, p, c2, out
    gc.collect()

    # bitonic merge of sorted(nq) ++ sorted(m): pad to pow2
    npow = 1 << int(np.ceil(np.log2(n2)))
    qh, ql = keys(nq)
    qh = jnp.sort(qh)  # stand-in: only sortedness matters for the merge
    bh, bl = keys(m)
    bh = jnp.sort(bh)
    padn = npow - nq - m
    FULL = jnp.uint32(0xFFFFFFFF)

    def merge(qh, ql, bh, bl):
        hi = jnp.concatenate([qh, jnp.full(padn, FULL, jnp.uint32),
                              bh[::-1]])
        lo = jnp.concatenate([ql, jnp.full(padn, FULL, jnp.uint32),
                              bl[::-1]])
        pay = jnp.arange(npow, dtype=jnp.int32)
        return bitonic_merge(hi, lo, pay)

    (mh, ml, mp), dt = timeit(
        f"bitonic merge n={npow/1e6:.0f}M (3 ops)", merge, qh, ql, bh, bl)
    # sortedness check
    mh_n = np.asarray(mh)
    ok = bool(np.all(mh_n[1:] >= mh_n[:-1]))
    print(f"merge output hi-plane sorted: {ok}", flush=True)


if __name__ == "__main__":
    main()
