"""Profile device_sort_kmers / device_match_seeds substeps on the TPU
tunnel using the cached bench dataset.  Usage:
    python tools/index_profile.py [dataset_dir]
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
import numpy as np  # noqa: E402

from damapper_tpu.ops import device_index as di  # noqa: E402
from damapper_tpu.pipeline import mapper as mp  # noqa: E402


def _sync(out):
    """Real execution barrier.  jax.block_until_ready accepts arbitrary
    pytrees (incl. registered dataclasses like DeviceKmerIndex), but on
    the axon tunnel it returns at dispatch — pulling one element of each
    array leaf is the only reliable barrier there (costs ~26ms tunnel
    latency per leaf; acceptable for a profiler)."""
    jax.block_until_ready(out)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
            np.asarray(leaf.reshape(-1)[:1])


def t(label, fn, n=2):
    outs = []
    for i in range(n):
        t0 = time.time()
        out = fn()
        _sync(out)
        dt = time.time() - t0
        print(f"  {label} [{i}]: {dt:.3f}s", flush=True)
        outs.append(out)
    return outs[-1]


def main():
    ds = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else
                      REPO / "tests" / "data" / "bench" / "ds_42_12000000_200")
    print("platform:", jax.devices()[0].platform, flush=True)
    t0 = time.time()
    reads_db = mp.read_block(str(ds / "reads.db"), [], 20)
    ref_blk = mp.read_block(str(ds / "ref.dam"), [], 20)
    print(f"load: {time.time()-t0:.2f}s reads={reads_db.nreads} "
          f"reflen={ref_blk.totlen}", flush=True)

    t0 = time.time()
    seq_dev = di.device_upload_seq(ref_blk)
    seq_dev.block_until_ready()
    print(f"upload ref seq ({ref_blk.totlen/1e6:.0f}Mb): "
          f"{time.time()-t0:.2f}s", flush=True)

    bindex = t("sort_kmers reads", lambda: di.device_sort_kmers(
        reads_db, 20, 0))
    aindex = t("sort_kmers ref fwd", lambda: di.device_sort_kmers(
        ref_blk, 20, 0, seq_dev=seq_dev))
    t("sort_kmers ref comp", lambda: di.device_sort_kmers(
        ref_blk, 20, 0, comp=True, seq_dev=seq_dev))

    db_bytes = reads_db.sizeof() + ref_blk.sizeof()
    hits = t("match_seeds", lambda: di.device_match_seeds(
        bindex, aindex, 16 << 30, db_bytes))
    print("hits:", len(hits), flush=True)


if __name__ == "__main__":
    main()
