"""A/B the single-device match join strategies on the real TPU.

Measures device_match_seeds_pair wall (warm) with DAMAPPER_JOIN=sort
(combined sort-merge join, q and q+1 copies) vs sortg (one query copy,
b_hi from b's own group spans) at a real read-block shape, and checks
the hit lists are identical.  (bsearch was measured too: its fori_loop
gather rounds exceed the axon >60s execution watchdog at this shape and
kill the TPU worker — do not add it back at block scale.)  The join mode is a static jit argument
read at call time, so one process measures both without cache poisoning
(and pays the axon first-execution stall only once, on the warmup).

Usage: python tools/join_ab.py [dataset_dir] [reads_block]
Defaults to the 50k config-3 dataset's block 1.  Appends one JSON line
per mode to tools/join_ab_results.jsonl.
"""

import json
import os
import pathlib
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(str(REPO / "tests" / "data" / "xla_cache"))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def main():
    ds = pathlib.Path(sys.argv[1] if len(sys.argv) > 1 else
                      REPO / "tests" / "data" / "bench" /
                      "ds_42_140000000_50000_r50000000")
    blk = sys.argv[2] if len(sys.argv) > 2 else "reads.1"

    from damapper_tpu.ops.device_index import (device_match_seeds_pair,
                                               device_sort_kmers,
                                               device_upload_seq)
    from damapper_tpu.pipeline.mapper import read_block

    t0 = time.time()
    reads_db = read_block(str(ds / blk), [], 20)
    ref_db = read_block(str(ds / "ref.1.dam"), [], 20)
    print(f"load {time.time() - t0:.1f}s reads={reads_db.totlen:,} "
          f"ref={ref_db.totlen:,}", flush=True)

    # absorb the axon first-execution stall on a tiny op
    t0 = time.time()
    np.asarray(jax.numpy.arange(8) * 2)
    print(f"first-exec warmup {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    rseq = device_upload_seq(reads_db)
    bindex = device_sort_kmers(reads_db, 20, 0, seq_dev=rseq)
    bindex_rc = device_sort_kmers(reads_db, 20, 0, comp=True, seq_dev=rseq)
    del rseq
    aindex = device_sort_kmers(ref_db, 20, 0)
    jax.block_until_ready((bindex.hi, bindex_rc.hi, aindex.hi))
    print(f"index {time.time() - t0:.1f}s "
          f"nq={bindex.n:,} nref={aindex.n:,}", flush=True)

    mem = 8 << 30
    dbb = reads_db.sizeof() + ref_db.sizeof()
    results = {}
    out = REPO / "tools" / "join_ab_results.jsonl"
    modes = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ["sort", "sortg", "sort", "sortg"])
    for mode in modes:
        os.environ["DAMAPPER_JOIN"] = mode
        t0 = time.time()
        hf, hc = device_match_seeds_pair(bindex, bindex_rc, aindex, mem, dbb)
        dt = time.time() - t0
        rec = {"mode": mode, "seconds": round(dt, 2),
               "nhits_f": int(len(hf.aread)), "nhits_c": int(len(hc.aread)),
               "warm": mode in results}
        if mode in results:
            prev = results[mode]
            rec["identical_across_modes"] = all(
                np.array_equal(getattr(a, f), getattr(b, f))
                for other in results.values() if other is not prev
                for a, b in ((hf, other["hf"]), (hc, other["hc"]))
                for f in ("aread", "bread", "apos", "diag"))
        results[mode] = {"hf": hf, "hc": hc}
        print(json.dumps(rec), flush=True)
        with open(out, "a") as fh:
            fh.write(json.dumps(rec) + "\n")


if __name__ == "__main__":
    main()
