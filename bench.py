"""Benchmark: reads mapped/sec vs the reference damapper binary.

Runs both mappers on the same simulated PacBio dataset (a BASELINE.md
mid-ladder config by default: the BASELINE config-3 genome size, 140 Mb / 1000 reads, scalable by env
knobs) and prints ONE JSON line:

  {"metric": ..., "value": reads/s (ours), "unit": "reads/s",
   "vs_baseline": ours/reference, "las_identical_to_reference": bool,
   "cell_updates_per_sec": batched wave-DP cells/s,
   "variants": {"n95_C": {...}, "profile": {...}}}

The correctness gate (.las record equality vs the reference, plus byte
equality of the -p profile track in that variant) is asserted before
timing is reported.

Env knobs: BENCH_GLEN (genome bp, default 140_000_000), BENCH_NREADS
(default 1000), BENCH_SEED, BENCH_BSIZE (ref block size; <genome forces the
multi-block path), BENCH_REPEATS (best-of, default 2), BENCH_VARIANTS=0 to
skip the -n.95 -C and -p timed variants.
"""

import json
import os

# before numpy loads: its MADV_HUGEPAGE hint makes cold big-buffer faults
# ~7x slower under this kernel's synchronous-compaction THP defrag (see
# damapper_tpu/__init__.py)
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

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
from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402
from damapper_tpu.utils.sysfix import ensure_map_count  # noqa: E402

enable_compile_cache(str(CACHE))
ensure_map_count()   # stock vm.max_map_count segfaults long XLA-CPU runs
import jax  # noqa: E402

_CPU_FB = os.environ.get("BENCH_FORCE_CPU") == "1"
if _CPU_FB:
    # tunnel-outage fallback (see the probe in main): measure on CPU
    # honestly rather than emitting nothing
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

# CPU-fallback defaults are smaller so an honest measurement completes
# within the driver's timeout (the metric string self-describes the size)
GLEN = int(os.environ.get("BENCH_GLEN",
                          12_000_000 if _CPU_FB else 140_000_000))
NREADS = int(os.environ.get("BENCH_NREADS", 200 if _CPU_FB else 1000))
SEED = int(os.environ.get("BENCH_SEED", 42))
BSIZE = int(os.environ.get("BENCH_BSIZE", 260_000_000))
# reads-side block size: >0 splits the reads DB into blocks and maps
# block-by-block (both ours and the reference), the reference's own
# memory-bounding recipe for large read sets (map.c:807-814,
# HPC.damapper jobs) — required above ~20k reads where a single-block
# device join exceeds HBM
RBSIZE = int(os.environ.get("BENCH_RBSIZE", 0))
# the axon TPU tunnel's execution time is jittery (3x swings between
# identical runs); report the best of BENCH_REPEATS attempts.  The CPU
# fallback is slow and not jittery — one attempt
REPEATS = int(os.environ.get("BENCH_REPEATS", 1 if _CPU_FB else 2))
# the reference is CPU-bound and much less jittery than the tunnel; large
# configs can't afford its wall twice (BENCH_REF_REPEATS=1 there)
REF_REPEATS = int(os.environ.get("BENCH_REF_REPEATS", REPEATS))
# BENCH_VARIANTS: "1" (all), "0" (none), or a comma list from
# {"n95_C", "profile"} — large-read-count configs can't afford every
# variant but BASELINE config 3 still needs the -p profile gate
_V = os.environ.get("BENCH_VARIANTS", "1")
VARIANTS = _V != "0"
VARIANT_SET = (None if _V in ("0", "1")
               else {v.strip() for v in _V.split(",")})


def build_dataset(work: pathlib.Path):
    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta
    from tests import helpers

    work.mkdir(parents=True, exist_ok=True)
    marker = work / f"ds_{SEED}_{GLEN}_{NREADS}_{BSIZE}_{RBSIZE}.ok"
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
                   [fasta.FastaEntry(f"r{i}", r)
                    for i, r in enumerate(reads)],
                   **({"bsize": RBSIZE} if RBSIZE else {}))
    marker.write_text("ok")


def _reads_blocks(work):
    """Reads-DB block names: ["reads"] single-block, else reads.1..N."""
    from damapper_tpu.io import db as dbio
    stub = dbio.read_stub(str(work / "reads.db"))
    if not RBSIZE or stub.nblocks <= 1:
        return ["reads"]
    return [f"reads.{k}" for k in range(1, stub.nblocks + 1)]


def time_reference(work: pathlib.Path, opts, repeats=None):
    from tests import helpers
    try:
        helpers.build_reference()
    except Exception:
        return None, None
    blocks = _reads_blocks(work)
    samples = []
    las = None
    for _ in range(max(1, repeats if repeats is not None else REPEATS)):
        t0 = time.time()
        las = [helpers.run_reference_damapper(
                   work, "ref.dam", b if b != "reads" else "reads.db",
                   opts)
               for b in blocks]
        samples.append(round(time.time() - t0, 2))
    time_reference.samples = samples    # dispersion for the bench record
    return min(samples), (las[0] if len(las) == 1 else las)


def time_ours(work: pathlib.Path, cfg_kw=None, repeats=None, subdir="ours"):
    from damapper_tpu.pipeline import mapper as mp
    cfg = mp.DamapperConfig(**(cfg_kw or {}))   # auto backends on TPU
    out = work / subdir
    out.mkdir(exist_ok=True)
    blocks = _reads_blocks(work)
    best = None
    stats = {}
    a_path = None
    samples = []
    for _ in range(max(1, repeats if repeats is not None else REPEATS)):
        # honesty: every repeat starts with a COLD ref-index cache, exactly
        # like the reference binary re-running Sort_Kmers per invocation
        # (map.c:655).  Within a repeat the cache legitimately amortizes
        # the ref index across the read-block list (the reference's
        # per-job rebuild, HPC.damapper.c) — hits/builds are disclosed in
        # the bench record.
        mp._ref_index_cache.clear()
        mp._ref_index_cache_bytes[0] = 0
        from damapper_tpu.pipeline import reporter as _rep
        _rep._ref_seq_cache.clear()   # same honesty rule for the align
        t0 = time.time()              # upload cache
        outs = []
        rstats = None
        for b in blocks:
            ap, _ = mp.run_damapper(str(work / "ref.dam"),
                                    str(work / b), cfg,
                                    out_dir=str(out))
            outs.append(ap)
            st = dict(mp.LAST_STATS)
            if rstats is None:
                rstats = st
            else:
                for k, v in st.get("times", {}).items():
                    rstats["times"][k] = rstats["times"].get(k, 0) + v
                for k in ("cell_updates", "n_lanes",
                          "align_device_s", "align_host_s"):
                    if st.get(k):
                        rstats[k] = round(rstats.get(k, 0) + st[k], 2)
                for k in ("ref_index_cache_hits", "ref_index_builds"):
                    rstats[k] = rstats.get(k, 0) + st.get(k, 0)
        dt = time.time() - t0
        samples.append(round(dt, 2))
        if best is None or dt < best:
            best = dt
            stats = rstats
            a_path = outs[0] if len(outs) == 1 else outs
    stats["samples"] = samples
    return best, (pathlib.Path(a_path) if isinstance(a_path, str)
                  else a_path), stats


def las_identical(ref_las, our_las) -> bool:
    from damapper_tpu.io import las as lasio
    if isinstance(ref_las, list) or isinstance(our_las, list):
        ref_las = ref_las if isinstance(ref_las, list) else [ref_las]
        our_las = our_las if isinstance(our_las, list) else [our_las]
        return (len(ref_las) == len(our_las)
                and all(las_identical(r, o)
                        for r, o in zip(ref_las, our_las)))
    g, _ = lasio.read_las(str(ref_las))
    o, _ = lasio.read_las(str(our_las))
    return lasio.las_equal(g, o)


def main():
    # per-config dataset dir: configs must not share files
    # non-default block sizes get their own dir: a reads-DB re-split into
    # blocks must not overwrite the single-block layout (stale mixed
    # layouts confused one bench variant before this suffix existed)
    work = REPO / "tests" / "data" / "bench" / (
        f"ds_{SEED}_{GLEN}_{NREADS}"
        + (f"_b{BSIZE}" if BSIZE != 260_000_000 else "")
        + (f"_r{RBSIZE}" if RBSIZE else ""))
    result = {
        "metric": "reads mapped/sec, simulated PacBio 15% err vs reference "
                  f"damapper (genome {GLEN}bp, {NREADS} reads, -k20)",
        "value": 0.0,
        "unit": "reads/s",
        "vs_baseline": 0.0,
    }
    if _CPU_FB:
        result["platform"] = "cpu (TPU tunnel unreachable)"
    try:
        # fail fast if the axon tunnel is wedged: a dead TPU worker makes
        # jax.devices() hang forever IN ANY PROCESS, which would otherwise
        # turn this bench into a silent timeout with no JSON line at all
        if (os.environ.get("JAX_PLATFORMS", "") not in ("cpu", "")
                and not _CPU_FB):
            ok = True
            try:
                probe = subprocess.run(
                    [sys.executable, "-c", "import jax; jax.devices()"],
                    timeout=int(os.environ.get("BENCH_TUNNEL_PROBE_S",
                                               180)),
                    capture_output=True)
                ok = probe.returncode == 0
            except subprocess.TimeoutExpired:
                ok = False
            if not ok:
                # TPU tunnel wedged: re-run this bench on CPU and say so,
                # rather than hanging past the driver timeout with no JSON
                env = dict(os.environ, BENCH_FORCE_CPU="1",
                           JAX_PLATFORMS="cpu")
                r = subprocess.run([sys.executable, __file__], env=env)
                sys.exit(r.returncode)
        build_dataset(work)
        # measurement context: the reference runs -T4 on this host — its
        # core count frames every vs_baseline ratio
        result["host_cores"] = os.cpu_count()
        result["ref_index_cache"] = (
            "cold per repeat; within a repeat the device ref index is "
            "reused across the read-block list (hits/builds recorded)")
        # best-of for the reference too: host contention swings its
        # wall-clock 2-3x, and a one-shot ref time makes ratios unfair
        # in either direction
        ref_dt, ref_las = time_reference(work, ["-k20", "-T4"],
                                         repeats=REF_REPEATS)
        our_dt, our_las, stats = time_ours(work)
        result["value"] = round(NREADS / our_dt, 3)
        # dispersion: tunnel/host contention swings single runs ~30%, so
        # the record carries every repeat, not just the best
        result["seconds_samples"] = stats.pop("samples", [])
        result["reference_seconds_samples"] = getattr(
            time_reference, "samples", [])
        if stats.get("times"):
            result["stage_seconds"] = {
                k: round(v, 2) for k, v in stats["times"].items()}
        result["ref_index_cache_hits"] = stats.get("ref_index_cache_hits", 0)
        result["ref_index_builds"] = stats.get("ref_index_builds", 0)
        if stats.get("align_device_s") is not None:
            # device kernel wall vs host extraction/refinement inside align
            result["align_device_s"] = stats["align_device_s"]
            result["align_host_s"] = stats["align_host_s"]
        if stats.get("cell_updates"):
            t = max(1e-9, stats["times"].get("align", our_dt))
            result["cell_updates_per_sec"] = round(
                stats["cell_updates"] / t, 0)
            result["wave_lanes"] = stats.get("n_lanes", 0)
        if ref_dt is not None:
            result["las_identical_to_reference"] = las_identical(ref_las,
                                                                 our_las)
            result["vs_baseline"] = round(ref_dt / our_dt, 4)
            result["reference_reads_per_sec"] = round(NREADS / ref_dt, 3)

        if VARIANTS and ref_dt is not None:
            # a variant where the REFERENCE binary itself crashes (e.g. its
            # -T4 -p profile pass segfaults on a <~4-reads-per-thread
            # trailing block — reproduced clean-room, tests/bin/damapper_ref
            # -k20 -T4 -p on a 15-read block) is recorded as that variant's
            # reference_error, not a whole-bench failure: our pipeline maps
            # the same input fine
            variants = {}
            if VARIANT_SET is None or "n95_C" in VARIANT_SET:
                # near-optimal chains + dual output (BASELINE config 2)
                try:
                    rd, rl = time_reference(work,
                                            ["-k20", "-T4", "-n.95", "-C"],
                                            repeats=1)
                    od, ol, _ = time_ours(work,
                                          dict(best_tie=.95, do_b=True),
                                          repeats=1, subdir="ours_nC")
                    variants["n95_C"] = {
                        "vs_baseline": round(rd / od, 4),
                        "las_identical": las_identical(rl, ol)}
                except Exception as e:
                    variants["n95_C"] = {
                        "reference_error": f"{type(e).__name__}: {e}"[:300]}
            if VARIANT_SET is None or "profile" in VARIANT_SET:
                # repeat-profile track (BASELINE config 3 options)
                try:
                    rd, rl = time_reference(work, ["-k20", "-T4", "-p"],
                                            repeats=1)
                    od, ol, _ = time_ours(work, dict(profile=True),
                                          repeats=1, subdir="ours_p")
                    prof_ok = all(
                        (work / f".{b}{ext}").read_bytes()
                        == (work / "ours_p" / f".{b}{ext}").read_bytes()
                        for b in _reads_blocks(work)
                        for ext in (".prof.anno", ".prof.data"))
                    variants["profile"] = {
                        "vs_baseline": round(rd / od, 4),
                        "las_identical": las_identical(rl, ol),
                        "profile_track_identical": prof_ok}
                except Exception as e:
                    variants["profile"] = {
                        "reference_error": f"{type(e).__name__}: {e}"[:300]}
            result["variants"] = variants
    except Exception as e:  # always emit the JSON line
        result["error"] = f"{type(e).__name__}: {e}"
    # per-mode Mosaic lowering status (tools/wave_compile_gate.py): a
    # kernel variant that fails to compile on the real toolchain must be
    # visible in the bench record, not discovered a round later
    gate = REPO / "tools" / "wave_compile_status.json"
    if gate.exists():
        try:
            result["wave_compile_status"] = {
                k: v.get("status", "?")
                for k, v in json.loads(gate.read_text()).items()}
        except ValueError:
            pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
