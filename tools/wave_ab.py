"""A/B the classic segment driver vs the persistent wave kernel.

Builds a bench-like batch of seeds (PacBio-length reads, 15% error) and
runs both PallasWaveEngine variants on the current backend, asserting
record-identical results and printing per-lane timings.

Usage:  python tools/wave_ab.py [ncases] [rlen] [mode]
        mode: ab (default) | classic | persistent | lanepack | plp
        (plp = persistent driver with lane-packed rows)
On TPU this is the fastest way to measure the persistent kernel's launch
economics without paying a whole pipeline run.
"""

import json
import os
import pathlib
import sys
import time

# pin every mode knob that isn't explicitly under test: without this, a
# previously-written wave_mode.json would silently flip the engine's
# defaults mid-measurement and the JSONL records would mislabel what ran
os.environ.setdefault("DAMAPPER_WAVE_PACKOPS", "0")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(str(pathlib.Path(__file__).resolve().parent.parent
                         / "tests" / "data" / "xla_cache"))

import jax.numpy as jnp  # noqa: E402

from damapper_tpu.ops.spec import new_align_spec  # noqa: E402
from damapper_tpu.ops.wave_pallas import PallasWaveEngine  # noqa: E402
from tests.test_wave_jax import make_cases  # noqa: E402


def key(rec):
    a, b = rec
    return (a.abpos, a.bbpos, a.aepos, a.bepos, a.diffs,
            tuple(a.trace), tuple(b.trace))


def run(engine, dev, seqmem, insts, label):
    t0 = time.time()
    got = engine.local_alignment_batch(dev, dev, seqmem, seqmem, insts)
    dt = time.time() - t0
    print(f"{label}: {dt:.2f}s total, {1e3 * dt / len(insts):.2f} ms/lane,"
          f" fallback={engine.n_fallback}"
          f" iters={getattr(engine, 'last_iters', 0)}"
          f" launches={getattr(engine, 'last_launches', 0)}", flush=True)
    return got, dt


def main():
    ncases = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rlen = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    mode = sys.argv[3] if len(sys.argv) > 3 else "ab"
    # bench-like length mix: fixed-length harnesses hid lanepack's
    # band-overflow fallback cost at real read-length spreads
    seqmem, insts = make_cases(777, ncases=ncases, glen=4 * rlen,
                               rlen=rlen, err=0.15, mix=True)
    spec = new_align_spec(0.85, 100, [.25, .25, .25, .25], True)
    dev = jnp.asarray(seqmem)
    print(f"{ncases} lanes, reads ~{rlen}bp", flush=True)

    results = {}
    for label, persistent, lanepack in (("classic", False, False),
                                        ("persistent", True, False),
                                        ("lanepack", False, True),
                                        ("plp", True, True)):
        if mode == "ab" and label in ("lanepack", "plp"):
            continue
        if mode != "ab" and mode != label:
            continue
        # band_cap stays at the engine's per-mode default so the record
        # reflects the exact production shape of that mode
        eng = PallasWaveEngine(spec, pool_cap=2048,
                               persistent=persistent, lanepack=lanepack)
        eng.host_min = 0
        run(eng, dev, seqmem, insts, label + " (compile)")
        got, dt = run(eng, dev, seqmem, insts, label + " (warm)   ")
        results[label] = (got, dt)
        # machine-readable record for tools/pick_wave_mode.py: the tunnel
        # watcher runs the roundout unattended, so the winning mode must be
        # derivable from a log no human is reading
        import jax
        rec = {"mode": label, "persistent": persistent, "lanepack": lanepack,
               "packops": os.environ.get("DAMAPPER_WAVE_PACKOPS", "0") == "1",
               "group": eng.G if hasattr(eng, "G") else
               os.environ.get("DAMAPPER_WAVE_GROUP"),
               "ncases": ncases, "rlen": rlen, "mix": True,
               "platform": jax.devices()[0].platform,
               "total_s": round(dt, 3),
               "ms_per_lane": round(1e3 * dt / len(insts), 3),
               "fallback": int(eng.n_fallback), "ts": time.time()}
        logp = os.environ.get(
            "WAVE_AB_LOG",
            str(pathlib.Path(__file__).parent / "wave_ab_results.jsonl"))
        with open(logp, "a") as fh:
            fh.write(json.dumps(rec) + "\n")

    if len(results) == 2:
        gc, dc = results["classic"]
        gp, dp = results["persistent"]
        mism = sum(1 for a, b in zip(gc, gp) if key(a) != key(b))
        print(f"identical: {mism == 0} ({mism} mismatches); "
              f"speedup {dc / dp:.2f}x", flush=True)
        if mism:
            sys.exit(1)


if __name__ == "__main__":
    main()
