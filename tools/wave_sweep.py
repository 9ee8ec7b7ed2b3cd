"""Shape sweep for the classic pallas wave driver on real hardware.

Measures warm ms/lane over a bench-like mixed-length batch for a matrix of
(BUCKET, BW, G) shapes (chunk lanes, reload-window columns, lockstep group),
asserting record-identical output vs the production default shape, and
appends every measurement to tools/wave_ab_results.jsonl (the provenance
file behind damapper_tpu/wave_mode.json).

The per-driver-iteration cost is dominated by streaming the full chunk
state (~37KB/lane incl. the 6 match planes) through the pallas call: a
smaller BUCKET pays less per iteration but runs more chunks; a larger BW
reloads less often but carries bigger planes.  This sweep measures the
real trade on the attached accelerator.

Usage: python tools/wave_sweep.py [ncases] [rlen]
Env:   WAVE_SWEEP_SHAPES="B,BW,G;B,BW,G;..." to override the matrix.
"""

import json
import os
import pathlib
import sys
import time

os.environ.setdefault("DAMAPPER_WAVE_PACKOPS", "0")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(str(pathlib.Path(__file__).resolve().parent.parent
                         / "tests" / "data" / "xla_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from damapper_tpu.ops.spec import new_align_spec  # noqa: E402
from damapper_tpu.ops.wave_pallas import PallasWaveEngine  # noqa: E402
from tests.test_wave_jax import make_cases  # noqa: E402


def key(rec):
    a, b = rec
    return (a.abpos, a.bbpos, a.aepos, a.bepos, a.diffs,
            tuple(a.trace), tuple(b.trace))


DEFAULT_SHAPES = [
    (256, 256, 32),     # production default (round 3/4)
    (128, 256, 32),
    (64, 256, 32),
    (64, 256, 64),
    (256, 512, 32),
    (128, 512, 32),
    (256, 384, 32),
    (256, 256, 16),
]


def main():
    ncases = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rlen = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    shapes = DEFAULT_SHAPES
    if os.environ.get("WAVE_SWEEP_SHAPES"):
        shapes = [tuple(int(x) for x in s.split(","))
                  for s in os.environ["WAVE_SWEEP_SHAPES"].split(";")]
    seqmem, insts = make_cases(777, ncases=ncases, glen=4 * rlen,
                               rlen=rlen, err=0.15, mix=True)
    spec = new_align_spec(0.85, 100, [.25, .25, .25, .25], True)
    dev = jnp.asarray(seqmem)
    logp = os.environ.get(
        "WAVE_AB_LOG",
        str(pathlib.Path(__file__).parent / "wave_ab_results.jsonl"))
    print(f"{ncases} lanes, reads ~{rlen}bp, platform "
          f"{jax.devices()[0].platform}", flush=True)

    golden = None
    for (B, BW, G) in shapes:
        os.environ["DAMAPPER_WAVE_BW"] = str(BW)
        eng = PallasWaveEngine(spec, pool_cap=2048, persistent=False,
                               lanepack=False, group=G)
        eng.BUCKET = B
        eng.host_min = 0
        label = f"B={B} BW={BW} G={G}"
        t0 = time.time()
        eng.local_alignment_batch(dev, dev, seqmem, seqmem, insts)
        tc = time.time() - t0
        t0 = time.time()
        got = eng.local_alignment_batch(dev, dev, seqmem, seqmem, insts)
        dt = time.time() - t0
        print(f"{label}: warm {dt:.2f}s, {1e3 * dt / ncases:.2f} ms/lane "
              f"(compile+first {tc:.1f}s) fallback={eng.n_fallback}",
              flush=True)
        if golden is None:
            golden = got
            mism = 0
        else:
            mism = sum(1 for a, b in zip(golden, got) if key(a) != key(b))
            if mism:
                print(f"  !! {mism} record mismatches vs default shape",
                      flush=True)
        rec = {"mode": "classic", "sweep": True, "bucket": B, "bw": BW,
               "group": G, "ncases": ncases, "rlen": rlen, "mix": True,
               "platform": jax.devices()[0].platform,
               "total_s": round(dt, 3),
               "ms_per_lane": round(1e3 * dt / ncases, 3),
               "fallback": int(eng.n_fallback), "mismatches": mism,
               "ts": time.time()}
        with open(logp, "a") as fh:
            fh.write(json.dumps(rec) + "\n")
        if mism:
            sys.exit(1)


if __name__ == "__main__":
    main()
