"""Iteration accounting for the wave kernel: where does the time go?

Runs the classic engine with kit telemetry and prints, per warm run:
total group-iterations (sum over groups of that group's in-kernel
iteration count), total waves, and the derived cost per kernel
iteration — separating in-kernel compute from driver glue.

Usage: python tools/wave_kit.py [ncases] [rlen] [G] [band_cap]
"""

import os
import pathlib
import sys
import time

os.environ["DAMAPPER_WAVE_KIT"] = "1"
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


def main():
    ncases = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rlen = int(sys.argv[2]) if len(sys.argv) > 2 else 6000
    G = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    W = int(sys.argv[4]) if len(sys.argv) > 4 else 64
    seqmem, insts = make_cases(777, ncases=ncases, glen=4 * rlen,
                               rlen=rlen, err=0.15)
    spec = new_align_spec(0.85, 100, [.25, .25, .25, .25], True)
    dev = jnp.asarray(seqmem)

    eng = PallasWaveEngine(spec, band_cap=W, pool_cap=2048, group=G,
                           persistent=False)
    eng.host_min = 0
    eng.local_alignment_batch(dev, dev, seqmem, seqmem, insts)  # compile
    # tunnel jitter swings single runs ~30%: take the min of 3 warm runs
    dt = float("inf")
    for _ in range(3):
        eng.kit_log = []
        eng.total_waves = 0
        t0 = time.time()
        eng.local_alignment_batch(dev, dev, seqmem, seqmem, insts)
        dt = min(dt, time.time() - t0)
    # each lane of a lockstep group carries the group's iteration count:
    # take one lane per group
    git = 0
    lanes = 0
    for kit in eng.kit_log:
        B = len(kit)
        lanes += B
        git += int(kit.reshape(-1, min(G, B))[:, 0].sum())
    print(f"G={G} lanes={ncases} (padded {lanes}) warm={dt:.3f}s "
          f"group-iters={git} waves={eng.total_waves} "
          f"us/group-iter={1e6 * dt / max(git, 1):.2f} "
          f"driver-iters={eng.last_iters} "
          f"kit/wave={git * min(G, lanes) / max(eng.total_waves, 1):.2f}")


if __name__ == "__main__":
    main()
