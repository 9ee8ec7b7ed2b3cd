"""Offline engine-vs-oracle parity replay of dumped wave seeds.

1. Dump: DAMAPPER_WAVE_DUMP=/tmp/seeds.pkl <run the mapper>
2. Replay: python tools/wave_replay.py /tmp/seeds.pkl <reads_db> <ref_db>
           [abase_lo:abase_hi]

Runs the device engine (host_min=0, fallbacks still allowed for
overflow) and the host oracle on the same seeds and prints every lane
whose records differ — the minimal reproducer for kernel parity bugs
that batch-only routing hides from the CPU suite.
"""

import os
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(str(pathlib.Path(__file__).resolve().parent.parent
                         / "tests" / "data" / "xla_cache"))

import jax.numpy as jnp  # noqa: E402

from damapper_tpu.io import db as dbio  # noqa: E402
from damapper_tpu.ops.spec import new_align_spec  # noqa: E402
from damapper_tpu.ops import wave as wave_host  # noqa: E402
from damapper_tpu.ops.wave_pallas import PallasWaveEngine  # noqa: E402


def key(rec):
    a, b = rec
    return (a.abpos, a.bbpos, a.aepos, a.bepos, a.diffs,
            tuple(np.asarray(a.trace).tolist()),
            tuple(np.asarray(b.trace).tolist()))


def main():
    dump = sys.argv[1]
    reads_path, ref_path = sys.argv[2], sys.argv[3]
    sel = None
    if len(sys.argv) > 4:
        lo, hi = sys.argv[4].split(":")
        sel = (int(lo), int(hi))

    calls = []
    with open(dump, "rb") as fh:
        while True:
            try:
                calls.append(pickle.load(fh))
            except EOFError:
                break
    print(f"{len(calls)} calls, {sum(map(len, calls))} seeds to replay")

    rdb = dbio.DazzDB.open(reads_path)
    rdb.trim()
    rdb.load_bases()
    adb = dbio.DazzDB.open(ref_path)
    adb.trim()
    adb.load_bases()
    # the reporter's combined memory: [reads | comp reads | reference]
    # (pipeline/reporter.py _align_block_batched) — dumped seed offsets
    # index THIS layout
    from damapper_tpu.io.db import complement_numeric
    comp_seq = rdb.seq.copy()
    for i in range(rdb.nreads):
        o = int(rdb.reads["boff"][i])
        ln = int(rdb.reads["rlen"][i])
        comp_seq[o:o + ln] = complement_numeric(rdb.seq[o:o + ln])
    Anp = np.concatenate([rdb.seq, comp_seq, adb.seq])
    Bnp = Anp
    Adev = jnp.asarray(Anp)
    Bdev = Adev
    freq = adb.freq
    spec = new_align_spec(float(os.environ.get("REPLAY_E", 0.85)),
                          int(os.environ.get("REPLAY_S", 100)),
                          np.asarray(freq), True)

    eng = PallasWaveEngine(spec)
    eng.host_min = 0
    # replay each original CALL as its own batch: a parity bug may
    # depend on batch composition (P-bucket sizing, lane sorting)
    got = []
    seeds = []
    for c in calls:
        got.extend(eng.local_alignment_batch(Adev, Bdev, Anp, Bnp, c))
        seeds.extend(c)

    bad = 0
    for i, s in enumerate(seeds):
        # the engine always sees the FULL seed set (a kernel parity bug
        # may be batch-composition-dependent); `sel` only bounds the
        # slow host-oracle comparison
        if sel and not (sel[0] <= s["abase"] < sel[1]):
            continue
        a_np = Anp[s["abase"]:s["abase"] + s["alen"]]
        b_np = Bnp[s["bbase"]:s["bbase"] + s["blen"]]
        ref = wave_host.local_alignment(
            a_np, b_np, spec, int(s["diag"]), int(s["diag"]),
            int(s["anti"]), -1, -1, int(s.get("flags", 0)))
        if key(ref) != key(got[i]):
            bad += 1
            print(f"LANE MISMATCH seed={s}")
            print(f"  oracle: {key(ref)[:5]}")
            print(f"  engine: {key(got[i])[:5]}")
    print(f"{bad} mismatching lanes of {len(seeds)}"
          f" (fallbacks: {eng.n_fallback})")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
