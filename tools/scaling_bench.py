"""Multi-host scaling efficiency: reads/s at 1 process vs N processes.

BASELINE.md's north star is >=80% reads/s scaling efficiency from 1 to N
hosts.  This harness runs the same generated plan through
parallel.launch.run_plan_multihost at nprocs=1 and nprocs=N (per-rank
block-ownership mode, the HPC.damapper model) and records

    efficiency = T(1) / (N * T(N))

to SCALING.json, together with the host context.  NOTE the context field:
on a single-core host every "rank" shares one CPU, so ~1/N efficiency is
the physical ceiling there — the number is only meaningful on hardware
with >= N cores/hosts.  The harness exists so the measurement is one
command on real hardware: `python tools/scaling_bench.py [nprocs] [glen]`.
"""

import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

REPO = pathlib.Path(__file__).resolve().parent.parent


def main():
    nprocs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    glen = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    nreads = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta
    from damapper_tpu.io import las as lasio
    from damapper_tpu.parallel.launch import run_plan_multihost
    from damapper_tpu.parallel.plan import generate_plan
    sys.path.insert(0, str(REPO / "tests"))
    import helpers

    rng = np.random.default_rng(5)
    genome = helpers.sim_genome(rng, glen)
    reads = [helpers.sim_read(rng, genome, min_len=3000, max_len=8000)[0]
             for _ in range(nreads)]

    results = {}
    with tempfile.TemporaryDirectory() as tmp:
        tmp = pathlib.Path(tmp)
        dbio.create_dam(str(tmp / "ref.dam"),
                        [fasta.FastaEntry("ctg0", genome)], bsize=glen)
        # one read block per rank so ownership mode has work to spread
        dbio.create_db(str(tmp / "reads.db"),
                       [fasta.FastaEntry(f"r{i}", r)
                        for i, r in enumerate(reads)],
                       bsize=max(200_000,
                                 sum(len(r) for r in reads) // (2 * nprocs)))
        cwd = os.getcwd()
        os.chdir(tmp)
        try:
            plan = generate_plan("ref.dam", "reads.db", bunit=1,
                                 nhosts=nprocs, opts="-k20", fmt="json")
        finally:
            os.chdir(cwd)

        las = {}
        for n in (1, nprocs):
            wd = tmp / f"np{n}"
            wd.mkdir()
            for f in ("ref.dam", "reads.db"):
                os.link(tmp / f, wd / f)
            for f in tmp.iterdir():
                if f.name.startswith("."):
                    os.link(f, wd / f.name)
            t0 = time.time()
            res = run_plan_multihost(plan, nprocs=n, workdir=str(wd))
            dt = time.time() - t0
            if res["rc"] != 0:
                print("\n".join(res["logs"]))
                return 1
            results[n] = dt
            las[n], _ = lasio.read_las(str(wd / "reads.ref.las"))

        identical = lasio.las_equal(las[1], las[nprocs])

    ncores = os.cpu_count() or 1
    eff = results[1] / (nprocs * results[nprocs])
    out = {
        "metric": "multi-host scaling efficiency (per-rank block ownership)",
        "nprocs": nprocs, "genome_bp": glen, "nreads": nreads,
        "seconds_1proc": round(results[1], 2),
        f"seconds_{nprocs}proc": round(results[nprocs], 2),
        "efficiency": round(eff, 4),
        "las_identical": identical,
        "host_cores": ncores,
        "context": ("single-core host: all ranks share one CPU, so ~1/N "
                    "efficiency is the physical ceiling; run on >= "
                    f"{nprocs} cores/hosts for a meaningful number"
                    if ncores < nprocs else
                    f"{ncores} cores for {nprocs} ranks"),
    }
    (REPO / "SCALING.json").write_text(json.dumps(out, indent=1) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
