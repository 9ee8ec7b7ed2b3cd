"""Cooperative sharded-index overhead on the virtual 8-device CPU mesh.

BASELINE config 5 shards the reference index over hosts ("ref" axis);
real multi-host hardware is not attached, but the STRUCTURAL overhead of
the sharded matcher (psum-merged group counts, per-shard emission, the
order-restoring gathered sort) is measurable on one process with an
8-virtual-device mesh: run the SAME dataset through the real mapper at
nref=1 (dp-only) and nref=2/4, record wall clocks and `.las` identity
to SHARDING_OVERHEAD.json.

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
          python tools/sharding_overhead.py [glen] [nreads]
(the script sets those itself when unset)
"""

import json
import os
import pathlib
import sys
import tempfile
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

REPO = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402


def main():
    glen = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    nreads = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    import jax
    # the preset axon plugin wins over env vars read this late: force the
    # CPU platform and the 8-device mesh via config (tests/conftest.py
    # does the same)
    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta
    from damapper_tpu.io import las as lasio
    from damapper_tpu.parallel.mesh import make_mesh
    from damapper_tpu.pipeline.mapper import DamapperConfig, run_damapper
    sys.path.insert(0, str(REPO / "tests"))
    import helpers

    assert len(jax.devices()) >= 8, "needs the 8-virtual-device CPU mesh"
    rng = np.random.default_rng(5)
    genome = helpers.sim_genome(rng, glen)
    reads = [helpers.sim_read(rng, genome, min_len=3000, max_len=8000)[0]
             for _ in range(nreads)]

    rec = {"metric": "ref-axis sharded-index overhead, 8-device CPU mesh "
                     "(one process; structural cost of psum counts + "
                     "per-shard emission + order-restoring sort)",
           "genome_bp": glen, "nreads": nreads, "host_cores": os.cpu_count(),
           "configs": {}}
    with tempfile.TemporaryDirectory() as tmp:
        tmp = pathlib.Path(tmp)
        dbio.create_dam(str(tmp / "ref.dam"),
                        [fasta.FastaEntry("ctg0", genome)], bsize=glen)
        dbio.create_db(str(tmp / "reads.db"),
                       [fasta.FastaEntry(f"r{i}", r)
                        for i, r in enumerate(reads)])
        base = None
        for nref in (1, 2, 4):
            mesh = make_mesh(8, ref_shards=nref)
            out = tmp / f"nref{nref}"
            out.mkdir()
            cfg = DamapperConfig(wave_backend="jax", index_backend="device",
                                 mesh=mesh)
            # run twice: first pays compiles, second is the measurement
            ts = []
            for rep in range(2):
                for f in out.glob("*.las"):
                    f.unlink()
                t0 = time.time()
                a, _ = run_damapper(str(tmp / "ref.dam"),
                                    str(tmp / "reads.db"), cfg,
                                    out_dir=str(out))
                ts.append(round(time.time() - t0, 2))
            recs, _ = lasio.read_las(a)
            if base is None:
                base = recs
                ident = True
            else:
                ident = lasio.las_equal(base, recs)
            rec["configs"][f"nref{nref}"] = {
                "seconds_cold": ts[0], "seconds": ts[1],
                "overhead_vs_nref1": None, "las_identical_to_nref1": ident}
        s1 = rec["configs"]["nref1"]["seconds"]
        for k, v in rec["configs"].items():
            v["overhead_vs_nref1"] = round(v["seconds"] / s1, 3)
    (REPO / "SHARDING_OVERHEAD.json").write_text(
        json.dumps(rec, indent=1) + "\n")
    print(json.dumps(rec, indent=1))


if __name__ == "__main__":
    main()
