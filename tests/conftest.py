import os

# see damapper_tpu/__init__.py: numpy's hugepage madvise is a 7x fault-rate
# loss under this kernel's THP defrag mode
os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs multichip).
# NB: the environment may pre-import jax with a TPU platform plugin, so force
# the platform via jax.config too — env vars alone are read too late.
os.environ["JAX_PLATFORMS"] = "cpu"
# always exercise the device wave path: tests use tiny batches that the
# production tiny-round host-oracle route would otherwise absorb
os.environ["DAMAPPER_WAVE_HOSTMIN"] = "0"
xf = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xf:
    os.environ["XLA_FLAGS"] = (
        xf + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib  # noqa: E402
import sys  # noqa: E402

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

# persistent XLA compile cache: repeat suite runs skip LLVM re-compilation
# of the big wave kernels entirely (also shared with bench.py / tools)
from damapper_tpu.utils.cache import enable_compile_cache  # noqa: E402

enable_compile_cache(str(pathlib.Path(__file__).parent / "data"
                         / "xla_cache"))

# the full suite's one process accumulates >65530 mmaps (hundreds of XLA
# executables); at the stock vm.max_map_count it segfaults inside XLA's
# compile path — raise the limit when privileged (see utils/sysfix.py)
from damapper_tpu.utils.sysfix import ensure_map_count  # noqa: E402

ensure_map_count()


import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def golden_small(tmp_path_factory):
    """Small mapped dataset: (reads_db, ref_db, las_records, tspace) with
    sequences loaded, for consumer-side (trace/display) tests."""
    from damapper_tpu.io import db as dbio
    from damapper_tpu.io import fasta
    from damapper_tpu.io import las as lasio
    from damapper_tpu.pipeline.mapper import DamapperConfig, run_damapper
    from tests import helpers

    tmp = tmp_path_factory.mktemp("golden_small")
    rng = np.random.default_rng(11)
    glen, ncontigs, nreads = 60_000, 2, 12
    genome = helpers.sim_genome(rng, glen)
    clen = glen // ncontigs
    entries = [fasta.FastaEntry(f"ctg{i}", genome[i * clen:(i + 1) * clen])
               for i in range(ncontigs)]
    reads = []
    for _ in range(nreads):
        ci = int(rng.integers(0, ncontigs))
        r, *_ = helpers.sim_read(rng, entries[ci].seq,
                                 min_len=2000, max_len=6000)
        reads.append(r)
    dbio.create_dam(str(tmp / "ref.dam"), entries, bsize=70_000)
    dbio.create_db(str(tmp / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)])
    cfg = DamapperConfig(wave_backend="oracle")
    a_path, _ = run_damapper(str(tmp / "ref.dam"), str(tmp / "reads.db"),
                             cfg, out_dir=str(tmp))
    recs, tspace = lasio.read_las(a_path)
    reads_db = dbio.DazzDB.open(str(tmp / "reads.db"))
    reads_db.trim()
    reads_db.load_bases()
    ref_db = dbio.DazzDB.open(str(tmp / "ref.dam"))
    ref_db.trim()
    ref_db.load_bases()
    return reads_db, ref_db, recs, tspace
