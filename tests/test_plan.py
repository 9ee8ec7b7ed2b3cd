import json
import os

import pytest

from damapper_tpu.io import db as dbio
from damapper_tpu.io import fasta
from damapper_tpu.parallel.plan import generate_plan
from tests import helpers


@pytest.fixture()
def dbs(tmp_path):
    genome, reads = helpers.sim_dataset(seed=5, glen=30000, nreads=12)
    dbio.create_dam(str(tmp_path / "ref.dam"),
                    [fasta.FastaEntry("g", genome)])
    dbio.create_db(str(tmp_path / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)],
                   bsize=20000)   # multiple blocks
    return tmp_path


def test_plan_sh(dbs, monkeypatch):
    monkeypatch.chdir(dbs)
    stub = dbio.read_stub(str(dbs / "reads.db"))
    plan = generate_plan("ref.dam", "reads.db", bunit=2)
    lines = plan.splitlines()
    njobs = (stub.nblocks - 1) // 2 + 1
    assert lines[0] == f"# Damapper jobs ({njobs})"
    body = [ln for ln in lines[1:] if not ln.startswith("#")]
    # every block appears exactly once across jobs
    blocks = []
    for ln in body:
        if "lacheck" in ln:
            continue
        blocks += [a for a in ln.split() if a.startswith("reads.")]
    assert sorted(blocks) == sorted(
        f"reads.{k}" for k in range(1, stub.nblocks + 1))
    assert "lacheck" in lines[-1]


def test_plan_json_hosts(dbs, monkeypatch):
    monkeypatch.chdir(dbs)
    plan = json.loads(generate_plan("ref.dam", "reads.db", bunit=1,
                                    nhosts=2, fmt="json"))
    hosts = {j["host"] for j in plan["jobs"]}
    assert hosts <= {0, 1}
    assert plan["resume"]["first_block"] == 1


def test_plan_resume_contract(dbs, monkeypatch):
    monkeypatch.chdir(dbs)
    # block 1 output missing -> requesting range starting at 2 must fail
    with pytest.raises(FileNotFoundError):
        generate_plan("ref.dam", "reads.db", first_block=2)
    # create block-1 output -> range from 2 allowed
    (dbs / "reads.1.ref.las").write_bytes(b"\0" * 12)
    generate_plan("ref.dam", "reads.db", first_block=2)
    # but block 2 existing must refuse
    (dbs / "reads.2.ref.las").write_bytes(b"\0" * 12)
    with pytest.raises(FileExistsError):
        generate_plan("ref.dam", "reads.db", first_block=2)


def test_plan_execution_end_to_end(tmp_path, monkeypatch):
    """Execute a generated plan (job lines + the LAcheck block) with the
    real CLI and verify the concatenated per-block .las equals a
    single-shot run (the reference's cluster workflow, README.md:79-104)."""
    import subprocess
    import sys as _sys

    from damapper_tpu.io import las as lasio
    from damapper_tpu.pipeline.mapper import DamapperConfig, run_damapper

    dbs = tmp_path
    genome, reads = helpers.sim_dataset(seed=6, glen=15000, nreads=6,
                                        min_len=1500, max_len=3000)
    dbio.create_dam(str(dbs / "ref.dam"),
                    [fasta.FastaEntry("g", genome)])
    dbio.create_db(str(dbs / "reads.db"),
                   [fasta.FastaEntry(f"r{i}", r)
                    for i, r in enumerate(reads)],
                   bsize=5000)   # several blocks
    monkeypatch.chdir(dbs)
    plan = generate_plan("ref.dam", "reads.db", bunit=1)
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [str(helpers.REPO)] + env.get("PYTHONPATH", "").split(os.pathsep))
    env["JAX_PLATFORMS"] = "cpu"
    env["DAMAPPER_WAVE"] = "oracle"
    for ln in plan.splitlines():
        if ln.startswith("#"):
            continue
        cmd = ln.replace("python ", f"{_sys.executable} ", 1)
        r = subprocess.run(cmd, shell=True, cwd=dbs, env=env,
                           capture_output=True, text=True)
        assert r.returncode == 0, f"{ln}\n{r.stdout}\n{r.stderr}"

    stub = dbio.read_stub(str(dbs / "reads.db"))
    per_block = []
    for k in range(1, stub.nblocks + 1):
        recs, ts = lasio.read_las(str(dbs / f"reads.{k}.ref.las"))
        per_block.extend(recs)

    out = dbs / "single"
    out.mkdir()
    a, _ = run_damapper(str(dbs / "ref.dam"), str(dbs / "reads.db"),
                        DamapperConfig(wave_backend="oracle"),
                        out_dir=str(out))
    single, _ = lasio.read_las(a)
    assert lasio.las_equal(single, per_block)


def test_db_block_arg_expansion(tmp_path):
    """'@' DB block-range arguments (Parse_Block_DB_Arg DB.c:2822-2923)."""
    import numpy as np
    import pytest
    from damapper_tpu.io import db as dbio, fasta
    from damapper_tpu.pipeline.mapper import expand_db_block_arg
    from tests import helpers

    rng = np.random.default_rng(3)
    reads = [helpers.sim_genome(rng, 3000) for _ in range(12)]
    dbio.create_db(str(tmp_path / "rd.db"),
                   [fasta.FastaEntry(f"r{i}", r) for i, r in enumerate(reads)],
                   bsize=9_000)
    nb = dbio.read_stub(str(tmp_path / "rd.db")).nblocks
    assert nb >= 3
    base = str(tmp_path / "rd")
    assert expand_db_block_arg(base) == [base]
    assert expand_db_block_arg(base + ".@") == \
        [f"{base}.{k}" for k in range(1, nb + 1)]
    assert expand_db_block_arg(base + ".@2") == \
        [f"{base}.{k}" for k in range(2, nb + 1)]
    assert expand_db_block_arg(base + ".@2-3") == [base + ".2", base + ".3"]
    with pytest.raises(ValueError):
        expand_db_block_arg(base + ".@3-2")
    with pytest.raises(FileNotFoundError):
        expand_db_block_arg(str(tmp_path / "nope") + ".@")


def test_plan_file_bundles(dbs, monkeypatch):
    """-f<name> job bundles (HPC.damapper.c:135-140, README.md:91-104):
    jobs land in <name>.01.OVL, the check block in <name>.02.CHECK.OPT,
    nothing on stdout — the reference generator's file shape."""
    monkeypatch.chdir(dbs)
    out = generate_plan("ref.dam", "reads.db", bunit=2, oname="NAME")
    assert out == ""
    ovl = (dbs / "NAME.01.OVL").read_text().splitlines()
    chk = (dbs / "NAME.02.CHECK.OPT").read_text().splitlines()
    assert ovl[0].startswith("# Damapper jobs (")
    assert all("lacheck" not in ln for ln in ovl)
    assert chk[0] == "# Check all .las files (optional but recommended)"
    assert "lacheck -vaS" in chk[1]


def test_plan_submit_decorations(dbs, monkeypatch):
    """--lsf/--slurm submission wrappers (HPC.damapper.c:22-46): each job
    line is prefixed with the scheduler command and the damapper command
    rides in quotes; -T/-M feed the SLURM resource fields."""
    monkeypatch.chdir(dbs)
    lsf = generate_plan("ref.dam", "reads.db", bunit=2, submit="lsf")
    for i, ln in enumerate(
            [l for l in lsf.splitlines()
             if not l.startswith("#") and "lacheck" not in l], start=1):
        assert ln.startswith(f"bsub -q medium -n 4 -o DAMAPPER.out "
                             f"-e DAMAPPER.err -R span[hosts=1] "
                             f"-J map#{i} \"")
        assert ln.endswith('"')
    slurm = generate_plan("ref.dam", "reads.db", bunit=2, submit="slurm",
                          opts="-T8 -M32")
    body = [l for l in slurm.splitlines()
            if not l.startswith("#") and "lacheck" not in l]
    # mem_per_cpu = 32GB * 1024 / 8 threads (HPC.damapper.c:389)
    assert body[0].startswith("srun -p batch -n 1 -c 8 "
                              "--mem_per_cpu=4096 -o DALIGNER.out "
                              "-e DALIGNER.err -J map#1 \"")
    # default memory: 16GB when -M absent
    slurm_d = generate_plan("ref.dam", "reads.db", bunit=2, submit="slurm")
    body_d = [l for l in slurm_d.splitlines()
              if not l.startswith("#") and "lacheck" not in l]
    assert "--mem_per_cpu=4096 " in body_d[0]   # 16*1024/4


def test_plan_lacheck_flags(dbs, monkeypatch):
    """LAcheck flags mirror the reference: -vaS normally, -vS with -z
    (HPC.damapper.c:456-459)."""
    monkeypatch.chdir(dbs)
    assert "lacheck -vaS " in generate_plan("ref.dam", "reads.db")
    assert "lacheck -vS " in generate_plan("ref.dam", "reads.db",
                                           opts="-z")
