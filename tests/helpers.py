"""Test helpers: data simulation and the reference-binary golden harness."""

from __future__ import annotations

import os
import pathlib
import subprocess
import sys

import numpy as np

REPO = pathlib.Path(__file__).resolve().parent.parent
REF = pathlib.Path("/root/reference")
BIN = REPO / "tests" / "bin"

BASES = "ACGT"


def sim_genome(rng: np.random.Generator, length: int) -> str:
    # vectorized but draw-identical to "".join(BASES[i] for i in draws):
    # Gbp-scale genomes take seconds, not minutes
    draws = rng.integers(0, 4, size=length)
    return np.frombuffer(BASES.encode(), dtype="S1")[draws].tobytes().decode()


def sim_read(rng: np.random.Generator, genome: str, min_len=2000, max_len=12000,
             err=0.15, ins_frac=0.55, del_frac=0.25):
    """Sample one PacBio-like read: substring + errors + random orientation.
    Returns (read_str, true_start, true_end, comp)."""
    L = len(genome)
    n = int(rng.integers(min_len, max_len + 1))
    n = min(n, L - 1)
    start = int(rng.integers(0, L - n))
    frag = genome[start:start + n]
    comp = bool(rng.integers(0, 2))
    if comp:
        tr = str.maketrans("ACGT", "TGCA")
        frag = frag.translate(tr)[::-1]
    out = []
    for ch in frag:
        r = rng.random()
        if r < err:
            e = rng.random()
            if e < ins_frac:                      # insertion
                out.append(BASES[rng.integers(0, 4)])
                out.append(ch)
            elif e < ins_frac + del_frac:         # deletion
                pass
            else:                                 # substitution
                out.append(BASES[(BASES.index(ch) + 1 + rng.integers(0, 3)) % 4])
        else:
            out.append(ch)
    return "".join(out), start, start + n, comp


def sim_dataset(seed: int, glen: int, nreads: int, **kw):
    rng = np.random.default_rng(seed)
    genome = sim_genome(rng, glen)
    reads = [sim_read(rng, genome, **kw)[0] for _ in range(nreads)]
    return genome, reads


# --- reference binary harness -------------------------------------------------

def build_reference() -> pathlib.Path:
    """Compile the reference damapper (sources read from /root/reference,
    artifacts kept inside the repo's gitignored tests/bin)."""
    BIN.mkdir(parents=True, exist_ok=True)
    exe = BIN / "damapper_ref"
    srcs = [REF / s for s in ("damapper.c", "map.c", "align.c", "DB.c", "QV.c")]
    if exe.exists() and all(exe.stat().st_mtime > s.stat().st_mtime for s in srcs):
        return exe
    subprocess.run(
        ["gcc", "-O3", "-Wno-unused-result", "-o", str(exe)]
        + [str(s) for s in srcs] + ["-lpthread", "-lm"],
        check=True, capture_output=True)
    return exe


def install_la_shims() -> None:
    """Install LAsort/LAcat/LAmerge/LAcheck shims (backed by our las codec)
    into tests/bin so the reference damapper's system() calls resolve."""
    BIN.mkdir(parents=True, exist_ok=True)
    for name, sub in [("LAsort", "lasort"), ("LAcat", "lacat"),
                      ("LAmerge", "lamerge"), ("LAcheck", "lacheck")]:
        p = BIN / name
        p.write_text("#!/bin/sh\nexec %s -m damapper_tpu.cli %s \"$@\"\n"
                     % (sys.executable, sub))
        p.chmod(0o755)


def run_reference_damapper(workdir, ref_dam: str, reads_db: str,
                           opts: list[str] | None = None) -> pathlib.Path:
    """Run the reference binary in `workdir`; returns the output .las path."""
    exe = build_reference()
    install_la_shims()
    env = dict(os.environ)
    env["PATH"] = str(BIN) + ":" + env["PATH"]
    env["PYTHONPATH"] = str(REPO) + ":" + env.get("PYTHONPATH", "")
    tmp = pathlib.Path(workdir) / "tmp"
    tmp.mkdir(exist_ok=True)
    cmd = [str(exe)] + (opts or []) + ["-P" + str(tmp), ref_dam, reads_db]
    r = subprocess.run(cmd, cwd=workdir, env=env, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"reference damapper failed:\n{r.stdout}\n{r.stderr}")
    aroot = pathlib.Path(ref_dam).name
    for suf in (".dam", ".db"):
        if aroot.endswith(suf):
            aroot = aroot[: -len(suf)]
    broot = pathlib.Path(reads_db).name
    for suf in (".dam", ".db"):
        if broot.endswith(suf):
            broot = broot[: -len(suf)]
    return pathlib.Path(workdir) / f"{broot}.{aroot}.las"
