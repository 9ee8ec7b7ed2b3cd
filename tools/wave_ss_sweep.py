"""Sweep the wave kernel's import-time constants on real hardware:
DAMAPPER_WAVE_SS (snake columns per phase-1 iteration) and
DAMAPPER_WAVE_DRANK (drop ranks per trip).  Each value needs a fresh
process (module-level constants), so this driver re-execs
tools/wave_sweep.py with one production shape per setting and collects
the ms/lane lines.

Usage: python tools/wave_ss_sweep.py [ncases]
"""

import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def run(env_kv, ncases):
    env = dict(os.environ, WAVE_SWEEP_SHAPES="128,256,32", **env_kv)
    p = subprocess.run(
        [sys.executable, str(REPO / "tools" / "wave_sweep.py"),
         str(ncases)],
        env=env, capture_output=True, text=True, timeout=1800)
    for line in p.stdout.splitlines():
        if line.startswith("B="):
            print(f"{env_kv}: {line}", flush=True)
    if p.returncode:
        print(f"{env_kv}: FAILED rc={p.returncode}", flush=True)
        print(p.stdout[-500:], p.stderr[-500:], flush=True)


def main():
    ncases = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    for ss in ("8", "16", "24", "32"):
        run({"DAMAPPER_WAVE_SS": ss}, ncases)
    for dr in ("1", "2", "4"):
        run({"DAMAPPER_WAVE_DRANK": dr}, ncases)


if __name__ == "__main__":
    main()
