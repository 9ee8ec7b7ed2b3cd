"""Per-mode Mosaic compile gate for the wave kernel.

Round 2 shipped three kernel variants that all failed to LOWER on the
real TPU toolchain while interpret-mode CI stayed green.  This gate
compiles every mode on the actual backend (each in its own subprocess,
time-bounded, so a compiler SIGABRT or hang cannot take the rest down)
and records per-mode status to tools/wave_compile_status.json:

    {"classic": {"status": "ok", "s": 41.2},
     "persistent": {"status": "fail", "reason": "NotImplementedError..."},
     ...}

bench.py embeds this file in its JSON output, and tools/pick_wave_mode.py
refuses to pick a winner unless every mode that compiles also has a warm
measurement — a dark-variant round cannot recur silently.

Usage: python tools/wave_compile_gate.py [--quick]
"""

import json
import os
import pathlib
import subprocess
import sys
import time

REPO = pathlib.Path(__file__).resolve().parent.parent
STATUS_FILE = REPO / "tools" / "wave_compile_status.json"

# mode name -> (wave_ab mode arg, packops env)
MODES = {
    "classic": ("classic", "0"),
    "classic_packops": ("classic", "1"),
    "lanepack": ("lanepack", "0"),
    "persistent": ("persistent", "0"),
    "persistent_packops": ("persistent", "1"),
    "plp": ("plp", "0"),
}


def triple(name):
    ab_mode, packops = MODES[name]
    return {"persistent": ab_mode in ("persistent", "plp"),
            "packops": packops == "1",
            "lanepack": ab_mode in ("lanepack", "plp")}


def probe(name, timeout=420):
    ab_mode, packops = MODES[name]
    env = dict(os.environ, DAMAPPER_WAVE_PACKOPS=packops,
               WAVE_AB_LOG="/dev/null")
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, str(REPO / "tools" / "wave_ab.py"),
             "8", "2000", ab_mode],
            env=env, capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"status": "fail", "reason": f"timeout after {timeout}s"}
    dt = round(time.time() - t0, 1)
    if r.returncode == 0:
        return {"status": "ok", "s": dt}
    tail = [ln for ln in (r.stderr or "").splitlines()
            if ln.strip() and "WARNING" not in ln]
    reason = ""
    for ln in reversed(tail):
        if ("Error" in ln or "error" in ln or "NotImplemented" in ln
                or "SIGABRT" in ln or "HTTP 500" in ln):
            reason = ln.strip()[:300]
            break
    if not reason and tail:
        reason = tail[-1].strip()[:300]
    return {"status": "fail", "rc": r.returncode, "reason": reason,
            "s": dt}


def main():
    quick = "--quick" in sys.argv
    names = (["classic", "persistent"] if quick else list(MODES))
    status = {}
    if STATUS_FILE.exists():
        try:
            status = json.loads(STATUS_FILE.read_text())
        except ValueError:
            status = {}
    for name in names:
        print(f"== compile gate: {name} ==", flush=True)
        status[name] = probe(name)
        status[name]["ts"] = time.time()
        print(f"   {status[name]}", flush=True)
        STATUS_FILE.write_text(json.dumps(status, indent=1) + "\n")
    bad = [n for n in names if status[n]["status"] != "ok"]
    print(f"gate: {len(names) - len(bad)}/{len(names)} modes compile; "
          f"failing: {bad or 'none'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
