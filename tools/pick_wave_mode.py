"""Pick the fastest measured wave-engine mode and persist it as the default.

Reads the JSONL records appended by tools/wave_ab.py, keeps TPU-platform
rows at micro-bench scale (>= 32 lanes), takes the best (lowest warm
ms/lane) configuration per (persistent, packops, lanepack) triple, and
writes the winner to damapper_tpu/wave_mode.json — which PallasWaveEngine
uses as its default whenever the DAMAPPER_WAVE_* env vars are unset and
the backend is not CPU.

This closes the loop for unattended measurement: the tunnel watcher runs
tools/tpu_roundout.sh whenever the axon tunnel comes back, and this picker
(invoked by the roundout before its full-pipeline benches) flips the
production default to whatever actually won on hardware, with no human in
the loop.

Coverage guard: tools/wave_compile_gate.py records which modes actually
lower on the real toolchain; this picker REFUSES to write a mode file
unless every compiling mode has at least one warm measurement in the
chosen group — a winner may not be declared against dark competitors
(round-2 lesson: wave_mode.json was "picked" from a field of one).

Usage: python tools/pick_wave_mode.py [results.jsonl]
"""

import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent
MODE_FILE = REPO / "damapper_tpu" / "wave_mode.json"
STATUS_FILE = REPO / "tools" / "wave_compile_status.json"


def pick(rows):
    """Fastest configuration, compared only WITHIN one (ncases, rlen)
    measurement group: per-lane cost amortizes with batch size, so mixing
    batch sizes would pick by batch-size artifact rather than config merit.
    The group used is the one that measured the MOST distinct
    configurations (ties to the larger batch), so every mode competes."""
    rows = [r for r in rows
            if r.get("platform") not in (None, "cpu")
            and r.get("ncases", 0) >= 32]
    if not rows:
        return None

    def cfg(r):
        return (bool(r.get("persistent")), bool(r.get("packops")),
                bool(r.get("lanepack")))

    groups = {}
    for r in rows:
        groups.setdefault((r.get("ncases"), r.get("rlen")), []).append(r)
    chosen = max(groups.values(),
                 key=lambda g: (len({cfg(r) for r in g}),
                                g[0].get("ncases", 0)))
    best = {}
    for r in chosen:
        key = cfg(r)
        if key not in best or r["ms_per_lane"] < best[key]["ms_per_lane"]:
            best[key] = r
    return min(best.values(), key=lambda r: r["ms_per_lane"]), chosen


def main():
    src = pathlib.Path(sys.argv[1]) if len(sys.argv) > 1 else (
        REPO / "tools" / "wave_ab_results.jsonl")
    if not src.exists():
        print(f"no results at {src}; keeping current defaults")
        return 0
    rows = []
    for line in src.read_text().splitlines():
        line = line.strip()
        if line:
            try:
                rows.append(json.loads(line))
            except json.JSONDecodeError:
                pass
    picked = pick(rows)
    if picked is None:
        print("no TPU-scale rows; keeping current defaults")
        return 0
    win, chosen_group = picked
    # minimum-coverage guard: every mode the compile gate says lowers
    # must have a measured row IN THE GROUP THE WINNER WAS PICKED FROM
    # (a warm row in some other (ncases, rlen) group never actually
    # competed against the winner)
    if STATUS_FILE.exists():
        try:
            gate = json.loads(STATUS_FILE.read_text())
        except ValueError:
            gate = {}
        sys.path.insert(0, str(REPO / "tools"))
        from wave_compile_gate import triple
        measured = {(bool(r.get("persistent")), bool(r.get("packops")),
                     bool(r.get("lanepack"))) for r in chosen_group}
        missing = []
        for name, rec in gate.items():
            if rec.get("status") != "ok":
                continue
            tr = triple(name)
            key = (tr["persistent"], tr["packops"], tr["lanepack"])
            if key not in measured:
                missing.append(name)
        if missing:
            print(f"refusing to pick: compiling modes never measured "
                  f"warm: {missing}")
            return 1
    out = {"persistent": bool(win.get("persistent")),
           "packops": bool(win.get("packops")),
           "lanepack": bool(win.get("lanepack")),
           "ms_per_lane": win["ms_per_lane"],
           "platform": win["platform"],
           "source": str(src), "ts": win.get("ts")}
    MODE_FILE.write_text(json.dumps(out, indent=1) + "\n")
    print(f"wave mode -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
