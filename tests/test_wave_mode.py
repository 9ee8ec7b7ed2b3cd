"""tools/pick_wave_mode.py: measured-mode selection logic."""

import importlib.util
import json
import pathlib
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "pick_wave_mode", REPO / "tools" / "pick_wave_mode.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_pick_prefers_fastest_tpu_row():
    mod = _load()
    rows = [
        # cpu rows and tiny batches are ignored
        {"platform": "cpu", "ncases": 64, "ms_per_lane": 0.1,
         "persistent": True, "packops": False, "lanepack": False},
        {"platform": "tpu", "ncases": 8, "ms_per_lane": 0.2,
         "persistent": True, "packops": False, "lanepack": False},
        # duplicate configs: the better run represents the config
        {"platform": "tpu", "ncases": 64, "ms_per_lane": 3.2,
         "persistent": False, "packops": False, "lanepack": False},
        {"platform": "tpu", "ncases": 64, "ms_per_lane": 2.9,
         "persistent": False, "packops": False, "lanepack": False},
        {"platform": "tpu", "ncases": 64, "ms_per_lane": 1.1,
         "persistent": True, "packops": True, "lanepack": False},
        {"platform": "tpu", "ncases": 256, "ms_per_lane": 1.4,
         "persistent": True, "packops": False, "lanepack": True},
    ]
    win, group = mod.pick(rows)
    assert (win["persistent"], win["packops"], win["lanepack"]) == (
        True, True, False)
    assert win["ms_per_lane"] == 1.1
    # the chosen group is the (ncases=64, rlen) one (most distinct configs)
    assert all(r["ncases"] == 64 for r in group)


def test_pick_empty_and_cpu_only():
    mod = _load()
    assert mod.pick([]) is None
    assert mod.pick([{"platform": "cpu", "ncases": 64,
                      "ms_per_lane": 1.0}]) is None


def test_main_writes_mode_file(tmp_path, monkeypatch):
    mod = _load()
    src = tmp_path / "r.jsonl"
    rows = [{"platform": "tpu", "ncases": 64, "ms_per_lane": 1.5,
             "persistent": True, "packops": False, "lanepack": True,
             "ts": 1.0}]
    src.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    monkeypatch.setattr(mod, "MODE_FILE", tmp_path / "wave_mode.json")
    # point the coverage guard at an absent gate file: this test checks
    # the write path, not gate coverage
    monkeypatch.setattr(mod, "STATUS_FILE", tmp_path / "absent.json")
    monkeypatch.setattr(sys, "argv", ["pick_wave_mode.py", str(src)])
    assert mod.main() == 0
    out = json.loads((tmp_path / "wave_mode.json").read_text())
    assert out == {"persistent": True, "packops": False, "lanepack": True,
                   "ms_per_lane": 1.5, "platform": "tpu",
                   "source": str(src), "ts": 1.0}


def test_main_refuses_unmeasured_compiling_mode(tmp_path, monkeypatch):
    """Coverage guard: a mode the compile gate marks ok but that has no
    warm measurement blocks the pick (round-2 lesson: a winner may not
    be declared against dark competitors)."""
    mod = _load()
    src = tmp_path / "r.jsonl"
    rows = [{"platform": "tpu", "ncases": 64, "ms_per_lane": 1.5,
             "persistent": False, "packops": False, "lanepack": False,
             "ts": 1.0}]
    src.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    gate = tmp_path / "gate.json"
    gate.write_text(json.dumps({
        "classic": {"status": "ok"},
        "lanepack": {"status": "ok"},       # compiles, never measured
        "persistent": {"status": "fail"},
    }))
    monkeypatch.setattr(mod, "MODE_FILE", tmp_path / "wave_mode.json")
    monkeypatch.setattr(mod, "STATUS_FILE", gate)
    monkeypatch.setattr(sys, "argv", ["pick_wave_mode.py", str(src)])
    assert mod.main() == 1
    assert not (tmp_path / "wave_mode.json").exists()

def test_main_refuses_mode_measured_only_in_other_group(tmp_path,
                                                        monkeypatch):
    """The coverage guard is scoped to the group the winner was picked
    from: a compiling mode measured solely at a different (ncases, rlen)
    never competed against the winner and must still block the pick."""
    mod = _load()
    src = tmp_path / "r.jsonl"
    rows = [
        # winning group (ncases=64): classic only
        {"platform": "tpu", "ncases": 64, "rlen": 3000, "ms_per_lane": 1.5,
         "persistent": False, "packops": False, "lanepack": False,
         "ts": 1.0},
        # lanepack measured, but in a different group
        {"platform": "tpu", "ncases": 32, "rlen": 1000, "ms_per_lane": 9.0,
         "persistent": False, "packops": False, "lanepack": True,
         "ts": 1.0},
    ]
    src.write_text("\n".join(json.dumps(r) for r in rows) + "\n")
    gate = tmp_path / "gate.json"
    gate.write_text(json.dumps({
        "classic": {"status": "ok"},
        "lanepack": {"status": "ok"},
    }))
    monkeypatch.setattr(mod, "MODE_FILE", tmp_path / "wave_mode.json")
    monkeypatch.setattr(mod, "STATUS_FILE", gate)
    monkeypatch.setattr(sys, "argv", ["pick_wave_mode.py", str(src)])
    assert mod.main() == 1
    assert not (tmp_path / "wave_mode.json").exists()
