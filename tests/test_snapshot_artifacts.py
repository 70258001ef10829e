"""End-of-round artifact hygiene classifier (VERDICT r4 #8)."""

import importlib.util
import json
import os

SCRIPT = os.path.join(os.path.dirname(__file__), "..", "scripts",
                      "snapshot_artifacts.py")
spec = importlib.util.spec_from_file_location("snapshot_artifacts", SCRIPT)
snap = importlib.util.module_from_spec(spec)
spec.loader.exec_module(snap)


def _write(tmp_path, rel, data):
    full = tmp_path / rel
    full.parent.mkdir(parents=True, exist_ok=True)
    if isinstance(data, (dict, list)):
        full.write_text(json.dumps(data))
    else:
        full.write_text(data)
    return str(full)


def test_classifier_verdicts(tmp_path, monkeypatch):
    monkeypatch.setattr(snap, "REPO", str(tmp_path))
    clean = _write(tmp_path, "artifacts/validation/st_ok.json",
                   dict(cd=5.57, cl=0.0106, bench="2D-1"))
    diverged = _write(tmp_path, "artifacts/validation/st_bad.json",
                      dict(cd_max=570.0, bench="2D-3"))
    flagged = _write(tmp_path, "artifacts/validation/st_flag.json",
                     dict(cd=3.2, diverged=True))
    quarantined = _write(
        tmp_path, "artifacts/validation/unstable_st_old.json",
        dict(cd_max=float(1e9) if False else 600.0))
    garbage = _write(tmp_path, "artifacts/blob.bin", "\x00\x01")
    badjson = _write(tmp_path, "artifacts/broken.json", "{not json")
    del clean, diverged, flagged, quarantined, garbage, badjson

    v = {p: snap.classify(p)[0] for p in (
        "artifacts/validation/st_ok.json",
        "artifacts/validation/st_bad.json",
        "artifacts/validation/st_flag.json",
        "artifacts/validation/unstable_st_old.json",
        "artifacts/blob.bin",
        "artifacts/broken.json",
    )}
    assert v["artifacts/validation/st_ok.json"] == "clean"
    assert v["artifacts/validation/st_bad.json"] == "diverged"
    assert v["artifacts/validation/st_flag.json"] == "diverged"
    # already-quarantined files stage as-is (evidence artifacts)
    assert v["artifacts/validation/unstable_st_old.json"] == "clean"
    assert v["artifacts/blob.bin"] == "unknown"
    assert v["artifacts/broken.json"] == "unknown"


def test_non_force_json_is_clean(tmp_path, monkeypatch):
    monkeypatch.setattr(snap, "REPO", str(tmp_path))
    _write(tmp_path, "artifacts/bench_probe.json",
           dict(value=320.0, metric="throughput"))
    assert snap.classify("artifacts/bench_probe.json")[0] == "clean"
