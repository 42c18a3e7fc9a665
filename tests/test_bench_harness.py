"""bench.py's per-metric retry harness: a transient failure must retry
and still emit the JSON line; a persistent failure must skip ONLY that
metric (stderr note) and never raise."""

import io
import json
import sys

import pytest


@pytest.fixture()
def bench_module():
    sys.path.insert(0, ".")
    import bench

    return bench


def test_emit_retries_transient_failure(bench_module, capsys, monkeypatch):
    monkeypatch.setattr(bench_module.time, "sleep", lambda s: None)
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise RuntimeError("tunnel flap")
        return 100.0

    bench_module._emit("m_transient", flaky, baseline=10.0)
    out = capsys.readouterr().out.strip()
    rec = json.loads(out)
    assert rec["metric"] == "m_transient"
    assert rec["value"] == 100.0
    assert rec["vs_baseline"] == 10.0
    assert calls["n"] == 2


def test_emit_skips_persistent_failure_without_raising(
    bench_module, capsys, monkeypatch
):
    monkeypatch.setattr(bench_module.time, "sleep", lambda s: None)

    def dead():
        raise RuntimeError("chip gone")

    bench_module._emit("m_dead", dead, baseline=1.0)
    # next metric still emits
    bench_module._emit("m_alive", lambda: 2.0, baseline=1.0)
    captured = capsys.readouterr()
    lines = [l for l in captured.out.splitlines() if l.strip()]
    assert len(lines) == 1
    assert json.loads(lines[0])["metric"] == "m_alive"
    assert "m_dead" in captured.err
