"""MetricLogger sinks: JSONL stream, tracker fan-out, graceful degradation
when a tracker library is missing (reference --report_to,
/root/reference/src/utils/tools.py:82-126)."""

import json

import pytest

from molly_tpu.utils.logging import MetricLogger, _Tracker


def test_jsonl_sink(tmp_path):
    lg = MetricLogger(str(tmp_path), "exp", console_every=0)
    lg.log(1, {"loss": 2.5, "skipme": "not-a-number"})
    lg.log(2, {"loss": 2.25})
    lg.close()
    lines = [json.loads(l) for l in
             (tmp_path / "exp.jsonl").read_text().splitlines()]
    assert lines == [{"step": 1, "loss": 2.5}, {"step": 2, "loss": 2.25}]


def test_missing_tracker_degrades(tmp_path, capsys):
    lg = MetricLogger(str(tmp_path), "exp", console_every=0,
                      report_to="jsonl,wandb,swanlab")
    assert all(t._run is None for t in lg._trackers)
    lg.log(1, {"loss": 1.0})  # must not raise
    lg.close()
    out = capsys.readouterr().out
    assert "unavailable" in out
    # jsonl sink still wrote
    assert (tmp_path / "exp.jsonl").read_text().strip()


def test_unknown_backend_raises():
    with pytest.raises(ValueError, match="unknown tracker"):
        _Tracker("mlflowish", "exp", None)


def test_tracker_fanout(tmp_path):
    calls = []

    class Stub:
        def log(self, step, rec):
            calls.append((step, rec))

        def close(self):
            calls.append("closed")

    lg = MetricLogger(str(tmp_path), "exp", console_every=0)
    lg._trackers.append(Stub())
    lg.log(3, {"loss": 0.5, "grad_norm": 1.25})
    lg.close()
    assert calls[0] == (3, {"loss": 0.5, "grad_norm": 1.25})
    assert calls[-1] == "closed"


def test_report_to_none(tmp_path):
    lg = MetricLogger(str(tmp_path), "exp", console_every=0,
                      report_to="none")
    lg.log(1, {"loss": 1.0})
    lg.close()
    assert not (tmp_path / "exp.jsonl").exists()
