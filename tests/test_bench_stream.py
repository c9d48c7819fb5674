"""bench.py streaming/finalize invariants (round-5 VERDICT item 1).

The driver records only the LAST ~2000 chars of bench stdout; BENCH_r04
was rc=124 with the single end-of-run JSON lost entirely. These tests pin
the machinery that prevents a recurrence: sections stream immediately,
the final consolidated line is bounded so it survives whole in the tail,
and finalize is idempotent + signal-safe.
"""

import json

import pytest

import bench


@pytest.fixture(autouse=True)
def fresh_state(tmp_path, monkeypatch):
    monkeypatch.setattr(bench, "_FINALIZED", False)
    monkeypatch.setattr(bench, "_RESULTS", {})
    monkeypatch.setattr(bench, "_FINAL", {})
    monkeypatch.setattr(bench, "_STREAM_PATH",
                        str(tmp_path / "stream.jsonl"))


def test_emit_streams_immediately(capsys):
    bench.emit("core", {"metric": "edges_per_s_per_chip", "value": 1.0})
    line = capsys.readouterr().out.strip()
    row = json.loads(line)
    assert row["section"] == "core" and row["value"] == 1.0
    with open(bench._STREAM_PATH) as f:
        assert json.loads(f.readline())["value"] == 1.0


def test_emit_final_subset_lands_in_final_line(capsys):
    bench.emit("core", {"a": 1, "b": 2}, final={"a": 1})
    bench._finalize()
    last = capsys.readouterr().out.strip().splitlines()[-1]
    row = json.loads(last)
    assert row == {"a": 1}


def test_final_line_bounded_for_driver_tail(capsys):
    bench.emit("core", {"metric": "edges_per_s_per_chip",
                        "value": 2503543.6, "unit": "edges/s"})
    # flood with droppable compact fields (tier vs-twin etc.)
    flood = {f"tier_model_{i:03d}_tw": 1234.56 for i in range(120)}
    flood.update({f"edges_per_s_b{i}_pallasmod": 1.5e6 for i in range(20)})
    bench.emit("tiers", flood)
    bench._finalize()
    last = capsys.readouterr().out.strip().splitlines()[-1]
    assert len(last) <= 1950
    row = json.loads(last)                     # valid JSON after drops
    assert row["metric"] == "edges_per_s_per_chip"
    assert row.get("fields_dropped_for_tail", 0) > 0


def test_finalize_idempotent(capsys):
    bench.emit("core", {"value": 1})
    bench._finalize()
    bench._finalize()
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines()
             if ln]
    assert len(lines) == 2                     # one stream + one final
