"""Guard committed measurement artifacts against truncation/corruption.

Round 3 regression: commit 17ae14b accidentally truncated RADAR_TRAIN.jsonl
to 0 bytes (the measured radar training line survived only in git history).
Every committed evidence artifact must be non-empty and line-parse as JSON;
this test makes that class of accident a suite failure instead of a silent
evidence loss (VERDICT round 3, Weak #1 / Next #1).
"""

from __future__ import annotations

import json
import pathlib

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]

# Every .jsonl evidence artifact at the repo root, plus the per-round JSON
# bench/multichip records the driver commits.
JSONL_ARTIFACTS = sorted(p.name for p in REPO.glob("*.jsonl"))
JSON_ARTIFACTS = sorted(p.name for p in REPO.glob("BENCH_r*.json")) + sorted(
    p.name for p in REPO.glob("MULTICHIP_r*.json")
)


def test_artifact_lists_nonempty():
    # If these globs ever come back empty the guards below would pass
    # vacuously; the repo always carries at least the perf + train logs.
    assert "PERF_REMEASURE.jsonl" in JSONL_ARTIFACTS
    assert "RADAR_TRAIN.jsonl" in JSONL_ARTIFACTS
    assert any(n.startswith("BENCH_r") for n in JSON_ARTIFACTS)


@pytest.mark.parametrize("name", JSONL_ARTIFACTS)
def test_jsonl_artifact_nonempty_and_parses(name):
    path = REPO / name
    raw = path.read_text()
    assert raw.strip(), f"{name} is empty — committed evidence was truncated"
    lines = [ln for ln in raw.splitlines() if ln.strip()]
    assert lines, f"{name} has no content lines"
    for i, ln in enumerate(lines):
        try:
            obj = json.loads(ln)
        except json.JSONDecodeError as e:  # pragma: no cover - failure path
            raise AssertionError(f"{name}:{i + 1} is not valid JSON: {e}") from e
        assert isinstance(obj, dict), f"{name}:{i + 1} is not a JSON object"


@pytest.mark.parametrize("name", JSON_ARTIFACTS)
def test_json_artifact_nonempty_and_parses(name):
    path = REPO / name
    raw = path.read_text()
    assert raw.strip(), f"{name} is empty — committed evidence was truncated"
    json.loads(raw)
