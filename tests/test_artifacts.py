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


# ---------------------------------------------------------------------------
# citation integrity: every ROOFLINE.jsonl study name cited in the docs must
# exist as a committed line. Round-4 regression (VERDICT r4 Weak #1):
# PARITY.md/PERF.md cited `ROOFLINE.jsonl vit_attention_*` but the bench
# output was never committed — the artifact parsed fine, the CONTENT the
# docs pointed at did not exist. This closes that loop one level up from
# the truncation guard above.
# ---------------------------------------------------------------------------

_CITING_DOCS = ["PARITY.md", "PERF.md", "README.md", "CLAUDE.md"]
# a study-like token right after a ROOFLINE.jsonl mention (optionally
# wrapped in backticks/parens, possibly across a line break); study names
# always contain an underscore, which filters prose words like "unless"
_CITE_RE = __import__("re").compile(
    r"ROOFLINE\.jsonl[`)\s]*[`(]?\s*([a-z0-9_]*_[a-z0-9_]*\*?)")


def _committed_roofline_studies():
    names = set()
    for ln in (REPO / "ROOFLINE.jsonl").read_text().splitlines():
        if not ln.strip():
            continue
        obj = json.loads(ln)
        for field in ("study", "program"):
            if field in obj:
                names.add(obj[field])
    return names


def test_roofline_citations_resolve():
    studies = _committed_roofline_studies()
    assert studies, "ROOFLINE.jsonl carries no study/program lines"
    unresolved = []
    for doc in _CITING_DOCS:
        text = " ".join((REPO / doc).read_text().split())
        for cite in _CITE_RE.findall(text):
            if cite.endswith("*"):
                ok = any(s.startswith(cite[:-1]) for s in studies)
            else:
                ok = cite in studies
            if not ok:
                unresolved.append(f"{doc}: ROOFLINE.jsonl {cite}")
    assert not unresolved, (
        "doc citations point at ROOFLINE.jsonl content that is not "
        "committed: " + "; ".join(unresolved))
