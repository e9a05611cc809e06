"""Parser waterfall: every branch the reference's parsers handle
(vlm_audit_module.py:366-649) — thinking split, fenced/naked/brace
JSON, prose mining, keyword fallback, synonym/confidence normalization."""

import pytest

from emr2a_tpu.judge.parsers import (
    extract_json_payload,
    normalize_confidence,
    normalize_decision,
    parse_audit_output,
    parse_audit_payload,
    parse_thinking_output,
)


def test_clean_json():
    out = parse_audit_output(
        '{"decision": "accept", "confidence": 0.85, '
        '"cited_neighbors": [1, 2], "rationale": "looks right"}')
    assert out == {"decision": "accept", "confidence": 0.85,
                   "cited_neighbors": [1, 2], "rationale": "looks right"}


def test_fenced_json():
    text = 'Sure, here is my answer:\n```json\n{"decision": "reject", "confidence": 0.9}\n```'
    out = parse_audit_output(text)
    assert out["decision"] == "reject"
    assert out["confidence"] == 0.9


def test_thinking_tag_then_json():
    text = ('I think the prediction looks wrong because the pattern is '
            'bacterial not viral... </think>\n'
            '{"decision": "reject", "confidence": 0.8, "rationale": "GGO absent"}')
    out = parse_audit_output(text)
    assert out["decision"] == "reject"
    assert out["confidence"] == 0.8


def test_thinking_without_json_mines_decision():
    text = ("Let me look at the images. The decision should be 'accept' "
            "since neighbor [1] and neighbor [2] clearly match. "
            "confidence: 0.75")
    out = parse_audit_output(text)
    assert out["decision"] == "accept"
    assert out["confidence"] == 0.75
    assert 1 in out["cited_neighbors"] and 2 in out["cited_neighbors"]


def test_percent_confidence_in_thinking():
    out = parse_thinking_output("I will reject this. confidence: 85")
    assert out["decision"] == "reject"
    assert out["confidence"] == 0.85


def test_contextual_inference():
    # "clear" + "support" -> accept (thinking-parser inference branch);
    # bare "support" without a confidence word stays abstain — matching
    # the reference, whose thinking parser always returns and so shadows
    # the keyword fallback (vlm_audit_module.py:465-479).
    out = parse_audit_output("the imaging findings clearly support the call")
    assert out["decision"] == "accept"
    out = parse_audit_output("the imaging findings support the call")
    assert out["decision"] == "abstain"
    out = parse_audit_output("it is hard to tell from these slices")
    assert out["decision"] == "abstain"


def test_garbage_defaults_to_abstain():
    out = parse_audit_output("%%%%%%")
    assert out["decision"] == "abstain"
    assert out["confidence"] == 0.5


def test_json_embedded_in_prose_brace_scanner():
    text = ('The schema is {"a": 1} but my answer is '
            '{"decision": "abstain", "confidence": 0.3, '
            '"rationale": "braces { } in \\"strings\\" are fine"}')
    payload = extract_json_payload(text)
    assert payload["decision"] == "abstain"


def test_python_literal_json():
    # single quotes -> json.loads fails, ast.literal_eval succeeds
    out = parse_audit_output("{'decision': 'accept', 'confidence': 0.9}")
    assert out["decision"] == "accept"


@pytest.mark.parametrize("raw,expected", [
    ("accept", "accept"), ("Support", "accept"), ("AGREE", "accept"),
    ("yes", "accept"), ("reject", "reject"), ("disagree", "reject"),
    ("incorrect", "reject"), ("no", "reject"), ("abstain", "abstain"),
    ("unsure", "abstain"), ("whatever", "abstain"), ("", "abstain"),
])
def test_decision_synonyms(raw, expected):
    assert normalize_decision(raw) == expected


@pytest.mark.parametrize("raw,expected", [
    (0.5, 0.5), ("0.7", 0.7), ("confidence 0.9 high", 0.9),
    (1.5, 1.0), (-0.2, 0.0), (None, 0.5), ("none", 0.5),
])
def test_confidence_normalization(raw, expected):
    assert normalize_confidence(raw) == expected


def test_payload_cited_neighbors_string():
    out = parse_audit_payload({"decision": "accept",
                               "cited_neighbors": "[1, 2, 3]"})
    assert out["cited_neighbors"] == [1, 2, 3]
