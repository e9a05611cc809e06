"""llms factory + reasoning evaluator with the fake LLM."""

import pytest

from emr2a_tpu.llms import FakeLLM, create_llm
from emr2a_tpu.reasoning import ReasoningEvaluator, build_diagnosis_prompt


def test_factory():
    llm = create_llm("fake")
    assert isinstance(llm, FakeLLM)
    with pytest.raises(ValueError, match="Unsupported LLM type"):
        create_llm("mystery")


def test_diagnosis_prompt_contains_cases():
    prompt = build_diagnosis_prompt(
        {"sex": "男", "age": "42", "fever": "有", "symptom": "咳嗽"},
        retrieved_cases=[{"label": "PJP肺炎", "score": 0.91}])
    assert "性别: 男" in prompt
    assert "PJP肺炎" in prompt
    assert "0.9100" in prompt
    assert '"diagnosis"' in prompt


def test_reasoning_diagnose_parses_json():
    llm = FakeLLM(script=[
        '前置说明```json\n{"diagnosis": "细菌性肺炎", "confidence": "高", '
        '"reasoning": "实变影", "key_findings": ["实变"]}\n```'])
    ev = ReasoningEvaluator(llm)
    out = ev.diagnose({"sex": "女", "age": "30"})
    assert out["diagnosis"] == "细菌性肺炎"
    assert "raw_response" in out


def test_reasoning_diagnose_fallback_on_garbage():
    ev = ReasoningEvaluator(FakeLLM(script=["no json here"]))
    out = ev.diagnose({"sex": "女"})
    assert out["diagnosis"] == "未知"
    assert out["reasoning"] == "no json here"


def test_review_and_treatment():
    ev = ReasoningEvaluator(FakeLLM(script=[
        '{"final_diagnosis": "正常", "agreement_with_retrieval": "是"}',
        '{"diagnosis_confirmation": "正常", "treatment_plan": "随访"}']))
    r = ev.review({"sex": "男"}, {"top_k": [{"label": "正常", "score": 0.8}]})
    assert r["final_diagnosis"] == "正常"
    t = ev.suggest_treatment({"sex": "男"}, "正常")
    assert t["treatment_plan"] == "随访"


@pytest.mark.parametrize("raw,expected", [
    ("病毒性肺炎", "病毒性肺炎"), ("Viral pneumonia", "病毒性肺炎"),
    ("细菌", "细菌性肺炎"), ("PJP", "pjp肺炎"),
    ("肺孢子菌肺炎", "pjp肺炎"), ("Normal chest", "正常"),
    ("别的", "别的"),
])
def test_label_normalization(raw, expected):
    ev = ReasoningEvaluator(FakeLLM())
    assert ev._normalize_label(raw) == expected


def test_evaluate_accuracy():
    ev = ReasoningEvaluator(FakeLLM())
    preds = [{"diagnosis": "viral"}, {"final_diagnosis": "正常"},
             {"diagnosis": "PJP"}]
    out = ev.evaluate_accuracy(preds, ["病毒性肺炎", "正常", "细菌性肺炎"])
    assert out == {"accuracy": pytest.approx(2 / 3), "correct": 2, "total": 3}


def test_qwen3_llm_generate_stream_routes_to_backend():
    """Qwen3LLM.generate_stream streams the prompt batch through the
    backend's continuous-batching protocol (one wave, per-request
    seeds), falling back to generate_batch-compatible outputs."""
    from emr2a_tpu.judge.backends import FakeVLMBackend
    from emr2a_tpu.llms.qwen3_llm import Qwen3LLM

    backend = FakeVLMBackend(script=["A", "B", "C"])
    llm = Qwen3LLM("fake", backend=backend)
    out = llm.generate_stream(["p1", "p2", "p3"], temperature=0.0,
                              n_slots=2, seeds=[10, 11, 12])
    assert out == ["A", "B", "C"]
    assert backend.stream_calls[0]["n"] == 3
    assert backend.stream_calls[0]["n_slots"] == 2


def test_openai_llm_payload_structure():
    """OpenAILLM.generate builds the exact chat.completions request the
    reference sends (llms/openai_llm.py:28-102): one user message whose
    content list leads with the text part followed by one image_url
    part per image, each a base64 PNG data URL; model/max_tokens/
    temperature/top_p forwarded verbatim."""
    import base64
    import io

    from PIL import Image

    from emr2a_tpu.llms.openai_llm import OpenAILLM

    captured = {}

    class _Completions:
        def create(self, **kwargs):
            captured.update(kwargs)

            class _Msg:
                content = "ok"

            class _Choice:
                message = _Msg()

            class _Resp:
                choices = [_Choice()]

            return _Resp()

    class _Client:
        class chat:
            completions = _Completions()

    llm = OpenAILLM(api_key="k", model="gpt-4o", client=_Client())
    imgs = [Image.new("RGB", (8, 8), (255, 0, 0)),
            Image.new("RGB", (8, 8), (0, 255, 0))]
    out = llm.generate("describe", images=imgs, max_new_tokens=77,
                       temperature=0.3, top_p=0.5)
    assert out == "ok"
    assert captured["model"] == "gpt-4o"
    assert captured["max_tokens"] == 77
    assert captured["temperature"] == 0.3
    assert captured["top_p"] == 0.5
    (msg,) = captured["messages"]
    assert msg["role"] == "user"
    content = msg["content"]
    assert content[0] == {"type": "text", "text": "describe"}
    assert len(content) == 3
    for part in content[1:]:
        assert part["type"] == "image_url"
        url = part["image_url"]["url"]
        assert url.startswith("data:image/png;base64,")
        png = base64.b64decode(url.split(",", 1)[1])
        assert Image.open(io.BytesIO(png)).size == (8, 8)


def test_evaluate_accuracy_empty():
    """Empty inputs return zeros instead of dividing by zero (the
    reference crashes, reasoning/evaluator.py:193 — reference bug,
    fixed)."""
    ev = ReasoningEvaluator(llm=FakeLLM())
    assert ev.evaluate_accuracy([], []) == {
        "accuracy": 0.0, "correct": 0, "total": 0}
