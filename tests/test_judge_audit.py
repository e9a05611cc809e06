"""Audit module + step4 runner end-to-end with the fake VLM backend."""

import json
from pathlib import Path

import numpy as np
import pytest

from emr2a_tpu.judge.audit import VLMAuditModule, select_even_slices
from emr2a_tpu.judge.backends import FakeVLMBackend
from emr2a_tpu.judge.review import VLMReviewModule
from emr2a_tpu.pipelines.step4_vlm_review.run import run_vlm_audit_pipeline


@pytest.fixture()
def cohort(tmp_path, rng):
    """Manifest + slice PNGs + a fold metrics.json tree (the step4
    input contract)."""
    from PIL import Image
    from emr2a_tpu.data.manifest import save_manifest

    records = []
    labels4 = ["PJP", "Bacterial", "Viral", "Normal"]
    for i in range(20):
        pid = f"p{i:02d}"
        pdir = tmp_path / "imgs" / pid
        pdir.mkdir(parents=True)
        slices = []
        for s in range(6):
            p = pdir / f"s{s}.png"
            Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(p)
            slices.append(str(p))
        records.append({"patient_id": pid, "label": labels4[i % 4],
                        "slices": slices,
                        "meta": {"sex": "男", "age": "42", "fever": "有",
                                 "symptom": "咳嗽"}})
    manifest_path = tmp_path / "manifest.jsonl"
    save_manifest(records, manifest_path)

    # Fold metrics: each test query's neighbors are other patients.
    # Even-indexed queries get a majority of same-label neighbors
    # (retrieval vote correct), odd-indexed a wrong-label majority —
    # the downstream error-detection AUROC needs both classes to be
    # non-degenerate (reference audit_metrics.py:112-185).
    exp_dir = tmp_path / "exp"
    pids = [r["patient_id"] for r in records]
    labs = {r["patient_id"]: r["label"] for r in records}
    for fold in range(1, 6):
        fold_dir = exp_dir / f"fold_{fold}"
        fold_dir.mkdir(parents=True)
        test_ids = pids[(fold - 1) * 4:fold * 4]
        top_ids = []
        for i in range(4):
            g = (fold - 1) * 4 + i
            same = [pids[(g + 4) % 20], pids[(g + 8) % 20]]    # own label
            other = [pids[(g + 1) % 20], pids[(g + 5) % 20]]   # next label
            top_ids.append(same + other[:1] if i % 2 == 0
                           else other + same[:1])
        m = {
            "all_top_labels": [[labs[p] for p in row] for row in top_ids],
            "all_top_scores": [[0.9 - 0.1 * j for j in range(3)]
                               for _ in range(4)],
            "all_top_patient_ids": top_ids,
            "test_patient_ids": test_ids,
        }
        (fold_dir / "metrics.json").write_text(json.dumps(m))
    return tmp_path, manifest_path, exp_dir, records


def test_select_even_slices():
    paths = [f"s{i}" for i in range(10)]
    assert select_even_slices(paths, 4) == ["s0", "s3", "s6", "s9"]
    assert select_even_slices(paths[:3], 4) == ["s0", "s1", "s2"]
    assert select_even_slices([], 4) == []


def test_audit_thresholds():
    m = VLMAuditModule(backend=FakeVLMBackend())
    assert m._apply_decision_thresholds("accept", 0.9) == "accept"
    assert m._apply_decision_thresholds("accept", 0.6) == "abstain"
    assert m._apply_decision_thresholds("reject", 0.75) == "reject"
    assert m._apply_decision_thresholds("reject", 0.3) == "abstain"
    assert m._apply_decision_thresholds("abstain", 0.99) == "abstain"


def test_audit_batch_with_failures(cohort, tmp_path):
    root, manifest_path, exp_dir, records = cohort
    from emr2a_tpu.data.manifest import load_manifest
    manifest = load_manifest(manifest_path)

    # Script: accept, thinking-reject, garbage (-> abstain via fallback)
    backend = FakeVLMBackend(script=[
        '{"decision": "accept", "confidence": 0.9, "rationale": "ok"}',
        'hmm the pattern is wrong </think> {"decision": "reject", "confidence": 0.8}',
        "%%%garbage%%%",
    ])
    m = VLMAuditModule(backend=backend)
    patients = manifest[:3]
    neighbors = [[("p05", "PJP", 0.9), ("p06", "Viral", 0.8)]] * 3
    out = m.audit_batch(
        retrieval_predictions=["PJP", "Viral", "Normal"],
        retrieval_similarities=[[0.9, 0.8]] * 3,
        retrieval_labels=[["PJP", "Viral"]] * 3,
        query_patients=patients, top_neighbors_list=neighbors,
        manifest=manifest, output_dir=tmp_path / "audit_out")
    res = out["audit_results"]
    assert [r["final_decision"] for r in res] == ["accept", "reject", "abstain"]
    assert out["accept_count"] == 1 and out["reject_count"] == 1
    # backend saw 4 query images + 2 neighbor-first-images
    assert backend.calls[0]["n_images"] == 6

    final = m.compute_final_predictions(
        ["PJP", "Viral", "Normal"], res, ground_truth=["PJP", "PJP", "Normal"])
    assert final["final_predictions"] == ["PJP", "NEEDS_REVIEW", "NEEDS_REVIEW"]
    assert final["coverage"] == pytest.approx(1 / 3)
    assert final["accuracy_on_accepted"] == 1.0


@pytest.mark.filterwarnings("error::sklearn.exceptions.UndefinedMetricWarning")
def test_step4_pipeline_end_to_end(cohort, tmp_path):
    root, manifest_path, exp_dir, records = cohort
    backend = FakeVLMBackend(script=[
        '{"decision": "accept", "confidence": 0.95, "cited_neighbors": [1]}',
        '{"decision": "reject", "confidence": 0.85}',
    ])
    out_dir = tmp_path / "audit_pipeline"
    results = run_vlm_audit_pipeline(
        exp_dir=exp_dir, manifest_path=manifest_path, output_dir=out_dir,
        max_samples=10, backend=backend, seed=42)

    assert (out_dir / "vlm_audit_summary.json").exists()
    details = [json.loads(l) for l in
               (out_dir / "vlm_audit_details.jsonl").read_text().splitlines()]
    assert len(details) == 10
    assert {"patient_id", "retrieval_prediction", "ground_truth",
            "retrieval_correct", "audit_decision", "audit_confidence",
            "cited_neighbors", "rationale",
            "needs_human_review"} <= set(details[0])
    assert "aurc" in results["metrics"]["selective_prediction"]
    # the cohort mixes correct and incorrect retrieval votes, so the
    # error-detection AUROC is computed over both classes (not the 0.5
    # single-class fallback)
    ed = results["metrics"]["error_detection"]
    assert np.isfinite(ed["auroc"]) and 0.0 <= ed["auroc"] <= 1.0
    corr = [d["retrieval_correct"] for d in details]
    assert any(corr) and not all(corr)
    assert results["audit_summary"]["accept_count"] == 5
    assert results["audit_summary"]["reject_count"] == 5
    # seeded sampling is deterministic
    results2 = run_vlm_audit_pipeline(
        exp_dir=exp_dir, manifest_path=manifest_path,
        output_dir=tmp_path / "audit2", max_samples=10,
        backend=FakeVLMBackend(script=backend.script), seed=42)
    assert results2["sample_patient_ids"] == results["sample_patient_ids"]


def test_step4_missing_keys_error(cohort, tmp_path):
    root, manifest_path, exp_dir, records = cohort
    bad_dir = tmp_path / "bad_exp"
    (bad_dir / "fold_1").mkdir(parents=True)
    (bad_dir / "fold_1" / "metrics.json").write_text(json.dumps({"top1": 0.5}))
    with pytest.raises(ValueError, match="missing keys"):
        run_vlm_audit_pipeline(
            exp_dir=bad_dir, manifest_path=manifest_path,
            output_dir=tmp_path / "x", backend=FakeVLMBackend())


def test_g2_review_with_fake_backend(cohort, tmp_path):
    root, manifest_path, exp_dir, records = cohort
    from emr2a_tpu.data.manifest import load_manifest
    manifest = load_manifest(manifest_path)
    backend = FakeVLMBackend(script=["PJP,0.85,covered",
                                     "Viral,0.6,uncovered",
                                     "not parseable at all §§§"])
    m = VLMReviewModule(backend=backend)
    out = m.g2_goalkeeper_review(
        retrieval_predictions=["PJP", "Bacterial", "Normal"],
        retrieval_similarities=[[0.9]] * 3,
        retrieval_labels=[["PJP"]] * 3,
        query_patients=manifest[:3],
        top_neighbors_list=[[("p05", "PJP", 0.9)]] * 3,
        manifest=manifest, output_dir=tmp_path / "g2")
    assert out["vlm_predictions"][0] == "PJP"
    assert out["agreements"] == [1, 0, 0]
    assert out["agreement_rate"] == pytest.approx(1 / 3)
    assert out["final_predictions"] == ["PJP", "Bacterial", "Normal"]
    # montages written
    assert (tmp_path / "g2" / "evidence_0").exists()


def test_audit_batch_batched_matches_sequential(cohort, tmp_path):
    """vlm_batch_size>1 routes through the backend's generate_batch in
    chunks and must produce the same audit results as the sequential
    loop (same scripts, same order); failed parses still degrade
    per-item."""
    root, manifest_path, exp_dir, records = cohort
    from emr2a_tpu.data.manifest import load_manifest
    manifest = load_manifest(manifest_path)

    script = [
        '{"decision": "accept", "confidence": 0.9, "rationale": "ok"}',
        '{"decision": "reject", "confidence": 0.8, "rationale": "no"}',
        "%%%garbage%%%",
        '{"decision": "accept", "confidence": 0.95, "rationale": "ok"}',
        '{"decision": "abstain", "confidence": 0.4, "rationale": "eh"}',
    ]
    patients = manifest[:5]
    neighbors = [[("p05", "PJP", 0.9), ("p06", "Viral", 0.8)]] * 5
    kwargs = dict(
        retrieval_predictions=["PJP", "Viral", "Normal", "PJP", "Viral"],
        retrieval_similarities=[[0.9, 0.8]] * 5,
        retrieval_labels=[["PJP", "Viral"]] * 5,
        query_patients=patients, top_neighbors_list=neighbors,
        manifest=manifest)

    seq_backend = FakeVLMBackend(script=script)
    seq = VLMAuditModule(backend=seq_backend).audit_batch(
        output_dir=tmp_path / "a", **kwargs)

    bat_backend = FakeVLMBackend(script=script)
    bat = VLMAuditModule(backend=bat_backend).audit_batch(
        output_dir=tmp_path / "b", vlm_batch_size=2, **kwargs)

    assert bat["audit_results"] == seq["audit_results"]
    assert bat_backend.batch_calls == [2, 2, 1]  # 5 cases in chunks of 2
    assert [r["final_decision"] for r in bat["audit_results"]] == \
        ["accept", "reject", "abstain", "accept", "abstain"]

    # serving="continuous" routes through generate_stream (slot-based
    # continuous batching) in ONE call, same results again
    str_backend = FakeVLMBackend(script=script)
    srm = VLMAuditModule(backend=str_backend).audit_batch(
        output_dir=tmp_path / "c", vlm_batch_size=2, serving="continuous",
        **kwargs)
    assert srm["audit_results"] == seq["audit_results"]
    assert [c["n"] for c in str_backend.stream_calls] == [5]
    assert not getattr(str_backend, "batch_calls", [])


def test_error_detection_single_class_valid_json():
    """All-correct main predictions (y_true one class) must still
    produce a strict-JSON-serializable artifact: the reference emits
    NaN tpr/precision curves here (audit_metrics.py:157 — reference
    bug, fixed with empty curves)."""
    import json as _json

    from emr2a_tpu.eval.audit_metrics import ErrorDetectionMetrics

    m = ErrorDetectionMetrics()
    out = m.compute(main_predictions=["PJP", "Viral", "Normal"],
                    ground_truth=["PJP", "Viral", "Normal"],
                    audit_scores=[0.1, 0.2, 0.3])
    assert out["auroc"] == 0.5
    assert out["fpr"] == [] and out["tpr"] == []
    # allow_nan=False raises on any NaN — the strict-parser contract
    _json.dumps(out, allow_nan=False)


def test_split_audit_prompt_property():
    """Splitting an audit template into (system block, case template)
    must lose nothing: system + formatted case == formatted original.
    The system block is field-free so it can ride as the constant chat
    system message (the shared-prefix serving path)."""
    from emr2a_tpu.judge.prompts import (
        VLM_AUDIT_CONSERVATIVE_PROMPT,
        VLM_AUDIT_EVIDENCE_CITATION_PROMPT,
        VLM_AUDIT_PROMPT,
        split_audit_prompt,
    )

    kw = dict(query_text="Sex: M, Age: 61", predicted_label="PJP",
              neighbor_info="  [1] ID: p7, Label: PJP, Similarity: 0.912")
    for tpl in (VLM_AUDIT_PROMPT, VLM_AUDIT_CONSERVATIVE_PROMPT,
                VLM_AUDIT_EVIDENCE_CITATION_PROMPT):
        system, case_tpl = split_audit_prompt(tpl)
        # field-free: the system block is identical for every case
        # (it may carry literal JSON braces, unescaped from {{ }})
        assert system
        for field in ("query_text", "predicted_label", "neighbor_info"):
            assert "{%s}" % field not in system
        assert system + "\n\n" + case_tpl.format(**kw) == tpl.format(**kw)

    # custom templates without the marker (or with fields before it)
    # stay unsplit — exact pre-split behavior
    custom = "Audit {predicted_label}.\n{query_text}\n{neighbor_info}"
    assert split_audit_prompt(custom) == ("", custom)
    fielded_head = ("Check {predicted_label}\n\nCase under audit:\n"
                    "{query_text} {neighbor_info}")
    assert split_audit_prompt(fielded_head) == ("", fielded_head)


def test_audit_request_carries_system_block(cohort, tmp_path):
    """_build_audit_request routes the constant instruction block as
    the system message and the backend receives it."""
    from emr2a_tpu.data.manifest import load_manifest
    from emr2a_tpu.judge.prompts import AUDIT_CASE_MARKER

    root, manifest_path, exp_dir, records = cohort
    manifest = load_manifest(manifest_path)
    be = FakeVLMBackend()
    mod = VLMAuditModule(backend=be)
    evidence = mod.construct_evidence_package(
        manifest[0], [(manifest[1]["patient_id"], "PJP", 0.9)],
        manifest, tmp_path)
    req = mod._build_audit_request(evidence, "PJP")
    assert req["system"] and "audit" in req["system"].lower()
    assert "{query_text}" not in req["system"]
    assert req["prompt"].startswith(AUDIT_CASE_MARKER)
    mod.query_vlm_audit(evidence, "PJP")
    assert be.calls[-1]["system"] == req["system"]


def test_audit_cases_share_token_prefix():
    """Two audit cases tokenized through the real backend path must
    share a token prefix long enough for the batcher's shared-prefix
    KV to engage (the system block precedes the per-case images)."""
    from tests.test_serving import tiny_backend
    from emr2a_tpu.models.serving import _MIN_SHARED_PREFIX

    be = tiny_backend()
    rng = np.random.RandomState(0)
    img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    mod = VLMAuditModule(backend=be)
    reqs = []
    for label in ("PJP", "Viral"):
        evidence = {"query_images": [], "query_text": f"Age {label}",
                    "neighbors": []}
        # bypass image-file IO: formatted prompt + system direct
        r = None
        from emr2a_tpu.judge.prompts import (get_vlm_audit_prompt,
                                             split_audit_prompt)
        system, case_tpl = split_audit_prompt(get_vlm_audit_prompt())
        prompt = case_tpl.format(query_text=f"Sex: M, Age: 61 ({label})",
                                 predicted_label=label,
                                 neighbor_info="  [1] ID: p1")
        ids, _, _ = be._prepare([img], prompt, system)
        reqs.append({"input_ids": np.asarray([ids], np.int64)})
    from emr2a_tpu.models.qwen3_vl import Qwen3VLModel
    from emr2a_tpu.models.serving import ContinuousBatcher
    srv = ContinuousBatcher(be.model, be.generator.params, n_slots=2,
                            prompt_bucket=256, max_new_tokens=4,
                            eos_token_id=-1)
    lp = srv._shared_prefix_len(reqs)
    assert lp >= _MIN_SHARED_PREFIX, lp
    # and it never reaches into the image run
    assert be.config.image_token_id not in reqs[0]["input_ids"][0, :lp]
