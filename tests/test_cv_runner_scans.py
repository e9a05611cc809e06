"""CV runner scan branches + G2 VLM review CLI path with fake backends."""

import json

import numpy as np
import pytest

from emr2a_tpu.analysis import run_cv_experiments as runner


@pytest.fixture()
def dataset(tmp_path, rng):
    from PIL import Image
    from emr2a_tpu.data.manifest import save_manifest
    img_dir = tmp_path / "imgs"
    records = []
    for label in ["Bacterial", "Viral", "PJP", "Normal"]:
        for i in range(6):
            pid = f"{label}_{i}"
            pdir = img_dir / pid
            pdir.mkdir(parents=True)
            slices = []
            for s in range(2):
                p = pdir / f"s{s}.png"
                Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(p)
                slices.append(str(p))
            records.append({"patient_id": pid, "label": label,
                            "slices": slices,
                            "meta": {"sex": "女", "age": str(20 + i),
                                     "fever": "无", "symptom": "咳嗽"}})
    mpath = tmp_path / "manifest.jsonl"
    save_manifest(records, mpath)
    return tmp_path, mpath


def test_topk_scan(dataset, tmp_path, monkeypatch):
    root, mpath = dataset
    out = tmp_path / "scan_out"
    monkeypatch.chdir(tmp_path)
    runner.main(["--manifest_path", str(mpath), "--output_dir", str(out),
                 "--image_encoder", "fake", "--text_encoder", "fake",
                 "--experiment_id", "tk", "--pca_dim", "8",
                 "--topk_scan", "--topk_list", "1", "3"])
    summary = json.loads((out / "tk_topk_scan_summary.json").read_text())
    assert {"tk_topk1", "tk_topk3"} <= set(summary)
    assert (out / "exp_tk_topk1" / "fold_1" / "metrics.json").exists()


def test_pca_scan(dataset, tmp_path, monkeypatch):
    root, mpath = dataset
    out = tmp_path / "pca_out"
    monkeypatch.chdir(tmp_path)
    runner.main(["--manifest_path", str(mpath), "--output_dir", str(out),
                 "--image_encoder", "fake", "--text_encoder", "fake",
                 "--experiment_id", "pc", "--pca_scan",
                 "--pca_list", "4", "8"])
    summary = json.loads((out / "pc_pca_scan_summary.json").read_text())
    assert {"pc_pca4", "pc_pca8"} <= set(summary)


def test_late_fusion_scan(dataset, tmp_path, monkeypatch):
    root, mpath = dataset
    out = tmp_path / "lf_out"
    monkeypatch.chdir(tmp_path)
    runner.main(["--manifest_path", str(mpath), "--output_dir", str(out),
                 "--image_encoder", "fake", "--text_encoder", "fake",
                 "--experiment_id", "lf", "--fusion", "late",
                 "--pca_dim", "8", "--late_fusion_scan",
                 "--w_text_list", "0.0", "1.0"])
    summary = json.loads((out / "lf_late_fusion_summary.json").read_text())
    assert {"lf_w0.00", "lf_w1.00"} <= set(summary)


def test_vlm_review_branch(dataset, tmp_path, monkeypatch):
    """--vlm_review with the fake backend writes vlm_review_summary.json
    and reports agreement metrics."""
    root, mpath = dataset
    out = tmp_path / "vr_out"
    monkeypatch.chdir(tmp_path)
    runner.main(["--manifest_path", str(mpath), "--output_dir", str(out),
                 "--image_encoder", "fake", "--text_encoder", "fake",
                 "--experiment_id", "vr", "--pca_dim", "8",
                 "--vlm_review", "--vlm_model_path", "fake"])
    summary = json.loads(
        (out / "exp_vr" / "vlm_review_summary.json").read_text())
    assert {"agreement_rate", "needs_review_ratio",
            "vlm_predictions"} <= set(summary)
    # evidence montages written
    assert (out / "exp_vr" / "vlm_review" / "evidence_0").exists()
    # real neighbor evidence: the stored per-query patient ids resolve
    # to manifest records, so neighbor montages exist (placeholder ids
    # would leave the evidence dirs query-only)
    assert list((out / "exp_vr" / "vlm_review" / "evidence_0")
                .glob("neighbor_*.png")), \
        "no neighbor montages — neighbor pids did not resolve"
