"""End-to-end pipeline contract tests: step1 → step2 (fake) → step3.

Exercises the file contracts the reference treats as its public API
(SURVEY.md §1): manifest.jsonl, embeddings.npz + embeddings_meta.json,
retrieval_results.json.
"""

import json
from pathlib import Path

import numpy as np
import pytest

from emr2a_tpu.pipelines.step1_manifest import build_manifest as step1
from emr2a_tpu.pipelines.step2_embeddings import build_embeddings as step2
from emr2a_tpu.pipelines.step3_retrieval import evaluate_retrieval as step3
from emr2a_tpu.data.manifest import load_manifest


@pytest.fixture()
def synthetic_dataset(tmp_path, rng):
    """CSV + image tree shaped like the reference expects:
    data_root/Case_csv/<Label>.csv + data_root/CT_2D_image_core/<Label>/<patient>/."""
    from PIL import Image
    data_root = tmp_path / "data"
    csv_dir = data_root / "Case_csv"
    csv_dir.mkdir(parents=True)
    img_root = data_root / "CT_2D_image_core"

    n_per_class = 8
    for label in ["Bacterial", "Viral", "PJP", "Normal"]:
        rows = ["name,sex,age,fever,symptom"]
        for i in range(n_per_class):
            name = f"{label.lower()}_patient_{i}"
            rows.append(f"{name},男,{30 + i},有,咳嗽")
            pdir = img_root / label / name
            pdir.mkdir(parents=True)
            # slice_10 before slice_2 alphabetically — natural sort check
            for s in [1, 2, 10]:
                arr = (rng.rand(24, 24, 3) * 255).astype(np.uint8)
                Image.fromarray(arr).save(pdir / f"slice_{s}.png")
        (csv_dir / f"{label}.csv").write_text("\n".join(rows) + "\n",
                                              encoding="utf-8")
    return tmp_path, data_root


def test_step1_manifest(synthetic_dataset):
    tmp_path, data_root = synthetic_dataset
    out_dir = tmp_path / "outputs"
    step1.main(["--data_root", str(data_root), "--out_dir", str(out_dir),
                "--relative_paths", "false"])
    manifest = load_manifest(out_dir / "manifest.jsonl")
    assert len(manifest) == 32
    rec = manifest[0]
    assert set(rec) >= {"patient_id", "label", "image_dir", "slices",
                        "meta", "match_by", "name"}
    assert rec["patient_id"].startswith("P")          # sha1 pseudo-id
    assert rec["match_by"] == "name"
    names = [Path(s).name for s in rec["slices"]]
    assert names == ["slice_1.png", "slice_2.png", "slice_10.png"]  # natural sort
    assert rec["meta"] == {"sex": "男", "age": "30", "fever": "有",
                           "symptom": "咳嗽"}
    # no id column in CSV -> patient_mapping.csv is written
    assert (out_dir / "patient_mapping.csv").exists()
    assert not (out_dir / "missing_in_fs.csv").exists()


def test_step1_missing_folder_goes_to_missing_in_fs(synthetic_dataset):
    tmp_path, data_root = synthetic_dataset
    # add a CSV row with no matching folder
    with (data_root / "Case_csv" / "PJP.csv").open("a", encoding="utf-8") as f:
        f.write("ghost_patient,女,50,无,\n")
    out_dir = tmp_path / "outputs2"
    step1.main(["--data_root", str(data_root), "--out_dir", str(out_dir)])
    assert (out_dir / "missing_in_fs.csv").exists()
    import pandas as pd
    miss = pd.read_csv(out_dir / "missing_in_fs.csv")
    assert list(miss["name"]) == ["ghost_patient"]


def test_step2_step3_end_to_end(synthetic_dataset):
    tmp_path, data_root = synthetic_dataset
    out_dir = tmp_path / "outputs"
    step1.main(["--data_root", str(data_root), "--out_dir", str(out_dir),
                "--relative_paths", "false"])

    feat_dir = tmp_path / "features"
    step2.main(["--manifest_path", str(out_dir / "manifest.jsonl"),
                "--encoder_type", "fake",
                "--output_dir", str(feat_dir)])

    data = np.load(feat_dir / "embeddings.npz")
    assert len(data.files) == 32
    first = data[data.files[0]]
    assert first.shape == (3, 64)  # 3 slices x fake dim
    meta = json.loads((feat_dir / "embeddings_meta.json").read_text())
    assert meta["num_patients"] == 32
    assert meta["embedding_dim"] == 64

    res_dir = tmp_path / "results"
    step3.main(["--manifest_path", str(out_dir / "manifest.jsonl"),
                "--embeddings_path", str(feat_dir / "embeddings.npz"),
                "--output_dir", str(res_dir)])
    results = json.loads((res_dir / "retrieval_results.json").read_text())
    assert {"image_top1", "image_top3", "image_top5",
            "image_weighted"} <= set(results)
    assert 0.0 <= results["image_top1"] <= 1.0


def test_step2_determinism(synthetic_dataset):
    """Fake encoder + fixed manifest -> byte-identical embeddings."""
    tmp_path, data_root = synthetic_dataset
    out_dir = tmp_path / "outputs"
    step1.main(["--data_root", str(data_root), "--out_dir", str(out_dir),
                "--relative_paths", "false"])
    f1, f2 = tmp_path / "f1", tmp_path / "f2"
    for fd in (f1, f2):
        step2.main(["--manifest_path", str(out_dir / "manifest.jsonl"),
                    "--encoder_type", "fake", "--output_dir", str(fd)])
    d1 = np.load(f1 / "embeddings.npz")
    d2 = np.load(f2 / "embeddings.npz")
    for k in d1.files:
        np.testing.assert_array_equal(d1[k], d2[k])


def test_step1_zh_headers_canonicalized(synthetic_dataset, tmp_path):
    """zh-headered CSVs produce canonical english meta keys, so the
    clinical-text renderer finds them.  (The reference keeps raw zh
    headers in meta while its renderer reads english keys — zh CSVs
    silently yield zero text embeddings there; fixed, see
    build_manifest META_KEY_CANON.)"""
    import shutil
    from emr2a_tpu.analysis.run_cv_experiments import render_clinical_text
    _, data_root = synthetic_dataset
    zh_root = tmp_path / "zh_data"
    shutil.copytree(data_root, zh_root)
    for csv in (zh_root / "Case_csv").glob("*.csv"):
        text = csv.read_text(encoding="utf-8")
        text = text.replace("name,sex,age,fever,symptom",
                            "姓名,性别,年龄,发热,症状")
        csv.write_text(text, encoding="utf-8")
    out = tmp_path / "zh_out"
    step1.main(["--data_root", str(zh_root), "--out_dir", str(out)])
    recs = [json.loads(l) for l in
            (out / "manifest.jsonl").read_text(encoding="utf-8").splitlines()]
    rec = next(r for r in recs if r["name"] == "bacterial_patient_0")
    assert rec["meta"] == {"sex": "男", "age": "30", "fever": "有",
                           "symptom": "咳嗽"}
    text = render_clinical_text(rec)
    assert "性别: 男" in text and "症状: 咳嗽" in text
