"""CV experiment runner CLI end-to-end with the fake encoder."""

import json

import numpy as np
import pytest

from emr2a_tpu.analysis import run_cv_experiments as runner


@pytest.fixture()
def dataset(tmp_path, rng):
    from tests.test_pipelines import synthetic_dataset
    # reuse the fixture function body via pytest indirection is awkward;
    # build a small manifest directly instead
    from PIL import Image
    from emr2a_tpu.data.manifest import save_manifest

    img_dir = tmp_path / "imgs"
    records = []
    for label in ["Bacterial", "Viral", "PJP", "Normal"]:
        for i in range(8):
            pid = f"{label}_{i}"
            pdir = img_dir / pid
            pdir.mkdir(parents=True)
            slices = []
            for s in range(3):
                p = pdir / f"s{s}.png"
                Image.fromarray((rng.rand(20, 20, 3) * 255).astype(np.uint8)).save(p)
                slices.append(str(p))
            records.append({
                "patient_id": pid, "label": label, "slices": slices,
                "meta": {"sex": "男", "age": str(30 + i), "fever": "有",
                         "symptom": "咳嗽"},
            })
    mpath = tmp_path / "manifest.jsonl"
    save_manifest(records, mpath)
    return tmp_path, mpath


def test_single_experiment(dataset, tmp_path, monkeypatch):
    root, mpath = dataset
    out = tmp_path / "exp_out"
    feat = tmp_path / "features"
    monkeypatch.chdir(tmp_path)  # features_dir default is relative
    runner.main([
        "--manifest_path", str(mpath), "--output_dir", str(out),
        "--image_encoder", "fake", "--text_encoder", "fake",
        "--experiment_id", "t1", "--pca_dim", "16", "--top_k", "3",
    ])
    exp = out / "exp_t1"
    assert (exp / "config.json").exists()
    cfg = json.loads((exp / "config.json").read_text())
    assert cfg["image_encoder"] == "fake" and cfg["pca_dim"] == 16
    for fold in range(1, 6):
        m = json.loads((exp / f"fold_{fold}" / "metrics.json").read_text())
        assert {"top1", "top3", "vote_acc", "weighted_vote_acc",
                "macro_f1", "all_top_labels", "all_top_scores",
                "all_top_patient_ids", "test_patient_ids",
                "train_ids"} <= set(m)
        assert len(m["all_top_labels"][0]) == 3
    assert (exp / "summary.csv").exists()
    assert (exp / "confusion_matrices.png").exists()
    # combined embeddings cache written
    cache = np.load("outputs/features/combined_embeddings.npz",
                    allow_pickle=True)
    assert {"patient_ids", "image_matrix", "text_matrix"} <= set(cache.files)


def test_skip_encoding_reload(dataset, tmp_path, monkeypatch):
    root, mpath = dataset
    out = tmp_path / "exp_out2"
    monkeypatch.chdir(tmp_path)
    runner.main(["--manifest_path", str(mpath), "--output_dir", str(out),
                 "--image_encoder", "fake", "--text_encoder", "fake",
                 "--experiment_id", "a", "--pca_dim", "8"])
    # second run from the cache must give identical metrics
    runner.main(["--manifest_path", str(mpath), "--output_dir", str(out),
                 "--image_encoder", "fake", "--text_encoder", "fake",
                 "--experiment_id", "b", "--pca_dim", "8",
                 "--skip_encoding", "--embeddings_path",
                 "outputs/features/combined_embeddings.npz"])
    ma = json.loads((out / "exp_a" / "fold_1" / "metrics.json").read_text())
    mb = json.loads((out / "exp_b" / "fold_1" / "metrics.json").read_text())
    assert ma["top1"] == mb["top1"]
    assert ma["all_top_scores"] == mb["all_top_scores"]


def test_text_shuffle_branch(dataset, tmp_path, monkeypatch):
    root, mpath = dataset
    out = tmp_path / "exp_out3"
    monkeypatch.chdir(tmp_path)
    runner.main(["--manifest_path", str(mpath), "--output_dir", str(out),
                 "--image_encoder", "fake", "--text_encoder", "fake",
                 "--experiment_id", "shuf", "--pca_dim", "8",
                 "--text_shuffle"])
    summary = json.loads((out / "shuf_text_shuffle_summary.json").read_text())
    assert {"original", "shuffled"} <= set(summary)
