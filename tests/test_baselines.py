"""Baselines: flax ResNet18 CNN training + VLM direct judging."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from emr2a_tpu.baselines.cnn.compute_cnn_metrics import (
    compute_per_class_metrics,
    format_report,
)
from emr2a_tpu.baselines.cnn.train_cnn_baseline import (
    ClinicalScaler,
    encode_clinical,
    sample_k_slices,
)
from emr2a_tpu.baselines.vlm_direct.run_vlm_direct_judging import (
    VLMDirectJudgingBaseline,
    calculate_agreement,
    evaluate_predictions,
    main as vlm_direct_main,
)
from emr2a_tpu.judge.backends import FakeVLMBackend
from emr2a_tpu.models.resnet import ImageOnlyModel, MultimodalModel, ResNet18


def test_sample_k_slices():
    assert sample_k_slices(list("abcdefgh"), 4) == ["a", "c", "e", "g"]
    assert sample_k_slices(["a", "b"], 4) == ["a", "b", "b", "b"]


def test_encode_clinical():
    np.testing.assert_array_equal(
        encode_clinical({"sex": "男", "age": "42", "fever": "有"}),
        [1.0, 42.0, 1.0])
    np.testing.assert_array_equal(
        encode_clinical({"sex": "女", "fever": "无"}), [0.0, 0.0, 0.0])


def test_clinical_scaler():
    rows = np.array([[1, 40, 0], [0, 60, 1]], np.float32)
    sc = ClinicalScaler().fit(rows)
    out = sc.transform(rows)
    np.testing.assert_allclose(out.mean(axis=0), 0, atol=1e-6)


def test_resnet18_shapes():
    model = ResNet18()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)), train=False)
    out = model.apply(variables, jnp.zeros((2, 64, 64, 3)), train=False)
    assert out.shape == (2, 512)
    assert "batch_stats" in variables


def test_image_only_model_trains():
    import optax
    model = ImageOnlyModel(num_classes=4)
    key = jax.random.PRNGKey(0)
    imgs = jax.random.normal(key, (4, 2, 32, 32, 3))
    labels = jnp.array([0, 1, 2, 3])
    variables = dict(model.init(key, imgs, train=False))
    opt = optax.adam(1e-3)
    opt_state = opt.init(variables["params"])

    @jax.jit
    def step(variables, opt_state):
        def loss_fn(params):
            logits, upd = model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                imgs, train=True, mutable=["batch_stats"])
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean(), upd["batch_stats"]
        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            variables["params"])
        updates, opt_state = opt.update(grads, opt_state)
        params = optax.apply_updates(variables["params"], updates)
        return {"params": params, "batch_stats": stats}, opt_state, loss

    losses = []
    for _ in range(5):
        variables, opt_state, loss = step(variables, opt_state)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_multimodal_model_forward():
    model = MultimodalModel(num_classes=4)
    key = jax.random.PRNGKey(0)
    variables = model.init(key, jnp.zeros((1, 2, 32, 32, 3)),
                           jnp.zeros((1, 3)), train=False)
    out = model.apply(variables, jnp.zeros((3, 2, 32, 32, 3)),
                      jnp.zeros((3, 3)), train=False)
    assert out.shape == (3, 4)


def test_per_class_metrics():
    cm = np.array([[5, 0, 0, 0], [0, 4, 1, 0], [0, 0, 5, 0], [1, 0, 0, 4]])
    m = compute_per_class_metrics([cm])
    assert m["Bacterial"]["recall"][0] == 1.0
    assert m["Normal"]["recall"][0] == pytest.approx(0.8)
    report = format_report(m)
    assert "| Bacterial" in report


def test_vlm_direct_parser():
    b = VLMDirectJudgingBaseline(backend=FakeVLMBackend())
    out = b._parse_vlm_output(
        '{"pred_label": "PJP", "confidence": 0.8, "rationale": "GGO"}')
    assert out["pred_label"] == "PJP"
    out = b._parse_vlm_output(
        "thinking... the findings are consistent with bacterial infection "
        "</think> oops no json")
    assert out["pred_label"] == "Bacterial" and out["confidence"] == 0.6
    assert b._parse_vlm_output('{"pred_label": "Banana"}') is None


def _make_cohort(tmp_path, rng, n=8):
    from PIL import Image
    from emr2a_tpu.data.manifest import save_manifest
    records = []
    for i in range(n):
        pid = f"p{i}"
        pdir = tmp_path / pid
        pdir.mkdir()
        slices = []
        for s in range(4):
            p = pdir / f"{s}.png"
            Image.fromarray((rng.rand(8, 8, 3) * 255).astype(np.uint8)).save(p)
            slices.append(str(p))
        records.append({"patient_id": pid,
                        "label": ["PJP", "Bacterial", "Viral", "Normal"][i % 4],
                        "slices": slices, "meta": {"sex": "男", "age": "40"}})
    mpath = tmp_path / "manifest.jsonl"
    save_manifest(records, mpath)
    return mpath


def test_vlm_direct_end_to_end(tmp_path, rng):
    mpath = _make_cohort(tmp_path, rng)

    backend = FakeVLMBackend(script=[
        '{"pred_label": "PJP", "confidence": 0.9, "rationale": "x"}',
        '{"pred_label": "Normal", "confidence": 0.7, "rationale": "y"}'])
    out_dir = tmp_path / "out"
    vlm_direct_main(["--manifest", str(mpath), "--output_dir", str(out_dir),
                     "--temperatures", "0.0", "0.5"], backend=backend)
    results = json.loads(
        (out_dir / "vlm_direct_judging_results.json").read_text())
    assert "all_patients" in results["folds"]
    fold = results["folds"]["all_patients"]
    assert len(fold["predictions"]["temp_0.0"]) == 8
    assert "agreement" in fold
    summary = json.loads((out_dir / "summary.json").read_text())
    assert "temp_0.0" in summary["average_metrics"]
    assert "agreement" in summary["average_metrics"]


def test_vlm_direct_continuous_matches_sequential(tmp_path, rng):
    """--serving continuous streams the (temperature x patient) grid
    through generate_stream in ONE call, yielding the same predictions
    as the sequential protocol (the fake backend cycles its script in
    request order, which the grid preserves: per temperature, per
    patient)."""
    mpath = _make_cohort(tmp_path, rng)
    script = ['{"pred_label": "PJP", "confidence": 0.9, "rationale": "x"}',
              '{"pred_label": "Normal", "confidence": 0.7, "rationale": "y"}',
              '{"pred_label": "Viral", "confidence": 0.6, "rationale": "z"}']
    outs = {}
    backends = {}
    for mode in ("sequential", "continuous"):
        backend = FakeVLMBackend(script=list(script))
        out_dir = tmp_path / f"out_{mode}"
        vlm_direct_main(
            ["--manifest", str(mpath), "--output_dir", str(out_dir),
             "--temperatures", "0.0", "0.7", "--serving", mode,
             "--n_slots", "4"], backend=backend)
        outs[mode] = json.loads(
            (out_dir / "vlm_direct_judging_results.json").read_text())
        backends[mode] = backend

    seq = outs["sequential"]["folds"]["all_patients"]
    con = outs["continuous"]["folds"]["all_patients"]
    for temp_key in ("temp_0.0", "temp_0.7"):
        sp = [(p["patient_id"], p["pred_label"], p["temperature"])
              for p in seq["predictions"][temp_key]]
        cp = [(p["patient_id"], p["pred_label"], p["temperature"])
              for p in con["predictions"][temp_key]]
        assert sp == cp
        assert seq["metrics"][temp_key] == con["metrics"][temp_key]
    assert seq["agreement"]["overall_agreement"] == \
        con["agreement"]["overall_agreement"]

    # continuous really streamed: one generate_stream call for the
    # whole 2x8 grid with per-request temperatures, zero per-item calls
    stream = backends["continuous"].stream_calls
    assert len(stream) == 1
    assert stream[0]["n"] == 16 and stream[0]["n_slots"] == 4
    assert stream[0]["temperatures"] == [0.0] * 8 + [0.7] * 8
    assert not getattr(backends["sequential"], "stream_calls", [])


def test_agreement_metric():
    run1 = [{"patient_id": "a", "true_label": "PJP", "pred_label": "PJP"},
            {"patient_id": "b", "true_label": "Viral", "pred_label": "Viral"}]
    run2 = [{"patient_id": "a", "true_label": "PJP", "pred_label": "PJP"},
            {"patient_id": "b", "true_label": "Viral", "pred_label": "Normal"}]
    out = calculate_agreement([run1, run2])
    assert out["overall_agreement"] == pytest.approx(0.75)


def test_evaluate_predictions():
    preds = [{"pred_label": "PJP", "true_label": "PJP"},
             {"pred_label": "Viral", "true_label": "Normal"}]
    m = evaluate_predictions(preds)
    assert m["accuracy"] == 0.5
    assert m["num_samples"] == 2
    assert set(m["per_class"]) == {"PJP", "Bacterial", "Viral", "Normal"}


# ---------------------------------------------------------------------------
# torchvision resnet18 checkpoint conversion (--pretrained path)
# ---------------------------------------------------------------------------

def _torch_resnet18():
    """Random-init torch ResNet18 with torchvision's exact module names
    (offline golden — torchvision itself is not installed)."""
    import torch
    import torch.nn as nn

    class BasicBlock(nn.Module):
        def __init__(self, cin, cout, stride=1):
            super().__init__()
            self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(cout)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(cout)
            self.downsample = None
            if stride != 1 or cin != cout:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False),
                    nn.BatchNorm2d(cout))

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            y = self.relu(self.bn1(self.conv1(x)))
            y = self.bn2(self.conv2(y))
            return self.relu(y + idt)

    class ResNet18Torch(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = nn.Sequential(BasicBlock(64, 64), BasicBlock(64, 64))
            self.layer2 = nn.Sequential(BasicBlock(64, 128, 2),
                                        BasicBlock(128, 128))
            self.layer3 = nn.Sequential(BasicBlock(128, 256, 2),
                                        BasicBlock(256, 256))
            self.layer4 = nn.Sequential(BasicBlock(256, 512, 2),
                                        BasicBlock(512, 512))
            self.avgpool = nn.AdaptiveAvgPool2d(1)
            self.fc = nn.Linear(512, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
                x = layer(x)
            return self.avgpool(x).flatten(1)

    torch.manual_seed(0)
    model = ResNet18Torch()
    # randomize BN running stats so the conversion of batch_stats is
    # actually exercised (fresh stats are the trivial 0/1)
    with torch.no_grad():
        for mod in model.modules():
            if isinstance(mod, nn.BatchNorm2d):
                mod.running_mean.normal_(0, 0.05)
                mod.running_var.uniform_(0.5, 1.5)
    return model


def test_resnet18_torch_checkpoint_parity(rng):
    """convert_torch_resnet18 output drives the flax backbone to the
    torch model's eval-mode features (reference --pretrained,
    /root/reference/baselines/cnn_baseline/train_cnn_baseline.py:137)."""
    import torch
    from emr2a_tpu.models.convert import convert_torch_resnet18

    model = _torch_resnet18().eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    variables = convert_torch_resnet18(sd)
    assert "fc" not in variables["params"]

    x = rng.randn(2, 64, 64, 3).astype(np.float32)
    with torch.no_grad():
        expected = model(torch.from_numpy(
            x.transpose(0, 3, 1, 2))).numpy()

    got = ResNet18().apply(
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got), expected,
                               atol=2e-4, rtol=1e-3)


def test_cnn_pretrained_flag(tmp_path, rng):
    """--pretrained loads converted weights into every fold's backbone."""
    import torch
    from emr2a_tpu.baselines.cnn.train_cnn_baseline import main as cnn_main
    from emr2a_tpu.data.manifest import save_manifest
    from PIL import Image

    ckpt = tmp_path / "resnet18.pth"
    torch.save(_torch_resnet18().state_dict(), ckpt)

    records = []
    for i in range(8):
        pdir = tmp_path / "imgs" / f"p{i}"
        pdir.mkdir(parents=True)
        slices = []
        for s in range(2):
            p = pdir / f"s{s}.png"
            Image.fromarray(
                (rng.rand(32, 32, 3) * 255).astype(np.uint8)).save(p)
            slices.append(str(p))
        records.append({"patient_id": f"p{i}",
                        "label": ["PJP", "Normal"][i % 2],
                        "slices": slices,
                        "meta": {"sex": "男", "age": "40", "fever": "有"}})
    manifest_path = tmp_path / "manifest.jsonl"
    save_manifest(records, manifest_path)

    cnn_main(["--manifest_path", str(manifest_path),
              "--output_dir", str(tmp_path / "out"),
              "--pretrained", "--pretrained_path", str(ckpt),
              "--cv_folds", "2", "--epochs", "1", "--k_slices", "2",
              "--image_size", "32", "--batch_size", "4"])
    results = json.loads(
        (tmp_path / "out" / "exp_image_only" / "results.json").read_text())
    assert len(results["fold_results"]) == 2

    with pytest.raises(SystemExit, match="pretrained_path"):
        cnn_main(["--manifest_path", str(manifest_path),
                  "--output_dir", str(tmp_path / "out2"), "--pretrained"])
