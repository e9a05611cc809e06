"""Encoder layer: fake encoder determinism, jit engine batching,
random-init CLIP end-to-end, factory aliases."""

import numpy as np
import pytest

from emr2a_tpu.encoders import CLIPEncoder, FakeEncoder, ViTEncoder, create_encoder
from emr2a_tpu.models.clip import CLIPConfig
from emr2a_tpu.models.text import CLIPTextConfig
from emr2a_tpu.models.vit import ViTConfig


def small_clip_config():
    return CLIPConfig(
        vision=ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                         num_layers=2, num_heads=2, mlp_dim=64,
                         activation="quick_gelu", use_pre_layernorm=True,
                         patch_bias=False, pooling="cls_ln"),
        text=CLIPTextConfig(vocab_size=64, max_length=16, hidden_size=32,
                            num_layers=2, num_heads=2, mlp_dim=64,
                            eos_token_id=63),
        projection_dim=16)


def test_fake_encoder_deterministic(rng):
    enc = FakeEncoder(dim=32)
    img = (rng.rand(20, 20, 3) * 255).astype(np.uint8)
    a = enc.encode_batch_images([img, None, img])
    assert a[1] is None
    np.testing.assert_array_equal(a[0], a[2])
    assert abs(np.linalg.norm(a[0]) - 1.0) < 1e-5
    t = enc.encode_batch_texts(["性别: 男", "性别: 男", "其他"])
    np.testing.assert_array_equal(t[0], t[1])
    assert not np.array_equal(t[0], t[2])


def test_fake_encoder_encode_images_drops_failures(tmp_path, rng):
    from PIL import Image
    good = tmp_path / "a.png"
    Image.fromarray((rng.rand(16, 16, 3) * 255).astype(np.uint8)).save(good)
    bad = tmp_path / "missing.png"
    enc = FakeEncoder(dim=16)
    out = enc.encode_images([good, bad, good])
    assert out.shape == (2, 16)


def test_random_clip_encoder_images(rng):
    enc = CLIPEncoder.random_init(small_clip_config(), max_batch=8)
    imgs = [(rng.rand(40, 40, 3) * 255).astype(np.uint8) for _ in range(5)]
    imgs[2] = None
    out = enc.encode_batch_images(imgs)
    assert out[2] is None
    for i in (0, 1, 3, 4):
        assert out[i].shape == (16,)
        assert abs(np.linalg.norm(out[i]) - 1.0) < 1e-4
    # Batch path must equal the single path (no batch-dependent state).
    single = enc.encode_batch_images([imgs[0]])[0]
    np.testing.assert_allclose(out[0], single, atol=1e-5)


def test_random_clip_encoder_texts():
    def toy_tokenizer(texts, **kw):
        ids = np.full((len(texts), 16), 63, np.int32)
        for i, t in enumerate(texts):
            toks = [hash(w) % 62 + 1 for w in t.split()][:14]
            ids[i, 0] = 0
            ids[i, 1:1 + len(toks)] = toks
        return {"input_ids": ids}

    enc = CLIPEncoder.random_init(small_clip_config(),
                                  tokenizer=toy_tokenizer, max_batch=8)
    out = enc.encode_batch_texts(["hello world", "foo"])
    assert len(out) == 2 and out[0].shape == (16,)
    assert not np.allclose(out[0], out[1])


def test_vit_encoder_no_text():
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                    num_layers=1, num_heads=2, mlp_dim=64, pooling="mean")
    enc = ViTEncoder(config=cfg)
    with pytest.raises(NotImplementedError):
        enc.encode_text("x")


def test_factory_aliases():
    enc = create_encoder("fake", dim=8)
    assert isinstance(enc, FakeEncoder)
    with pytest.raises(ValueError, match="Unsupported encoder type"):
        create_encoder("nope")


def test_mixed_size_batch(rng):
    """Mixed-size inputs canonicalize to one batch via host resize."""
    enc = CLIPEncoder.random_init(small_clip_config(), max_batch=8)
    imgs = [(rng.rand(40, 40, 3) * 255).astype(np.uint8),
            (rng.rand(64, 48, 3) * 255).astype(np.uint8)]
    out = enc.encode_batch_images(imgs)
    assert out[0].shape == out[1].shape == (16,)


def test_encode_images_native_fast_path(tmp_path, rng):
    """With square sources flagged, encode_images routes through the
    C++ pool (when built) and closely matches the per-image host path
    (resize filters differ slightly between the two decoders)."""
    from PIL import Image
    from emr2a_tpu.models.vit import ViTConfig
    cfg = ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                    num_layers=1, num_heads=2, mlp_dim=64, pooling="mean")
    enc = ViTEncoder(config=cfg)
    enc.assume_square_sources = True
    # source at exactly the spec resize size -> both decode paths are
    # resize-free and must agree up to decode-impl noise
    size = enc.preprocess.resize_size
    paths = []
    for i in range(3):
        p = tmp_path / f"x{i}.png"
        Image.fromarray((rng.rand(size, size, 3) * 255).astype(np.uint8)).save(p)
        paths.append(p)
    paths.append(tmp_path / "missing.png")
    fast = enc.encode_images(paths)
    assert fast.shape == (3, 32)
    from emr2a_tpu.encoders.base import BaseEncoder
    slow = BaseEncoder.encode_images(enc, paths)
    for f, s in zip(fast, slow):
        cos = np.dot(f, s) / (np.linalg.norm(f) * np.linalg.norm(s))
        assert cos > 0.999, cos


def test_mesh_sharded_batch_encoding(rng):
    """dp inference: image batches shard over the data mesh axis and
    produce the same embeddings as the single-device path."""
    from emr2a_tpu.parallel.mesh import create_mesh
    mesh = create_mesh((8, 1))
    cfg = small_clip_config()
    single = CLIPEncoder.random_init(cfg, max_batch=16)
    sharded = CLIPEncoder.random_init(cfg, max_batch=16, mesh=mesh)
    imgs = [(rng.rand(40, 40, 3) * 255).astype(np.uint8) for _ in range(12)]
    a = single.encode_batch_images(imgs)
    b = sharded.encode_batch_images(imgs)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-5)


class _IdTok:
    """Toy tokenizer staying inside small_clip_config's vocab (64,
    eos=63): out-of-range ids would NaN the embedding lookup
    (jnp.take fill mode)."""

    def __call__(self, texts, **kw):
        n = kw.get("max_length", 8)
        ids = np.full((len(texts), n), 63, np.int64)
        for i, t in enumerate(texts):
            toks = [62] + [ord(c) % 60 for c in t[:n - 2]] + [63]
            ids[i, :len(toks)] = toks
        return {"input_ids": ids,
                "attention_mask": (ids != 63).astype(np.int64)}


def test_mesh_sharded_text_encoding(rng):
    """dp inference for the text path, incl. a non-power-of-two data
    axis (bucket rounds up to a multiple of the axis size)."""
    cfg = small_clip_config()
    single = CLIPEncoder.random_init(cfg, max_batch=16, tokenizer=_IdTok())
    texts = [f"case {i} ct" for i in range(5)]
    a = single.encode_batch_texts(texts)
    assert all(np.isfinite(x).all() for x in a)
    import jax
    from jax.sharding import Mesh
    from emr2a_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS
    for axis in (8, 6):  # 6: non-power-of-two data axis (bucket round-up)
        mesh = Mesh(np.array(jax.devices()[:axis]).reshape(axis, 1),
                    (DATA_AXIS, MODEL_AXIS))
        sharded = CLIPEncoder.random_init(cfg, max_batch=16,
                                          tokenizer=_IdTok(), mesh=mesh)
        b = sharded.encode_batch_texts(texts)
        for x, y in zip(a, b):
            np.testing.assert_allclose(x, y, atol=1e-5)


def test_mesh_sharded_text_with_mask(rng):
    """BERT text path (attention_mask present) through the shard_map
    dp wrapper: sharded == single-device."""
    from emr2a_tpu.parallel.mesh import create_mesh
    from emr2a_tpu.encoders import BioMedCLIPEncoder
    from emr2a_tpu.models.clip import BioMedCLIPConfig
    from emr2a_tpu.models.text import BertConfig
    from emr2a_tpu.models.vit import ViTConfig

    class _BertTok:
        def __call__(self, texts, **kw):
            n = kw.get("max_length", 16)
            ids = np.zeros((len(texts), n), np.int64)
            for i, t in enumerate(texts):
                toks = [2] + [3 + (ord(c) % 60) for c in t[:n - 2]] + [1]
                ids[i, :len(toks)] = toks
            return {"input_ids": ids,
                    "attention_mask": (ids != 0).astype(np.int64)}

    cfg = BioMedCLIPConfig(
        vision=ViTConfig(image_size=32, patch_size=16, hidden_size=32,
                         num_layers=2, num_heads=2, mlp_dim=64,
                         pooling="cls"),
        text=BertConfig(vocab_size=64, max_length=16, hidden_size=32,
                        num_layers=2, num_heads=2, mlp_dim=64),
        projection_dim=16, text_proj="mlp")
    single = BioMedCLIPEncoder.random_init(cfg, tokenizer=_BertTok(),
                                           context_length=16)
    texts = [f"case {i}" for i in range(5)]
    a = single.encode_batch_texts(texts)
    assert all(np.isfinite(x).all() for x in a)
    mesh = create_mesh((8, 1))
    sharded = BioMedCLIPEncoder.random_init(cfg, tokenizer=_BertTok(),
                                            context_length=16, mesh=mesh)
    b = sharded.encode_batch_texts(texts)
    for x, y in zip(a, b):
        np.testing.assert_allclose(x, y, atol=1e-5)
