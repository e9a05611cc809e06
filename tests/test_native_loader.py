"""C++ decode pool: correctness vs PIL, failure handling, throughput sanity."""

import numpy as np
import pytest
from PIL import Image

from emr2a_tpu.data.native_loader import (
    decode_batch,
    load_images_batch,
    native_available,
)

needs_native = pytest.mark.skipif(not native_available(),
                                  reason="native toolchain unavailable")


@pytest.fixture()
def image_files(tmp_path, rng):
    paths = []
    arrays = []
    for i, (h, w, fmt) in enumerate([(64, 64, "PNG"), (100, 80, "JPEG"),
                                     (32, 32, "PNG")]):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = tmp_path / f"img_{i}.{fmt.lower()}"
        Image.fromarray(arr).save(p, format=fmt)
        paths.append(p)
        arrays.append(arr)
    return paths, arrays


@needs_native
def test_png_decode_exact(image_files):
    paths, arrays = image_files
    out, ok = decode_batch([paths[0]], 64, 64)
    assert ok[0]
    np.testing.assert_array_equal(out[0], arrays[0])  # PNG lossless, no resize


@needs_native
def test_jpeg_decode_close(image_files, tmp_path, rng):
    arr = (rng.rand(48, 48, 3) * 255).astype(np.uint8)
    p = tmp_path / "q.jpg"
    Image.fromarray(arr).save(p, format="JPEG", quality=95)
    out, ok = decode_batch([p], 48, 48)
    assert ok[0]
    # JPEG lossy: verify it decoded the same content, not noise
    pil = np.asarray(Image.open(p).convert("RGB"))
    assert np.abs(out[0].astype(int) - pil.astype(int)).mean() < 2.0


@needs_native
def test_resize_and_failures(image_files, tmp_path):
    paths, arrays = image_files
    bad = tmp_path / "corrupt.png"
    bad.write_bytes(b"not an image")
    missing = tmp_path / "missing.png"
    out, ok = decode_batch([paths[1], bad, missing, paths[2]], 32, 32)
    assert list(ok) == [True, False, False, True]
    assert out[1].sum() == 0 and out[2].sum() == 0
    # resized row matches PIL area-ish downscale loosely
    pil = np.asarray(Image.open(paths[1]).convert("RGB").resize(
        (32, 32), Image.BILINEAR))
    assert np.abs(out[0].astype(int) - pil.astype(int)).mean() < 12


@needs_native
def test_parallel_matches_serial(image_files):
    paths, _ = image_files
    big = list(paths) * 10
    a, ok_a = decode_batch(big, 40, 40, n_threads=1)
    b, ok_b = decode_batch(big, 40, 40, n_threads=8)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(ok_a, ok_b)


def test_fallback_loader(image_files, monkeypatch):
    """load_images_batch works even when native is forced off."""
    import emr2a_tpu.data.native_loader as nl
    monkeypatch.setattr(nl, "native_available", lambda: False)
    paths, _ = image_files
    out, ok = nl.load_images_batch(paths, 32)
    assert out.shape == (3, 32, 32, 3)
    assert ok.all()
