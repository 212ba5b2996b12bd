"""Native thread-pooled image decoder (csrc/image_decode.cpp via
data/image_decode.py): PIL parity per format, batch == single, fallbacks."""

import numpy as np
import pytest
from PIL import Image

from vggt_qwen3_tpu.data.image_decode import (
    decode_batch_rgb, decode_rgb, native_available,
)

pytestmark = pytest.mark.skipif(
    not native_available(), reason="csrc/libimage_decode.so not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = {}
    rgb = rng.integers(0, 256, (37, 53, 3)).astype(np.uint8)
    Image.fromarray(rgb).save(d / "rgb.png")
    paths["png_rgb"] = (str(d / "rgb.png"), rgb)
    gray = rng.integers(0, 256, (21, 33)).astype(np.uint8)
    Image.fromarray(gray, "L").save(d / "gray.png")
    paths["png_gray"] = (str(d / "gray.png"), np.stack([gray] * 3, -1))
    rgba = rng.integers(0, 256, (18, 25, 4)).astype(np.uint8)
    Image.fromarray(rgba, "RGBA").save(d / "rgba.png")
    paths["png_rgba"] = (str(d / "rgba.png"), rgba[..., :3])
    pal = Image.fromarray(rgb).convert("P", palette=Image.ADAPTIVE)
    pal.save(d / "pal.png")
    paths["png_pal"] = (str(d / "pal.png"), np.asarray(pal.convert("RGB")))
    Image.fromarray(rgb).save(d / "photo.jpg", quality=92)
    paths["jpeg"] = (str(d / "photo.jpg"), None)  # PIL-decoded below
    return paths


@pytest.mark.parametrize("key", ["png_rgb", "png_gray", "png_rgba", "png_pal"])
def test_png_bit_exact_vs_pil(images, key):
    path, expected = images[key]
    got = decode_rgb(path, native=True)
    pil = np.asarray(Image.open(path).convert("RGB"))
    np.testing.assert_array_equal(got, pil)
    np.testing.assert_array_equal(got, expected)


def test_jpeg_matches_pil_within_idct_rounding(images):
    path, _ = images["jpeg"]
    got = decode_rgb(path, native=True).astype(np.int16)
    pil = np.asarray(Image.open(path).convert("RGB")).astype(np.int16)
    assert got.shape == pil.shape
    # same libjpeg family; a different build may differ by ±1 IDCT rounding
    assert np.abs(got - pil).max() <= 1


def test_batch_decode_matches_single_and_handles_mixed_formats(images):
    paths = [images[k][0] for k in ("png_rgb", "jpeg", "png_gray", "png_rgba")]
    batch = decode_batch_rgb(paths, native=True, nthreads=4)
    for p, b in zip(paths, batch):
        np.testing.assert_array_equal(b, decode_rgb(p, native=True))


def test_missing_file_and_fallback(images, tmp_path):
    with pytest.raises(Exception):
        decode_rgb(str(tmp_path / "nope.png"), native=True)
    # non-jpeg/png container silently routes to PIL
    path, _ = images["png_rgb"]
    bmp = tmp_path / "x.bmp"
    Image.open(path).save(bmp)
    got = decode_rgb(str(bmp), native=True)
    np.testing.assert_array_equal(got, np.asarray(Image.open(bmp).convert("RGB")))


def test_dataset_uses_native_when_enabled(images, tmp_path, monkeypatch):
    """The env switch routes MultiViewJsonDataset image loads through the
    native decoder (same pixels either way for PNG)."""
    import json

    from vggt_qwen3_tpu.data.dataset import DatasetConfig, MultiViewJsonDataset

    path, expected = images["png_rgb"]
    rec = [{"images": [path], "question": "q", "answer": "a", "task": "t",
            "scene_id": "s"}]
    src = tmp_path / "d.json"
    src.write_text(json.dumps(rec))
    ds = MultiViewJsonDataset(
        DatasetConfig(path_glob=str(src), num_views=1, image_size=56, task="t")
    )
    monkeypatch.setenv("VGGT_NATIVE_DECODE", "1")
    out = ds[0]
    np.testing.assert_array_equal(out["images"][0], expected)
