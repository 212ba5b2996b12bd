"""XLA preprocessing parity vs the reference transform semantics
(Resize BICUBIC → CenterCrop → ToTensor, collate_multiview.py:12-19).

torchvision is not installed in this environment; its Resize/CenterCrop on PIL
inputs delegate to PIL, so the oracle below reproduces torchvision behavior
with pure PIL + numpy (shorter-side resize, round((d-size)/2) crop, /255 CHW).
"""

import numpy as np
import pytest

pytest.importorskip("PIL")
from PIL import Image

from vggt_qwen3_tpu.ops.preprocess import preprocess_views, resize_center_crop


def pil_oracle(img_u8: np.ndarray, size: int) -> np.ndarray:
    im = Image.fromarray(img_u8)
    w, h = im.size
    if h <= w:
        nh, nw = size, max(size, int(round(size * w / h)))
    else:
        nh, nw = max(size, int(round(size * h / w))), size
    im = im.resize((nw, nh), Image.BICUBIC)
    top = int(round((nh - size) / 2.0))
    left = int(round((nw - size) / 2.0))
    im = im.crop((left, top, left + size, top + size))
    arr = np.asarray(im).astype(np.float32) / 255.0
    return arr.transpose(2, 0, 1)


@pytest.mark.parametrize("hw", [(640, 480), (480, 640), (448, 448), (97, 213)])
def test_resize_center_crop_parity(hw):
    h, w = hw
    size = 64
    rng = np.random.default_rng(abs(hash(hw)) % 2**32)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    ref = pil_oracle(img, size)
    ours = np.asarray(resize_center_crop(img, size))
    assert ours.shape == ref.shape == (3, size, size)
    # PIL quantizes to uint8 between stages and uses a slightly different
    # antialias window; random-noise images are the worst case for kernel
    # differences (observed max 6/255 at ratio ~1.5). Mean stays tight.
    diff = np.abs(ours - ref)
    assert diff.max() <= 7.0 / 255.0 + 1e-6, diff.max()
    assert diff.mean() <= 0.5 / 255.0, diff.mean()


def test_resize_center_crop_smooth_image_tight():
    """Natural (smooth) images: ≤1/255 max deviation from PIL."""
    y, x = np.mgrid[0:97, 0:213]
    img = np.stack([x * 255 / 213, y * 255 / 97, (x + y) * 255 / 310], -1).astype(np.uint8)
    ref = pil_oracle(img, 64)
    ours = np.asarray(resize_center_crop(img, 64))
    assert np.abs(ours - ref).max() <= 1.1 / 255.0


def test_preprocess_views_stack():
    rng = np.random.default_rng(0)
    views = [rng.integers(0, 256, size=(100, 80, 3), dtype=np.uint8) for _ in range(3)]
    out = np.asarray(preprocess_views(views, 56))
    assert out.shape == (3, 3, 56, 56)
    assert 0.0 <= out.min() and out.max() <= 1.0
