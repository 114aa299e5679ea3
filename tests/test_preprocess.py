"""Preprocessing parity: ResizeKeepRatioPadNoCrop semantics
(reference kiri_ocr/model.py:311-339, core.py:489-528)."""
import numpy as np
import pytest
from PIL import Image

from kiri_tpu.config import CFG
from kiri_tpu.ops.preprocess import (ResizeKeepRatioPadNoCrop, crop_region,
                                     invert_if_dark, normalize_u8,
                                     preprocess_np, preprocess_pil,
                                     preprocess_regions,
                                     resize_keep_ratio_pad_np)

CFG_SMALL = CFG(IMG_H=48, IMG_W=160)


def test_pad_value_and_left_alignment():
    img = Image.new("L", (40, 48), 0)  # narrow black
    out = ResizeKeepRatioPadNoCrop(48, 160)(img)
    arr = np.asarray(out)
    assert arr.shape == (48, 160)
    assert (arr[:, :40] == 0).all()
    assert (arr[:, 40:] == 128).all()  # gray-128 right pad


def test_wide_image_cropped():
    img = Image.new("L", (400, 48), 10)
    out = ResizeKeepRatioPadNoCrop(48, 160)(img)
    assert out.size == (160, 48)
    assert (np.asarray(out) == 10).all()


def test_aspect_ratio_scaling():
    img = Image.new("L", (100, 24), 0)  # h 24 -> 48 doubles w to 200 -> crop 160
    out = ResizeKeepRatioPadNoCrop(48, 160)(img)
    assert out.size == (160, 48)
    img = Image.new("L", (50, 100), 0)  # h 100 -> 48 shrinks w to 24
    arr = np.asarray(ResizeKeepRatioPadNoCrop(48, 160)(img))
    assert (arr[:, 30:] == 128).all()


def test_np_path_matches_pil_geometry():
    rng = np.random.default_rng(0)
    for ih, iw in [(24, 100), (96, 300), (48, 160), (30, 700)]:
        src = rng.integers(0, 255, (ih, iw), dtype=np.uint8)
        np_out = resize_keep_ratio_pad_np(src, 48, 160)
        pil_out = np.asarray(
            ResizeKeepRatioPadNoCrop(48, 160)(Image.fromarray(src)))
        assert np_out.shape == pil_out.shape == (48, 160)
        # Content region and pad region must agree exactly in location.
        assert ((np_out == 128).mean() - (pil_out == 128).mean()) < 0.02


def test_invert_if_dark():
    dark = np.full((10, 10), 20, np.uint8)
    light = np.full((10, 10), 200, np.uint8)
    assert invert_if_dark(dark).mean() == 235
    assert (invert_if_dark(light) == light).all()


def test_crop_region_bounds():
    img = np.arange(100, dtype=np.uint8).reshape(10, 10)
    roi = crop_region(img, (2, 2, 4, 4), extra_padding=5)
    assert roi.shape == (10, 10)  # clamped to image
    assert crop_region(img, (20, 20, 5, 5), extra_padding=0) is None


def test_preprocess_regions_batch():
    img = np.full((100, 200), 255, np.uint8)
    img[10:30, 10:100] = 0
    boxes = [(10, 10, 90, 20), (300, 300, 10, 10), (0, 50, 80, 30)]
    batch, kept, widths = preprocess_regions(CFG_SMALL, img, boxes)
    assert batch.shape == (2, 48, 160)
    assert kept == [0, 2]


def test_normalize_u8_range():
    import jax.numpy as jnp

    x = np.array([[0, 128, 255]], dtype=np.uint8)[None]
    y = np.asarray(normalize_u8(jnp.asarray(x), jnp.float32))
    assert y.shape == (1, 1, 1, 3)
    np.testing.assert_allclose(y[0, 0, 0], [-1.0, 0.0039215, 1.0], atol=1e-4)


def test_preprocess_pil_reference_layout():
    img = Image.new("L", (100, 24), 128)
    out = preprocess_pil(CFG_SMALL, img)
    assert out.shape == (1, 1, 48, 160)
    assert abs(float(out.mean())) < 0.01  # 128 -> ~0.0


def test_width_bucket_helpers():
    from kiri_tpu.ops.preprocess import (content_width, pick_width_bucket,
                                         width_buckets)

    assert content_width((48, 100), 48, 640) == 100
    assert content_width((96, 100), 48, 640) == 50   # downscale by 2
    assert content_width((24, 1000), 48, 640) == 640  # capped
    bs = width_buckets(CFG_SMALL)
    assert bs[-1] == CFG_SMALL.IMG_W
    assert all(b <= CFG_SMALL.IMG_W for b in bs)
    assert pick_width_bucket(CFG_SMALL, 1) == bs[0]
    assert pick_width_bucket(CFG_SMALL, CFG_SMALL.IMG_W) == CFG_SMALL.IMG_W
    assert pick_width_bucket(CFG_SMALL, 10 ** 9) == CFG_SMALL.IMG_W


def test_preprocess_regions_returns_widths():
    img = np.full((100, 400), 255, np.uint8)
    img[10:30, 10:40] = 0
    batch, kept, widths = preprocess_regions(CFG_SMALL, img,
                                             [(10, 10, 30, 20),
                                              (0, 40, 380, 20)])
    assert len(widths) == len(kept) == batch.shape[0]
    # Narrow first crop keeps a sub-IMG_W content width; the page-wide
    # second crop caps at IMG_W.
    assert widths[0] < widths[1] == CFG_SMALL.IMG_W


def test_preprocess_crops_matches_regions():
    """preprocess_crops on pre-cut crops == preprocess_regions on the same
    boxes (the factored crop-cutting half must not change behavior)."""
    from kiri_tpu.ops.preprocess import (crop_region, preprocess_crops,
                                         preprocess_regions)

    rng = np.random.default_rng(5)
    img = rng.integers(0, 255, (100, 300), dtype=np.uint8)
    boxes = [(10, 10, 120, 30), (40, 50, 200, 40)]
    batch_r, kept, widths_r = preprocess_regions(CFG_SMALL, img, boxes)
    crops = [crop_region(img, b, 5) for b in boxes]
    batch_c, widths_c = preprocess_crops(CFG_SMALL, crops)
    assert kept == [0, 1]
    assert np.array_equal(batch_r, batch_c)
    assert np.array_equal(widths_r, widths_c)


def test_preprocess_crops_per_crop_sharpen_and_empty():
    from kiri_tpu.ops.preprocess import preprocess_crops

    # Empty input -> empty batch with the right shapes.
    batch, widths = preprocess_crops(CFG_SMALL, [])
    assert batch.shape == (0, CFG_SMALL.IMG_H, CFG_SMALL.IMG_W)
    assert widths.shape == (0,)
    # Per-crop sharpen sequence: with enhance on, a sharpened
    # deskew-provenance crop must differ from an unsharpened twin of the
    # same content (and both runs must accept the sequence form).
    rng = np.random.default_rng(6)
    soft = np.full((32, 120), 255, np.uint8)
    soft[12:20, 10:110] = 120          # low-contrast-free soft stroke band
    soft = np.clip(soft.astype(np.float32)
                   + rng.normal(0, 0, soft.shape), 0, 255).astype(np.uint8)
    b1, _ = preprocess_crops(CFG_SMALL, [soft, soft], enhance=True,
                             sharpen=[True, False])
    assert not np.array_equal(b1[0], b1[1])
