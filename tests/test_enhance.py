"""Adaptive crop enhancement (ops/preprocess.enhance_crop).

The stage is a TPU-port addition (the reference has none): conditional
denoise + contrast stretch that must be a strict no-op on clean crops and
must recover degraded ones. CER-level impact is measured by
scripts/eval_recognizer.py --degrade [--enhance]; these tests pin the
image-level contract.
"""
import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from kiri_tpu.ops.preprocess import (enhance_crop, estimate_noise_sigma,
                                     preprocess_regions)


@pytest.fixture(scope="module")
def clean_line():
    img = Image.new("L", (320, 48), 255)
    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 30)
    ImageDraw.Draw(img).text((8, 6), "hello world", font=font, fill=0)
    return np.asarray(img, np.uint8)


def _noisy(img, sigma=20, seed=0):
    rng = np.random.default_rng(seed)
    return np.clip(img.astype(np.float32)
                   + rng.normal(0, sigma, img.shape), 0, 255).astype(np.uint8)


def _low_contrast(img, lo=90, hi=180):
    return np.clip(img.astype(np.float32) / 255.0 * (hi - lo) + lo,
                   0, 255).astype(np.uint8)


def test_noise_estimator_separates_conditions(clean_line):
    assert estimate_noise_sigma(clean_line) < 1.0
    assert estimate_noise_sigma(_low_contrast(clean_line)) < 1.0
    assert estimate_noise_sigma(_noisy(clean_line)) > 4.0


def test_enhance_noop_on_clean(clean_line):
    out = enhance_crop(clean_line)
    assert np.array_equal(out, clean_line)


def test_enhance_restores_low_contrast(clean_line):
    deg = _low_contrast(clean_line)
    out = enhance_crop(deg)
    # Dynamic range restored to (near) full scale.
    assert out.max() >= 250 and out.min() <= 5
    mae = np.abs(out.astype(np.float32) - clean_line.astype(np.float32)).mean()
    mae_deg = np.abs(deg.astype(np.float32)
                     - clean_line.astype(np.float32)).mean()
    assert mae < mae_deg / 3


def test_enhance_denoises(clean_line):
    deg = _noisy(clean_line)
    out = enhance_crop(deg)
    # Whole-image MSE is the wrong lens (text edges blur while noise drops);
    # the contract is (a) residual noise back under the trigger threshold and
    # (b) the background actually flattened. CER impact (0.0441 -> 0.0019)
    # is measured by eval_recognizer --degrade --enhance.
    bg = np.all(clean_line == 255, axis=1)  # margin rows far from glyphs
    assert bg.any()
    err_deg = np.square(deg[bg].astype(np.float32) - 255.0).mean()
    err_out = np.square(out[bg].astype(np.float32) - 255.0).mean()
    # Clipping bias (u8 bg noise is one-sided) dominates the residual; the
    # sharp separability contract is the sigma one below.
    assert err_out < err_deg * 0.75
    assert estimate_noise_sigma(out) < 2.5 < estimate_noise_sigma(deg)


def test_enhance_blur_then_stretch_composes(clean_line):
    """Noisy AND low-contrast: blur runs before stretch so the stretch does
    not amplify raw noise."""
    deg = _noisy(_low_contrast(clean_line), sigma=16)
    out = enhance_crop(deg)
    assert out.max() >= 250  # contrast restored
    err_deg = np.square(deg.astype(np.float32)
                        - clean_line.astype(np.float32)).mean()
    err_out = np.square(out.astype(np.float32)
                        - clean_line.astype(np.float32)).mean()
    assert err_out < err_deg


def test_preprocess_regions_enhance_plumbing(clean_line):
    from kiri_tpu.config import CFG

    cfg = CFG()
    page = np.full((120, 400), 255, np.uint8)
    deg = _low_contrast(clean_line)
    page[10:58, 10:330] = deg
    boxes = [(10, 10, 320, 48)]
    plain, _, _ = preprocess_regions(cfg, page, boxes, extra_padding=0)
    enh, _, _ = preprocess_regions(cfg, page, boxes, extra_padding=0,
                                   enhance=True)
    assert plain.max() < 200          # compressed range survives
    assert enh.max() >= 250           # stretch ran inside the batch path


def test_pipeline_enhance_flag(tmp_path, monkeypatch, clean_line):
    """OCR(enhance=True) reaches preprocess_regions in the host crop path."""
    import jax
    from PIL import Image as PILImage

    import kiri_tpu.pipeline as P
    from kiri_tpu.config import CFG
    from kiri_tpu.models import recognizer as R
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.checkpoints import save_checkpoint

    cfg = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=4,
              DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=4,
              COMPUTE_DTYPE="float32",
              BATCH_BUCKETS=(1, 2, 4), STEP_BUCKETS=(16,))
    import json
    vp = tmp_path / "vocab.json"
    vp.write_text(json.dumps({"<unk>": 0, "a": 1, "b": 2}))
    tok = CharTokenizer(str(vp), cfg)
    variables = R.init_recognizer(jax.random.PRNGKey(0), cfg, tok)
    ckpt = tmp_path / "model.safetensors"
    save_checkpoint(ckpt, variables, cfg, vocab_path=str(vp))

    page = np.full((120, 400), 255, np.uint8)
    page[10:58, 10:330] = _low_contrast(clean_line)[:, :320]
    doc = tmp_path / "doc.png"
    PILImage.fromarray(page).save(doc)

    seen = []
    orig = P.preprocess_crops

    def spy(cfg_, crops, enhance=False, sharpen=False):
        seen.append(enhance)
        return orig(cfg_, crops, enhance=enhance, sharpen=sharpen)

    monkeypatch.setattr(P, "preprocess_crops", spy)
    ocr = P.OCR(str(ckpt), det_method="legacy", decode_method="fast",
                enhance=True)
    ocr.extract_text(str(doc))
    assert seen and all(seen)


def test_small_noisy_crop_upscales_then_blurs(clean_line):
    """Document-scale noisy crops must NOT be blurred at native scale
    (sigma-0.8 at 22 px destroys glyphs: CER 0.0166 -> 0.1954); instead they
    LINEAR-upscale to target_h and denoise there (0.1358 -> 0.0366 with the
    cubic resize path)."""
    small = np.asarray(Image.fromarray(clean_line).resize((150, 22),
                                                          Image.BILINEAR))
    deg = _noisy(small, sigma=20)
    out = enhance_crop(deg, target_h=48)
    assert out.shape[0] == 48                      # upscaled to model height
    assert estimate_noise_sigma(out) < 2.5         # denoised at model scale
    # A clean small crop keeps its native size (no upscale detour).
    assert enhance_crop(small, target_h=48).shape == small.shape


def test_sharpen_repairs_resampled_crop(clean_line):
    small = np.asarray(Image.fromarray(clean_line).resize((150, 22),
                                                          Image.BILINEAR))
    pil = Image.fromarray(small)
    soft = pil.rotate(4, resample=Image.BILINEAR, expand=True, fillcolor=255)
    soft = soft.rotate(-4, resample=Image.BILINEAR, expand=True, fillcolor=255)
    arr = np.asarray(soft, np.uint8)
    h, w = arr.shape
    y0, x0 = (h - 22) // 2, (w - 150) // 2
    deg = arr[y0:y0 + 22, x0:x0 + 150]

    out = enhance_crop(deg, sharpen=True)
    # Unsharp must raise edge energy back toward the crisp original.
    def grad_energy(x):
        f = x.astype(np.float32)
        return float(np.abs(np.diff(f, axis=1)).mean())
    assert grad_energy(out) > grad_energy(deg) * 1.2
    # and be skipped when the crop is noisy (would amplify noise): with the
    # noise gate fired, sharpen=True must change nothing vs sharpen=False
    # (the stretch may still run — it is noise-safe).
    noisy = _noisy(deg, sigma=20)
    assert np.array_equal(enhance_crop(noisy, sharpen=True),
                          enhance_crop(noisy, sharpen=False))


def test_despike_salt_pepper(clean_line):
    """Isolated full-range impulses are removed at any scale; anti-aliased
    glyph pixels (mid-gray coronas) are untouched."""
    for H, W in ((48, 320), (22, 150)):
        base = np.asarray(Image.fromarray(clean_line).resize(
            (W, H), Image.BILINEAR), np.uint8)
        rng = np.random.default_rng(3)
        # Pepper only where the whole 3x3 base neighborhood is white — the
        # strict rule guarantees repair there (impulses near glyph edges are
        # left alone by design).
        p = np.pad(base, 1, mode="edge")
        win = np.lib.stride_tricks.sliding_window_view(p, (3, 3))
        white_nbhd = win.min(axis=(-2, -1)) >= 200
        # Border pixels replicate themselves through the edge padding, so an
        # impulse there never sees an all-opposite neighborhood — keep the
        # test interior.
        white_nbhd[0, :] = white_nbhd[-1, :] = False
        white_nbhd[:, 0] = white_nbhd[:, -1] = False
        pepper = (rng.random(base.shape) < 0.004) & white_nbhd
        # Keep impulses isolated (no two adjacent) for determinism.
        ys, xs = np.nonzero(pepper)
        keep = np.ones(len(ys), bool)
        taken = set()
        for i, (y, x) in enumerate(zip(ys, xs)):
            if any((y + dy, x + dx) in taken
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1)):
                keep[i] = False
            else:
                taken.add((y, x))
        pepper[:] = False
        pepper[ys[keep], xs[keep]] = True
        assert pepper.sum() > 0
        deg = base.copy()
        deg[pepper] = 0
        out = enhance_crop(deg)
        assert (out[pepper] > 150).all()            # impulses repaired
        # clean crops effectively untouched
        assert (enhance_crop(base) != base).sum() <= 1


# ------------------------------------------------- device (XLA) twin parity
def test_enhance_lines_matches_host(clean_line):
    """kernels/resize.enhance_lines tracks ops/preprocess.enhance_crop on
    every condition (mean-vs-median spike fill and nearest-order-statistic
    percentiles allow small numeric drift, not behavioral drift)."""
    import jax.numpy as jnp

    from kiri_tpu.kernels.resize import enhance_lines, pack_crops

    small = np.asarray(Image.fromarray(clean_line).resize((150, 22),
                                                          Image.BILINEAR))
    rng = np.random.default_rng(11)
    sp = clean_line.copy()
    m = rng.random(sp.shape)
    sp[(m < 0.003) & (sp > 200)] = 0
    crops = [clean_line, _noisy(clean_line), _low_contrast(clean_line),
             small, _noisy(small), _low_contrast(small), sp]
    from kiri_tpu.kernels.resize import post_blur_masked, preprocess_lines
    from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np

    buf, sizes = pack_crops(crops)
    enh, small_noisy = enhance_lines(jnp.asarray(buf), jnp.asarray(sizes))
    # Small noisy crops diverge at crop level BY DESIGN (host upscales
    # inside enhance_crop, device in the resize stage) — compare at the
    # recognition-ready tensor level, where both policies meet.
    norm = preprocess_lines(enh, jnp.asarray(sizes), 48, 384,
                            linear_mask=small_noisy)
    norm = np.asarray(post_blur_masked(norm, small_noisy))
    assert bool(np.asarray(small_noisy)[4])  # the noisy small crop flagged
    for i, c in enumerate(crops):
        host_crop = enhance_crop(c, target_h=48)
        host = (resize_keep_ratio_pad_np(host_crop, 48, 384
                                         ).astype(np.float32) / 255.0
                - 0.5) / 0.5
        dev = norm[i]
        if i == 0:  # clean stays identical to the plain preprocess
            plain = np.asarray(preprocess_lines(
                jnp.asarray(buf), jnp.asarray(sizes), 48, 384))[0]
            np.testing.assert_allclose(dev, plain, atol=1e-5)
        diff = np.abs(dev - host) * 127.5  # back to gray-level units
        assert diff.mean() < 6.0, (i, diff.mean())
        # disagreeing pixels are rare (spike-fill / percentile rounding /
        # interp-kernel family differences)
        assert (diff > 48).mean() < 0.02, (i, (diff > 48).mean())


def test_enhance_lines_sharpen_gate(clean_line):
    import jax.numpy as jnp

    from kiri_tpu.kernels.resize import enhance_lines, pack_crops

    small = np.asarray(Image.fromarray(clean_line).resize((150, 22),
                                                          Image.BILINEAR))
    soft = Image.fromarray(small).rotate(
        4, resample=Image.BILINEAR, expand=True, fillcolor=255).rotate(
        -4, resample=Image.BILINEAR, expand=True, fillcolor=255)
    arr = np.asarray(soft, np.uint8)
    h, w = arr.shape
    deg = arr[(h - 22) // 2:(h - 22) // 2 + 22,
              (w - 150) // 2:(w - 150) // 2 + 150]
    buf, sizes = pack_crops([deg])
    plain = np.asarray(enhance_lines(jnp.asarray(buf),
                                     jnp.asarray(sizes))[0])
    sharp = np.asarray(enhance_lines(jnp.asarray(buf), jnp.asarray(sizes),
                                     sharpen=True)[0])

    def ge(x):
        return float(np.abs(np.diff(x[0, :22, :150].astype(np.float32),
                                    axis=1)).mean())
    # The contrast stretch also fires on this crop (raising plain's edge
    # energy), so the sharpen contract is: strictly above plain, and within
    # 5% of the host sharpen result.
    assert ge(sharp) > ge(plain)
    host = enhance_crop(deg, sharpen=True).astype(np.float32)
    host_ge = float(np.abs(np.diff(host, axis=1)).mean())
    assert abs(ge(sharp) - host_ge) / host_ge < 0.05


def test_enhance_lines_per_crop_sharpen_mask(clean_line):
    """Pooled batches sharpen only the crops whose page was deskew-resampled."""
    import jax.numpy as jnp

    from kiri_tpu.kernels.resize import enhance_lines, pack_crops

    small = np.asarray(Image.fromarray(clean_line).resize((150, 22),
                                                          Image.BILINEAR))
    buf, sizes = pack_crops([small, small])
    out = np.asarray(enhance_lines(jnp.asarray(buf), jnp.asarray(sizes),
                                   sharpen=jnp.asarray([True, False]))[0])
    a, b = out[0, :22, :150], out[1, :22, :150]
    assert not np.array_equal(a, b)        # first sharpened
    assert np.array_equal(b, small)        # second untouched


def test_stretch_skips_dense_ink_full_range_lines(clean_line):
    """A dense-ink line can have p99-p1 < 200 with a pure-white background;
    the stretch must not fire there (hi >= 240 gate)."""
    img = np.full((48, 96), 255, np.uint8)
    img[10:40, 4:60] = 80  # dense mid-gray ink block
    p1, p99 = np.percentile(img, 1), np.percentile(img, 99)
    assert p99 - p1 < 200 and p99 >= 240  # the misfire profile
    assert np.array_equal(enhance_crop(img), img)
