"""Pallas preprocessing kernel vs host reference preprocessing."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kiri_tpu.kernels.resize import (pack_crops, preprocess_lines_ref,
                                     preprocess_lines_tpu)
from kiri_tpu.ops.preprocess import resize_keep_ratio_pad_np


def _host_oracle(crop, out_h, out_w):
    """Reference host path: invert-if-dark + resize/pad + normalize."""
    img = crop
    if float(img.mean()) < 127.0:
        img = 255 - img
    resized = resize_keep_ratio_pad_np(img, out_h, out_w)
    return (resized.astype(np.float32) / 255.0 - 0.5) / 0.5


@pytest.fixture()
def crops():
    rng = np.random.default_rng(0)
    shapes = [(30, 200), (60, 90), (48, 640), (20, 500), (100, 40)]
    return [rng.integers(0, 255, s, np.uint8) for s in shapes]


def test_pack_crops(crops):
    buf, sizes = pack_crops(crops)
    assert buf.shape[0] == len(crops)
    assert buf.shape[1] % 64 == 0 and buf.shape[2] % 64 == 0
    for i, c in enumerate(crops):
        assert tuple(sizes[i]) == c.shape
        np.testing.assert_array_equal(buf[i, : c.shape[0], : c.shape[1]], c)


def test_ref_impl_matches_host(crops):
    buf, sizes = pack_crops(crops)
    out = np.asarray(preprocess_lines_ref(jnp.asarray(buf),
                                          jnp.asarray(sizes), 48, 160))
    for i, c in enumerate(crops):
        oracle = _host_oracle(c, 48, 160)
        # Same geometry: pad regions identical, content within interp tol.
        pad = oracle == ((128 / 255 - 0.5) / 0.5)
        diff = np.abs(out[i] - oracle)
        # Pad region must be exactly gray.
        if pad.any():
            assert diff[pad].max() < 1e-3, f"crop {i} pad mismatch"
        # Content: bilinear vs area/bilinear host resize – loose tolerance,
        # interior pixels dominate.
        assert np.median(diff[~pad]) < 0.15, (
            i, float(np.median(diff[~pad])))


def test_inversion_inside_kernel():
    dark = np.full((40, 100), 20, np.uint8)
    buf, sizes = pack_crops([dark])
    out = np.asarray(preprocess_lines_ref(jnp.asarray(buf),
                                          jnp.asarray(sizes), 48, 160))
    # Inverted to 235 -> normalized (235/255-.5)/.5 = 0.843
    content = out[0][:, :80]
    assert abs(float(content.mean()) - 0.843) < 0.01


def test_pallas_kernel_matches_ref(crops):
    buf, sizes = pack_crops(crops)
    ref = np.asarray(preprocess_lines_ref(jnp.asarray(buf),
                                          jnp.asarray(sizes), 48, 160))
    got = np.asarray(preprocess_lines_tpu(jnp.asarray(buf),
                                          jnp.asarray(sizes), 48, 160,
                                          interpret=True))
    np.testing.assert_allclose(got, ref, atol=2e-3)


# ---------------------------------------------------------------------------
# im2col stem conv vs XLA's native conv (exactness, all stem layer shapes)
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("shape,cout,stride", [
    ((2, 48, 64, 1), 48, (1, 1)),     # conv0
    ((2, 48, 64, 48), 96, (2, 2)),    # conv1
    ((2, 24, 32, 96), 160, (2, 2)),   # conv2
    ((2, 12, 16, 160), 256, (2, 1)),  # conv3
    ((1, 47, 33, 8), 16, (2, 2)),     # odd spatial dims
    ((1, 5, 7, 3), 4, (2, 1)),
])
def test_conv3x3_matmul_matches_lax_conv(shape, cout, stride):
    from kiri_tpu.models.recognizer import _conv3x3_matmul

    rng = np.random.default_rng(42)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, shape[-1], cout)) * 0.1,
                    jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, window_strides=stride, padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    got = _conv3x3_matmul(x, w, stride)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-4)


def test_conv3x3_matmul_grads_match():
    """VJP of the im2col formulation equals VJP of the native conv."""
    from kiri_tpu.models.recognizer import _conv3x3_matmul

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, 12, 10, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((3, 3, 8, 16)) * 0.1, jnp.float32)

    def f_ours(x, w):
        return jnp.sum(jnp.sin(_conv3x3_matmul(x, w, (2, 1))))

    def f_lax(x, w):
        y = jax.lax.conv_general_dilated(
            x, w, window_strides=(2, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return jnp.sum(jnp.sin(y))

    gx1, gw1 = jax.grad(f_ours, argnums=(0, 1))(x, w)
    gx2, gw2 = jax.grad(f_lax, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx2),
                               rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gw1), np.asarray(gw2),
                               rtol=1e-5, atol=1e-4)
