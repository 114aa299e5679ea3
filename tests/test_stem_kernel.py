"""Fused Pallas stem kernel vs the XLA conv stem (interpret mode on CPU).

The kernel must reproduce models.recognizer.stem_forward (inference branch,
BN folded) exactly: polyphase stride-2 decomposition, halo-tile recompute,
and true-boundary zero masking all have off-by-one failure modes that this
pins down at f32 (bit-level agreement up to accumulation order).
"""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kiri_tpu.config import CFG
from kiri_tpu.kernels.stem import fold_stem_weights, stem_fused_tpu
from kiri_tpu.models import recognizer as R
from kiri_tpu.tokenizer import CharTokenizer


@pytest.fixture(scope="module")
def stem_setup(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stem")
    (tmp / "v.json").write_text(json.dumps({"<unk>": 0, "a": 1}))
    cfg = CFG(COMPUTE_DTYPE="float32")
    tok = CharTokenizer(str(tmp / "v.json"), cfg)
    variables = R.init_recognizer(jax.random.PRNGKey(0), cfg, tok)
    # Non-trivial BN stats so the folding itself is exercised.
    bs = variables["batch_stats"]["stem"]
    k = jax.random.PRNGKey(1)
    for i in range(4):
        k, k1, k2 = jax.random.split(k, 3)
        bs[f"bn{i}"]["mean"] = jax.random.normal(
            k1, bs[f"bn{i}"]["mean"].shape) * 0.3
        bs[f"bn{i}"]["var"] = jnp.abs(jax.random.normal(
            k2, bs[f"bn{i}"]["var"].shape)) + 0.5
    return cfg, variables


@pytest.mark.parametrize("w,w_tiles", [(640, 2), (320, 1), (160, 1),
                                       (640, 4)])
def test_stem_kernel_matches_xla(stem_setup, w, w_tiles):
    cfg, variables = stem_setup
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 48, w), jnp.float32)
    ref, _ = R.stem_forward(variables["params"]["stem"],
                            variables["batch_stats"]["stem"],
                            x[..., None], cfg, train=False)
    folded = fold_stem_weights(variables["params"]["stem"],
                               variables["batch_stats"]["stem"], jnp.float32)
    out = stem_fused_tpu(x, folded, interpret=True, w_tiles=w_tiles)
    assert out.shape == (2, 6, w // 4, cfg.ENC_DIM)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_stem_kernel_boundary_zeros(stem_setup):
    """An all-zero image must produce the same output as the XLA stem
    (pure bias/SiLU propagation — catches boundary-mask sign errors)."""
    cfg, variables = stem_setup
    x = jnp.zeros((1, 48, 160), jnp.float32)
    ref, _ = R.stem_forward(variables["params"]["stem"],
                            variables["batch_stats"]["stem"],
                            x[..., None], cfg, train=False)
    folded = fold_stem_weights(variables["params"]["stem"],
                               variables["batch_stats"]["stem"], jnp.float32)
    out = stem_fused_tpu(x, folded, interpret=True, w_tiles=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)
