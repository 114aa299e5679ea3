"""Multi-device sharding: DP/TP train step on a virtual 8-device CPU mesh.

Also asserts DP+TP training is numerically equivalent to single-device
training at the same global batch (BatchNorm stats are global-batch)."""
import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kiri_tpu.config import CFG
from kiri_tpu.models import recognizer as R
from kiri_tpu.parallel import (make_mesh, pad_batch_to_devices, shard_batch,
                               shard_variables, variable_shardings)
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.train.trainer import (TrainConfig, collate, make_optimizer,
                                    make_train_step)

CFG_TINY = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=4,
               DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=4,
               IMG_H=48, IMG_W=160, COMPUTE_DTYPE="float32", DROPOUT=0.0)

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def tok(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("shard")
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcde "):
        vocab[ch] = i + 1
    vp = tmp / "vocab.json"
    vp.write_text(json.dumps(vocab))
    return CharTokenizer(str(vp), CFG_TINY)


def _batch(tok, n=8):
    rng = np.random.default_rng(0)
    samples = [{"image": rng.integers(0, 255, (48, 160), np.uint8),
                "text": "ab cde"} for _ in range(n)]
    return collate(samples, tok)


def _run_one_step(tok, mesh):
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    tc = TrainConfig(batch_size=8)
    optimizer, sched = make_optimizer(tc, 100)
    if mesh is not None:
        variables = shard_variables(variables, mesh)
    opt_state = optimizer.init(variables["params"])
    step = make_train_step(CFG_TINY, tok, optimizer, tc, mesh)
    batch = _batch(tok)
    if mesh is not None:
        batch, _ = pad_batch_to_devices(batch, mesh)
        batch = shard_batch(batch, mesh)
    new_vars, _, metrics = step(variables, opt_state, batch,
                                jax.random.PRNGKey(42),
                                jnp.float32(sched(0)))
    return jax.device_get(new_vars), float(metrics["loss"])


@needs_8
@pytest.mark.parametrize("mp", [1, 2])
def test_mesh_train_step(tok, mp):
    mesh = make_mesh(8, model_parallel=mp)
    _, loss = _run_one_step(tok, mesh)
    assert np.isfinite(loss)


@needs_8
def test_dp_matches_single_device(tok):
    """Same global batch: 8-way DP must equal single-device numerics."""
    vars_dp, loss_dp = _run_one_step(tok, make_mesh(8, model_parallel=1))
    vars_1, loss_1 = _run_one_step(tok, None)
    assert abs(loss_dp - loss_1) < 1e-4
    for a, b in zip(jax.tree.leaves(vars_dp["params"]),
                    jax.tree.leaves(vars_1["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4)


@needs_8
def test_tp_matches_single_device(tok):
    vars_tp, loss_tp = _run_one_step(tok, make_mesh(8, model_parallel=2))
    vars_1, loss_1 = _run_one_step(tok, None)
    assert abs(loss_tp - loss_1) < 1e-3


@needs_8
def test_variable_shardings_cover_tree(tok):
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    mesh = make_mesh(8, model_parallel=2)
    sh = variable_shardings(variables, mesh)
    n_leaves = len(jax.tree.leaves(variables))
    n_specs = len(jax.tree.leaves(sh, is_leaf=lambda x: hasattr(x, "spec")))
    assert n_leaves == n_specs
    # At least the FFN weights must actually be model-sharded.
    specs = [s.spec for s in jax.tree.leaves(
        sh, is_leaf=lambda x: hasattr(x, "spec"))]
    assert any("model" in str(s) for s in specs)


@needs_8
def test_inference_batch_sharded(tok):
    """Sharded-batch inference (DP serving) matches single-device output."""
    mesh = make_mesh(8, model_parallel=1)
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    imgs = np.random.default_rng(1).integers(0, 255, (8, 48, 160), np.uint8)

    def fwd(variables, imgs):
        mem, _ = R.encode(variables, imgs, CFG_TINY, train=False)
        return R.ctc_logits(variables["params"], mem, CFG_TINY)

    ref = np.asarray(jax.jit(fwd)(variables, imgs))
    sharded_vars = shard_variables(variables, mesh)
    sharded_imgs = shard_batch({"x": imgs}, mesh)["x"]
    out = np.asarray(jax.jit(fwd)(sharded_vars, sharded_imgs))
    np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-3)


@needs_8
@pytest.mark.parametrize("mp", [1, 2])
def test_engine_multichip_inference_matches_single(tok, mp):
    """Mesh-sharded inference (DP batch, TP params) returns the same texts
    and confidences as the single-device engine."""
    from kiri_tpu.engine import RecognizerEngine

    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    rng = np.random.default_rng(3)
    imgs = rng.integers(0, 255, (6, 48, 160), np.uint8)
    widths = np.asarray([60, 160, 100, 160, 40, 90], np.int32)

    single = RecognizerEngine(variables, CFG_TINY, tok)
    multi = RecognizerEngine(variables, CFG_TINY, tok,
                             mesh=make_mesh(8, model_parallel=mp))
    for method in ("ctc", "beam"):
        a = single.recognize_batch(imgs, method, widths=widths)
        b = multi.recognize_batch(imgs, method, widths=widths)
        assert [t for t, _ in a] == [t for t, _ in b]
        np.testing.assert_allclose([c for _, c in a], [c for _, c in b],
                                   atol=1e-4)


def test_engine_multichip_recognize_crops_with_enhance(tok):
    """The device-preprocess + on-device enhancement path runs on a mesh
    engine and matches the single-device engine."""
    from kiri_tpu.engine import RecognizerEngine

    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    rng = np.random.default_rng(5)
    crops = [rng.integers(0, 255, (h, w), np.uint8)
             for h, w in ((30, 120), (22, 80), (48, 150), (40, 60))]

    single = RecognizerEngine(variables, CFG_TINY, tok)
    multi = RecognizerEngine(variables, CFG_TINY, tok, mesh=make_mesh(8))
    a = single.recognize_crops(crops, "ctc", enhance=True,
                               sharpen=np.array([True, False, False, True]))
    b = multi.recognize_crops(crops, "ctc", enhance=True,
                              sharpen=np.array([True, False, False, True]))
    assert [t for t, _ in a] == [t for t, _ in b]
    np.testing.assert_allclose([c for _, c in a], [c for _, c in b],
                               atol=1e-4)
