"""Sharded checkpoint I/O: per-shard save/restore on the 8-device mesh.

The reference has no distributed checkpoint story (single-process torch.save,
kiri_ocr/training.py:1003-1115); this is the TPU-native scale path — every
process writes only its shards. Round-trip fidelity and interop with the
reference-compatible single-file format are the contracts tested here.
"""
import numpy as np
import pytest

import jax

from kiri_tpu.config import CFG
from kiri_tpu.models.recognizer import init_recognizer
from kiri_tpu.parallel import make_mesh, shard_variables
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.train import sharded_ckpt


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from kiri_tpu.tokenizer import build_vocab_from_texts

    cfg = CFG(ENC_DIM=64, ENC_LAYERS=1, ENC_HEADS=2, DEC_LAYERS=1,
              DEC_HEADS=2, COMPUTE_DTYPE="float32")
    vp = build_vocab_from_texts(["abc abc"],
                                tmp_path_factory.mktemp("v") / "vocab.json")
    tok = CharTokenizer(vp, cfg)
    variables = init_recognizer(jax.random.PRNGKey(0), cfg, tok)
    return cfg, tok, variables


def _tree_equal(a, b):
    fa = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(a)[0]}
    fb = {jax.tree_util.keystr(k): v
          for k, v in jax.tree_util.tree_flatten_with_path(b)[0]}
    assert set(fa) == set(fb)
    for k in fa:
        np.testing.assert_array_equal(np.asarray(fa[k]), np.asarray(fb[k]),
                                      err_msg=k)


def test_roundtrip_plain(tmp_path, tiny):
    cfg, tok, variables = tiny
    sharded_ckpt.save_sharded(tmp_path / "ck", variables, cfg,
                              vocab_path="v.json", epoch=3, step=77,
                              best_val_acc=0.5)
    got, cfg2, meta, opt = sharded_ckpt.restore_sharded(tmp_path / "ck")
    assert opt is None
    assert meta["epoch"] == 3 and meta["step"] == 77
    assert cfg2.ENC_DIM == cfg.ENC_DIM
    assert got["meta"].use_dec_pos_enc == variables["meta"].use_dec_pos_enc
    _tree_equal({k: v for k, v in got.items() if k != "meta"},
                {k: v for k, v in variables.items() if k != "meta"})


def test_roundtrip_sharded_mesh(tmp_path, tiny):
    """Save from sharded arrays, restore onto the mesh: values identical and
    restored arrays carry the mesh sharding."""
    cfg, tok, variables = tiny
    mesh = make_mesh(8, model_parallel=2)
    sv = shard_variables({k: v for k, v in variables.items() if k != "meta"},
                         mesh)
    sv["meta"] = variables["meta"]
    sharded_ckpt.save_sharded(tmp_path / "ck", sv, cfg)
    got, _, _, _ = sharded_ckpt.restore_sharded(tmp_path / "ck", mesh=mesh)
    _tree_equal({k: v for k, v in got.items() if k != "meta"},
                {k: v for k, v in variables.items() if k != "meta"})
    leaf = got["params"]["enc_layers"][0]["ffn"]["lin1"]["w"]
    assert hasattr(leaf, "sharding") and leaf.sharding.mesh.shape == {
        "data": 4, "model": 2}


def test_opt_state_roundtrip(tmp_path, tiny):
    import optax

    cfg, tok, variables = tiny
    opt = optax.adamw(1e-3)
    tree = {k: v for k, v in variables.items() if k != "meta"}
    opt_state = opt.init(tree["params"])
    sharded_ckpt.save_sharded(tmp_path / "ck", variables, cfg,
                              opt_state=opt_state)
    _, _, meta, got_opt = sharded_ckpt.restore_sharded(
        tmp_path / "ck", opt_state_template=opt_state)
    assert meta["has_opt_state"]
    assert got_opt is not None
    _tree_equal(got_opt, opt_state)


def test_to_reference_interop(tmp_path, tiny):
    """Sharded -> reference-compatible safetensors -> load_checkpoint."""
    from kiri_tpu.train.checkpoints import load_checkpoint

    cfg, tok, variables = tiny
    sharded_ckpt.save_sharded(tmp_path / "ck", variables, cfg, epoch=9)
    out = tmp_path / "flat.safetensors"
    sharded_ckpt.to_reference(tmp_path / "ck", out)
    got, cfg2, meta = load_checkpoint(str(out))
    assert meta["epoch"] == 9
    _tree_equal({"params": got["params"]},
                {"params": jax.tree.map(
                    lambda x: np.asarray(x, np.float32),
                    variables["params"])})
