"""Reference-CLI flag parity: file-driven generate, detector dataset tools,
train-detector --data-yaml, HF dataset subset/split/streaming options.

Matches the reference surfaces at kiri_ocr/cli.py:309-509,
kiri_ocr/generator.py:312-454, detector/craft/{dataset,training}.py.
"""
import json
import sys
import types
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from kiri_tpu.cli import _build_parser, _parse_lang_spec


# --------------------------------------------------------------------- parse
def test_reference_arch_spellings_alias():
    p = _build_parser()
    a = p.parse_args(["train", "--train-labels", "x", "--encoder-dim", "128",
                      "--decoder-ffn-dim", "512", "--encoder-layers", "2"])
    assert a.enc_dim == 128 and a.dec_ff == 512 and a.enc_layers == 2
    b = p.parse_args(["train", "--train-labels", "x", "--enc-dim", "96"])
    assert b.enc_dim == 96


def test_reference_flags_accepted():
    p = _build_parser()
    a = p.parse_args(["train", "--hf-dataset", "d1", "d2", "--hf-subset", "s",
                      "--hf-train-split", "tr", "--hf-val-split", "va",
                      "--hf-streaming", "--resume"])
    assert a.hf_subset == "s" and a.hf_streaming and a.resume
    g = p.parse_args(["generate", "-t", "f.txt", "-v", "v.txt", "-a", "3",
                      "--val-augment", "2", "--font-mode", "all",
                      "--random-augment", "--language", "english",
                      "--width", "512", "--fonts-dir", "fonts"])
    assert g.augment == 3 and g.font_mode == "all" and g.width == 512
    gd = p.parse_args(["generate-detector", "--text-file", "c.txt",
                       "--min-lines", "3", "--max-lines", "9",
                       "--image-height", "480", "--workers", "4",
                       "--font", "x.ttf"])
    assert gd.min_lines == 3 and gd.image_height == 480
    td = p.parse_args(["train-detector", "--data-yaml", "ds/data.yaml",
                       "--epochs", "2", "--model-size", "m", "--name", "run1"])
    assert td.data_yaml == "ds/data.yaml" and td.epochs == 2


def test_parse_lang_spec(tmp_path):
    f = tmp_path / "corpus.txt"
    f.write_text("hello\n")
    assert _parse_lang_spec(str(f)) == [str(f)]
    assert _parse_lang_spec("khmer:a.txt,english:b.txt") == ["a.txt", "b.txt"]
    assert _parse_lang_spec(None) == []


# ------------------------------------------------------ file-driven generate
def test_generate_from_files_layout(tmp_path):
    from kiri_tpu.data.synth import DatasetGenerator

    src = tmp_path / "train.txt"
    src.write_text("hello world\nsecond line\nthird one\n", encoding="utf-8")
    vf = tmp_path / "val.txt"
    vf.write_text("val line\n", encoding="utf-8")

    gen = DatasetGenerator(str(tmp_path / "out"), augment=False)
    out = gen.generate_from_files(str(src), val_file=str(vf),
                                  train_augment=2, val_augment=1)
    train_labels = (Path(out) / "train" / "labels.txt").read_text(
        encoding="utf-8").splitlines()
    val_labels = (Path(out) / "val" / "labels.txt").read_text(
        encoding="utf-8").splitlines()
    assert len(train_labels) == 6  # 3 lines x 2 copies
    assert len(val_labels) == 1
    name, text = train_labels[0].split("\t")
    assert (Path(out) / "train" / "images" / name).exists()
    assert text == "hello world"


def test_generate_from_files_autosplit_and_font_all(tmp_path):
    from kiri_tpu.data.synth import DatasetGenerator

    src = tmp_path / "train.txt"
    src.write_text("\n".join(f"line number {i}" for i in range(10)),
                   encoding="utf-8")
    gen = DatasetGenerator(str(tmp_path / "out"), augment=False)
    out = gen.generate_from_files(str(src), font_mode="all")
    train = (Path(out) / "train" / "labels.txt").read_text().splitlines()
    val = (Path(out) / "val" / "labels.txt").read_text().splitlines()
    n_fonts = len(gen.fonts.english_fonts)
    assert n_fonts >= 1
    assert len(train) == 9 * n_fonts
    assert len(val) == 1 * n_fonts


def test_generate_width_cap(tmp_path):
    from kiri_tpu.data.synth import DatasetGenerator

    gen = DatasetGenerator(str(tmp_path), augment=False, max_width=100)
    img = gen.generate_one("a very long line of text that renders wide")
    assert img is not None and img.shape[1] <= 100


# ------------------------------------------------- detector dataset options
def test_generate_detector_text_file_and_line_bounds(tmp_path):
    from kiri_tpu.data.docsynth import generate_detector_dataset

    corpus = ["alpha beta gamma", "delta epsilon", "zeta eta theta iota"]
    ann_path = generate_detector_dataset(
        str(tmp_path / "ds"), 3, 320, 256, kind="db", texts=corpus,
        min_lines=2, max_lines=40, augment=False)
    ann = json.loads(Path(ann_path).read_text())
    assert len(ann) == 3
    for rec in ann:
        assert 2 <= len(rec["lines"]) <= 40
        for text in rec["texts"]:
            # Drawn lines are (possibly width-trimmed) prefixes of the corpus.
            assert any(c.startswith(text.split()[0]) for c in corpus)
    img = Image.open(tmp_path / "ds" / "images" / ann[0]["image"])
    assert img.size == (320, 256)  # --image-height != --image-size


def test_load_detector_batches_roundtrip(tmp_path):
    from kiri_tpu.data.docsynth import (generate_detector_dataset,
                                        load_detector_batches)

    generate_detector_dataset(str(tmp_path / "train"), 3, 128, 128,
                              kind="both", augment=False)
    db = load_detector_batches(tmp_path, "db", batch_size=2)
    assert len(db) == 2  # 3 docs -> 2 batches (remainder wraps)
    assert db[0]["image"].shape == (2, 128, 128, 1)
    assert db[0]["prob_gt"].shape == (2, 128, 128)
    craft = load_detector_batches(str(tmp_path / "train" / "annotations.json"),
                                  "craft", batch_size=3)
    assert craft[0]["region_gt"].shape == (3, 64, 64)
    with pytest.raises(FileNotFoundError):
        load_detector_batches(tmp_path / "nope", "db", 2)


def test_train_detector_from_disk(tmp_path):
    """2 steps of DB training off a pre-generated dataset (--data-yaml)."""
    from kiri_tpu.data.docsynth import generate_detector_dataset
    from kiri_tpu.detect.db.train import DBTrainConfig, train_db

    generate_detector_dataset(str(tmp_path / "ds" / "train"), 2, 96, 96,
                              kind="db", augment=False)
    tc = DBTrainConfig(steps=2, batch_size=2, image_size=96,
                       data_dir=str(tmp_path / "ds"), log_every=0,
                       out_dir=str(tmp_path / "run"))
    variables = train_db(tc, verbose=False)
    assert (tmp_path / "run" / "detector.safetensors").exists()
    assert variables["params"]


# ----------------------------------------------------------- HF data options
class _FakeHFDataset(list):
    def train_test_split(self, test_size, seed):
        n_val = max(1, int(len(self) * test_size))
        return {"train": _FakeHFDataset(self[n_val:]),
                "test": _FakeHFDataset(self[:n_val])}


def _fake_rows(n, tag):
    return [{"image": np.full((8, 16), 128, np.uint8),
             "text": f"{tag}{i}"} for i in range(n)]


def test_load_hf_dataset_subset_and_splits(monkeypatch):
    import kiri_tpu.data.datasets as D

    calls = []

    def fake_load_dataset(name, subset=None, split=None, streaming=False):
        calls.append((name, subset, split, streaming))
        if split == "custom_val":
            return _FakeHFDataset(_fake_rows(2, "v"))
        if split == "train":
            return _FakeHFDataset(_fake_rows(6, "t"))
        raise ValueError(f"no split {split}")

    fake_mod = types.SimpleNamespace(
        load_dataset=fake_load_dataset,
        concatenate_datasets=lambda ds: _FakeHFDataset(
            [r for d in ds for r in d]))
    monkeypatch.setitem(sys.modules, "datasets", fake_mod)

    train, val = D.load_hf_dataset(["org/ds"], subset="khm",
                                   val_split="custom_val")
    assert len(train) == 6 and len(val) == 2
    assert ("org/ds", "khm", "train", False) in calls
    assert train[0]["text"].startswith("t")
    assert train[0]["image"].shape == (48, 640)  # preprocessed


def test_load_hf_dataset_val_fallback_chain(monkeypatch):
    import kiri_tpu.data.datasets as D

    def fake_load_dataset(name, subset=None, split=None, streaming=False):
        if split == "train":
            return _FakeHFDataset(_fake_rows(10, "t"))
        if split == "test":  # only the last fallback exists
            return _FakeHFDataset(_fake_rows(3, "x"))
        raise ValueError
    monkeypatch.setitem(sys.modules, "datasets", types.SimpleNamespace(
        load_dataset=fake_load_dataset, concatenate_datasets=None))
    train, val = D.load_hf_dataset(["d"])
    assert len(train) == 10 and len(val) == 3


def test_load_hf_dataset_streaming_materializes(monkeypatch):
    import kiri_tpu.data.datasets as D

    def fake_load_dataset(name, subset=None, split=None, streaming=False):
        assert streaming is True
        if split != "train":
            raise ValueError
        return iter(_fake_rows(8, "s"))  # streams have no len/indexing
    monkeypatch.setitem(sys.modules, "datasets", types.SimpleNamespace(
        load_dataset=fake_load_dataset, concatenate_datasets=None))
    train, val = D.load_hf_dataset(["d"], streaming=True, val_ratio=0.25)
    assert len(train) == 6 and len(val) == 2  # seeded auto-split of 8
    texts = {train[i]["text"] for i in range(6)} | {val[i]["text"]
                                                    for i in range(2)}
    assert len(texts) == 8


def test_build_vocab_from_hf_dataset(tmp_path):
    from kiri_tpu.tokenizer import build_vocab_from_hf_dataset

    ds = [{"text": "abc"}, {"text": "cde"}]
    path = build_vocab_from_hf_dataset(ds, tmp_path / "vocab.json")
    vocab = json.loads(Path(path).read_text())
    assert set(vocab) == {"<unk>", "a", "b", "c", "d", "e"}
    assert vocab["<unk>"] == 0


def test_reference_config_file_keys(tmp_path, monkeypatch):
    """A reference-format train_config.yaml (its key spellings, its
    path/data keys) drives our train subcommand (kiri_ocr/cli.py:9-27)."""
    from PIL import Image as PILImage

    from kiri_tpu.cli import main

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    lines = []
    for i, text in enumerate(["ab", "ba"]):
        PILImage.new("L", (80, 48), 255).save(img_dir / f"l{i}.png")
        lines.append(f"l{i}.png\t{text}")
    (tmp_path / "labels.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "cfg.yaml").write_text(f"""
train_labels: {tmp_path / 'labels.txt'}
output_dir: {tmp_path / 'out'}
epochs: 3
encoder_dim: 64
decoder_ffn_dim: 96
resume: true
""")

    captured = {}

    def fake_train_loop(cfg, tok, tc, *a, **kw):
        captured["cfg"] = cfg
        captured["tc"] = tc
        captured["resume"] = kw.get("resume")

    import kiri_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, "train_loop", fake_train_loop)
    main(["train", "--config", str(tmp_path / "cfg.yaml")])
    assert captured["cfg"].ENC_DIM == 64
    assert captured["cfg"].DEC_FF == 96
    assert captured["tc"].epochs == 3
    assert captured["resume"] is True


def test_config_hf_dataset_scalar_normalized(tmp_path, monkeypatch):
    """A YAML `hf_dataset: user/name` scalar becomes a one-element list (the
    CLI flag is nargs='+'), not an iterable of characters."""
    from kiri_tpu.cli import main

    (tmp_path / "cfg.yaml").write_text("hf_dataset: org/my-set\nepochs: 1\n")
    captured = {}

    import kiri_tpu.data.datasets as D

    def fake_load_hf(names, *a, **kw):
        captured["names"] = names
        raise SystemExit(0)  # stop before training
    monkeypatch.setattr(D, "load_hf_dataset", fake_load_hf)
    with pytest.raises(SystemExit):
        main(["train", "--config", str(tmp_path / "cfg.yaml")])
    assert captured["names"] == ["org/my-set"]


def test_cli_generate_train_file_reference_layout(tmp_path):
    """`generate -t file` (no other flags) writes the reference's
    train/+val/ layout, not the legacy flat labels.txt."""
    from kiri_tpu.cli import main

    src = tmp_path / "lines.txt"
    src.write_text("\n".join(f"sample line {i}" for i in range(5)))
    main(["generate", "-t", str(src), "-o", str(tmp_path / "out"),
          "--no-augment"])
    assert (tmp_path / "out" / "train" / "labels.txt").exists()
    assert (tmp_path / "out" / "val" / "labels.txt").exists()
    assert not (tmp_path / "out" / "labels.txt").exists()


def test_font_mode_all_respects_width_cap(tmp_path):
    from kiri_tpu.data.synth import DatasetGenerator

    src = tmp_path / "lines.txt"
    src.write_text("a very long line of text that renders quite wide\n" * 2)
    gen = DatasetGenerator(str(tmp_path / "out"), augment=False,
                           max_width=100)
    out = gen.generate_from_files(str(src), font_mode="all")
    for split in ("train", "val"):
        for row in (Path(out) / split / "labels.txt").read_text().splitlines():
            name = row.split("\t")[0]
            img = Image.open(Path(out) / split / "images" / name)
            assert img.size[0] <= 100


def test_missing_val_file_raises(tmp_path):
    from kiri_tpu.data.synth import DatasetGenerator

    src = tmp_path / "lines.txt"
    src.write_text("hello\nworld\n")
    gen = DatasetGenerator(str(tmp_path / "out"), augment=False)
    with pytest.raises(FileNotFoundError):
        gen.generate_from_files(str(src), val_file=str(tmp_path / "nope.txt"))
