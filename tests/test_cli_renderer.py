"""CLI subcommands and renderer outputs."""
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from kiri_tpu.cli import main
from kiri_tpu.renderer import DocumentRenderer


def test_init_config(tmp_path, capsys):
    main(["init-config", "-o", str(tmp_path / "cfg.yaml")])
    text = (tmp_path / "cfg.yaml").read_text()
    assert "epochs:" in text and "lr:" in text
    import yaml

    cfg = yaml.safe_load(text)
    assert cfg["batch_size"] == 32


def test_generate(tmp_path):
    main(["generate", "-o", str(tmp_path / "d"), "-n", "4", "--no-augment"])
    labels = (tmp_path / "d" / "labels.txt").read_text().splitlines()
    assert len(labels) == 4
    name, text = labels[0].split("\t")
    img = Image.open(tmp_path / "d" / "images" / name)
    assert img.size[1] == 48
    assert text


def test_generate_append(tmp_path):
    main(["generate", "-o", str(tmp_path / "d"), "-n", "3"])
    main(["generate", "-o", str(tmp_path / "d"), "-n", "2", "--append"])
    labels = (tmp_path / "d" / "labels.txt").read_text().splitlines()
    assert len(labels) == 5


def test_generate_detector(tmp_path):
    main(["generate-detector", "--output", str(tmp_path / "det"),
          "--num-train", "2", "--num-val", "1", "--image-size", "256",
          "--kind", "db"])
    ann = json.loads((tmp_path / "det" / "train" / "annotations.json")
                     .read_text())
    assert len(ann) == 2
    assert "lines" in ann[0] and "chars" in ann[0]
    gt = tmp_path / "det" / "train" / "gt"
    assert (gt / f"{ann[0]['image']}.db_prob.npy").exists()


def test_bare_image_implicit_predict(tmp_path, capsys):
    """A bare image path routes to predict (reference cli.py:516-530).
    Succeeds when the default model exists, else errors gracefully."""
    img = tmp_path / "x.png"
    Image.new("L", (100, 50), 255).save(img)
    main([str(img), "--output", str(tmp_path / "out"), "--no-render",
          "--det-method", "legacy"])
    out = capsys.readouterr().out
    assert ("Error" in out) or ("Saved results" in out)


def test_predict_deskew_plumbing(tmp_path, monkeypatch):
    """--deskew reaches the OCR constructor (pipeline->detector facade)."""
    import kiri_tpu.pipeline as pipeline_mod

    seen = {}

    class FakeOCR:
        def __init__(self, **kw):
            seen.update(kw)
            raise RuntimeError("stop here")

    monkeypatch.setattr(pipeline_mod, "OCR", FakeOCR)
    img = tmp_path / "x.png"
    Image.new("L", (100, 50), 255).save(img)
    main(["predict", str(img), "--deskew", "--det-method", "legacy",
          "--output", str(tmp_path / "out"), "--no-render"])
    assert seen.get("deskew") is True


def test_renderer_outputs(tmp_path):
    img_path = tmp_path / "doc.png"
    Image.new("RGB", (200, 100), (255, 255, 255)).save(img_path)
    results = [
        {"box": [10, 10, 80, 20], "text": "hello", "confidence": 0.95,
         "det_confidence": 1.0, "line_number": 1},
        {"box": [10, 50, 120, 20], "text": "world", "confidence": 0.6,
         "det_confidence": 1.0, "line_number": 2},
    ]
    r = DocumentRenderer()
    p1 = r.draw_boxes(img_path, results, str(tmp_path / "boxes.png"))
    p2 = r.draw_results(img_path, results, str(tmp_path / "res.png"))
    p3 = r.create_report(img_path, results, str(tmp_path / "rep.html"))
    assert Image.open(p1).size == (200, 100)
    assert Image.open(p2).size == (410, 100)
    html = Path(p3).read_text()
    assert "hello" in html and "world" in html and "data:image/png" in html
    # show_text/show_confidence kwargs (reference renderer.py:72-73):
    # boxes-only render stays at source width; confidence suffix toggles.
    p4 = r.draw_results(img_path, results, str(tmp_path / "boxes_only.png"),
                        show_text=False)
    assert Image.open(p4).size == (200, 100)
    import numpy as np
    p5 = r.draw_results(img_path, results, str(tmp_path / "noconf.png"),
                        show_confidence=False)
    a_conf = np.asarray(Image.open(p2).convert("L"))
    a_noconf = np.asarray(Image.open(p5).convert("L"))
    assert (a_conf < 128).sum() > (a_noconf < 128).sum()


def test_version(capsys):
    with pytest.raises(SystemExit):
        main(["--version"])
    assert "kiri-tpu" in capsys.readouterr().out


def test_renderer_khmer_overlay(tmp_path):
    """Khmer result text draws visible ink (reference renderer.py:21-41
    falls back to a Khmer-capable font; here the pseudo-glyph pool)."""
    import numpy as np
    from PIL import Image

    from kiri_tpu.renderer import DocumentRenderer

    src = tmp_path / "doc.png"
    Image.fromarray(np.full((100, 300), 255, np.uint8)).convert(
        "RGB").save(src)
    r = DocumentRenderer()
    out = r.draw_results(str(src), [
        {"box": [10, 10, 200, 30], "text": "កខគ", "confidence": 0.95}],
        str(tmp_path / "out.png"))
    arr = np.asarray(Image.open(out).convert("L"))
    assert (arr[:, 310:] < 128).sum() > 30, "no ink for Khmer overlay"

def test_train_flag_plumbing(tmp_path, monkeypatch):
    """--select-metric/--train-only/--dec-input-noise reach TrainConfig."""
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    lines = []
    for i, text in enumerate(["ab", "ba"]):
        Image.new("L", (80, 48), 255).save(img_dir / f"l{i}.png")
        lines.append(f"l{i}.png\t{text}")
    (tmp_path / "labels.txt").write_text("\n".join(lines) + "\n")

    captured = {}

    def fake_train_loop(cfg, tok, tc, *a, **kw):
        captured["tc"] = tc

    import kiri_tpu.train.trainer as trainer_mod
    monkeypatch.setattr(trainer_mod, "train_loop", fake_train_loop)
    main(["train", "--train-labels", str(tmp_path / "labels.txt"),
          "--output-dir", str(tmp_path / "out"), "--epochs", "1",
          "--select-metric", "ar", "--train-only", "decoder",
          "--dec-input-noise", "0.25"])
    tc = captured["tc"]
    assert tc.select_metric == "ar"
    assert tc.train_only == "decoder"
    assert tc.dec_input_noise == 0.25


def test_detector_aug_weights_plumbing(monkeypatch, tmp_path):
    """--aug-weights parses into DBTrainConfig.aug_weights."""
    captured = {}

    import kiri_tpu.detect.db.train as db_train

    def fake_train_db(tc, verbose=True, variables=None):
        captured["tc"] = tc
        return {}

    monkeypatch.setattr(db_train, "train_db", fake_train_db)
    main(["train-detector", "--detector", "db", "--steps", "1",
          "--output-dir", str(tmp_path), "--aug-conditions", "0.5",
          "--aug-weights", "rotated=3,noisy=0.5"])
    tc = captured["tc"]
    assert tc.aug_conditions == 0.5
    assert tc.aug_weights == {"rotated": 3.0, "noisy": 0.5}


def test_pick_condition_weighting():
    """Weighted sampling over-samples the biased condition."""
    import random

    from kiri_tpu.detect.db.train import pick_condition

    rng = random.Random(0)
    picks = [pick_condition(rng, {"rotated": 9.0}) for _ in range(600)]
    frac = picks.count("rotated") / len(picks)
    assert frac > 0.6, frac  # expected 9/12 = 0.75
    rng = random.Random(0)
    uni = [pick_condition(rng) for _ in range(600)]
    assert 0.15 < uni.count("rotated") / len(uni) < 0.35


def test_multi_image_predict_pooled(tmp_path, capsys):
    """predict with several images runs one pooled pass and writes one
    output subdirectory per page."""
    from PIL import ImageDraw, ImageFont

    from kiri_tpu.config import CFG
    from kiri_tpu.models import recognizer as R
    from kiri_tpu.tokenizer import CharTokenizer
    from kiri_tpu.train.checkpoints import save_checkpoint
    import jax

    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz "):
        vocab[ch] = i + 1
    vp = tmp_path / "vocab.json"
    vp.write_text(json.dumps(vocab))
    cfg = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=4,
              DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=4,
              COMPUTE_DTYPE="float32",
              BATCH_BUCKETS=(1, 2, 4), STEP_BUCKETS=(16, 32))
    tok = CharTokenizer(str(vp), cfg)
    variables = R.init_recognizer(jax.random.PRNGKey(0), cfg, tok)
    ckpt = tmp_path / "model.safetensors"
    save_checkpoint(ckpt, variables, cfg, vocab_path=str(vp))

    font = ImageFont.truetype(
        "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf", 28)
    paths = []
    for i, line in enumerate(["hello world", "more text"]):
        img = Image.new("L", (500, 90), 255)
        ImageDraw.Draw(img).text((30, 20), line, fill=0, font=font)
        p = tmp_path / f"page{i}.png"
        img.save(p)
        paths.append(str(p))

    out = tmp_path / "out"
    main(["predict", *paths, "--model", str(ckpt), "--det-method", "legacy",
          "--decode-method", "fast", "--output", str(out), "--no-render"])
    stdout = capsys.readouterr().out
    assert "pooled batch" in stdout
    for i in range(2):
        doc_dir = out / f"page{i}"
        assert (doc_dir / "extracted_text.txt").exists()
        assert (doc_dir / "ocr_results.json").exists()


def test_predict_enhance_plumbing(tmp_path, monkeypatch):
    """--enhance reaches the OCR constructor."""
    import kiri_tpu.pipeline as pipeline_mod

    seen = {}

    class FakeOCR:
        def __init__(self, **kw):
            seen.update(kw)
            raise RuntimeError("stop here")

    monkeypatch.setattr(pipeline_mod, "OCR", FakeOCR)
    img = tmp_path / "x.png"
    Image.new("L", (100, 50), 255).save(img)
    main(["predict", str(img), "--enhance", "--det-method", "legacy",
          "--output", str(tmp_path / "out"), "--no-render"])
    assert seen.get("enhance") is True
