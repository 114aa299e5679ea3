"""OCR pipeline end-to-end with the legacy CV detector on synthetic pages."""
import json

import jax
import numpy as np
import pytest
from PIL import Image, ImageDraw, ImageFont

from kiri_tpu.config import CFG
from kiri_tpu.models import recognizer as R
from kiri_tpu.tokenizer import CharTokenizer
from kiri_tpu.train.checkpoints import save_checkpoint

FONT = "/usr/share/fonts/truetype/dejavu/DejaVuSans.ttf"

CFG_TINY = CFG(ENC_DIM=32, ENC_LAYERS=1, ENC_FF=64, ENC_HEADS=4,
               DEC_DIM=32, DEC_LAYERS=1, DEC_FF=64, DEC_HEADS=4,
               COMPUTE_DTYPE="float32",
               BATCH_BUCKETS=(1, 2, 4, 8), STEP_BUCKETS=(16, 32, 64))


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("pipe")
    vocab = {"<unk>": 0}
    for i, ch in enumerate("abcdefghijklmnopqrstuvwxyz 0123456789"):
        vocab[ch] = i + 1
    vp = tmp / "vocab.json"
    vp.write_text(json.dumps(vocab))
    tok = CharTokenizer(str(vp), CFG_TINY)
    variables = R.init_recognizer(jax.random.PRNGKey(0), CFG_TINY, tok)
    path = tmp / "model.safetensors"
    save_checkpoint(path, variables, CFG_TINY, vocab_path=str(vp))
    return str(path)


@pytest.fixture(scope="module")
def doc(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("docs")
    font = ImageFont.truetype(FONT, 28)
    img = Image.new("L", (700, 220), 255)
    d = ImageDraw.Draw(img)
    d.text((40, 20), "hello world", fill=0, font=font)
    d.text((40, 90), "second line here", fill=0, font=font)
    d.text((40, 160), "third 12345", fill=0, font=font)
    p = tmp / "doc.png"
    img.save(p)
    return str(p)


@pytest.fixture(scope="module")
def ocr(ckpt):
    from kiri_tpu.pipeline import OCR

    return OCR(ckpt, det_method="legacy", decode_method="fast")


def test_extract_text_result_schema(ocr, doc):
    text, results = ocr.extract_text(doc)
    assert len(results) == 3
    for i, r in enumerate(results):
        assert set(r) == {"box", "text", "confidence", "det_confidence",
                          "line_number"}
        assert r["line_number"] == i + 1
        assert len(r["box"]) == 4
    assert text.count("\n") == 2  # three grouped lines


def test_reading_order(ocr, doc):
    _, results = ocr.extract_text(doc)
    ys = [r["box"][1] for r in results]
    assert ys == sorted(ys)


def test_blank_page(ocr, tmp_path):
    p = tmp_path / "blank.png"
    Image.new("L", (300, 200), 255).save(p)
    text, results = ocr.extract_text(str(p))
    assert text == "" and results == []


def test_process_document_streaming(ocr, doc):
    results = list(ocr.process_document_streaming(doc))
    assert len(results) == 3
    assert all("total_regions" in r and r["total_regions"] == 3
               for r in results)


def test_stream_chars_schema(ocr, doc):
    chunks = list(ocr.extract_text_stream_chars(doc))
    starts = [c for c in chunks if c.get("region_start")]
    assert len(starts) == 3
    assert chunks[-1]["document_finished"]
    keys = {"token", "text", "cumulative_text", "region_number",
            "total_regions", "step", "region_finished", "document_finished",
            "region_start", "box", "det_confidence"}
    assert set(chunks[0]) >= keys - {"confidence"}


def test_decode_method_validation(ckpt):
    from kiri_tpu.pipeline import OCR

    with pytest.raises(ValueError, match="Invalid decode_method"):
        OCR(ckpt, decode_method="bogus")


def test_deprecated_use_beam_search(ckpt):
    from kiri_tpu.pipeline import OCR

    with pytest.warns(DeprecationWarning):
        o = OCR(ckpt, use_beam_search=True)
    assert o.decode_method == "beam"


def test_model_cache(ckpt):
    from kiri_tpu.pipeline import OCR

    a = OCR(ckpt, det_method="legacy")
    b = OCR(ckpt, det_method="legacy")
    assert a.engine is b.engine


def test_recognize_single_line_image(ocr, tmp_path):
    font = ImageFont.truetype(FONT, 28)
    img = Image.new("L", (300, 48), 255)
    ImageDraw.Draw(img).text((5, 5), "abc", fill=0, font=font)
    p = tmp_path / "line.png"
    img.save(p)
    text, conf = ocr.recognize_single_line_image(str(p))
    assert isinstance(text, str) and 0 <= conf <= 1


def test_device_preprocess_path(ckpt, doc):
    """preprocess='device' routes process_document through the Pallas fused
    preprocessing (engine.recognize_crops) and yields the same result
    schema/geometry as the host path."""
    from kiri_tpu.pipeline import OCR

    ocr_dev = OCR(ckpt, det_method="legacy", decode_method="fast",
                  preprocess="device")
    results = ocr_dev.process_document(doc)
    assert len(results) >= 3
    for r in results:
        assert set(r) >= {"box", "text", "confidence", "det_confidence",
                          "line_number"}
    ocr_host = OCR(ckpt, det_method="legacy", decode_method="fast")
    host = ocr_host.process_document(doc)
    assert [r["box"] for r in results] == [r["box"] for r in host]


def test_invalid_preprocess_rejected(ckpt):
    from kiri_tpu.pipeline import OCR

    with pytest.raises(ValueError, match="preprocess"):
        OCR(ckpt, preprocess="gpu")


def test_extract_text_batch_matches_single(ocr, doc, tmp_path):
    """The pooled multi-document pass must produce exactly what per-document
    extract_text produces (same regions, texts, assembly) — it only changes
    HOW the recognition is dispatched, not what it computes."""
    font = ImageFont.truetype(FONT, 28)
    img = Image.new("L", (700, 160), 255)
    d = ImageDraw.Draw(img)
    d.text((40, 20), "another page", fill=0, font=font)
    d.text((40, 90), "with two lines", fill=0, font=font)
    p2 = tmp_path / "doc2.png"
    img.save(p2)
    blank = tmp_path / "blank.png"
    Image.new("L", (300, 200), 255).save(blank)

    paths = [doc, str(p2), str(blank)]
    batch = ocr.extract_text_batch(paths)
    single = [ocr.extract_text(p) for p in paths]
    assert len(batch) == 3
    for (bt, br), (st, sr) in zip(batch, single):
        assert bt == st
        assert br == sr


def test_process_documents_device_preprocess(ckpt, doc):
    from kiri_tpu.pipeline import OCR

    ocr_dev = OCR(ckpt, det_method="legacy", decode_method="fast",
                  preprocess="device")
    pooled = ocr_dev.process_documents([doc, doc])
    assert len(pooled) == 2
    assert [r["box"] for r in pooled[0]] == [r["box"] for r in pooled[1]]
    assert [r["text"] for r in pooled[0]] == [r["text"] for r in pooled[1]]


def test_auto_decode_method_end_to_end(ckpt, doc):
    from kiri_tpu.pipeline import OCR

    ocr_auto = OCR(ckpt, det_method="legacy", decode_method="auto")
    results = ocr_auto.process_document(doc)
    assert len(results) == 3
    # Streaming under auto uses the CTC path (documented degradation).
    chunks = list(ocr_auto.extract_text_stream_chars(doc))
    assert chunks[-1]["document_finished"]


def test_recognize_region_and_streaming_schema(ocr):
    """Direct region APIs (reference core.py:553-686): tuple result and
    per-step streaming dicts from a preprocessed line image."""
    font = ImageFont.truetype(FONT, 28)
    img = Image.new("L", (300, 48), 255)
    ImageDraw.Draw(img).text((8, 6), "hi there", fill=0, font=font)
    arr = np.asarray(img, np.uint8)

    text, conf = ocr.recognize_region(arr)
    assert isinstance(text, str) and 0.0 <= conf <= 1.0

    # Reference [1,1,H,W] float layout is also accepted.
    ref_layout = (arr.astype(np.float32) / 255.0 - 0.5) / 0.5
    text2, _ = ocr.recognize_region(ref_layout[None, None])
    assert text2 == text

    chunks = list(ocr.recognize_region_streaming(arr))
    assert chunks, "no streaming chunks"
    for c in chunks:
        assert {"text", "step", "finished"} <= set(c)
    assert chunks[-1]["finished"] is True
    assert chunks[-1]["text"] == text


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/detector.safetensors").exists()
    or not __import__("pathlib").Path("models/model.safetensors").exists(),
    reason="trained checkpoints not present")
def test_process_documents_mixed_sizes_order(tmp_path):
    """Mixed page sizes force multiple detection canvas groups, so the
    facade iterator yields pages OUT of input order — results must still
    line up with their documents."""
    from kiri_tpu.data.docsynth import DocumentGenerator
    from kiri_tpu.pipeline import OCR

    paths = []
    for i, (w, h, seed) in enumerate([(640, 640, 61), (480, 640, 62),
                                      (640, 640, 63), (512, 512, 64)]):
        img = DocumentGenerator(w, h, seed=seed).generate()["image"]
        p = tmp_path / f"d{i}.png"
        Image.fromarray(img).save(p)
        paths.append(str(p))
    ocr = OCR("models/model.safetensors", det_method="db",
              det_model_path="models/detector.safetensors",
              decode_method="fast")
    pooled = ocr.process_documents(paths)
    for p, res in zip(paths, pooled):
        want = ocr.process_document(p)
        assert [r["box"] for r in res] == [r["box"] for r in want]
        assert [r["text"] for r in res] == [r["text"] for r in want]
