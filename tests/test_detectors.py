"""Detector components: DB postproc, CRAFT box extraction, doc generator GT."""
import numpy as np
import pytest

from kiri_tpu.data.docsynth import (DocumentGenerator, craft_ground_truth,
                                    db_ground_truth)


def _bare_db_detector():
    from kiri_tpu.detect.db import DBDetector

    det = DBDetector.__new__(DBDetector)
    det.det_db_thresh = 0.3
    det.det_db_box_thresh = 0.5
    det.det_db_unclip_ratio = 1.6
    det.min_size = 3
    det.max_candidates = 1000
    det.padding_pct = 0.01
    det.padding_px = 5
    det.padding_y_pct = 0.05
    det.padding_y_px = 5
    det.debug = False
    return det


def test_docsynth_produces_lines_and_chars():
    gen = DocumentGenerator(320, 320, seed=0)
    doc = gen.generate()
    assert doc["image"].shape == (320, 320)
    assert doc["image"].dtype == np.uint8
    assert len(doc["lines"]) >= 1
    assert len(doc["lines"]) == len(doc["texts"]) == len(doc["chars"])
    for (x, y, w, h), text, cboxes in zip(doc["lines"], doc["texts"],
                                          doc["chars"]):
        assert w > 0 and h > 0
        assert len(cboxes) == sum(1 for c in text if c != " ")


def test_db_ground_truth_maps():
    prob, thresh, tmask = db_ground_truth((100, 200), [(20, 20, 100, 20)])
    assert prob.shape == (100, 200)
    # Shrunk positive region strictly inside the box.
    ys, xs = np.nonzero(prob)
    assert xs.min() > 20 and xs.max() < 120
    assert ys.min() > 20 and ys.max() < 40
    # Threshold peaks (=1) on the box border, decays away from it.
    assert thresh.max() > 0.95
    assert tmask.sum() > 0
    assert thresh[30, 20] > thresh[30, 10]  # closer to edge -> higher


def test_db_postproc_recall_from_perfect_maps():
    det = _bare_db_detector()
    total_gt = total_det = 0
    for seed in range(8):
        gen = DocumentGenerator(320, 320, seed=seed)
        doc = gen.generate()
        prob, _, _ = db_ground_truth(doc["image"].shape, doc["lines"])
        boxes, scores = det._boxes_from_bitmap(
            prob, (prob > 0.3).astype(np.uint8), 320, 320)
        total_gt += len(doc["lines"])
        total_det += len(boxes)
    assert total_det >= 0.9 * total_gt, (total_det, total_gt)
    assert total_det <= 1.1 * total_gt


def test_db_boxes_cover_gt_lines():
    det = _bare_db_detector()
    gen = DocumentGenerator(320, 320, seed=1)
    doc = gen.generate()
    prob, _, _ = db_ground_truth(doc["image"].shape, doc["lines"])
    boxes, scores = det._boxes_from_bitmap(
        prob, (prob > 0.3).astype(np.uint8), 320, 320)
    padded = det._apply_smart_padding(boxes)
    results = det._sort_boxes_reading_order(list(zip(padded, scores)))
    # Reading order: vertical centers non-decreasing across line groups.
    centers = [np.mean(b[:, 1]) for b, _ in results]
    assert all(c2 >= c1 - 15 for c1, c2 in zip(centers, centers[1:]))
    # Each GT line center is inside some detected box AABB.
    hit = 0
    for (x, y, w, h) in doc["lines"]:
        cx, cy = x + w / 2, y + h / 2
        for b, _ in results:
            if (b[:, 0].min() <= cx <= b[:, 0].max()
                    and b[:, 1].min() <= cy <= b[:, 1].max()):
                hit += 1
                break
    assert hit >= 0.9 * len(doc["lines"])


def test_craft_gt_and_box_extraction():
    from kiri_tpu.detect.craft import get_det_boxes

    gen = DocumentGenerator(320, 320, seed=5)
    doc = gen.generate()
    region, affinity = craft_ground_truth(doc["image"].shape, doc["chars"])
    assert 0 <= region.min() and region.max() <= 1.0
    boxes = get_det_boxes(region, affinity, 0.7, 0.4, 0.4)
    assert boxes, "no boxes from perfect CRAFT maps"
    n_words = sum(len(t.split()) for t in doc["texts"])
    # Word-level detection: box count within 2x of word count.
    assert 0.4 * n_words <= len(boxes) <= 2.0 * n_words


def test_craft_confidence_handles_out_of_map_quads(monkeypatch):
    """min_area_rect quads on rotated pages can have corners outside the
    score map; negative indices must not python-wrap the confidence slice
    to an empty array (crashed with 'zero-size array to reduction')."""
    import jax

    import kiri_tpu.detect.craft as craft_mod
    from kiri_tpu.detect.craft import CRAFTDetector
    from kiri_tpu.detect.craft.net import init_craft_net

    det = CRAFTDetector(variables=init_craft_net(jax.random.PRNGKey(0)))
    bad_quads = [
        np.array([[-6.0, -3.0], [20.0, -5.0], [22.0, 8.0], [-4.0, 10.0]]),
        np.array([[-9.0, -8.0], [-2.0, -8.0], [-2.0, -1.0], [-9.0, -1.0]]),
        np.array([[5.0, 5.0], [30.0, 5.0], [30.0, 15.0], [5.0, 15.0]]),
    ]
    monkeypatch.setattr(craft_mod, "get_det_boxes",
                        lambda *a, **k: list(bad_quads))
    img = np.full((96, 128), 255, np.uint8)
    img[30:40, 20:90] = 0
    results = det.detect_text(img)
    assert len(results) == 3
    for pts, conf in results:
        assert np.isfinite(conf) and pts.shape == (4, 2)


def test_db_net_shapes():
    import jax

    from kiri_tpu.detect.db.net import db_forward, init_db_net

    v = init_db_net(jax.random.PRNGKey(0))
    x = np.zeros((1, 64, 96, 1), np.float32)
    prob, thresh, _ = jax.jit(lambda v, x: db_forward(v, x))(v, x)
    assert prob.shape == (1, 64, 96)
    assert thresh.shape == (1, 64, 96)
    assert 0 <= float(prob.min()) and float(prob.max()) <= 1


def test_craft_net_shapes():
    import jax

    from kiri_tpu.detect.craft.net import craft_forward, init_craft_net

    v = init_craft_net(jax.random.PRNGKey(0))
    x = np.zeros((1, 64, 96, 1), np.float32)
    region, affinity, _ = jax.jit(lambda v, x: craft_forward(v, x))(v, x)
    assert region.shape == (1, 32, 48)
    assert affinity.shape == (1, 32, 48)


def test_db_checkpoint_roundtrip(tmp_path):
    import jax

    from kiri_tpu.detect.db import load_db_checkpoint, save_db_checkpoint
    from kiri_tpu.detect.db.net import init_db_net

    v = init_db_net(jax.random.PRNGKey(0))
    p = tmp_path / "det.safetensors"
    save_db_checkpoint(p, v)
    v2 = load_db_checkpoint(p)
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(v2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_db_train_step_decreases_loss():
    import jax
    import jax.numpy as jnp
    import optax

    from kiri_tpu.detect.db.net import init_db_net
    from kiri_tpu.detect.db.train import (DBTrainConfig, db_loss,
                                          make_batch, make_db_train_step)

    tc = DBTrainConfig(image_size=160, batch_size=2, lr=1e-3)
    gen = DocumentGenerator(160, 160, seed=0)
    batch = jax.tree.map(jnp.asarray, make_batch(gen, 2, 160))
    variables = init_db_net(jax.random.PRNGKey(0))
    optimizer = optax.adam(tc.lr)
    opt_state = optimizer.init(variables["params"])
    step = make_db_train_step(tc, optimizer)
    losses = []
    for i in range(12):
        variables, opt_state, metrics = step(variables, opt_state, batch,
                                             jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_craft_train_step_decreases_loss():
    import jax
    import jax.numpy as jnp
    import optax

    from kiri_tpu.detect.craft.net import init_craft_net
    from kiri_tpu.detect.craft.train import craft_loss, make_batch

    gen = DocumentGenerator(160, 160, seed=0)
    batch = jax.tree.map(jnp.asarray, make_batch(gen, 2, 160))
    variables = init_craft_net(jax.random.PRNGKey(0))
    optimizer = optax.adam(5e-4)
    opt_state = optimizer.init(variables["params"])

    @jax.jit
    def step(variables, opt_state, batch):
        (loss, (ns, m)), grads = jax.value_and_grad(
            craft_loss, has_aux=True)(variables, batch)
        updates, opt_state = optimizer.update(grads["params"], opt_state)
        params = optax.apply_updates(variables["params"], updates)
        bs = dict(variables["batch_stats"])
        if ns:
            bs.update(ns)
        return {"params": params, "batch_stats": bs}, opt_state, loss

    losses = []
    for _ in range(12):
        variables, opt_state, loss = step(variables, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/detector.safetensors").exists(),
    reason="trained DB checkpoint not present")
def test_trained_db_detector_e2e():
    """The committed DB checkpoint must find every line on an unseen doc."""
    from kiri_tpu.detect.db import DBDetector

    det = DBDetector("models/detector.safetensors")
    gen = DocumentGenerator(640, 640, seed=321)
    doc = gen.generate()
    results = det.detect_text(doc["image"])
    boxes = [b for b, _ in results]
    hit = sum(1 for (x, y, w, h) in doc["lines"]
              if any(b[:, 0].min() <= x + w / 2 <= b[:, 0].max()
                     and b[:, 1].min() <= y + h / 2 <= b[:, 1].max()
                     for b in boxes))
    assert hit >= 0.9 * len(doc["lines"]), (hit, len(doc["lines"]))
    # Confidences are meaningful probabilities.
    assert all(0.3 <= c <= 1.0 for _, c in results)


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/craft.safetensors").exists(),
    reason="trained CRAFT checkpoint not present")
def test_trained_craft_serving_scale_recall():
    """Guard against serving-scale collapse: the committed CRAFT checkpoint
    must keep finding lines through the PRODUCT path (facade -> canvas 1280 /
    mag_ratio 1.5 upscale), not just at training-native 640px. A fine-tune
    that only ever saw native-scale glyphs once silently dropped from 100
    raw quads to 1 exactly here."""
    from kiri_tpu.detect import TextDetector

    det = TextDetector(method="craft", model_path="models/craft.safetensors")
    gen = DocumentGenerator(640, 640, seed=654)
    doc = gen.generate()
    boxes = det.detect_lines_objects(doc["image"])
    hit = sum(1 for (x, y, w, h) in doc["lines"]
              if any(b.x <= x + w / 2 <= b.x + b.width
                     and b.y <= y + h / 2 <= b.y + b.height
                     for b in boxes))
    assert hit >= 0.9 * len(doc["lines"]), (hit, len(doc["lines"]))


def test_hub_fallback_repo_id(tmp_path, monkeypatch):
    """Repo-id model paths route through the hub download (reference:
    kiri_ocr/detector/__init__.py:82-107), falling back to legacy offline."""
    from kiri_tpu.detect import TextDetector

    calls = []

    def fake_download(self, repo_id):
        calls.append(repo_id)
        return None  # offline

    monkeypatch.setattr(TextDetector, "_download_from_hub", fake_download)
    det = TextDetector(method="db", model_path="someorg/somerepo")
    assert calls == ["someorg/somerepo"]
    assert det.method == "legacy"  # graceful fallback, no crash


def test_find_default_model_tries_hub_when_no_local(monkeypatch, tmp_path):
    from kiri_tpu.detect import TextDetector

    calls = []
    monkeypatch.setattr(
        TextDetector, "_download_from_hub",
        lambda self, repo: calls.append(repo) or None)
    # Point the local search away from the repo's models/ dir.
    monkeypatch.chdir(tmp_path)
    monkeypatch.setattr(
        TextDetector, "_find_default_model",
        TextDetector._find_default_model)  # keep real impl

    det = TextDetector.__new__(TextDetector)
    det.method = "db"
    found = TextDetector._find_default_model(det)
    # Local repo checkpoint exists via absolute repo-root candidate, so the
    # hub is NOT consulted when a local model is found.
    if found is None:
        assert calls == [TextDetector.DEFAULT_HUB_REPO]
    else:
        assert calls == []


def test_smart_padding_shared_budget_no_merge():
    """Regression (round-1 'dense layout merges adjacent lines'): with the
    reference clamp two stacked lines could each consume the full gap and end
    up touching; the shared-budget clamp must leave >= half the gap intact."""
    det = _bare_db_detector()

    def quad(x, y, w, h):
        return np.array([[x, y], [x + w, y], [x + w, y + h], [x, y + h]],
                        np.int32)

    for gap in (4, 6, 8, 12):
        boxes = [quad(10, 50 + i * (18 + gap), 200, 18) for i in range(5)]
        padded = det._apply_smart_padding(boxes)
        for i in range(len(padded) - 1):
            bot_i = padded[i][:, 1].max()
            top_j = padded[i + 1][:, 1].min()
            # >= half the original clearance must survive (int rounding -1).
            assert top_j - bot_i >= gap / 2 - 1, (
                f"gap {gap}: padded boxes {i},{i + 1} separated by "
                f"{top_j - bot_i}")


def test_smart_padding_isolated_box_gets_full_target():
    """A box with no neighbors is padded by the full target amounts."""
    det = _bare_db_detector()
    box = np.array([[100, 100], [300, 100], [300, 124], [100, 124]], np.int32)
    (padded,) = det._apply_smart_padding([box])
    w0, h0 = 200, 24
    pw = (padded[:, 0].max() - padded[:, 0].min()) - w0
    ph = (padded[:, 1].max() - padded[:, 1].min()) - h0
    assert pw >= (w0 * det.padding_pct + h0 * 0.5 + det.padding_px) - 2
    assert ph >= (h0 * det.padding_y_pct + det.padding_y_px) - 2


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/detector.safetensors").exists(),
    reason="trained DB checkpoint not present")
def test_db_detect_text_batch_matches_single():
    """Batched multi-page DB detection is bit-identical to per-page calls.

    Mixed page sizes force multiple canvas groups plus a padded batch
    bucket, so the grouping/bucketing bookkeeping in predict_maps_batch is
    exercised, not just the trivial same-shape case."""
    from kiri_tpu.detect.db import DBDetector

    det = DBDetector("models/detector.safetensors")
    docs = [DocumentGenerator(640, 640, seed=s).generate()["image"]
            for s in (11, 12, 13)]
    docs.append(DocumentGenerator(480, 640, seed=14).generate()["image"])
    batched = det.detect_text_batch(docs)
    for img, got in zip(docs, batched):
        want = det.detect_text(img)
        assert len(got) == len(want)
        for (gb, gs), (wb, ws) in zip(got, want):
            assert np.array_equal(gb, wb)
            assert gs == pytest.approx(ws, abs=1e-6)


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/detector.safetensors").exists(),
    reason="trained DB checkpoint not present")
def test_facade_batch_matches_single_pages():
    """Facade detect_lines_objects_batch == per-page detect_lines_objects,
    including per-page deskew state captured in last_batch_state."""
    from kiri_tpu.detect import TextDetector

    det = TextDetector(method="db",
                       model_path="models/detector.safetensors")
    docs = [DocumentGenerator(640, 640, seed=s).generate()["image"]
            for s in (21, 22)]
    batched = det.detect_lines_objects_batch(docs)
    assert len(det.last_batch_state) == len(docs)
    for img, got in zip(docs, batched):
        want = det.detect_lines_objects(img)
        assert [(b.x, b.y, b.width, b.height) for b in got] == \
               [(b.x, b.y, b.width, b.height) for b in want]
        assert [b.confidence for b in got] == [b.confidence for b in want]


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/craft.safetensors").exists(),
    reason="trained CRAFT checkpoint not present")
def test_craft_detect_text_batch_matches_single():
    """Batched multi-page CRAFT detection == per-page calls (mixed page
    sizes -> multiple canvas groups + a padded batch bucket)."""
    from kiri_tpu.detect.craft import CRAFTDetector

    det = CRAFTDetector("models/craft.safetensors")
    docs = [DocumentGenerator(640, 640, seed=s).generate()["image"]
            for s in (16, 17)]
    docs.append(DocumentGenerator(480, 640, seed=18).generate()["image"])
    batched = det.detect_text_batch(docs)
    for img, got in zip(docs, batched):
        want = det.detect_text(img)
        assert len(got) == len(want)
        for (gp, gc), (wp, wc) in zip(got, want):
            assert np.array_equal(gp, wp)
            assert gc == pytest.approx(wc, abs=1e-6)


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/craft.safetensors").exists(),
    reason="trained CRAFT checkpoint not present")
def test_facade_batch_matches_single_pages_craft():
    from kiri_tpu.detect import TextDetector

    det = TextDetector(method="craft", model_path="models/craft.safetensors")
    docs = [DocumentGenerator(640, 640, seed=s).generate()["image"]
            for s in (26, 27)]
    batched = det.detect_lines_objects_batch(docs)
    for img, got in zip(docs, batched):
        want = det.detect_lines_objects(img)
        assert [(b.x, b.y, b.width, b.height) for b in got] == \
               [(b.x, b.y, b.width, b.height) for b in want]


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/detector.safetensors").exists(),
    reason="trained DB checkpoint not present")
def test_db_map_downsample_serving_knob():
    """det_map_downsample=2 (wire saver: quarter-size u16 map + host
    bilinear upsample) must keep box COUNTS and stay within a few px of
    the full-res boxes; downstream crops carry >=5 px padding."""
    from kiri_tpu.detect.db import DBDetector

    full = DBDetector("models/detector.safetensors")
    half = DBDetector("models/detector.safetensors", det_map_downsample=2)
    for seed in (301, 302, 303):
        img = DocumentGenerator(640, 640, seed=seed).generate()["image"]
        rf = full.detect_text(img)
        rh = half.detect_text(img)
        assert len(rf) == len(rh)
        for (bf, _), (bh, _) in zip(rf, rh):
            # Vertex order of a min-area quad can rotate under tiny
            # coordinate shifts; compare the axis-aligned extents.
            ef = [bf[:, 0].min(), bf[:, 0].max(), bf[:, 1].min(),
                  bf[:, 1].max()]
            eh = [bh[:, 0].min(), bh[:, 0].max(), bh[:, 1].min(),
                  bh[:, 1].max()]
            assert np.abs(np.array(ef) - np.array(eh)).max() <= 6


def test_ocr_det_kwargs_plumbing(monkeypatch, tmp_path):
    """OCR(det_kwargs=...) reaches the TextDetector constructor."""
    from kiri_tpu import pipeline as P

    seen = {}

    class FakeDetector:
        def __init__(self, **kw):
            seen.update(kw)

    monkeypatch.setattr("kiri_tpu.detect.TextDetector", FakeDetector)
    ocr = P.OCR.__new__(P.OCR)
    ocr._detector = None
    ocr.det_method = "db"
    ocr.det_model_path = None
    ocr.det_conf_threshold = 0.5
    ocr.deskew = False
    ocr.det_kwargs = {"det_map_downsample": 2, "det_db_thresh": 0.4}
    _ = ocr.detector
    assert seen["det_map_downsample"] == 2
    assert seen["det_db_thresh"] == 0.4


def test_det_map_downsample_validated_at_construction():
    from kiri_tpu.detect.db import DBDetector

    with pytest.raises(ValueError, match="divisor of 32"):
        DBDetector.__new__(DBDetector).__init__(det_map_downsample=3)


@pytest.mark.skipif(
    not __import__("pathlib").Path("models/detector.safetensors").exists(),
    reason="trained DB checkpoint not present")
def test_batch_resets_stale_single_page_deskew_state():
    """A previous page's deskew frame must not leak into a batch call
    (the single-page API documents this invariant; the batch API must
    honor it too)."""
    from kiri_tpu.detect import TextDetector

    det = TextDetector(method="db", model_path="models/detector.safetensors",
                       deskew=True)
    det.last_deskewed_image = np.zeros((10, 10), np.uint8)  # stale frame
    det.last_deskew_boxes = [(0, 0, 5, 5)]
    doc = DocumentGenerator(640, 640, seed=77).generate()["image"]
    det.detect_lines_objects_batch([doc])
    assert det.last_deskewed_image is None
    assert det.last_deskew_boxes is None


def test_split_column_merges_splits_aligned_gutter():
    """A detected box bridging a two-column gutter must split at the
    gutter (aligned ink-free band across other lines' rows), with each
    part tightened to its own ink."""
    from kiri_tpu.detect import TextDetector
    from kiri_tpu.detect.base import DetectionLevel, TextBox

    rng = np.random.default_rng(3)
    page = np.full((300, 600), 255, np.uint8)
    # Two columns of 5 text rows; gutter at x 280..320.
    rows = [20, 75, 130, 185, 240]
    for y in rows:
        for x0, x1 in ((30, 280), (320, 570)):
            for x in range(x0, x1, 9):       # strokes with word-ish gaps
                if rng.random() < 0.85:
                    page[y:y + 22, x:x + 4] = 0
    det = TextDetector(method="legacy")      # facade helper only
    boxes = [TextBox(25, rows[0] - 4, 550, 30, confidence=0.9,
                     level=DetectionLevel.LINE)]          # bridges gutter
    boxes += [TextBox(25, y - 4, 260, 30, confidence=0.9,
                      level=DetectionLevel.LINE) for y in rows[1:]]
    boxes += [TextBox(315, y - 4, 260, 30, confidence=0.9,
                      level=DetectionLevel.LINE) for y in rows[1:]]
    out = det._split_column_merges(page, boxes)
    assert len(out) == len(boxes) + 1        # one split
    halves = [b for b in out if b.y < 40]
    assert len(halves) == 2
    left, right = sorted(halves, key=lambda b: b.x)
    assert left.x + left.width <= 320 and right.x >= 280
    assert left.confidence == right.confidence == 0.9


def test_split_column_merges_keeps_wide_word_spaces():
    """Wide word spaces inside ONE line (not aligned across other lines)
    must not split the box; sparse pages without neighbor evidence are
    left alone entirely."""
    from kiri_tpu.detect import TextDetector
    from kiri_tpu.detect.base import DetectionLevel, TextBox

    rng = np.random.default_rng(4)
    page = np.full((300, 600), 255, np.uint8)
    rows = [20, 75, 130, 185, 240]
    # Full-width lines with a 30px space at a DIFFERENT x per line.
    gaps = [100, 220, 340, 460, 520]
    for y, gx in zip(rows, gaps):
        for x in range(30, 570, 9):
            if gx <= x < gx + 30:
                continue
            if rng.random() < 0.9:
                page[y:y + 22, x:x + 4] = 0
    det = TextDetector(method="legacy")
    boxes = [TextBox(25, y - 4, 550, 30, confidence=0.9,
                     level=DetectionLevel.LINE) for y in rows]
    out = det._split_column_merges(page, boxes)
    assert len(out) == len(boxes)
    # Sparse page: 2 boxes -> no neighbor evidence -> untouched.
    out2 = det._split_column_merges(page, boxes[:2])
    assert [b.bbox for b in out2] == [b.bbox for b in boxes[:2]]
    # Knob off -> untouched.
    det.split_columns = False
    out3 = det._split_column_merges(page, boxes)
    assert [b.bbox for b in out3] == [b.bbox for b in boxes]
