"""ONNX importer tests: wire codec round-trip + op semantics vs torch oracle.

The reference executes its pretrained DB detector as an ONNX session
(kiri_ocr/detector/db/model.py:113-116). kiri_tpu imports such graphs into
JAX (utils/onnx_pb.py + utils/onnx_import.py). torch.onnx.export needs the
`onnx` package (absent here), so graphs are synthesized with our own wire
writer and each op's numerics are checked against torch.nn.functional.
"""
import numpy as np
import pytest

from kiri_tpu.utils import onnx_pb
from kiri_tpu.utils.onnx_import import import_onnx

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _model(nodes, inits, inputs, outputs, opset=13):
    data = onnx_pb.write_model(nodes, inits, inputs, outputs, opset=opset)
    return import_onnx(data)


def _run(mod, *xs):
    import jax

    out = jax.jit(mod.apply)(mod.params, *[np.asarray(x) for x in xs])
    if isinstance(out, tuple):
        return tuple(np.asarray(o) for o in out)
    return np.asarray(out)


# --------------------------------------------------------------- wire codec
def test_tensor_roundtrip_dtypes():
    rng = np.random.default_rng(0)
    for arr in [
        rng.standard_normal((3, 4)).astype(np.float32),
        rng.integers(-5, 5, (2, 3)).astype(np.int64),
        rng.integers(0, 2, (4,)).astype(np.bool_),
        rng.standard_normal((2, 2, 2)).astype(np.float16),
        np.float32(3.25).reshape(()),  # scalar
    ]:
        parsed = onnx_pb.parse_tensor(onnx_pb.write_tensor("t", arr))
        assert parsed["name"] == "t"
        np.testing.assert_array_equal(parsed["array"], arr)
        assert parsed["array"].dtype == arr.dtype
        assert parsed["array"].shape == arr.shape  # 0-d must stay 0-d


def test_model_roundtrip_structure():
    w = np.ones((4, 3, 1, 1), np.float32)
    nodes = [onnx_pb.write_node("Conv", ["x", "w"], ["y"], name="c0",
                                kernel_shape=[1, 1], strides=[1, 1])]
    data = onnx_pb.write_model(nodes, {"w": w},
                               [("x", [None, 3, None, None])],
                               [("y", [None, 4, None, None])], opset=11)
    m = onnx_pb.parse_model(data)
    assert m["opset"] == 11
    g = m["graph"]
    assert [n["op_type"] for n in g["nodes"]] == ["Conv"]
    assert g["nodes"][0]["attrs"]["kernel_shape"] == [1, 1]
    assert list(g["initializers"]) == ["w"]
    assert g["inputs"][0]["shape"] == [None, 3, None, None]


# ------------------------------------------------------------ op semantics
def test_conv_vs_torch_strided_dilated_grouped():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 14, 18)).astype(np.float32)
    for stride, dil, group, pad in [(1, 1, 1, 1), (2, 1, 1, 0),
                                    (1, 2, 1, 2), (1, 1, 8, 1),
                                    (2, 1, 2, (1, 2))]:
        kh = kw = 3
        cout = 8
        w = rng.standard_normal((cout, 8 // group, kh, kw)).astype(np.float32)
        b = rng.standard_normal((cout,)).astype(np.float32)
        if isinstance(pad, tuple):
            pads = [pad[0], pad[1], pad[0], pad[1]]
            tpad = pad
        else:
            pads = [pad] * 4
            tpad = pad
        mod = _model(
            [onnx_pb.write_node("Conv", ["x", "w", "b"], ["y"],
                                kernel_shape=[kh, kw],
                                strides=[stride, stride], pads=pads,
                                dilations=[dil, dil], group=group)],
            {"w": w, "b": b}, [("x", list(x.shape))], [("y", [None] * 4)])
        got = _run(mod, x)
        want = F.conv2d(torch.from_numpy(x), torch.from_numpy(w),
                        torch.from_numpy(b), stride=stride, padding=tpad,
                        dilation=dil, groups=group).numpy()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_conv_transpose_vs_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 6, 10, 12)).astype(np.float32)
    w = rng.standard_normal((6, 4, 2, 2)).astype(np.float32)  # [Cin,Cout,k,k]
    b = rng.standard_normal((4,)).astype(np.float32)
    mod = _model(
        [onnx_pb.write_node("ConvTranspose", ["x", "w", "b"], ["y"],
                            kernel_shape=[2, 2], strides=[2, 2])],
        {"w": w, "b": b}, [("x", list(x.shape))], [("y", [None] * 4)])
    got = _run(mod, x)
    want = F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                              torch.from_numpy(b), stride=2).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_batchnorm_folds_and_matches():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 5, 6, 7)).astype(np.float32)
    scale = rng.standard_normal(5).astype(np.float32)
    bias = rng.standard_normal(5).astype(np.float32)
    mean = rng.standard_normal(5).astype(np.float32)
    var = rng.random(5).astype(np.float32) + 0.1
    mod = _model(
        [onnx_pb.write_node("BatchNormalization",
                            ["x", "s", "b", "m", "v"], ["y"],
                            epsilon=1e-5)],
        {"s": scale, "b": bias, "m": mean, "v": var},
        [("x", list(x.shape))], [("y", [None] * 4)])
    got = _run(mod, x)
    want = F.batch_norm(torch.from_numpy(x), torch.from_numpy(mean),
                        torch.from_numpy(var), torch.from_numpy(scale),
                        torch.from_numpy(bias), eps=1e-5).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pools_vs_torch():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 15, 17)).astype(np.float32)
    # MaxPool k3 s2 p1 ceil
    mod = _model(
        [onnx_pb.write_node("MaxPool", ["x"], ["y"], kernel_shape=[3, 3],
                            strides=[2, 2], pads=[1, 1, 1, 1], ceil_mode=1)],
        {}, [("x", list(x.shape))], [("y", [None] * 4)])
    want = F.max_pool2d(torch.from_numpy(x), 3, 2, 1, ceil_mode=True).numpy()
    np.testing.assert_allclose(_run(mod, x), want, rtol=1e-5, atol=1e-5)
    # AveragePool k2 s2, count_include_pad default (exclude)
    mod = _model(
        [onnx_pb.write_node("AveragePool", ["x"], ["y"], kernel_shape=[2, 2],
                            strides=[2, 2], pads=[1, 1, 1, 1])],
        {}, [("x", list(x.shape))], [("y", [None] * 4)])
    want = F.avg_pool2d(torch.from_numpy(x), 2, 2, 1,
                        count_include_pad=False).numpy()
    np.testing.assert_allclose(_run(mod, x), want, rtol=1e-5, atol=1e-5)
    # GlobalAveragePool
    mod = _model([onnx_pb.write_node("GlobalAveragePool", ["x"], ["y"])],
                 {}, [("x", list(x.shape))], [("y", [None] * 4)])
    np.testing.assert_allclose(
        _run(mod, x), x.mean(axis=(2, 3), keepdims=True), rtol=1e-5,
        atol=1e-6)


def test_activations_vs_torch():
    rng = np.random.default_rng(5)
    x = (rng.standard_normal((3, 9)) * 4).astype(np.float32)
    cases = {
        "Relu": (F.relu, {}),
        "Sigmoid": (torch.sigmoid, {}),
        "HardSwish": (F.hardswish, {}),
        "LeakyRelu": (lambda t: F.leaky_relu(t, 0.1), {"alpha": 0.1}),
        "Softmax": (lambda t: F.softmax(t, dim=-1), {"axis": -1}),
        "Erf": (torch.erf, {}),
    }
    for op, (fn, attrs) in cases.items():
        mod = _model([onnx_pb.write_node(op, ["x"], ["y"], **attrs)],
                     {}, [("x", list(x.shape))], [("y", [None, None])])
        np.testing.assert_allclose(
            _run(mod, x), fn(torch.from_numpy(x)).numpy(),
            rtol=1e-4, atol=1e-5, err_msg=op)
    # torch.hardsigmoid is alpha=1/6 beta=0.5
    mod = _model([onnx_pb.write_node("HardSigmoid", ["x"], ["y"],
                                     alpha=1.0 / 6.0, beta=0.5)],
                 {}, [("x", list(x.shape))], [("y", [None, None])])
    np.testing.assert_allclose(
        _run(mod, x), F.hardsigmoid(torch.from_numpy(x)).numpy(),
        rtol=1e-4, atol=1e-5)


def test_resize_nearest_and_bilinear():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((1, 4, 6, 5)).astype(np.float32)
    # nearest, asymmetric, integer scale — the PP-OCR FPN upsample flavor
    mod = _model(
        [onnx_pb.write_node("Resize", ["x", "", "sc"], ["y"], mode="nearest",
                            coordinate_transformation_mode="asymmetric")],
        {"sc": np.array([1, 1, 2, 2], np.float32)},
        [("x", list(x.shape))], [("y", [None] * 4)])
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="nearest").numpy()
    np.testing.assert_allclose(_run(mod, x), want, rtol=1e-6, atol=1e-6)
    # bilinear half_pixel == torch align_corners=False
    mod = _model(
        [onnx_pb.write_node("Resize", ["x", "", "sc"], ["y"], mode="linear",
                            coordinate_transformation_mode="half_pixel")],
        {"sc": np.array([1, 1, 2, 2], np.float32)},
        [("x", list(x.shape))], [("y", [None] * 4)])
    want = F.interpolate(torch.from_numpy(x), scale_factor=2,
                         mode="bilinear", align_corners=False).numpy()
    np.testing.assert_allclose(_run(mod, x), want, rtol=1e-4, atol=1e-5)


def test_gemm_matmul_vs_torch():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((4, 6)).astype(np.float32)
    w = rng.standard_normal((5, 6)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    mod = _model(
        [onnx_pb.write_node("Gemm", ["a", "w", "b"], ["y"], transB=1,
                            alpha=1.0, beta=1.0)],
        {"w": w, "b": b}, [("a", list(a.shape))], [("y", [None, None])])
    want = F.linear(torch.from_numpy(a), torch.from_numpy(w),
                    torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(_run(mod, a), want, rtol=1e-4, atol=1e-5)


def test_shape_chain_constant_folds_under_jit():
    """Shape->Gather->Unsqueeze->Concat->Reshape must fold to a static
    reshape: PP-OCR exports encode every view op this way."""
    rng = np.random.default_rng(8)
    x = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
    nodes = [
        onnx_pb.write_node("Shape", ["x"], ["shp"]),
        onnx_pb.write_node("Gather", ["shp", "i0"], ["n"], axis=0),
        onnx_pb.write_node("Unsqueeze", ["n"], ["n1"], axes=[0]),
        onnx_pb.write_node("Concat", ["n1", "rest"], ["tgt"], axis=0),
        onnx_pb.write_node("Reshape", ["x", "tgt"], ["y"]),
    ]
    mod = _model(nodes,
                 {"i0": np.array(0, np.int64),
                  "rest": np.array([-1], np.int64)},
                 [("x", list(x.shape))], [("y", [None, None])])
    got = _run(mod, x)
    np.testing.assert_array_equal(got, x.reshape(2, -1))


def test_slice_split_pad_where():
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 8, 6)).astype(np.float32)
    mod = _model(
        [onnx_pb.write_node("Slice", ["x", "st", "en", "ax"], ["y"])],
        {"st": np.array([1], np.int64), "en": np.array([5], np.int64),
         "ax": np.array([1], np.int64)},
        [("x", list(x.shape))], [("y", [None] * 3)])
    np.testing.assert_array_equal(_run(mod, x), x[:, 1:5])

    mod = _model(
        [onnx_pb.write_node("Split", ["x"], ["a", "b"], axis=1,
                            split=[3, 5])],
        {}, [("x", list(x.shape))], [("a", [None] * 3), ("b", [None] * 3)])
    a, b = _run(mod, x)
    np.testing.assert_array_equal(a, x[:, :3])
    np.testing.assert_array_equal(b, x[:, 3:])

    mod = _model(
        [onnx_pb.write_node("Pad", ["x", "p"], ["y"], mode="constant")],
        {"p": np.array([0, 0, 1, 0, 0, 2], np.int64)},
        [("x", list(x.shape))], [("y", [None] * 3)])
    got = _run(mod, x)
    assert got.shape == (2, 8, 9)
    np.testing.assert_array_equal(got[:, :, 1:7], x)


def test_mobilenetv3_style_block_vs_torch():
    """Composite: conv-bn-hswish -> depthwise conv-bn -> SE -> residual add.

    This is the exact building block of the PP-OCR DB backbone the importer
    exists for; oracle is the same block in torch.
    """
    rng = np.random.default_rng(10)
    C = 8
    x = rng.standard_normal((1, C, 12, 16)).astype(np.float32)
    w1 = (rng.standard_normal((C, C, 1, 1)) * 0.3).astype(np.float32)
    bn_s = np.abs(rng.standard_normal(C)).astype(np.float32) + 0.5
    bn_b = rng.standard_normal(C).astype(np.float32)
    bn_m = rng.standard_normal(C).astype(np.float32) * 0.1
    bn_v = (np.abs(rng.standard_normal(C)) + 0.5).astype(np.float32)
    wd = (rng.standard_normal((C, 1, 3, 3)) * 0.3).astype(np.float32)
    wse1 = (rng.standard_normal((C // 2, C, 1, 1)) * 0.3).astype(np.float32)
    wse2 = (rng.standard_normal((C, C // 2, 1, 1)) * 0.3).astype(np.float32)

    nodes = [
        onnx_pb.write_node("Conv", ["x", "w1"], ["c1"], kernel_shape=[1, 1]),
        onnx_pb.write_node("BatchNormalization",
                           ["c1", "bns", "bnb", "bnm", "bnv"], ["b1"]),
        onnx_pb.write_node("HardSwish", ["b1"], ["h1"]),
        onnx_pb.write_node("Conv", ["h1", "wd"], ["dw"], kernel_shape=[3, 3],
                           pads=[1, 1, 1, 1], group=C),
        onnx_pb.write_node("GlobalAveragePool", ["dw"], ["gap"]),
        onnx_pb.write_node("Conv", ["gap", "wse1"], ["se1"],
                           kernel_shape=[1, 1]),
        onnx_pb.write_node("Relu", ["se1"], ["se1r"]),
        onnx_pb.write_node("Conv", ["se1r", "wse2"], ["se2"],
                           kernel_shape=[1, 1]),
        onnx_pb.write_node("HardSigmoid", ["se2"], ["gate"],
                           alpha=1.0 / 6.0, beta=0.5),
        onnx_pb.write_node("Mul", ["dw", "gate"], ["scaled"]),
        onnx_pb.write_node("Add", ["scaled", "x"], ["y"]),
    ]
    inits = {"w1": w1, "bns": bn_s, "bnb": bn_b, "bnm": bn_m, "bnv": bn_v,
             "wd": wd, "wse1": wse1, "wse2": wse2}
    mod = _model(nodes, inits, [("x", list(x.shape))], [("y", [None] * 4)])
    got = _run(mod, x)

    t = torch.from_numpy
    h1 = F.hardswish(F.batch_norm(F.conv2d(t(x), t(w1)), t(bn_m), t(bn_v),
                                  t(bn_s), t(bn_b), eps=1e-5))
    dw = F.conv2d(h1, t(wd), padding=1, groups=C)
    gate = F.hardsigmoid(F.conv2d(F.relu(F.conv2d(
        dw.mean(dim=(2, 3), keepdim=True), t(wse1))), t(wse2)))
    want = (dw * gate + t(x)).numpy()
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_db_head_convtranspose_sigmoid():
    """DB head tail: ConvTranspose x2 upsample -> Sigmoid prob map, the
    final stage of the PP-OCR det graph (kiri_ocr/detector/db/model.py
    consumes exactly this output)."""
    rng = np.random.default_rng(11)
    x = rng.standard_normal((1, 4, 8, 8)).astype(np.float32)
    w = (rng.standard_normal((4, 1, 2, 2)) * 0.4).astype(np.float32)
    nodes = [
        onnx_pb.write_node("ConvTranspose", ["x", "w"], ["u"],
                           kernel_shape=[2, 2], strides=[2, 2]),
        onnx_pb.write_node("Sigmoid", ["u"], ["p"]),
    ]
    mod = _model(nodes, {"w": w}, [("x", list(x.shape))], [("p", [None] * 4)])
    got = _run(mod, x)
    want = torch.sigmoid(
        F.conv_transpose2d(torch.from_numpy(x), torch.from_numpy(w),
                           stride=2)).numpy()
    assert got.shape == (1, 1, 16, 16)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_dbdetector_onnx_routing(tmp_path):
    """DBDetector(model_path='*.onnx') runs the imported graph end-to-end:
    mirrors the reference's onnxruntime session path (db/model.py:113-116)
    with a tiny synthetic det graph (conv -> sigmoid prob map)."""
    from kiri_tpu.detect.db import DBDetector

    rng = np.random.default_rng(12)
    # Ink detector: gray canvas is ~1.0 on paper after ImageNet norm and
    # strongly negative on ink; a negative-weight conv + sigmoid gives a
    # high prob exactly on dark strokes.
    w = np.full((1, 3, 3, 3), -1.0, np.float32)
    b = np.array([-10.0], np.float32)
    nodes = [
        onnx_pb.write_node("Conv", ["x", "w", "b"], ["l"],
                           kernel_shape=[3, 3], pads=[1, 1, 1, 1]),
        onnx_pb.write_node("Sigmoid", ["l"], ["p"]),
    ]
    data = onnx_pb.write_model(nodes, {"w": w, "b": b},
                               [("x", [None, 3, None, None])],
                               [("p", [None, 1, None, None])])
    path = tmp_path / "tiny_db.onnx"
    path.write_bytes(data)

    det = DBDetector(model_path=str(path))
    page = np.full((96, 128), 255, np.uint8)
    page[40:56, 30:100] = 0  # one fat dark bar
    prob, (net_h, net_w, oh, ow) = det.predict_maps(page)
    assert prob.shape == (net_h, net_w) and (oh, ow) == (96, 128)
    assert 0.0 <= prob.min() and prob.max() <= 1.0
    assert prob[46, 60] > 0.9          # on the bar
    assert prob[10, 10] < 0.1          # on paper
    # batch path shares the graph
    out = list(det._iter_maps_batch([page, page]))
    assert len(out) == 2


def test_unsupported_op_message():
    mod = _model([onnx_pb.write_node("TotallyFakeOp", ["x"], ["y"])],
                 {}, [("x", [2, 2])], [("y", [2, 2])])
    with pytest.raises(NotImplementedError, match="TotallyFakeOp"):
        mod.apply(mod.params, np.zeros((2, 2), np.float32))
