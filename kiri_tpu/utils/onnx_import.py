"""ONNX graph -> jittable JAX function (dependency-free importer).

The reference ships its default DB detector as a pretrained PP-OCR ONNX file
executed by onnxruntime (kiri_ocr/detector/db/model.py:113-116, auto-download
in detector/__init__.py:82-107). This environment has neither `onnx` nor
`onnxruntime` nor egress — so instead of a weight-name mapping table we import
the *graph*: parse the protobuf ourselves (utils/onnx_pb.py) and interpret the
node list as JAX ops, producing a jittable function + a params dict of JAX
arrays. Any PP-OCR-family det/rec/cls graph (MobileNetV3 / ResNet backbones,
FPN necks, DB / CTC heads) then runs natively on TPU.

Interpretation strategy
-----------------------
* The environment maps tensor name -> value. Values are either host numpy
  arrays (graph constants / anything derived only from constants) or traced
  JAX arrays. Ops whose inputs are all host constants are computed eagerly
  with numpy — this constant-folds the Shape->Gather->Unsqueeze->Concat->
  Resize/Reshape chains PP-OCR exports use for "dynamic" shapes. Under jit
  the input shape is static, so `Shape` of a traced array is itself a host
  constant and the whole chain folds; the compiled graph contains only real
  tensor compute.
* Layout is kept NCHW exactly as ONNX specifies (lax.conv_general_dilated
  takes dimension_numbers; XLA lays out for the MXU regardless).
* Weights live in a separate params dict (donate/shard like any other JAX
  params) rather than being baked into the trace as literals.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

from . import onnx_pb


def _is_const(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


class _Env:
    """Name -> value map with ONNX's empty-name-means-missing convention."""

    def __init__(self):
        self.d: Dict[str, Any] = {}

    def get(self, name: str):
        if name == "":
            return None
        return self.d[name]

    def put(self, name: str, value) -> None:
        if name:
            self.d[name] = value


def _np(*vals):
    return all(v is None or _is_const(v) for v in vals)


def _pads4(attrs, spatial: int = 2):
    """ONNX pads [x1b,x2b,...,x1e,x2e] -> ((b,e), ...) per spatial dim."""
    pads = attrs.get("pads", [0] * (2 * spatial))
    return tuple((int(pads[i]), int(pads[i + spatial]))
                 for i in range(spatial))


def _auto_pad(attrs, kshape, strides, dilations, xshape):
    """Resolve auto_pad (SAME_UPPER/LOWER/VALID) to explicit pads."""
    ap = attrs.get("auto_pad", b"NOTSET")
    ap = ap.decode() if isinstance(ap, bytes) else ap
    if ap in ("", "NOTSET"):
        return _pads4(attrs, len(kshape))
    if ap == "VALID":
        return tuple((0, 0) for _ in kshape)
    out = []
    for i, k in enumerate(kshape):
        eff_k = (k - 1) * dilations[i] + 1
        in_sz = xshape[2 + i]
        out_sz = -(-in_sz // strides[i])  # ceil
        total = max(0, (out_sz - 1) * strides[i] + eff_k - in_sz)
        if ap == "SAME_UPPER":
            out.append((total // 2, total - total // 2))
        else:  # SAME_LOWER
            out.append((total - total // 2, total // 2))
    return tuple(out)


def _conv(x, w, b, attrs, jnp, lax):
    group = int(attrs.get("group", 1))
    spatial = w.ndim - 2
    strides = tuple(int(s) for s in attrs.get("strides", [1] * spatial))
    dilations = tuple(int(d) for d in attrs.get("dilations", [1] * spatial))
    pads = _auto_pad(attrs, w.shape[2:], strides, dilations, x.shape)
    dn = lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCW", "OIW", "NCW"))
    y = lax.conv_general_dilated(
        x, jnp.asarray(w, x.dtype), strides, pads,
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=group)
    if b is not None:
        y = y + jnp.asarray(b, y.dtype).reshape((1, -1) + (1,) * spatial)
    return y


def _conv_transpose(x, w, b, attrs, jnp, lax):
    # ONNX ConvTranspose: w is [Cin, Cout/group, kH, kW].
    group = int(attrs.get("group", 1))
    if group != 1:
        raise NotImplementedError("grouped ConvTranspose")
    spatial = w.ndim - 2
    strides = tuple(int(s) for s in attrs.get("strides", [1] * spatial))
    dilations = tuple(int(d) for d in attrs.get("dilations", [1] * spatial))
    pads = _pads4(attrs, spatial)
    out_pad = tuple(int(p) for p in attrs.get("output_padding", [0] * spatial))
    # Gradient-style transposed conv: lhs_dilation = stride, flipped kernel.
    k_eff = tuple((w.shape[2 + i] - 1) * dilations[i] + 1
                  for i in range(spatial))
    tpads = tuple(
        (k_eff[i] - 1 - pads[i][0], k_eff[i] - 1 - pads[i][1] + out_pad[i])
        for i in range(spatial))
    wt = jnp.asarray(w, x.dtype)
    wt = jnp.flip(wt, axis=tuple(range(2, 2 + spatial)))
    wt = jnp.swapaxes(wt, 0, 1)  # -> [Cout, Cin, ...] OIHW
    dn = lax.conv_dimension_numbers(
        x.shape, wt.shape,
        ("NCHW", "OIHW", "NCHW") if spatial == 2 else ("NCW", "OIW", "NCW"))
    y = lax.conv_general_dilated(
        x, wt, (1,) * spatial, tpads, lhs_dilation=strides,
        rhs_dilation=dilations, dimension_numbers=dn)
    if b is not None:
        y = y + jnp.asarray(b, y.dtype).reshape((1, -1) + (1,) * spatial)
    return y


def _pool(x, attrs, kind: str, jnp, lax):
    spatial = x.ndim - 2
    k = tuple(int(v) for v in attrs["kernel_shape"])
    strides = tuple(int(s) for s in attrs.get("strides", [1] * spatial))
    dil = tuple(int(d) for d in attrs.get("dilations", [1] * spatial))
    pads = _auto_pad(attrs, k, strides, dil, x.shape)
    if attrs.get("ceil_mode", 0):
        # Extend end-padding so the last (partial) window is emitted.
        newp = []
        for i in range(spatial):
            eff_k = (k[i] - 1) * dil[i] + 1
            in_sz = x.shape[2 + i] + pads[i][0] + pads[i][1]
            rem = (in_sz - eff_k) % strides[i]
            newp.append((pads[i][0],
                         pads[i][1] + ((strides[i] - rem) % strides[i]
                                       if rem else 0)))
        pads = tuple(newp)
    window = (1, 1) + k
    ws = (1, 1) + strides
    wd = (1, 1) + dil
    wp = ((0, 0), (0, 0)) + pads
    if kind == "max":
        init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else (
            jnp.iinfo(x.dtype).min)
        return lax.reduce_window(x, init, lax.max, window, ws, wp,
                                 window_dilation=wd)
    # average: count_include_pad=0 (the PP-OCR default) divides by the
    # number of real elements in each window.
    s = lax.reduce_window(x, 0.0, lax.add, window, ws, wp,
                          window_dilation=wd)
    if attrs.get("count_include_pad", 0):
        denom = float(np.prod(k))
        return s / denom
    ones = jnp.ones(x.shape[2:], x.dtype)[None, None]
    cnt = lax.reduce_window(ones, 0.0, lax.add, window, ws, wp,
                            window_dilation=wd)
    return s / cnt


def _resize(x, scales, sizes, attrs, jnp):
    import jax.image as jimage

    mode = attrs.get("mode", b"nearest")
    mode = mode.decode() if isinstance(mode, bytes) else mode
    if sizes is not None and np.size(sizes):
        out_shape = tuple(int(v) for v in np.asarray(sizes).reshape(-1))
    else:
        sc = np.asarray(scales, np.float64).reshape(-1)
        out_shape = tuple(int(np.floor(d * s))
                          for d, s in zip(x.shape, sc))
    method = {"nearest": "nearest", "linear": "bilinear",
              "cubic": "bicubic"}[mode]
    ct = attrs.get("coordinate_transformation_mode", b"half_pixel")
    ct = ct.decode() if isinstance(ct, bytes) else ct
    if mode == "nearest" and ct == "asymmetric":
        # PP-OCR FPN upsamples use nearest+asymmetric (= plain repeat for
        # integer scale). jax.image nearest is half_pixel; integer-factor
        # repeat matches asymmetric exactly, so use it when possible.
        if all(o % i == 0 for o, i in zip(out_shape, x.shape)):
            y = x
            for ax, (o, i) in enumerate(zip(out_shape, x.shape)):
                if o != i:
                    y = jnp.repeat(y, o // i, axis=ax)
            return y
    return jimage.resize(x, out_shape, method=method)


def _gemm(a, b, c, attrs, jnp):
    alpha = float(attrs.get("alpha", 1.0))
    beta = float(attrs.get("beta", 1.0))
    if attrs.get("transA", 0):
        a = a.T
    if attrs.get("transB", 0):
        b = b.T
    y = alpha * (a @ jnp.asarray(b, a.dtype))
    if c is not None:
        y = y + beta * jnp.asarray(c, y.dtype)
    return y


def _slice(x, ins, attrs, jnp):
    nd = x.ndim
    if len(ins) > 1 and ins[1] is not None:  # opset >= 10: tensor operands
        starts = np.asarray(ins[1]).reshape(-1).tolist()
        ends = np.asarray(ins[2]).reshape(-1).tolist()
        axes = (np.asarray(ins[3]).reshape(-1).tolist()
                if len(ins) > 3 and ins[3] is not None else
                list(range(len(starts))))
        steps = (np.asarray(ins[4]).reshape(-1).tolist()
                 if len(ins) > 4 and ins[4] is not None else [1] * len(starts))
    else:  # opset 1: attributes
        starts = list(attrs["starts"])
        ends = list(attrs["ends"])
        axes = list(attrs.get("axes", range(len(starts))))
        steps = [1] * len(starts)
    sl = [slice(None)] * nd
    for st, en, ax, sp in zip(starts, ends, axes, steps):
        ax = int(ax) % nd
        INT_MAX = 1 << 62
        st, en, sp = int(st), int(en), int(sp)
        en = min(max(en, -INT_MAX), INT_MAX)
        sl[ax] = slice(st, en, sp)
    return x[tuple(sl)]


def _make_unary(fname):
    def op(ins, attrs, xp):
        return getattr(xp, fname)(ins[0])
    return op


def _make_binary(fname):
    def op(ins, attrs, xp):
        a, b = ins[0], ins[1]
        return getattr(xp, fname)(a, b)
    return op


class OnnxModule:
    """An imported ONNX graph: `params` pytree + jittable `apply`.

    apply(params, *inputs) -> tuple of outputs (or single output unwrapped).
    Input order matches graph inputs (initializers excluded).
    """

    def __init__(self, model: Dict[str, Any]):
        g = model["graph"]
        self.graph = g
        self.opset = model.get("opset") or 13
        # Split initializers: integer/bool or tiny tensors are *structural*
        # (Reshape targets, Resize scales, Slice bounds, Gather indices...)
        # and must stay host-side numpy so shape chains constant-fold under
        # jit; everything else is a weight and goes into the traced params
        # pytree (shardable / donatable like any JAX params).
        self.params: Dict[str, np.ndarray] = {}
        self.consts: Dict[str, np.ndarray] = {}
        for k, v in g["initializers"].items():
            if v.dtype.kind in "iub" or v.size <= 8:
                self.consts[k] = v
            else:
                self.params[k] = v
        init_names = set(self.params) | set(self.consts)
        self.input_names: List[str] = [
            i["name"] for i in g["inputs"] if i["name"] not in init_names]
        self.output_names: List[str] = [o["name"] for o in g["outputs"]]
        self.input_shapes: Dict[str, List[Optional[int]]] = {
            i["name"]: i["shape"] for i in g["inputs"]
            if i["name"] not in init_names}

    # ------------------------------------------------------------------ run
    def apply(self, params: Dict[str, Any], *inputs):
        """Execute the graph. Jittable: jax.jit(mod.apply)(params, x)."""
        import jax.numpy as jnp
        from jax import lax

        if len(inputs) != len(self.input_names):
            raise ValueError(
                f"expected {len(self.input_names)} inputs "
                f"{self.input_names}, got {len(inputs)}")
        env = _Env()
        for k, v in self.consts.items():
            env.put(k, v)
        for k, v in params.items():
            env.put(k, np.asarray(v) if isinstance(v, np.ndarray) else v)
        for name, val in zip(self.input_names, inputs):
            env.put(name, val)

        for node in self.graph["nodes"]:
            ins = [env.get(n) for n in node["input"]]
            outs = self._exec(node, ins, jnp, lax)
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            for name, val in zip(node["output"], outs):
                env.put(name, val)
        result = tuple(
            jnp.asarray(env.get(n)) for n in self.output_names)
        return result[0] if len(result) == 1 else result

    def __call__(self, *inputs):
        return self.apply(self.params, *inputs)

    # ------------------------------------------------------------- node exec
    def _exec(self, node, ins, jnp, lax):
        op = node["op_type"]
        attrs = node["attrs"]
        const = _np(*ins)
        xp = np if const else jnp

        def dec(v, default=None):
            if v is None:
                return default
            return v.decode() if isinstance(v, bytes) else v

        # --- constants / shape machinery (host-side when foldable) ---
        if op == "Constant":
            for key in ("value", "value_float", "value_int"):
                if key in attrs:
                    return np.asarray(attrs[key])
            if "value_floats" in attrs:
                return np.asarray(attrs["value_floats"], np.float32)
            if "value_ints" in attrs:
                return np.asarray(attrs["value_ints"], np.int64)
            raise NotImplementedError("Constant without value")
        if op == "Shape":
            shape = np.asarray(ins[0].shape, np.int64)
            start = int(attrs.get("start", 0))
            end = attrs.get("end")
            return shape[start:int(end)] if end is not None else shape[start:]
        if op == "ConstantOfShape":
            val = attrs.get("value")
            fill = np.asarray(val).reshape(-1)[0] if val is not None else 0.0
            shp = tuple(int(v) for v in np.asarray(ins[0]).reshape(-1))
            return np.full(shp, fill)
        if op == "Range":
            return np.arange(int(ins[0]), int(ins[1]), int(ins[2]))
        if op in ("Identity", "Dropout"):
            return ins[0]
        if op == "Cast":
            to = onnx_pb.DTYPES[int(attrs["to"])]
            if const:
                return np.asarray(ins[0]).astype(to)
            return ins[0].astype(to)
        if op == "Reshape":
            target = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
            cur = ins[0].shape
            # allowzero=0 (default): 0 copies the input dim.
            if not attrs.get("allowzero", 0):
                target = [cur[i] if t == 0 else t
                          for i, t in enumerate(target)]
            return xp.reshape(ins[0], target)
        if op == "Flatten":
            ax = int(attrs.get("axis", 1)) % (ins[0].ndim + 1)
            lead = int(np.prod(ins[0].shape[:ax], dtype=np.int64))
            return xp.reshape(ins[0], (lead, -1))
        if op == "Transpose":
            perm = attrs.get("perm")
            if perm is None:
                perm = list(range(ins[0].ndim))[::-1]
            return xp.transpose(ins[0], [int(p) for p in perm])
        if op == "Squeeze":
            axes = (list(np.asarray(ins[1]).reshape(-1))
                    if len(ins) > 1 and ins[1] is not None
                    else attrs.get("axes"))
            if axes is None:
                return xp.squeeze(ins[0])
            return xp.squeeze(ins[0], axis=tuple(int(a) for a in axes))
        if op == "Unsqueeze":
            axes = (list(np.asarray(ins[1]).reshape(-1))
                    if len(ins) > 1 and ins[1] is not None
                    else attrs["axes"])
            y = ins[0]
            for a in sorted(int(a) for a in axes):
                y = xp.expand_dims(y, a)
            return y
        if op == "Concat":
            ax = int(attrs.get("axis", 0))
            vals = [v for v in ins if v is not None]
            if _np(*vals):
                return np.concatenate([np.atleast_1d(np.asarray(v))
                                       for v in vals], axis=ax)
            return jnp.concatenate([jnp.atleast_1d(jnp.asarray(v))
                                    for v in vals], axis=ax)
        if op == "Split":
            ax = int(attrs.get("axis", 0))
            if len(ins) > 1 and ins[1] is not None:
                sizes = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
            elif "split" in attrs:
                sizes = [int(v) for v in attrs["split"]]
            else:
                n = len(node["output"])
                d = ins[0].shape[ax]
                sizes = [d // n] * n
            idx = np.cumsum(sizes)[:-1].tolist()
            return tuple(xp.split(ins[0], idx, axis=ax))
        if op == "Gather":
            ax = int(attrs.get("axis", 0))
            return xp.take(ins[0], np.asarray(ins[1]).astype(np.int64)
                           if const else jnp.asarray(ins[1], jnp.int32),
                           axis=ax)
        if op == "Expand":
            shp = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
            cur = list(ins[0].shape)
            while len(cur) < len(shp):
                cur.insert(0, 1)
            full = [max(a, b) for a, b in zip(cur, shp)]
            return xp.broadcast_to(xp.reshape(ins[0], cur), full)
        if op == "Slice":
            return _slice(ins[0], ins, attrs, xp)
        if op == "Pad":
            mode = dec(attrs.get("mode"), "constant")
            if len(ins) > 1 and ins[1] is not None:
                pads = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
                cval = (float(np.asarray(ins[2]).reshape(-1)[0])
                        if len(ins) > 2 and ins[2] is not None else 0.0)
            else:
                pads = [int(v) for v in attrs["pads"]]
                cval = float(attrs.get("value", 0.0))
            nd = ins[0].ndim
            pw = [(pads[i], pads[i + nd]) for i in range(nd)]
            if mode == "constant":
                return xp.pad(ins[0], pw, constant_values=cval)
            return xp.pad(ins[0], pw,
                          mode={"reflect": "reflect", "edge": "edge"}[mode])

        # --- elementwise ---
        simple = {
            "Relu": lambda v: xp.maximum(v, 0),
            "Sigmoid": lambda v: (1.0 / (1.0 + xp.exp(-v))) if const
            else jnp.asarray(lax.logistic(v)),
            "Tanh": lambda v: xp.tanh(v),
            "Exp": lambda v: xp.exp(v),
            "Log": lambda v: xp.log(v),
            "Sqrt": lambda v: xp.sqrt(v),
            "Neg": lambda v: -v,
            "Abs": lambda v: xp.abs(v),
            "Floor": lambda v: xp.floor(v),
            "Ceil": lambda v: xp.ceil(v),
            "Not": lambda v: ~v if const else jnp.logical_not(v),
        }
        if op in simple:
            return simple[op](ins[0])
        if op == "Erf":
            if const:
                from math import erf
                return np.vectorize(erf)(
                    np.asarray(ins[0], np.float64)).astype(np.float32)
            from jax.scipy.special import erf as jax_erf
            return jax_erf(ins[0])
        if op == "LeakyRelu":
            alpha = float(attrs.get("alpha", 0.01))
            return xp.where(ins[0] >= 0, ins[0], alpha * ins[0])
        if op == "PRelu":
            slope = ins[1]
            x = ins[0]
            if np.ndim(slope) and np.shape(slope)[0] == x.shape[1]:
                slope = xp.reshape(slope, (1, -1) + (1,) * (x.ndim - 2))
            return xp.where(x >= 0, x, slope * x)
        if op == "Clip":
            lo = ins[1] if len(ins) > 1 and ins[1] is not None else (
                attrs.get("min", -np.inf))
            hi = ins[2] if len(ins) > 2 and ins[2] is not None else (
                attrs.get("max", np.inf))
            return xp.clip(ins[0], lo, hi)
        if op == "HardSigmoid":
            alpha = float(attrs.get("alpha", 0.2))
            beta = float(attrs.get("beta", 0.5))
            return xp.clip(alpha * ins[0] + beta, 0.0, 1.0)
        if op == "HardSwish":
            return ins[0] * xp.clip(ins[0] / 6.0 + 0.5, 0.0, 1.0)
        if op == "Softmax":
            ax = int(attrs.get("axis", -1))
            if const:
                z = np.exp(ins[0] - np.max(ins[0], axis=ax, keepdims=True))
                return z / z.sum(axis=ax, keepdims=True)
            import jax.nn
            return jax.nn.softmax(ins[0], axis=ax)
        if op == "Softplus":
            return xp.log1p(xp.exp(ins[0]))
        binary = {"Add": "add", "Sub": "subtract", "Mul": "multiply",
                  "Div": "divide", "Pow": "power", "Min": "minimum",
                  "Max": "maximum", "Equal": "equal", "Greater": "greater",
                  "Less": "less", "And": "logical_and", "Or": "logical_or"}
        if op in binary:
            if op in ("Min", "Max") and len(ins) != 2:
                y = ins[0]
                f = xp.minimum if op == "Min" else xp.maximum
                for v in ins[1:]:
                    y = f(y, v)
                return y
            return getattr(xp, binary[op])(ins[0], ins[1])
        if op == "Where":
            return xp.where(ins[0], ins[1], ins[2])
        if op in ("Sum", "Mean"):
            y = ins[0]
            for v in ins[1:]:
                y = y + v
            return y / len(ins) if op == "Mean" else y

        # --- reductions ---
        reductions = {"ReduceMean": "mean", "ReduceSum": "sum",
                      "ReduceMax": "max", "ReduceMin": "min",
                      "ReduceProd": "prod"}
        if op in reductions:
            axes = attrs.get("axes")
            if axes is None and len(ins) > 1 and ins[1] is not None:
                axes = [int(v) for v in np.asarray(ins[1]).reshape(-1)]
            kd = bool(attrs.get("keepdims", 1))
            ax = tuple(int(a) for a in axes) if axes is not None else None
            return getattr(xp, reductions[op])(ins[0], axis=ax, keepdims=kd)
        if op == "ArgMax":
            ax = int(attrs.get("axis", 0))
            kd = bool(attrs.get("keepdims", 1))
            y = xp.argmax(ins[0], axis=ax)
            return xp.expand_dims(y, ax) if kd else y

        # --- linear algebra ---
        if op == "MatMul":
            return ins[0] @ (np.asarray(ins[1]) if const
                             else jnp.asarray(ins[1], ins[0].dtype))
        if op == "Gemm":
            return _gemm(ins[0], ins[1],
                         ins[2] if len(ins) > 2 else None, attrs, jnp)

        # --- NN layers (always traced; weights may be params) ---
        if op == "Conv":
            return _conv(jnp.asarray(ins[0]), ins[1],
                         ins[2] if len(ins) > 2 else None, attrs, jnp, lax)
        if op == "ConvTranspose":
            return _conv_transpose(jnp.asarray(ins[0]), ins[1],
                                   ins[2] if len(ins) > 2 else None,
                                   attrs, jnp, lax)
        if op == "BatchNormalization":
            x, scale, bias, mean, var = ins[:5]
            eps = float(attrs.get("epsilon", 1e-5))
            shape = (1, -1) + (1,) * (x.ndim - 2)
            inv = 1.0 / np.sqrt(np.asarray(var, np.float64) + eps) \
                if _np(var) else 1.0 / jnp.sqrt(var + eps)
            w = (np.asarray(scale) * inv if _np(scale, var)
                 else scale * inv)
            b = (np.asarray(bias) - np.asarray(mean) * w
                 if _np(bias, mean) and _np(scale, var) else bias - mean * w)
            xj = jnp.asarray(x)
            return (xj * jnp.asarray(w, xj.dtype).reshape(shape)
                    + jnp.asarray(b, xj.dtype).reshape(shape))
        if op == "InstanceNormalization":
            x = jnp.asarray(ins[0])
            eps = float(attrs.get("epsilon", 1e-5))
            ax = tuple(range(2, x.ndim))
            mu = x.mean(axis=ax, keepdims=True)
            var = x.var(axis=ax, keepdims=True)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            return ((x - mu) / jnp.sqrt(var + eps)
                    * jnp.asarray(ins[1], x.dtype).reshape(shape)
                    + jnp.asarray(ins[2], x.dtype).reshape(shape))
        if op == "LayerNormalization":
            x = jnp.asarray(ins[0])
            ax = int(attrs.get("axis", -1))
            eps = float(attrs.get("epsilon", 1e-5))
            axes = tuple(range(ax % x.ndim, x.ndim))
            mu = x.mean(axis=axes, keepdims=True)
            var = x.var(axis=axes, keepdims=True)
            y = (x - mu) / jnp.sqrt(var + eps)
            y = y * jnp.asarray(ins[1], x.dtype)
            if len(ins) > 2 and ins[2] is not None:
                y = y + jnp.asarray(ins[2], x.dtype)
            return y
        if op == "MaxPool":
            return _pool(jnp.asarray(ins[0]), attrs, "max", jnp, lax)
        if op == "AveragePool":
            return _pool(jnp.asarray(ins[0]), attrs, "avg", jnp, lax)
        if op == "GlobalAveragePool":
            x = jnp.asarray(ins[0])
            return x.mean(axis=tuple(range(2, x.ndim)), keepdims=True)
        if op == "GlobalMaxPool":
            x = jnp.asarray(ins[0])
            return x.max(axis=tuple(range(2, x.ndim)), keepdims=True)
        if op in ("Resize", "Upsample"):
            if op == "Upsample":
                scales = (ins[1] if len(ins) > 1 and ins[1] is not None
                          else attrs.get("scales"))
                return _resize(jnp.asarray(ins[0]), scales, None, attrs, jnp)
            # Resize(x, roi, scales, sizes)
            scales = ins[2] if len(ins) > 2 and ins[2] is not None else None
            sizes = ins[3] if len(ins) > 3 and ins[3] is not None else None
            if scales is not None and not np.size(np.asarray(scales)):
                scales = None
            return _resize(jnp.asarray(ins[0]), scales, sizes, attrs, jnp)

        raise NotImplementedError(
            f"ONNX op {op!r} (node {node['name']!r}) is not supported by the "
            f"importer; supported set covers PP-OCR det/rec/cls graphs")


def import_onnx(src) -> OnnxModule:
    """Load an .onnx file (path or bytes) into an OnnxModule."""
    if isinstance(src, (bytes, bytearray)):
        model = onnx_pb.parse_model(bytes(src))
    else:
        model = onnx_pb.load_model(src)
    return OnnxModule(model)
