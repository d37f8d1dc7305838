"""First-party numpy evaluator for the ONNX op subset this repo exports.

onnxruntime is not a dependency of this framework, but an export path
without an executor is unverifiable — this module walks a ModelProto with
the repo's own wire-format parser (`data/proto.py`) and executes the graph
in numpy, implementing exactly the op set `models/onnx_export.py` emits
(Conv 1D/2D, Gather, Slice, Concat, Pad, elementwise math, reductions,
Where, Transpose, Squeeze/Unsqueeze, Reshape). Semantics follow the ONNX
operator spec at opset 15; tests cross-check the evaluated graph against
the JAX forward pass (tests/test_export.py) and, when onnxruntime happens
to be installed, against it too.

This is a verification tool, not a serving runtime — inference here runs
the CQT cascade as naive convolutions.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from basic_pitch_tpu.data import proto

# TensorProto.DataType
_FLOAT = 1
_INT64 = 7


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = None
    name = ""
    raw = b""
    for field, wire, value in proto.iter_fields(buf):
        if field == 1 and wire == 0:
            dims.append(int(value))
        elif field == 2 and wire == 0:
            dtype = int(value)
        elif field == 8:
            name = value.decode()
        elif field == 9:
            raw += value
    if dtype == _FLOAT:
        arr = np.frombuffer(raw, dtype="<f4").astype(np.float32)
    elif dtype == _INT64:
        arr = np.frombuffer(raw, dtype="<i8").astype(np.int64)
    else:
        raise ValueError(f"evaluator: unsupported tensor dtype {dtype}")
    return name, arr.reshape(dims)


def _parse_attrs(buf_list: List[bytes]) -> Dict[str, object]:
    import struct

    attrs: Dict[str, object] = {}
    for buf in buf_list:
        name = ""
        value: object = None
        for field, wire, v in proto.iter_fields(buf):
            if field == 1:
                name = v.decode()
            elif field == 2:  # f
                value = struct.unpack("<f", v)[0]
            elif field == 3:  # i
                value = proto._from_signed_varint(v)
            elif field == 4:  # s
                value = v.decode()
            elif field == 8:  # ints (packed or repeated)
                ints = list(attrs.get(name, [])) if isinstance(attrs.get(name), list) else []
                if wire == 2:
                    pos = 0
                    while pos < len(v):
                        x, pos = proto.decode_varint(v, pos)
                        ints.append(proto._from_signed_varint(x))
                else:
                    ints.append(proto._from_signed_varint(v))
                value = ints
        attrs[name] = value
    return attrs


class Node:
    def __init__(self, op: str, inputs: List[str], outputs: List[str], attrs: Dict):
        self.op = op
        self.inputs = inputs
        self.outputs = outputs
        self.attrs = attrs


class OnnxGraph:
    """Parsed ModelProto: nodes in topological (file) order + initializers."""

    def __init__(self, path):
        data = open(path, "rb").read()
        graph = None
        for field, _w, value in proto.iter_fields(data):
            if field == 7:
                graph = value
        if graph is None:
            raise ValueError(f"{path}: no graph in ModelProto")
        self.nodes: List[Node] = []
        self.initializers: Dict[str, np.ndarray] = {}
        self.input_names: List[str] = []
        self.output_names: List[str] = []
        for field, _w, value in proto.iter_fields(graph):
            if field == 5:
                name, arr = _parse_tensor(value)
                self.initializers[name] = arr
            elif field == 1:
                op, ins, outs, attr_bufs = "", [], [], []
                for f2, _w2, v2 in proto.iter_fields(value):
                    if f2 == 1:
                        ins.append(v2.decode())
                    elif f2 == 2:
                        outs.append(v2.decode())
                    elif f2 == 4:
                        op = v2.decode()
                    elif f2 == 5:
                        attr_bufs.append(v2)
                self.nodes.append(Node(op, ins, outs, _parse_attrs(attr_bufs)))
            elif field in (11, 12):
                for f2, _w2, v2 in proto.iter_fields(value):
                    if f2 == 1:
                        (self.input_names if field == 11 else self.output_names).append(
                            v2.decode()
                        )

    def run(self, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        env: Dict[str, np.ndarray] = dict(self.initializers)
        env.update({k: np.asarray(v) for k, v in feeds.items()})
        for node in self.nodes:
            args = [env[i] for i in node.inputs]
            env[node.outputs[0]] = _OPS[node.op](args, node.attrs)
        return {name: env[name] for name in self.output_names}


# --- op kernels ---------------------------------------------------------------


def _conv(args, attrs):
    x, w = args[0], args[1]
    bias = args[2] if len(args) > 2 else None
    strides = attrs.get("strides") or [1] * (x.ndim - 2)
    pads = attrs.get("pads") or [0] * (2 * (x.ndim - 2))
    n_sp = x.ndim - 2
    pad_width = [(0, 0), (0, 0)] + [(pads[i], pads[i + n_sp]) for i in range(n_sp)]
    xp = np.pad(x, pad_width)
    if n_sp == 1:
        batch, cin, length = xp.shape
        cout, _, k = w.shape
        n_out = (length - k) // strides[0] + 1
        frames = np.lib.stride_tricks.sliding_window_view(xp, k, axis=2)[
            :, :, :: strides[0]
        ][:, :, :n_out]  # (b, cin, n_out, k)
        y = np.einsum("bcnk,ock->bon", frames, w, optimize=True)
    elif n_sp == 2:
        batch, cin, h, wd = xp.shape
        cout, _, kh, kw = w.shape
        ho = (h - kh) // strides[0] + 1
        wo = (wd - kw) // strides[1] + 1
        view = np.lib.stride_tricks.sliding_window_view(xp, (kh, kw), axis=(2, 3))
        view = view[:, :, :: strides[0], :: strides[1]][:, :, :ho, :wo]
        y = np.einsum("bchwij,ocij->bohw", view, w, optimize=True)
    else:
        raise ValueError("evaluator Conv supports 1D/2D only")
    y = y.astype(np.float32)
    if bias is not None:
        y += bias.reshape((1, -1) + (1,) * n_sp)
    return y


def _slice(args, _attrs):
    data, starts, ends, axes = args[0], args[1], args[2], args[3]
    steps = args[4] if len(args) > 4 else np.ones_like(starts)
    slices = [slice(None)] * data.ndim
    for s, e, a, st in zip(starts, ends, axes, steps):
        slices[int(a)] = slice(int(s), int(e), int(st))
    return data[tuple(slices)]


def _pad(args, attrs):
    data, pads = args[0], args[1]
    mode = attrs.get("mode", "constant")
    n = data.ndim
    pad_width = [(int(pads[i]), int(pads[i + n])) for i in range(n)]
    return np.pad(data, pad_width, mode=mode)


def _safe_div(x, y):
    """Division whose 0/0 (silent-input normalized-log) is masked by a
    downstream Where — suppress the numpy warning, keep the values."""
    with np.errstate(divide="ignore", invalid="ignore"):
        return np.divide(x, y)


def _reduce(fn):
    def run(args, attrs):
        axes = tuple(attrs.get("axes") or range(args[0].ndim))
        keep = bool(attrs.get("keepdims", 1))
        return fn(args[0], axis=axes, keepdims=keep)

    return run


_OPS = {
    "Conv": _conv,
    "Gather": lambda a, at: np.take(a[0], a[1], axis=int(at.get("axis", 0))),
    "Slice": _slice,
    "Pad": _pad,
    "Concat": lambda a, at: np.concatenate(a, axis=int(at["axis"])),
    "Transpose": lambda a, at: np.transpose(a[0], at["perm"]),
    "Reshape": lambda a, at: a[0].reshape([int(d) for d in a[1]]),
    "Unsqueeze": lambda a, at: np.expand_dims(a[0], tuple(int(x) for x in a[1])),
    "Squeeze": lambda a, at: np.squeeze(a[0], tuple(int(x) for x in a[1])),
    "Mul": lambda a, at: a[0] * a[1],
    "Add": lambda a, at: a[0] + a[1],
    "Sub": lambda a, at: a[0] - a[1],
    "Div": lambda a, at: _safe_div(a[0], a[1]),
    "Sqrt": lambda a, at: np.sqrt(a[0]),
    "Log": lambda a, at: np.log(a[0]),
    "Relu": lambda a, at: np.maximum(a[0], 0.0),
    "Sigmoid": lambda a, at: 1.0 / (1.0 + np.exp(-a[0])),
    "Greater": lambda a, at: a[0] > a[1],
    "Where": lambda a, at: np.where(a[0], a[1], a[2]),
    "ReduceMin": _reduce(np.min),
    "ReduceMax": _reduce(np.max),
}


def run_model(path: "str | pathlib.Path", audio: np.ndarray) -> Dict[str, np.ndarray]:
    """Execute an exported nmp.onnx on (batch, 43844) or (batch, 43844, 1)
    audio; returns {"note", "onset", "contour"} posteriorgrams."""
    from basic_pitch_tpu.models import onnx_export

    graph = OnnxGraph(path)
    if audio.ndim == 2:
        audio = audio[..., None]
    out = graph.run({onnx_export.INPUT_NAME: audio.astype(np.float32)})
    return {
        head: out[name] for head, name in onnx_export.OUTPUT_NAMES.items()
    }
