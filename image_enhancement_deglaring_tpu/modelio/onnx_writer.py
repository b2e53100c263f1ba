"""Minimal ONNX exporter (pure Python, protobuf wire format).

Exports LightweightUNet params to an opset-11 ONNX model with dynamic
batch/height/width axes — the same contract as the reference exporter
(reference: scripts/export_to_onnx.py:134-161: input 'input'
[batch_size, 1, height, width], output 'output', opset 11) and the same
GroupNorm lowering torch uses at opset 11 (Reshape -> InstanceNormalization
-> Reshape(Shape) -> Mul(scale) -> Add(bias)), so the artifact is
interchangeable with the reference's best_model.onnx for any ONNX runtime.

Layout: our NHWC/HWIO params are converted back to ONNX's NCHW/OIHW.
"""

from __future__ import annotations

import struct

import numpy as np

# -------------------------------------------------------- protobuf encoding


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_field(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _int_field(field: int, v: int) -> bytes:
    return _tag(field, 0) + _varint(v)


def _str_field(field: int, s: str) -> bytes:
    return _len_field(field, s.encode("utf-8"))


# ------------------------------------------------------------ ONNX messages

_ATTR_FLOAT, _ATTR_INT, _ATTR_STRING, _ATTR_TENSOR, _ATTR_INTS = 1, 2, 3, 4, 7


def _attribute(name: str, value) -> bytes:
    msg = _str_field(1, name)
    if isinstance(value, bool) or isinstance(value, (int, np.integer)):
        msg += _tag(3, 0) + _varint(int(value)) + _int_field(20, _ATTR_INT)
    elif isinstance(value, float):
        msg += _tag(2, 5) + struct.pack("<f", value) + _int_field(20, _ATTR_FLOAT)
    elif isinstance(value, (list, tuple)):
        for v in value:
            msg += _tag(7, 0) + _varint(int(v))
        msg += _int_field(20, _ATTR_INTS)
    elif isinstance(value, np.ndarray):
        msg += _len_field(5, _tensor(None, value)) + _int_field(20, _ATTR_TENSOR)
    elif isinstance(value, (str, bytes)):
        raw = value.encode() if isinstance(value, str) else value
        msg += _len_field(4, raw) + _int_field(20, _ATTR_STRING)
    else:
        raise TypeError(f"unsupported attribute {name}={value!r}")
    return msg


_DTYPE_CODES = {np.dtype(np.float32): 1, np.dtype(np.int64): 7, np.dtype(np.int32): 6}


def _tensor(name: str | None, arr: np.ndarray) -> bytes:
    arr = np.ascontiguousarray(arr)
    msg = b""
    for d in arr.shape:
        msg += _tag(1, 0) + _varint(d)
    msg += _int_field(2, _DTYPE_CODES[arr.dtype])
    if name:
        msg += _str_field(8, name)
    msg += _len_field(9, arr.tobytes())
    return msg


def _node(op_type: str, inputs: list[str], outputs: list[str],
          name: str = "", **attrs) -> bytes:
    msg = b""
    for i in inputs:
        msg += _str_field(1, i)
    for o in outputs:
        msg += _str_field(2, o)
    if name:
        msg += _str_field(3, name)
    msg += _str_field(4, op_type)
    for k, v in attrs.items():
        msg += _len_field(5, _attribute(k, v))
    return msg


def _value_info(name: str, dims: list) -> bytes:
    shape_msg = b""
    for d in dims:
        if isinstance(d, str):
            dim = _str_field(2, d)  # dim_param
        else:
            dim = _tag(1, 0) + _varint(d)  # dim_value
        shape_msg += _len_field(1, dim)
    tensor_type = _int_field(1, 1) + _len_field(2, shape_msg)  # elem FLOAT
    type_msg = _len_field(1, tensor_type)
    return _str_field(1, name) + _len_field(2, type_msg)


class OnnxGraphBuilder:
    def __init__(self, name: str = "deglare_unet"):
        self.name = name
        self.nodes: list[bytes] = []
        self.initializers: list[bytes] = []
        self.inputs: list[bytes] = []
        self.outputs: list[bytes] = []
        self._uid = 0

    def uid(self, base: str) -> str:
        self._uid += 1
        return f"{base}_{self._uid}"

    def init_tensor(self, name: str, arr: np.ndarray) -> str:
        self.initializers.append(_tensor(name, np.asarray(arr)))
        return name

    def add(self, op_type: str, inputs: list[str], n_out: int = 1, **attrs) -> list[str]:
        outs = [self.uid(f"{op_type}_out") for _ in range(n_out)]
        self.nodes.append(_node(op_type, inputs, outs, name=self.uid(op_type), **attrs))
        return outs

    def add_named(self, op_type: str, inputs: list[str], outputs: list[str], **attrs):
        self.nodes.append(_node(op_type, inputs, outputs, name=self.uid(op_type), **attrs))
        return outputs

    def graph_bytes(self) -> bytes:
        msg = b""
        for n in self.nodes:
            msg += _len_field(1, n)
        msg += _str_field(2, self.name)
        for t in self.initializers:
            msg += _len_field(5, t)
        for i in self.inputs:
            msg += _len_field(11, i)
        for o in self.outputs:
            msg += _len_field(12, o)
        return msg

    def model_bytes(self, opset: int = 11) -> bytes:
        opset_msg = _str_field(1, "") + _int_field(2, opset)
        return (
            _int_field(1, 7)  # ir_version
            + _str_field(2, "image-enhancement-deglaring-tpu")
            + _str_field(3, "0.1.0")
            + _len_field(7, self.graph_bytes())
            + _len_field(8, opset_msg)
        )


# --------------------------------------------------------------- UNet export


def _conv_oihw(w_hwio: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(np.asarray(w_hwio), (3, 2, 0, 1))).astype(np.float32)


def _emit_block(g: OnnxGraphBuilder, x: str, blk: str, p: dict, groups: int = 8) -> str:
    """[Conv3x3 -> GN(opset-11 lowering) -> SiLU] x 2."""
    for conv_key, gn_s, gn_b, idx in (
        ("conv1", "gn1_scale", "gn1_bias", 0),
        ("conv2", "gn2_scale", "gn2_bias", 3),
    ):
        w = g.init_tensor(f"{blk}.{idx}.weight", _conv_oihw(p[conv_key]))
        (x,) = g.add("Conv", [x, w], dilations=[1, 1], group=1,
                     kernel_shape=[3, 3], pads=[1, 1, 1, 1], strides=[1, 1])
        c = int(np.asarray(p[gn_s]).shape[0])
        # GroupNorm lowering: Reshape [0, G, -1] -> InstanceNorm ->
        # Reshape(Shape(x)) -> Mul(scale) -> Add(bias)
        shape_i = g.init_tensor(g.uid("gnshape"), np.asarray([0, groups, -1], np.int64))
        (r,) = g.add("Reshape", [x, shape_i])
        ones = g.init_tensor(g.uid("gn_ones"), np.ones(groups, np.float32))
        zeros = g.init_tensor(g.uid("gn_zeros"), np.zeros(groups, np.float32))
        (inorm,) = g.add("InstanceNormalization", [r, ones, zeros], epsilon=1e-5)
        (shp,) = g.add("Shape", [x])
        (x,) = g.add("Reshape", [inorm, shp])
        # Named like the torch state dict so our own importer (and
        # extract_weights-style tools) can read them straight back.
        scale = g.init_tensor(f"{blk}.{idx + 1}.weight",
                              np.asarray(p[gn_s], np.float32).reshape(c, 1, 1))
        bias = g.init_tensor(f"{blk}.{idx + 1}.bias",
                             np.asarray(p[gn_b], np.float32).reshape(c, 1, 1))
        (x,) = g.add("Mul", [x, scale])
        (x,) = g.add("Add", [x, bias])
        # SiLU = x * sigmoid(x)
        (sig,) = g.add("Sigmoid", [x])
        (x,) = g.add("Mul", [x, sig])
    return x


def export_lightweight_unet(params: dict, path: str, *, groups: int = 8) -> str:
    """Write our LightweightUNet params as an opset-11 .onnx file."""
    g = OnnxGraphBuilder()
    g.inputs.append(_value_info("input", ["batch_size", 1, "height", "width"]))
    g.outputs.append(_value_info("output", ["batch_size", 1, "height", "width"]))

    x = "input"
    skips = {}
    for blk in ("enc1", "enc2", "enc3", "enc4"):
        x = _emit_block(g, x, blk, params[blk], groups)
        skips[blk] = x
        (x,) = g.add("AveragePool", [x], kernel_shape=[2, 2], strides=[2, 2])
    x = _emit_block(g, x, "bottleneck", params["bottleneck"], groups)

    for up, dec, skip in (("upconv4", "dec4", "enc4"), ("upconv3", "dec3", "enc3"),
                          ("upconv2", "dec2", "enc2"), ("upconv1", "dec1", "enc1")):
        w = g.init_tensor(f"{up}.weight", np.asarray(params[up]["weight"], np.float32))
        b = g.init_tensor(f"{up}.bias", np.asarray(params[up]["bias"], np.float32))
        (x,) = g.add("ConvTranspose", [x, w, b], kernel_shape=[2, 2], strides=[2, 2])
        (x,) = g.add("Concat", [x, skips[skip]], axis=1)
        x = _emit_block(g, x, dec, params[dec], groups)

    wout = g.init_tensor("output_conv.weight", _conv_oihw(params["output_conv_weight"]))
    bout = g.init_tensor("output_conv.bias",
                         np.asarray(params["output_conv_bias"], np.float32))
    g.add_named("Conv", [x, wout, bout], ["output"], dilations=[1, 1], group=1,
                kernel_shape=[1, 1], pads=[0, 0, 0, 0], strides=[1, 1])

    with open(path, "wb") as f:
        f.write(g.model_bytes(opset=11))
    return path
