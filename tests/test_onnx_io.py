"""ONNX writer/reader round-trip and graph-structure checks."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.modelio import (
    lightweight_unet_params_from_onnx,
    load_onnx,
)
from image_enhancement_deglaring_tpu.modelio.onnx_writer import export_lightweight_unet
from image_enhancement_deglaring_tpu.models import LightweightUNet, count_parameters


@pytest.fixture(scope="module")
def params():
    model = LightweightUNet()
    return jax.tree_util.tree_map(
        np.asarray,
        jax.jit(model.init)(jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 1)))["params"],
    )


def test_export_import_roundtrip(tmp_path, params):
    path = export_lightweight_unet(params, str(tmp_path / "model.onnx"))
    back = lightweight_unet_params_from_onnx(path)
    assert count_parameters(back) == count_parameters(params) == 486409
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0, atol=0)


def test_export_narrow_model_per_block_group_counts(tmp_path):
    """A features_start=4 model normalizes enc1/dec1 with 4 groups
    (resolve_group_count), not the default 8 — a uniform exporter count
    would produce an ONNX whose Reshape [0, 8, -1] still *succeeds*
    (8 divides C*H*W) while computing statistics across the wrong
    boundaries. Executing the export must match the Flax forward."""
    from image_enhancement_deglaring_tpu.modelio import run_onnx

    model = LightweightUNet(features_start=4)
    p = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(model.init)(jax.random.PRNGKey(5),
                            jnp.zeros((1, 32, 32, 1)))["params"],
    )
    path = export_lightweight_unet(p, str(tmp_path / "narrow.onnx"))
    x = np.random.default_rng(0).random((1, 32, 32, 1), np.float32)
    want = np.asarray(model.apply({"params": p}, x))  # NHWC
    got = run_onnx(path, {"input": x.transpose(0, 3, 1, 2)})["output"]
    np.testing.assert_allclose(got.transpose(0, 2, 3, 1), want,
                               rtol=0, atol=2e-5)


def test_executor_pool_pads_and_default_strides_match_torch():
    """The numpy oracle must honor ONNX pooling semantics: pads applied
    (max ignores the padding, avg excludes it by default) and missing
    strides meaning 1 per axis — NOT kernel_shape."""
    import torch
    import torch.nn.functional as F

    from image_enhancement_deglaring_tpu.modelio import run_graph
    from image_enhancement_deglaring_tpu.modelio.onnx_reader import (
        OnnxGraph,
        OnnxNode,
    )

    x = np.random.default_rng(1).random((1, 3, 8, 8), np.float32)
    cases = [
        ("MaxPool", {"kernel_shape": [3, 3], "pads": [1, 1, 1, 1],
                     "strides": [1, 1]},
         lambda t: F.max_pool2d(t, 3, stride=1, padding=1)),
        ("MaxPool", {"kernel_shape": [2, 2]},  # strides default = 1
         lambda t: F.max_pool2d(t, 2, stride=1)),
        ("AveragePool", {"kernel_shape": [2, 2], "pads": [1, 1, 1, 1],
                         "strides": [2, 2]},
         lambda t: F.avg_pool2d(t, 2, stride=2, padding=1,
                                count_include_pad=False)),
        ("AveragePool", {"kernel_shape": [2, 2], "pads": [1, 1, 1, 1],
                         "strides": [2, 2], "count_include_pad": 1},
         lambda t: F.avg_pool2d(t, 2, stride=2, padding=1,
                                count_include_pad=True)),
    ]
    for op, attrs, torch_fn in cases:
        g = OnnxGraph(initializers={},
                      nodes=[OnnxNode(op, ["x"], ["y"], attributes=attrs)],
                      inputs=["x"], outputs=["y"])
        got = run_graph(g, {"x": x})["y"]
        want = torch_fn(torch.from_numpy(x)).numpy()
        np.testing.assert_allclose(got, want, rtol=0, atol=1e-6,
                                   err_msg=str((op, attrs)))

    # unsupported attributes fail loudly instead of mis-pooling
    g = OnnxGraph(initializers={},
                  nodes=[OnnxNode("MaxPool", ["x"], ["y"],
                                  attributes={"kernel_shape": [2, 2],
                                              "ceil_mode": 1})],
                  inputs=["x"], outputs=["y"])
    with pytest.raises(NotImplementedError):
        run_graph(g, {"x": x})


def test_export_graph_structure_matches_reference_contract(tmp_path, params):
    path = export_lightweight_unet(params, str(tmp_path / "model.onnx"))
    g = load_onnx(path)
    # interface contract of the reference exporter
    # (reference: scripts/export_to_onnx.py:134-161)
    assert g.inputs == ["input"]
    assert g.outputs == ["output"]
    from collections import Counter

    ops = Counter(n.op_type for n in g.nodes)
    # same op census as the reference's best_model.onnx (sans inlined
    # Constant nodes — we use initializers)
    assert ops["Conv"] == 19
    assert ops["ConvTranspose"] == 4
    assert ops["AveragePool"] == 4
    assert ops["InstanceNormalization"] == 18
    assert ops["Sigmoid"] == 18
    assert ops["Concat"] == 4


def test_reference_onnx_and_reexport_agree():
    import os

    ref = "/root/reference/best_model.onnx"
    if not os.path.exists(ref):
        pytest.skip("reference onnx missing")
    p = lightweight_unet_params_from_onnx(ref)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        out = export_lightweight_unet(p, os.path.join(d, "re.onnx"))
        p2 = lightweight_unet_params_from_onnx(out)
    for a, b in zip(jax.tree_util.tree_leaves(p), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_reader_rejects_garbage(tmp_path):
    bad = tmp_path / "junk.onnx"
    bad.write_bytes(b"\x00\x01not a protobuf model")
    with pytest.raises((ValueError, IndexError)):
        load_onnx(str(bad))


def test_reader_rejects_truncated_model(tmp_path, params):
    from image_enhancement_deglaring_tpu.modelio.onnx_writer import (
        export_lightweight_unet,
    )

    full = export_lightweight_unet(params, str(tmp_path / "full.onnx"))
    data = open(full, "rb").read()
    trunc = tmp_path / "trunc.onnx"
    trunc.write_bytes(data[: len(data) // 2])
    with pytest.raises((ValueError, IndexError, KeyError)):
        from image_enhancement_deglaring_tpu.modelio import (
            lightweight_unet_params_from_onnx,
        )

        lightweight_unet_params_from_onnx(str(trunc))


def test_negative_ints_roundtrip_through_codec():
    """Protobuf varints are two's-complement for negative int64: axis=-1
    attributes and Reshape shapes like [0, 8, -1] must survive the
    writer -> reader round trip (standard ONNX files use both)."""
    from image_enhancement_deglaring_tpu.modelio.onnx_reader import (
        _parse_attribute,
        _parse_tensor,
    )
    from image_enhancement_deglaring_tpu.modelio.onnx_writer import (
        _attribute,
        _tensor,
        _varint,
    )

    # scalar int attribute axis=-1
    buf = _attribute("axis", -1)
    name, val = _parse_attribute(buf, 0, len(buf))
    assert (name, val) == ("axis", -1)

    # repeated ints attribute with negatives
    buf = _attribute("axes", [-1, 0, -2])
    name, val = _parse_attribute(buf, 0, len(buf))
    assert (name, val) == ("axes", [-1, 0, -2])

    # int64 tensor carrying a -1 (e.g. a Reshape shape initializer)
    buf = _tensor("shape", np.asarray([0, 8, -1], np.int64))
    name, arr = _parse_tensor(buf, 0, len(buf))
    assert name == "shape"
    np.testing.assert_array_equal(arr, [0, 8, -1])

    # the varint encoder itself must terminate on negatives (10 bytes)
    assert len(_varint(-1)) == 10


def test_reader_decodes_int32_double_uint64_tensor_fields():
    """Legal ONNX initializers may use int32_data (field 5 — also carries
    INT8/16, UINT8/16, BOOL and FLOAT16 bit patterns), double_data (10) or
    uint64_data (11) instead of raw_data; onnx.helper.make_tensor emits
    these by default. They must parse, not reshape-crash as empty."""
    import struct

    from image_enhancement_deglaring_tpu.modelio.onnx_reader import (
        _parse_tensor,
    )
    from image_enhancement_deglaring_tpu.modelio.onnx_writer import _varint

    def field(fn, wire, payload):
        return _varint((fn << 3) | wire) + payload

    def packed(fn, payload):
        return field(fn, 2, _varint(len(payload)) + payload)

    def tensor(dims, dtype_code, data_field):
        b = b"".join(field(1, 0, _varint(d)) for d in dims)
        b += field(2, 0, _varint(dtype_code))
        b += packed(8, b"t")  # name
        return b + data_field

    # INT32 in packed int32_data, including a negative
    buf = tensor([2, 2], 6, packed(5, b"".join(
        _varint(v & ((1 << 64) - 1)) for v in [1, -2, 3, 4])))
    name, arr = _parse_tensor(buf, 0, len(buf))
    assert name == "t" and arr.dtype == np.int32
    np.testing.assert_array_equal(arr, [[1, -2], [3, 4]])

    # FLOAT16 bit patterns in int32_data
    want16 = np.asarray([1.5, -0.25, 0.0], np.float16)
    buf = tensor([3], 10, packed(5, b"".join(
        _varint(int(v)) for v in want16.view(np.uint16))))
    _, arr = _parse_tensor(buf, 0, len(buf))
    assert arr.dtype == np.float16
    np.testing.assert_array_equal(arr, want16)

    # DOUBLE in packed double_data
    want64 = np.asarray([1.25, -3.5], np.float64)
    buf = tensor([2], 11, packed(10, struct.pack("<2d", *want64)))
    _, arr = _parse_tensor(buf, 0, len(buf))
    assert arr.dtype == np.float64
    np.testing.assert_array_equal(arr, want64)

    # UINT64 in packed uint64_data
    buf = tensor([2], 13, packed(11, _varint(7) + _varint(2**40)))
    _, arr = _parse_tensor(buf, 0, len(buf))
    assert arr.dtype == np.uint64
    np.testing.assert_array_equal(arr, [7, 2**40])

    # BOOL in int32_data
    buf = tensor([2], 9, packed(5, _varint(1) + _varint(0)))
    _, arr = _parse_tensor(buf, 0, len(buf))
    assert arr.dtype == np.bool_
    np.testing.assert_array_equal(arr, [True, False])


def test_reader_decodes_unpacked_negative_int64_data():
    """int64_data stored as unpacked varints (onnx.helper default for
    small tensors) with negative entries decodes signed."""
    from image_enhancement_deglaring_tpu.modelio.onnx_reader import _parse_tensor
    from image_enhancement_deglaring_tpu.modelio.onnx_writer import (
        _int_field,
        _str_field,
        _tag,
        _varint,
    )

    msg = _tag(1, 0) + _varint(2)            # dims: [2]
    msg += _int_field(2, 7)                  # data_type: INT64
    msg += _str_field(8, "t")                # name
    msg += _tag(7, 0) + _varint(5)           # int64_data: 5
    msg += _tag(7, 0) + _varint(-3)          # int64_data: -3
    name, arr = _parse_tensor(msg, 0, len(msg))
    assert name == "t"
    np.testing.assert_array_equal(arr, [5, -3])


def test_reader_survives_byte_mutation_fuzz(tmp_path, params):
    """Seeded byte-level fuzz of the hand-rolled protobuf reader: every
    mutated file either parses or raises a clean exception — never hangs,
    never segfaults the parse loops (varints terminate at buffer end)."""
    from image_enhancement_deglaring_tpu.modelio.onnx_reader import load_onnx

    path = export_lightweight_unet(params, str(tmp_path / "fuzz.onnx"))
    blob = bytearray(open(path, "rb").read())
    rng = np.random.default_rng(0)
    mutated = tmp_path / "mut.onnx"
    outcomes = {"ok": 0, "raised": 0}
    for trial in range(120):
        mut = bytearray(blob)
        kind = trial % 3
        if kind == 0:  # flip a byte
            mut[int(rng.integers(len(mut)))] = int(rng.integers(256))
        elif kind == 1:  # truncate
            del mut[int(rng.integers(1, len(mut))):]
        else:  # corrupt a varint-heavy region near the header
            for _ in range(4):
                mut[int(rng.integers(min(512, len(mut))))] = 0xFF
        with open(mutated, "wb") as f:
            f.write(mut)
        try:
            load_onnx(str(mutated))
            outcomes["ok"] += 1
        except Exception:
            outcomes["raised"] += 1
    # the fuzz must have exercised the failure paths, not skated through
    assert outcomes["raised"] > 0
    assert sum(outcomes.values()) == 120
