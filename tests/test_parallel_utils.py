"""parallel.distributed + mesh helper tests (single-process semantics)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from image_enhancement_deglaring_tpu.parallel import (
    make_mesh,
    replicate,
    shard_batch,
)
from image_enhancement_deglaring_tpu.parallel.distributed import (
    global_mesh,
    process_batch_slice,
)


def test_process_batch_slice_single_process():
    start, end = process_batch_slice(32)
    assert (start, end) == (0, 32)


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("data",)


def test_shard_batch_requires_divisibility():
    mesh = make_mesh(8)
    with pytest.raises(ValueError):
        shard_batch(jnp.zeros((7, 4)), mesh)
    sharded = shard_batch(jnp.zeros((16, 4)), mesh)
    assert sharded.sharding.num_devices == 8


def test_replicate_places_on_all_devices():
    mesh = make_mesh(8)
    tree = {"a": jnp.ones((3, 3)), "b": {"c": jnp.zeros(5)}}
    rep = replicate(tree, mesh)
    for leaf in jax.tree_util.tree_leaves(rep):
        assert leaf.sharding.num_devices == 8
        assert leaf.sharding.is_fully_replicated


def test_trace_server_port_accepts_connections():
    """cli.serve --profile_port wires utils.profiling.start_trace_server;
    the contract is a live TCP port TensorBoard's profile plugin can
    connect to."""
    import socket

    from image_enhancement_deglaring_tpu.utils.profiling import (
        start_trace_server,
    )

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    start_trace_server(port)
    with socket.create_connection(("127.0.0.1", port), timeout=10):
        pass  # connected: the profiler server is listening


def test_put_from_full_and_fetch_replicated_roundtrip():
    """Single-process semantics of the multi-host sweep helpers: put a
    host array onto a trial-axis sharding over the 8-device mesh and read
    it back; fetch_replicated must be a plain fetch for addressable and
    replicated layouts alike."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_enhancement_deglaring_tpu.parallel.mesh import (
        fetch_replicated,
        put_from_full,
    )

    mesh = make_mesh(8)
    x = np.arange(32, dtype=np.float32).reshape(8, 4)
    sharded = put_from_full(x, NamedSharding(mesh, P("data")))
    assert sharded.sharding.num_devices == 8
    np.testing.assert_array_equal(fetch_replicated(sharded), x)
    rep = put_from_full(x, NamedSharding(mesh, P()))
    assert rep.sharding.is_fully_replicated
    np.testing.assert_array_equal(fetch_replicated(rep), x)
    np.testing.assert_array_equal(fetch_replicated(x), x)  # numpy passthrough


def test_profiler_trace_writes_files(tmp_path):
    from image_enhancement_deglaring_tpu.utils import trace

    with trace(str(tmp_path)):
        _ = (jnp.ones((64, 64)) @ jnp.ones((64, 64))).block_until_ready()
    import os

    found = []
    for root, _, files in os.walk(tmp_path):
        found.extend(files)
    assert found  # trace artifacts were written


def test_reshard_fn_cached_per_sharding():
    """fetch_replicated/_reshard go through reshard_fn, which must return
    the SAME jitted callable for an equal sharding — a fresh
    jax.jit(lambda ...) per call would defeat jit's function-identity
    trace cache and recompile the all-gather on every epoch."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from image_enhancement_deglaring_tpu.parallel.mesh import (
        make_mesh,
        reshard_fn,
    )

    mesh = make_mesh()
    a = reshard_fn(NamedSharding(mesh, P()))
    b = reshard_fn(NamedSharding(mesh, P()))
    assert a is b
    c = reshard_fn(NamedSharding(mesh, P("data")))
    assert c is not a
    x = np.arange(len(jax.devices()) * 2, dtype=np.float32)
    np.testing.assert_array_equal(np.asarray(a(x)), x)
