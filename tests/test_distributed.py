"""Multi-host path, exercised for real: two OS processes, each one "host"
with 4 virtual CPU devices, coordinated by jax.distributed + Gloo
collectives over an 8-device global mesh.

This is the closest this single machine can get to a TPU pod slice: it
executes the actual multi-process code paths (`distributed.initialize`,
`put_global_batch`'s make_array_from_process_local_data branch,
per-host LocalSliceLoader slices, cross-process gradient all-reduce,
collective orbax checkpointing with a single primary-host writer) rather
than simulating them on one process's virtual mesh.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "distributed_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def two_host_run(tmp_path_factory):
    """Launch the 2-process training run once; tests assert on its output."""
    tmp = tmp_path_factory.mktemp("dist")
    port = _free_port()
    env = {
        # deliberately NOT the test process's env: the axon sitecustomize
        # must stay off PYTHONPATH so JAX_PLATFORMS is honored
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        # reuse the suite's persistent compilation cache across reruns
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, "tests",
                                                  ".jax_cache"),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
    }
    ckpt = tmp / "ckpt"
    outs = [tmp / "r0.json", tmp / "r1.json"]
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(r), str(port), str(outs[r]),
             str(ckpt)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for r in (0, 1)
    ]
    logs = []
    for p in procs:
        try:
            # cold-cache phase 7 (three small sweeps) can push the first
            # run past the old 600s bound; warm reruns are minutes
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for r, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"rank {r} failed:\n{log}"
    return ckpt, [json.load(open(o)) for o in outs], logs


def test_two_hosts_agree_bitwise(two_host_run):
    """Both hosts fetch the same replicated result — their best params and
    losses must agree exactly (any divergence means the hosts took
    different training decisions)."""
    _, (r0, r1), _ = two_host_run
    assert r0["step"] == r1["step"] > 0
    assert r0["n_leaves"] == r1["n_leaves"]
    assert r0["best_val"] == r1["best_val"]
    assert r0["param_abs_sum"] == r1["param_abs_sum"]


def test_two_hosts_match_single_process(two_host_run, tmp_path):
    """2 hosts x 4 devices == 1 process x 8 devices, to float tolerance:
    the same global batches land on the same global mesh positions, so
    only all-reduce ordering may differ."""
    import jax

    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.parallel import make_mesh
    from image_enhancement_deglaring_tpu.train.loop import train_model
    from tests.loaders import ArrayLoader

    _, (r0, _), _ = two_host_run
    rng = np.random.default_rng(0)
    y = rng.random((16, 32, 32, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.15, y.shape), 0, 1).astype(np.float32)
    best_params, _, best_val, state = train_model(
        LightweightUNet(), ArrayLoader(x[:8], y[:8], 8),
        ArrayLoader(x[8:], y[8:], 8), epochs=2, lr=1e-3,
        output_dir=str(tmp_path), save_every=100, progress=False,
        mesh=make_mesh(),
    )
    assert int(np.asarray(state.step)) == r0["step"]
    np.testing.assert_allclose(r0["best_val"], float(best_val),
                               rtol=1e-5, atol=1e-7)
    abs_sum = float(sum(np.abs(np.asarray(l)).sum()
                        for l in jax.tree_util.tree_leaves(best_params)))
    np.testing.assert_allclose(r0["param_abs_sum"], abs_sum, rtol=1e-5)


def test_resident_distributed_hosts_agree(two_host_run):
    """Resident + multi-host composition: the HBM cache is assembled
    across processes and the scanned epoch runs over the global mesh —
    both hosts must land on identical replicated results."""
    _, (r0, r1), _ = two_host_run
    assert r0["resident_step"] == r1["resident_step"] > 0
    assert r0["resident_best_val"] == r1["resident_best_val"]
    assert r0["resident_param_abs_sum"] == r1["resident_param_abs_sum"]
    assert np.isfinite(r0["resident_best_val"])


def test_resident_distributed_matches_single_process(two_host_run, tmp_path):
    """Resident 2 hosts x 4 devices == resident 1 process x 8 devices, to
    float tolerance: the epoch batch plan is seeded identically and the
    cross-host cache holds the same rows at the same global positions, so
    only collective reduction ordering may differ."""
    import jax

    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.parallel import make_mesh
    from image_enhancement_deglaring_tpu.train.loop import train_model
    from tests.loaders import ArrayLoader

    _, (r0, _), _ = two_host_run
    rng = np.random.default_rng(0)
    y = rng.random((16, 32, 32, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.15, y.shape), 0, 1).astype(np.float32)
    best_params, _, best_val, state = train_model(
        LightweightUNet(), ArrayLoader(x[:8], y[:8], 8),
        ArrayLoader(x[8:], y[8:], 8), epochs=2, lr=1e-3,
        output_dir=str(tmp_path), save_every=100, progress=False,
        mesh=make_mesh(), resident=True,
    )
    assert int(np.asarray(state.step)) == r0["resident_step"]
    np.testing.assert_allclose(r0["resident_best_val"], float(best_val),
                               rtol=1e-5, atol=1e-7)
    abs_sum = float(sum(np.abs(np.asarray(l)).sum()
                        for l in jax.tree_util.tree_leaves(best_params)))
    np.testing.assert_allclose(r0["resident_param_abs_sum"], abs_sum,
                               rtol=1e-5)


def test_preemption_decision_is_host_uniform(two_host_run):
    """A SIGTERM on ONE host must stop EVERY host (the preemption
    checkpoint write is collective) — and no signal anywhere must not."""
    _, (r0, r1), _ = two_host_run
    assert r0["preempt_agree_one_host"] is True
    assert r1["preempt_agree_one_host"] is True
    assert r0["preempt_agree_none"] is False
    assert r1["preempt_agree_none"] is False


def test_sweep_fanout_two_hosts_match_single_process(two_host_run,
                                                     tmp_path):
    """Multi-host sweep fan-out: 2 hosts x 4 devices sharding the vmapped
    trial axis must reproduce the single-process 8-device sweep — same
    best trial, same per-trial val losses (replicated data + seeded
    sampling means only collective layout may differ), and only host 0
    writes sweep_results.json / best_trial_params.npz."""
    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.parallel import make_mesh, run_sweep
    from image_enhancement_deglaring_tpu.parallel.sweep import SearchSpace
    from tests.loaders import ArrayLoader

    _, (r0, r1), _ = two_host_run
    # both hosts computed identical sweep outcomes
    assert r0["sweep_best_id"] == r1["sweep_best_id"]
    assert r0["sweep_best_val"] == r1["sweep_best_val"]
    assert r0["sweep_vals"] == r1["sweep_vals"]
    assert len(r0["sweep_vals"]) == 4
    # host-0-only artifact writes
    assert r0["sweep_wrote_results"] and r0["sweep_wrote_params"]
    assert not r1["sweep_wrote_results"] and not r1["sweep_wrote_params"]

    # single-process 8-device reference run (same seed, same data)
    rng = np.random.default_rng(0)
    y = rng.random((16, 32, 32, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.15, y.shape), 0, 1).astype(np.float32)

    def loaders(bs):
        return ArrayLoader(x[:8], y[:8], bs), ArrayLoader(x[8:], y[8:], bs)

    sres = run_sweep(
        LightweightUNet, loaders, n_trials=4, max_epochs=2, min_iter=1,
        eta=2, method="random", seed=5, mesh=make_mesh(),
        output_dir=str(tmp_path), space=SearchSpace(batch_sizes=(8,)),
        halving="mask")  # the multi-host run force-switches to mask
    assert sres["best"]["trial_id"] == r0["sweep_best_id"]
    np.testing.assert_allclose(
        [t["best_val_loss"] for t in sres["trials"]], r0["sweep_vals"],
        rtol=1e-5)


def test_sweep_resume_broadcasts_journal_from_host0(two_host_run):
    """Preempted multi-host sweep, then resume where the journal exists on
    HOST 0 ONLY (per-rank output dirs): _journal_bytes_all_hosts must
    broadcast host 0's bytes so both hosts replay the same restored
    history — a per-host file read would give rank 1 nothing and deadlock
    or fork the lock-step sweep. The resumed sweep equals an uninterrupted
    run, and only host 0 writes the results file."""
    _, (r0, r1), _ = two_host_run
    assert r0["swres_preempted"] and r1["swres_preempted"]
    assert r0["swres_pre_trials"] == r1["swres_pre_trials"] == 1
    assert r0["swres_journal_local"] and not r1["swres_journal_local"]
    assert r0["swres_resumed_matches_full"]
    assert r1["swres_resumed_matches_full"]
    assert r0["swres_results_written"] and not r1["swres_results_written"]


def test_host0_owns_the_checkpoint(two_host_run):
    """Only host 0 writes checkpoints — both hosts pointed at the SAME
    output directory and it must hold exactly one uncorrupted best_model
    (two concurrent writers would race the directory swap)."""
    ckpt, _, logs = two_host_run
    best = ckpt / "best_model"
    assert best.is_dir()
    from image_enhancement_deglaring_tpu.train import restore_checkpoint

    item, meta = restore_checkpoint(str(best))
    assert "params" in item and np.isfinite(meta["val_loss"])
    assert "New best model" in logs[0]


def test_resume_best_bar_is_host_uniform(two_host_run):
    """Resume phase with HOST-DIVERGENT output dirs (only rank 0's holds
    the best_model) AND a host-divergent resume_from (rank 1's path does
    not exist): host 0 is the only reader for both the checkpoint restore
    and the best bar, everything broadcast — a per-host read would crash
    rank 1 outright and let early-stop counters diverge in general."""
    _, (r0, r1), _ = two_host_run
    assert r0["resume_best_val"] == r1["resume_best_val"]
    assert r0["resume_best_val"] == pytest.approx(r0["best_val"])
    assert r0["resume_param_abs_sum"] == r1["resume_param_abs_sum"]
    assert r0["resume_param_abs_sum"] == pytest.approx(r0["param_abs_sum"])


def test_resume_missing_everywhere_fails_uniformly(two_host_run):
    """Resume from a checkpoint no host has: EVERY rank raises the same
    loud RuntimeError (host 0 broadcasts its read failure) instead of a
    rank-local crash that hangs the survivors in the next collective."""
    _, (r0, r1), _ = two_host_run
    for r in (r0, r1):
        assert "host 0 could not restore" in r["resume_missing_err"]
    assert r0["resume_missing_err"] == r1["resume_missing_err"]


def test_sliced_batch_count_matches_iteration_rule():
    """The shared skip-rule helper must agree with a brute-force replay of
    _iter_batches' arithmetic for every small configuration — _Loader and
    LocalSliceLoader both delegate to it, so this pins the single source
    of truth they share."""
    from image_enhancement_deglaring_tpu.data.dataset import (
        sliced_batch_count,
    )

    for ns in range(1, 13):
        for bs in (1, 2, 3, 4, 5, 8):
            for world in (1, 2, 3, 4, 8):
                for drop_last in (False, True):
                    limit = (ns // bs) * bs if drop_last else ns
                    want = sum(
                        1 for start in range(0, limit, bs)
                        if min(bs, limit - start) >= world)
                    got = sliced_batch_count(ns, bs, world, drop_last)
                    assert got == want, (ns, bs, world, drop_last)


def test_pre_decode_slice_matches_post_decode(tmp_path):
    """set_batch_slice (decode 1/world of each batch) must yield exactly
    the rows the post-decode slicer would keep — per-index augmentation
    seeds make the two paths bit-identical, including the seeded shuffle,
    ragged tails (truncate to a world multiple), and skipped sub-world
    tails."""
    from image_enhancement_deglaring_tpu.data import generate_synthetic_sd1
    from image_enhancement_deglaring_tpu.data.dataset import (
        GlareRemovalDataset,
        _Loader,
    )
    from image_enhancement_deglaring_tpu.data.pipeline import list_image_paths

    generate_synthetic_sd1(str(tmp_path), n_train=10, n_val=0, size=32,
                           seed=3)
    paths = list_image_paths(str(tmp_path) + "/train")

    def fresh_loader():
        ds = GlareRemovalDataset(paths, image_size=32, seed=7,
                                 augment="optimized")
        ld = _Loader(ds, 4, shuffle=True, drop_last=False, seed=11,
                     num_workers=0)
        ld.set_epoch(1)
        return ld

    full = [b for b in fresh_loader()]        # 10 rows -> batches of 4,4,2
    for world in (2, 4):
        got_per_rank = []
        for rank in range(world):
            ld = fresh_loader()
            ld.set_batch_slice(rank, world)
            got_per_rank.append(list(ld))
        # world=4 skips the ragged 2-row tail (per==0) on every rank
        want_batches = [b for b in full if b[0].shape[0] // world > 0]
        for rank_batches in got_per_rank:
            assert len(rank_batches) == len(want_batches)
        # __len__ must mirror iteration (skipped sub-world batches
        # excluded): a len>0/iterate-empty loader would crash
        # train_model's conditional init peek
        ld = fresh_loader()
        ld.set_batch_slice(0, world)
        assert len(ld) == len(want_batches)
        for bi, (fx, fy) in enumerate(want_batches):
            per = fx.shape[0] // world
            for rank in range(world):
                gx, gy = got_per_rank[rank][bi]
                np.testing.assert_array_equal(
                    gx, fx[rank * per:(rank + 1) * per])
                np.testing.assert_array_equal(
                    gy, fy[rank * per:(rank + 1) * per])


def test_local_slice_loader_engages_pre_decode(tmp_path):
    """LocalSliceLoader must detect set_batch_slice support and route
    through the pre-decode path (world==1 here, so output == full)."""
    from image_enhancement_deglaring_tpu.data import generate_synthetic_sd1
    from image_enhancement_deglaring_tpu.data.dataset import (
        GlareRemovalDataset,
        _Loader,
    )
    from image_enhancement_deglaring_tpu.data.pipeline import list_image_paths
    from image_enhancement_deglaring_tpu.parallel.distributed import (
        LocalSliceLoader,
    )

    generate_synthetic_sd1(str(tmp_path), n_train=4, n_val=0, size=32,
                           seed=5)
    paths = list_image_paths(str(tmp_path) + "/train")
    ds = GlareRemovalDataset(paths, image_size=32, seed=7)
    ld = _Loader(ds, 2, shuffle=False, drop_last=False, seed=0,
                 num_workers=0)
    sliced = LocalSliceLoader(ld)
    assert sliced._pre_sliced
    got = [b[0] for b in sliced]
    want = [b[0] for b in _Loader(ds, 2, shuffle=False, drop_last=False,
                                  seed=0, num_workers=0)]
    assert len(got) == len(want) == 2
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_local_slice_loader_covers_batch_disjointly():
    """Single-process sanity for the slice arithmetic (the 2-process run
    covers the real thing): rank slices are disjoint, cover the batch, and
    ragged tails truncate to a process multiple."""
    from image_enhancement_deglaring_tpu.parallel.distributed import (
        LocalSliceLoader,
    )
    from tests.loaders import ArrayLoader

    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    loader = ArrayLoader(x, x, 4, ragged_tail=True)
    sliced = LocalSliceLoader(loader)
    # process_count()==1 here: the slice is the whole batch
    got = [b[0] for b in sliced]
    want = [b[0] for b in loader]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)
    assert sliced.num_samples == 10 and sliced.batch_size == 4


def test_fallback_len_excludes_skipped_tail():
    """Post-decode fallback path: __iter__ skips batches with fewer rows
    than the process count, and __len__ must agree (simulated world=4 by
    overriding the instance's rank/world — process_count() is 1 here)."""
    from image_enhancement_deglaring_tpu.parallel.distributed import (
        LocalSliceLoader,
    )
    from tests.loaders import ArrayLoader

    x = np.arange(20, dtype=np.float32).reshape(10, 2)
    sliced = LocalSliceLoader(ArrayLoader(x, x, 4, ragged_tail=True))
    sliced._pre_sliced = False
    sliced._n, sliced._i = 4, 0
    got = list(sliced)
    assert len(got) == 2            # the 2-row tail is skipped (2 < 4)
    assert len(sliced) == 2         # len mirrors iteration
    for b in got:
        assert b[0].shape[0] == 1   # 4 rows // world 4

    # world larger than the batch size: every batch skips, len is 0
    tiny = LocalSliceLoader(ArrayLoader(x, x, 4, ragged_tail=True))
    tiny._pre_sliced = False
    tiny._n, tiny._i = 8, 0
    assert list(tiny) == [] and len(tiny) == 0


def test_val_pad_target_uses_local_device_count(monkeypatch):
    """Multi-host validation padding aligns to the PER-HOST device count:
    rounding the local batch to the GLOBAL count would inflate the
    assembled global batch (and every val step's FLOPs) process_count-
    fold."""
    import jax

    from image_enhancement_deglaring_tpu.parallel import make_mesh
    from image_enhancement_deglaring_tpu.train.loop import _val_pad_target

    mesh = make_mesh()  # 8 virtual devices
    assert _val_pad_target(4, None) == 4          # no mesh: untouched
    assert _val_pad_target(4, mesh) == 8          # 1 process: global count
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    assert _val_pad_target(4, mesh) == 4          # 2 hosts x 4 devices
    assert _val_pad_target(5, mesh) == 8
    monkeypatch.setattr(jax, "process_count", lambda: 8)
    assert _val_pad_target(4, mesh) == 4          # 8 hosts x 1 device
