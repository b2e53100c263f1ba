"""Preemption-safe training: SIGTERM mid-epoch -> exact checkpoint ->
resume continues bitwise-identically to an uninterrupted run.

The reference trainer has no preemption story at all (a killed
optimized_train.py loses everything since the last --save_every epoch);
the serving stack's SIGTERM drain (serve/ipc.py) set the bar this matches
on the training side.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading

import jax
import numpy as np
import pytest

from image_enhancement_deglaring_tpu.models import LightweightUNet
from image_enhancement_deglaring_tpu.train.loop import train_model
from image_enhancement_deglaring_tpu.train.preempt import (
    PreemptionGuard,
    preemption_agreed,
)
from tests.loaders import ArrayLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _toy_data():
    rng = np.random.default_rng(7)
    y = rng.random((12, 16, 16, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.1, y.shape), 0, 1).astype(np.float32)
    return x, y


class KillAtLoader(ArrayLoader):
    """Sends THIS process a real SIGTERM right before yielding batch
    ``kill_batch`` of epoch ``kill_epoch`` — a deterministic preemption
    (the guard's handler turns it into a flag; default handling would
    kill pytest, so the loader only fires while train_model's guard is
    installed, i.e. during iteration)."""

    def __init__(self, *args, kill_epoch: int, kill_batch: int, **kw):
        super().__init__(*args, **kw)
        self.kill_epoch, self.kill_batch = kill_epoch, kill_batch
        self._epoch = -1

    def set_epoch(self, epoch):
        self._epoch = epoch

    def __iter__(self):
        for i, batch in enumerate(super().__iter__()):
            if self._epoch == self.kill_epoch and i == self.kill_batch:
                os.kill(os.getpid(), signal.SIGTERM)
            yield batch


def test_sigterm_mid_epoch_then_resume_is_bitwise_equal(tmp_path):
    x, y = _toy_data()

    def loaders(kill=False):
        cls = KillAtLoader if kill else ArrayLoader
        kw = {"kill_epoch": 1, "kill_batch": 1} if kill else {}
        return (cls(x[:8], y[:8], 2, **kw), ArrayLoader(x[8:], y[8:], 4))

    # A: uninterrupted baseline
    tr, va = loaders()
    _, _, a_best, a_state = train_model(
        LightweightUNet(), tr, va, epochs=3, lr=1e-3,
        output_dir=str(tmp_path / "full"), save_every=100, progress=False)

    # B: SIGTERM lands during epoch 1 -> early return + exact snapshot
    tr_k, va_k = loaders(kill=True)
    out = tmp_path / "pre"
    _, _, _, b_state = train_model(
        LightweightUNet(), tr_k, va_k, epochs=3, lr=1e-3,
        output_dir=str(out), save_every=100, progress=False)
    ckpt = out / "preempt_checkpoint"
    assert ckpt.is_dir()
    meta = json.load(open(ckpt / "train_meta.json"))
    assert meta["mid_epoch"] is True
    assert meta["epoch"] == 1 and meta["epoch_step"] >= 1
    # fewer steps than the full run: it genuinely stopped mid-epoch
    assert int(np.asarray(b_state.step)) < int(np.asarray(a_state.step))

    # C: resume replays epoch 1 from the next batch onward
    tr_c, va_c = loaders()
    _, _, c_best, c_state = train_model(
        LightweightUNet(), tr_c, va_c, epochs=3, lr=1e-3,
        output_dir=str(out), save_every=100, progress=False,
        resume_from=str(ckpt))

    assert int(np.asarray(c_state.step)) == int(np.asarray(a_state.step))
    assert c_best == a_best
    a_leaves = [np.asarray(l) for l in
                jax.tree_util.tree_leaves(a_state.params)]
    c_leaves = [np.asarray(l) for l in
                jax.tree_util.tree_leaves(c_state.params)]
    assert len(a_leaves) == len(c_leaves)
    for al, cl in zip(a_leaves, c_leaves):
        np.testing.assert_array_equal(al, cl)


def test_sigterm_at_epoch_boundary_uses_whole_epoch_semantics(tmp_path):
    """A signal that lands outside the step loop (here: before training
    starts epoch 1's steps, via a flag set during validation of epoch 0)
    is caught by the epoch-boundary check and saved WITHOUT mid_epoch —
    resume starts at the next epoch."""
    x, y = _toy_data()
    guard = PreemptionGuard()
    tr = ArrayLoader(x[:8], y[:8], 2)
    va = ArrayLoader(x[8:], y[8:], 4)
    with guard:
        # trigger "externally" after the first step of epoch 0 completes:
        # flip the flag from a watcher thread, but AFTER iteration starts
        def flip():
            guard.triggered = True

        t = threading.Timer(0.0, flip)
        t.start()
        train_model(LightweightUNet(), tr, va, epochs=3, lr=1e-3,
                    output_dir=str(tmp_path), save_every=100,
                    progress=False, preempt_guard=guard)
        t.join()
    ckpt = tmp_path / "preempt_checkpoint"
    assert ckpt.is_dir()
    meta = json.load(open(ckpt / "train_meta.json"))
    # single-process the per-step check fires first (mid_epoch) OR the
    # boundary check (no mid_epoch) if the flag landed between steps —
    # both are valid exact snapshots; what must hold: the checkpoint
    # exists, carries resume extras, and the run ended early
    assert "step" in meta and "rng" in meta and "lr_state" in meta


def test_guard_restores_handlers_and_is_inert_off_main_thread():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert signal.getsignal(signal.SIGTERM) == g._handle
    assert signal.getsignal(signal.SIGTERM) == before

    # off the main thread signal.signal raises ValueError: stays inert
    res = {}

    def worker():
        with PreemptionGuard() as g2:
            res["installed"] = bool(g2._prev)

    t = threading.Thread(target=worker)
    t.start()
    t.join()
    assert res["installed"] is False
    assert signal.getsignal(signal.SIGTERM) == before


def test_preemption_agreed_single_process_is_local():
    assert preemption_agreed(True) is True
    assert preemption_agreed(False) is False


@pytest.mark.slow
@pytest.mark.parametrize("resume_after", [True])
def test_cli_sigterm_exits_zero_and_resumes(tmp_path, resume_after):
    """Real process, real SIGTERM: the train CLI drains to an exact
    checkpoint, exits 0, and --resume completes the run."""
    from image_enhancement_deglaring_tpu.data import generate_synthetic_sd1

    data = tmp_path / "d"
    generate_synthetic_sd1(str(data), n_train=8, n_val=0, size=32, seed=1)
    out = tmp_path / "run"
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, "tests",
                                                  ".jax_cache"),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
    }
    cmd = [sys.executable, "-m", "image_enhancement_deglaring_tpu.cli.train",
           "--data_dir", str(data / "train"), "--output_dir", str(out),
           "--batch_size", "4", "--image_size", "32", "--num_workers", "0",
           "--augment", "none", "--save_every", "1000"]
    p = subprocess.Popen(cmd + ["--epochs", "500"], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, cwd=REPO)
    watchdog = threading.Timer(420, p.kill)  # bound the line-read loop
    watchdog.start()
    lines = []
    try:
        for line in p.stdout:
            lines.append(line)
            # "Epoch 1/" matches the first tqdm description or the first
            # epoch summary — either way training is live when we fire
            if "Epoch 1/" in line:
                p.send_signal(signal.SIGTERM)
                break
        rest, _ = p.communicate(timeout=300)
        lines.append(rest)
    except Exception:
        p.kill()
        raise
    finally:
        watchdog.cancel()
    log = "".join(lines)
    assert p.returncode == 0, log
    assert "Preempted" in log and "Training preempted" in log, log
    ckpt = out / "preempt_checkpoint"
    assert ckpt.is_dir(), log
    assert not (out / "final_model").exists()  # drain skipped final work

    if resume_after:
        done = subprocess.run(
            cmd + ["--epochs", "3", "--resume", str(ckpt)], env=env,
            capture_output=True, text=True, timeout=300, cwd=REPO)
        assert done.returncode == 0, done.stdout + done.stderr
        assert "Training completed" in done.stdout
        assert (out / "final_model").is_dir()


def test_signal_during_early_stop_epoch_keeps_final_artifacts(tmp_path):
    """A signal landing OUTSIDE the step loop during the early-stopping
    epoch (its validation/teardown) returns through the patience break,
    which precedes the epoch-boundary preemption check — so NO preempt
    checkpoint exists. Callers keying 'skip final artifacts' on
    guard.triggered would then exit pointing at a nonexistent resume path;
    guard.preempt_checkpoint is the truth (cli/train.py gates on it)."""
    x, y = _toy_data()
    guard = PreemptionGuard()

    class FlagAtValLoader(ArrayLoader):
        # sets the guard flag when iterated the `flag_at`-th time (1-based)
        def __init__(self, *a, flag_at, **k):
            super().__init__(*a, **k)
            self.flag_at, self.count = flag_at, 0

        def __iter__(self):
            self.count += 1
            if self.count == self.flag_at:
                guard.triggered = True
            yield from super().__iter__()

    tr = ArrayLoader(x[:8], y[:8], 4)
    # lr=0: epoch 0 improves (inf -> L), epoch 1's identical val loss does
    # not -> patience=1 early-stops at epoch 1, whose val sets the flag.
    # Iterations: 1 = train_model's init peek, 2 = epoch 0 val, 3 = the
    # early-stopping epoch's val
    va = FlagAtValLoader(x[8:], y[8:], 4, flag_at=3)
    _, _, best, _state = train_model(
        LightweightUNet(), tr, va, epochs=5, lr=0.0, patience=1,
        output_dir=str(tmp_path), save_every=100, progress=False,
        preempt_guard=guard)
    assert guard.triggered
    assert va.count == 3  # early stop really fired at epoch 1
    assert guard.preempt_checkpoint is None
    assert not (tmp_path / "preempt_checkpoint").exists()
    assert np.isfinite(best)


class SkippableKillLoader(KillAtLoader):
    """KillAtLoader + the _Loader.set_skip_batches fast-forward hook, so
    resume exercises the plan-level skip path (no decode of skipped
    batches) instead of iterate-and-discard."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._skip = 0
        self.materialized = 0

    def set_skip_batches(self, k):
        self._skip = k

    def __len__(self):
        return max(0, super().__len__() - self._skip)

    def __iter__(self):
        # set_skip_batches contract (data/dataset.py): __len__ shrinks by
        # the skip, but iteration walks the FULL epoch plan and drops the
        # first `skip` yields. ArrayLoader.__iter__ is len()-driven, so the
        # skip must be zeroed while the base generator runs — otherwise it
        # applies twice (base drops the tail, this method drops the head)
        # and one batch is silently lost.
        skip, self._skip = self._skip, 0
        try:
            for i, batch in enumerate(super().__iter__()):
                if i < skip:
                    continue
                self.materialized += 1
                yield batch
        finally:
            self._skip = skip


def test_resident_drains_at_segment_boundary_and_resumes_exact(tmp_path):
    """Resident epochs run as K scanned segments with a preemption check
    between them (train_model resident_segments): a flag raised mid-epoch
    drains at the NEXT SEGMENT boundary — without waiting out the epoch —
    to an exact mid-epoch checkpoint, and resume is bitwise-identical to
    an uninterrupted run. Previously the whole epoch was one dispatch and
    drain latency was unbounded for large caches."""
    x, y = _toy_data()
    common = dict(epochs=3, lr=1e-3, save_every=100, progress=False,
                  resident=True, resident_segments=4,
                  validation_metrics_every=100, log_images_every=100)

    def loaders():
        # 8 samples / batch 2 = 4 steps per epoch -> 4 segments of 1 step
        return ArrayLoader(x[:8], y[:8], 2), ArrayLoader(x[8:], y[8:], 4)

    tr, va = loaders()
    _, _, a_best, a_state = train_model(
        LightweightUNet(), tr, va, output_dir=str(tmp_path / "full"),
        **common)

    # flag already up when epoch 0 starts: the FIRST segment boundary
    # must drain (epoch_step == 1 of 4 — provably not the epoch end)
    guard = PreemptionGuard()
    guard.triggered = True
    out = tmp_path / "pre"
    tr_b, va_b = loaders()
    _, _, _, b_state = train_model(
        LightweightUNet(), tr_b, va_b, output_dir=str(out),
        preempt_guard=guard, **common)
    ckpt = out / "preempt_checkpoint"
    assert ckpt.is_dir()
    meta = json.load(open(ckpt / "train_meta.json"))
    assert meta["mid_epoch"] is True
    assert meta["epoch"] == 0 and meta["epoch_step"] == 1
    assert int(np.asarray(b_state.step)) == 1

    tr_c, va_c = loaders()
    _, _, c_best, c_state = train_model(
        LightweightUNet(), tr_c, va_c, output_dir=str(out),
        resume_from=str(ckpt), **common)
    assert int(np.asarray(c_state.step)) == int(np.asarray(a_state.step))
    assert c_best == a_best
    for al, cl in zip(jax.tree_util.tree_leaves(a_state.params),
                      jax.tree_util.tree_leaves(c_state.params)):
        np.testing.assert_array_equal(np.asarray(al), np.asarray(cl))


def test_cross_mode_mid_epoch_resume_is_rejected(tmp_path):
    """A mid-epoch checkpoint records which mode wrote it: resident and
    streaming count epoch_step against DIFFERENT batch plans (on-device
    permutation vs loader order), so resuming one into the other would
    silently train some batches twice and skip others — the step-count
    guard can't see it (counts still match). Must fail loudly."""
    x, y = _toy_data()
    guard = PreemptionGuard()
    guard.triggered = True
    out = tmp_path / "pre"
    tr = ArrayLoader(x[:8], y[:8], 2)
    va = ArrayLoader(x[8:], y[8:], 4)
    train_model(LightweightUNet(), tr, va, epochs=3, lr=1e-3,
                output_dir=str(out), save_every=100, progress=False,
                resident=True, resident_segments=4, preempt_guard=guard,
                validation_metrics_every=100, log_images_every=100)
    ckpt = out / "preempt_checkpoint"
    meta = json.load(open(ckpt / "train_meta.json"))
    assert meta["mid_epoch"] and meta["resident"] is True

    tr2 = ArrayLoader(x[:8], y[:8], 2)
    va2 = ArrayLoader(x[8:], y[8:], 4)
    with pytest.raises(ValueError, match="resident run but this resume"):
        train_model(LightweightUNet(), tr2, va2, epochs=3, lr=1e-3,
                    output_dir=str(out), save_every=100, progress=False,
                    resume_from=str(ckpt))


class ContractViolatingSkipLoader(ArrayLoader):
    """Deliberately broken set_skip_batches: __len__ shrinks AND __iter__
    stays len()-driven, so the skip applies twice (the round-4 harness bug
    — base drops the tail, the subclass drops the head) and one batch is
    silently lost per resumed epoch."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self._skip = 0

    def set_skip_batches(self, k):
        self._skip = k

    def __len__(self):
        return max(0, super().__len__() - self._skip)

    def __iter__(self):
        for i, batch in enumerate(super().__iter__()):
            if i >= self._skip:
                yield batch


def test_loop_rejects_contract_violating_skip_loader(tmp_path):
    """The train loop's steps-vs-plan guard turns a loader that silently
    drops batches (set_skip_batches len/iter contract violation, see
    data/dataset.py) into a loud RuntimeError instead of corrupted
    training."""
    x, y = _toy_data()
    # fabricate a mid-epoch preemption checkpoint via a well-behaved run
    tr, va = (KillAtLoader(x[:8], y[:8], 2, kill_epoch=1, kill_batch=1),
              ArrayLoader(x[8:], y[8:], 4))
    out = tmp_path / "pre"
    train_model(LightweightUNet(), tr, va, epochs=3, lr=1e-3,
                output_dir=str(out), save_every=100, progress=False)
    ckpt = out / "preempt_checkpoint"
    assert ckpt.is_dir()

    tr_bad = ContractViolatingSkipLoader(x[:8], y[:8], 2)
    va_c = ArrayLoader(x[8:], y[8:], 4)
    with pytest.raises(RuntimeError, match="contract is violated"):
        train_model(LightweightUNet(), tr_bad, va_c, epochs=3, lr=1e-3,
                    output_dir=str(out), save_every=100, progress=False,
                    resume_from=str(ckpt))


def test_plan_skip_resume_is_bitwise_equal(tmp_path):
    """Same bitwise-equality contract as the discard-fallback test above,
    through the set_skip_batches fast path — and the skipped batches never
    reach the prefetcher."""
    x, y = _toy_data()

    def loaders(kill=False):
        kw = {"kill_epoch": 1, "kill_batch": 1} if kill else \
             {"kill_epoch": -1, "kill_batch": -1}
        return (SkippableKillLoader(x[:8], y[:8], 2, **kw),
                ArrayLoader(x[8:], y[8:], 4))

    tr_a, va_a = loaders()
    _, _, a_best, a_state = train_model(
        LightweightUNet(), tr_a, va_a, epochs=3, lr=1e-3,
        output_dir=str(tmp_path / "full"), save_every=100, progress=False)

    tr_b, va_b = loaders(kill=True)
    out = tmp_path / "pre"
    train_model(LightweightUNet(), tr_b, va_b, epochs=3, lr=1e-3,
                output_dir=str(out), save_every=100, progress=False)
    ckpt = out / "preempt_checkpoint"
    assert ckpt.is_dir()
    skip = json.load(open(ckpt / "train_meta.json"))["epoch_step"]
    assert skip >= 1

    tr_c, va_c = loaders()
    _, _, c_best, c_state = train_model(
        LightweightUNet(), tr_c, va_c, epochs=3, lr=1e-3,
        output_dir=str(out), save_every=100, progress=False,
        resume_from=str(ckpt))
    # resume runs epochs 1 (minus the skipped steps) and 2: the plan-level
    # skip means those batches were never materialized at all
    per_epoch = len(ArrayLoader(x[:8], y[:8], 2))
    assert tr_c.materialized == 2 * per_epoch - skip
    assert c_best == a_best
    assert int(np.asarray(c_state.step)) == int(np.asarray(a_state.step))
    for al, cl in zip(jax.tree_util.tree_leaves(a_state.params),
                      jax.tree_util.tree_leaves(c_state.params)):
        np.testing.assert_array_equal(np.asarray(al), np.asarray(cl))
