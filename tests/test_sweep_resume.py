"""Preemption-safe, resumable sweeps.

The reference's W&B server persists sweep state and agents rejoin
(reference: sweep.py:231-241); a SIGTERMed local sweep previously lost
every finished trial. Here: every finished trial group appends to
``sweep_journal.jsonl``, a PreemptionGuard stops the sweep at the next
epoch boundary, and ``resume=True`` replays the schedule deterministically
— journaled groups restore without training, so the resumed sweep's result
is IDENTICAL to an uninterrupted run's.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from image_enhancement_deglaring_tpu.models import LightweightUNet
from image_enhancement_deglaring_tpu.parallel import SearchSpace, run_sweep
from tests.loaders import ArrayLoader

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIZE = 16


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(0)
    y = rng.random((16, SIZE, SIZE, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.1, y.shape), 0, 1).astype(np.float32)
    return x, y


class _CountingFactory:
    """Counts VmappedTrialGroup constructions: one call per LIVE group, so
    restored-from-journal groups are proven to never retrain."""

    def __init__(self):
        self.calls = 0

    def __call__(self):
        self.calls += 1
        return LightweightUNet(features_start=2, num_groups=2)


class _TriggerAfter:
    """PreemptionGuard stand-in whose flag flips after ``n`` checks —
    a deterministic in-process "SIGTERM landed mid-sweep"."""

    def __init__(self, n: int):
        self.n = n
        self.calls = 0

    @property
    def triggered(self) -> bool:
        self.calls += 1
        return self.calls > self.n


def _kwargs(tmp_path, sub):
    return dict(n_trials=4, max_epochs=2, min_iter=2, eta=2,
                method="random", seed=0, max_parallel_trials=1,
                space=SearchSpace(batch_sizes=(8,)),
                output_dir=str(tmp_path / sub))


def test_preempted_sweep_resumes_to_identical_result(tmp_path, toy):
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    # A: uninterrupted baseline (4 single-trial groups)
    fa = _CountingFactory()
    a = run_sweep(fa, loader_factory, **_kwargs(tmp_path, "full"))
    assert fa.calls == 4 and a["preempted"] is False

    # B: "SIGTERM" lands during group 2 -> group 1 journaled, group 2
    # abandoned mid-epoch, sweep returns preempted. Guard-check schedule
    # per group: 1 between-groups + 1 per epoch boundary (2 epochs), so
    # n=4 survives all of group 1 (checks 1-3) and trips inside group 2.
    out = tmp_path / "pre"
    fb = _CountingFactory()
    b = run_sweep(fb, loader_factory, preempt_guard=_TriggerAfter(4),
                  **_kwargs(tmp_path, "pre"))
    assert b["preempted"] is True
    assert fb.calls == 2  # group 2 was built, then abandoned
    assert len(b["trials"]) == 1  # only group 1 finished
    # a preempted sweep must NOT publish a results file...
    assert not (out / "sweep_results.json").exists()
    # ...but the journal holds the finished group (after the meta header)
    lines = [json.loads(ln) for ln in
             (out / "sweep_journal.jsonl").read_text().splitlines()]
    assert "meta" in lines[0] and len(lines) == 2
    assert [t["trial_id"] for t in lines[1]["group"]] == [0]

    # C: resume replays the schedule — group 1 restores from the journal
    # (no training), groups 2-4 run live; result == uninterrupted run
    fc = _CountingFactory()
    c = run_sweep(fc, loader_factory, resume=True,
                  **_kwargs(tmp_path, "pre"))
    assert fc.calls == 3  # groups 2, 3, 4 only
    assert c["preempted"] is False
    assert c["best"]["trial_id"] == a["best"]["trial_id"]
    assert c["best"]["best_val_loss"] == a["best"]["best_val_loss"]
    assert c["trials"] == a["trials"]  # full per-trial equality
    saved = json.load(open(out / "sweep_results.json"))
    assert saved["best"]["trial_id"] == a["best"]["trial_id"]
    assert (out / "best_trial_params.npz").exists()


def test_double_preemption_resume_chain(tmp_path, toy):
    """Preempt -> resume -> preempt AGAIN -> resume: groups restored from
    the journal are never re-appended, groups finished during a resume leg
    append after them, so the journal accumulates exactly one record per
    finished group across any number of preemptions and the final result
    still equals the uninterrupted run."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    kw = _kwargs(tmp_path, "chain")
    journal = tmp_path / "chain" / "sweep_journal.jsonl"
    a = run_sweep(_CountingFactory(), loader_factory,
                  **_kwargs(tmp_path, "full"))

    # leg 1: trips inside group 2 -> journal holds group 1
    b = run_sweep(_CountingFactory(), loader_factory,
                  preempt_guard=_TriggerAfter(4), **kw)
    assert b["preempted"] and len(b["trials"]) == 1

    # leg 2 (resume): group 1 restores with NO guard checks consumed;
    # group 2 runs live (checks 1-3), group 3 trips at its first epoch
    # boundary (check 5) -> journal now holds groups 1 and 2
    c = run_sweep(_CountingFactory(), loader_factory, resume=True,
                  preempt_guard=_TriggerAfter(4), **kw)
    assert c["preempted"] and len(c["trials"]) == 2
    n_groups = sum(1 for ln in journal.read_text().splitlines()
                   if "group" in json.loads(ln))
    assert n_groups == 2  # one record per finished group, no duplicates

    # leg 3: finishes; trial-for-trial identical to the uninterrupted run
    d = run_sweep(_CountingFactory(), loader_factory, resume=True, **kw)
    assert d["preempted"] is False
    assert d["trials"] == a["trials"] and d["best"] == a["best"]


def test_tpe_resume_mid_second_wave_identical(tmp_path, toy):
    """The hardest resume case: TPE's wave-2 proposals are a function of
    the wave-1 HISTORY. A resume that restored wave 1 even slightly
    differently (order, val losses, lr/wd) would re-fit the densities on
    different data and sample a DIFFERENT wave 2 — the hyperparameter
    mismatch guard would then fail, or worse, a different sweep would run.
    Preempt during wave 2, resume, and require full trial-level equality
    with the uninterrupted TPE sweep."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    kw = dict(n_trials=6, max_epochs=2, min_iter=2, eta=2, method="tpe",
              seed=0, max_parallel_trials=1,
              space=SearchSpace(batch_sizes=(8,)))
    a = run_sweep(_CountingFactory(), loader_factory,
                  output_dir=str(tmp_path / "full"), **kw)
    assert a["preempted"] is False and len(a["trials"]) == 6

    # wave 1 = 4 single-trial groups (3 checks each = 12), wave 2 begins
    # at check 13 — trip inside wave 2's first group
    b = run_sweep(_CountingFactory(), loader_factory,
                  preempt_guard=_TriggerAfter(13),
                  output_dir=str(tmp_path / "pre"), **kw)
    assert b["preempted"] is True
    assert 4 <= len(b["trials"]) < 6  # wave 1 journaled, wave 2 partial

    c = run_sweep(_CountingFactory(), loader_factory, resume=True,
                  output_dir=str(tmp_path / "pre"), **kw)
    assert c["preempted"] is False
    assert c["trials"] == a["trials"]
    assert c["best"] == a["best"]


def test_resume_with_drifted_flags_fails_loudly(tmp_path, toy):
    """The journal header pins every schedule-determining flag; resuming
    with a different seed must refuse, not silently run a different
    sweep under the old journal."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    kw = _kwargs(tmp_path, "run")
    run_sweep(_CountingFactory(), loader_factory,
              preempt_guard=_TriggerAfter(4), **kw)
    kw["seed"] = 1
    with pytest.raises(ValueError, match="different flags"):
        run_sweep(_CountingFactory(), loader_factory, resume=True, **kw)


def test_resume_tolerates_torn_trailing_journal_line(tmp_path, toy):
    """A non-graceful kill (SIGKILL/OOM/hard VM reclaim) can tear the
    journal's final append mid-write. Resume must DROP the torn trailing
    line (that group re-runs deterministically) and still complete to the
    uninterrupted result — refusing to resume would defeat the journal's
    whole purpose. A torn line anywhere EARLIER is real corruption and
    still refuses."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    kw = _kwargs(tmp_path, "pre")
    a = run_sweep(_CountingFactory(), loader_factory,
                  **_kwargs(tmp_path, "full"))
    run_sweep(_CountingFactory(), loader_factory,
              preempt_guard=_TriggerAfter(4), **kw)
    journal = tmp_path / "pre" / "sweep_journal.jsonl"
    with open(journal, "a") as f:
        f.write('{"group": [{"trial_id": 1, "batch')  # torn mid-append
    c = run_sweep(_CountingFactory(), loader_factory, resume=True, **kw)
    assert c["trials"] == a["trials"] and c["best"] == a["best"]
    # the torn tail was truncated before this run appended, so the journal
    # parses cleanly end-to-end and a SECOND resume also succeeds
    c2 = run_sweep(_CountingFactory(), loader_factory, resume=True, **kw)
    assert c2["trials"] == a["trials"]

    # torn NON-final line: corruption, not a crash artifact — refuse
    lines = journal.read_text().splitlines()
    lines.insert(1, '{"group": [{"torn')
    journal.write_text("\n".join(lines) + "\n")
    with pytest.raises(ValueError, match="not the final line"):
        run_sweep(_CountingFactory(), loader_factory, resume=True, **kw)


def test_resume_with_drifted_fingerprint_fails_loudly(tmp_path, toy):
    """Schedule flags alone can match while the RESULTS are incomparable
    (different model family / data dir / dtype). The caller-declared
    fingerprint rides the journal header and a drifted resume refuses."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    kw = _kwargs(tmp_path, "run")
    run_sweep(_CountingFactory(), loader_factory,
              preempt_guard=_TriggerAfter(4),
              fingerprint={"model": "basic", "image_size": 512}, **kw)
    with pytest.raises(ValueError, match="different flags"):
        run_sweep(_CountingFactory(), loader_factory, resume=True,
                  fingerprint={"model": "optimized", "image_size": 512},
                  **kw)


def test_resume_without_journal_fails_loudly(tmp_path, toy):
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    with pytest.raises(FileNotFoundError, match="sweep journal"):
        run_sweep(_CountingFactory(), loader_factory, resume=True,
                  **_kwargs(tmp_path, "none"))


def test_fresh_sweep_truncates_stale_journal(tmp_path, toy):
    """Re-running WITHOUT --resume in a dir holding an old journal starts
    a fresh journal (header + this run's groups only) — stale groups from
    a previous schedule must not leak into a later resume."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    kw = _kwargs(tmp_path, "run")
    run_sweep(_CountingFactory(), loader_factory, **kw)
    first = (tmp_path / "run" / "sweep_journal.jsonl").read_text()
    run_sweep(_CountingFactory(), loader_factory, **kw)
    again = (tmp_path / "run" / "sweep_journal.jsonl").read_text()
    assert first == again  # deterministic schedule, fresh header each run
    assert sum(1 for ln in again.splitlines() if "group" in json.loads(ln)) == 4


@pytest.mark.slow
def test_cli_sigterm_mid_sweep_then_resume_matches_uninterrupted(tmp_path):
    """Real process, real SIGTERM: cli.sweep drains at the next epoch
    boundary, exits 0 with a resume hint, and --resume completes the sweep
    to the same best trial as an uninterrupted run (the style of
    tests/test_preempt.py's CLI drain test)."""
    from image_enhancement_deglaring_tpu.data import generate_synthetic_sd1

    data = tmp_path / "d"
    generate_synthetic_sd1(str(data), n_train=12, n_val=0, size=32, seed=1)
    env = {
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
        "PYTHONPATH": REPO,
        "JAX_PLATFORMS": "cpu",
        "JAX_COMPILATION_CACHE_DIR": os.path.join(REPO, "tests",
                                                  ".jax_cache"),
        "JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS": "0.5",
    }

    def cmd(out):
        return [sys.executable, "-m",
                "image_enhancement_deglaring_tpu.cli.sweep",
                "--data_dir", str(data / "train"), "--output_dir", str(out),
                "--sweep_count", "3", "--max_epochs", "2",
                "--early_stop_min_iter", "2", "--eta", "2",
                "--image_size", "32", "--method", "random",
                "--num_workers", "0", "--parallel_trials", "1",
                "--early_stop_patience", "0", "--seed", "0"]

    # A: uninterrupted baseline
    full = tmp_path / "full"
    done = subprocess.run(cmd(full), env=env, capture_output=True,
                          text=True, timeout=900, cwd=REPO)
    assert done.returncode == 0, done.stdout + done.stderr
    assert "Sweep completed" in done.stdout
    best_a = json.load(open(full / "sweep_results.json"))["best"]

    # B: SIGTERM once the first group lands in the journal
    out = tmp_path / "pre"
    p = subprocess.Popen(cmd(out), env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, cwd=REPO)
    journal = out / "sweep_journal.jsonl"
    deadline = time.time() + 600
    try:
        while time.time() < deadline:
            if journal.exists() and sum(
                    1 for ln in journal.read_text().splitlines() if ln) >= 2:
                break
            if p.poll() is not None:
                break
            time.sleep(0.5)
        else:
            raise AssertionError("journal never gained a finished group")
        assert p.poll() is None, p.stdout.read()
        p.send_signal(signal.SIGTERM)
        watchdog = threading.Timer(300, p.kill)
        watchdog.start()
        try:
            log, _ = p.communicate(timeout=300)
        finally:
            watchdog.cancel()
    except Exception:
        p.kill()
        raise
    assert p.returncode == 0, log
    assert "Sweep preempted" in log and "--resume" in log, log
    assert not (out / "sweep_results.json").exists()
    n_journaled = sum(1 for ln in journal.read_text().splitlines()
                      if "group" in json.loads(ln))
    assert 1 <= n_journaled < 3

    # C: resume completes to the identical best trial
    done = subprocess.run(cmd(out) + ["--resume", str(out)], env=env,
                          capture_output=True, text=True, timeout=900,
                          cwd=REPO)
    assert done.returncode == 0, done.stdout + done.stderr
    assert "Sweep completed" in done.stdout
    best_c = json.load(open(out / "sweep_results.json"))["best"]
    assert best_c["trial_id"] == best_a["trial_id"]
    assert best_c["best_val_loss"] == pytest.approx(
        best_a["best_val_loss"], rel=1e-5)
