"""Online W&B-server-driven sweep mode (--method wandb).

The reference's sweep is owned by the W&B server: ``wandb.agent`` pulls
every trial's hyperparameters from the server-side Bayes controller and
Hyperband stops runs server-side (reference: sweep.py:94-241).
``run_wandb_agent_sweep`` reproduces those semantics; these tests drive it
with a fake server (no network) and assert the protocol: server proposals
become the trained hyperparameters, per-epoch val_loss streams to the
run, server stop decisions are honored, and rejoin attaches to an
existing sweep id instead of registering a new one.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from image_enhancement_deglaring_tpu.models import LightweightUNet
from image_enhancement_deglaring_tpu.parallel.sweep import (
    SearchSpace,
    run_wandb_agent_sweep,
)
from tests.loaders import ArrayLoader

SIZE = 16


@pytest.fixture(scope="module")
def toy():
    rng = np.random.default_rng(0)
    y = rng.random((16, SIZE, SIZE, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.1, y.shape), 0, 1).astype(np.float32)
    return x, y


def _tiny():
    return LightweightUNet(features_start=2, num_groups=2)


class _FakeRun:
    def __init__(self, config, stop_after=None):
        self.config = config
        self.summary = {}
        self.logged = []
        self._stop_after = stop_after
        self.finished = False

    def log(self, rec, step=None):
        self.logged.append((rec, step))

    def should_stop(self):
        return (self._stop_after is not None
                and len(self.logged) >= self._stop_after)

    def finish(self):
        self.finished = True


class _FakeWandbServer:
    """Server + agent stand-in: proposals come from a fixed list (the
    'Bayes controller'), one run per agent function call, an optional
    Hyperband stop decision for one chosen trial."""

    def __init__(self, proposals, stop_trial=None, stop_after=None):
        self.proposals = proposals
        self.stop_trial, self.stop_after = stop_trial, stop_after
        self.sweep_configs = []
        self.agent_calls = []
        self.runs = []

    def sweep(self, config, project=None, entity=None):
        self.sweep_configs.append((config, project, entity))
        return "sw-fake-1"

    def init(self, **kw):
        i = len(self.runs)
        run = _FakeRun(self.proposals[i],
                       self.stop_after if i == self.stop_trial else None)
        self.runs.append(run)
        return run

    def agent(self, sweep_id, function=None, count=None):
        self.agent_calls.append((sweep_id, count))
        for _ in range(count):
            function()


PROPOSALS = [
    {"batch_size": 8, "learning_rate": 3e-3, "weight_decay": 1e-5},
    {"batch_size": 8, "learning_rate": 1e-3, "weight_decay": 5e-5},
    {"batch_size": 8, "learning_rate": 5e-4, "weight_decay": 2e-6},
]


def test_server_proposals_drive_trials_and_server_stop_honored(tmp_path,
                                                               toy):
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    fake = _FakeWandbServer(PROPOSALS, stop_trial=1, stop_after=1)
    result = run_wandb_agent_sweep(
        _tiny, loader_factory, n_trials=3, max_epochs=3, min_iter=1,
        eta=2, seed=0, output_dir=str(tmp_path),
        space=SearchSpace(batch_sizes=(8,)), project="p", entity="e",
        wandb_module=fake)

    # the registered sweep config is the reference-shaped server config
    (cfg, proj, ent), = fake.sweep_configs
    assert proj == "p" and ent == "e"
    assert cfg["method"] == "bayes"
    assert cfg["early_terminate"] == {"type": "hyperband", "min_iter": 1,
                                      "eta": 2}
    assert cfg["parameters"]["batch_size"]["values"] == [8]
    assert fake.agent_calls == [("sw-fake-1", 3)]

    # every trial trained the SERVER's hyperparameters
    assert [t["lr"] for t in result["trials"]] == \
        [p["learning_rate"] for p in PROPOSALS]
    assert [t["wd"] for t in result["trials"]] == \
        [p["weight_decay"] for p in PROPOSALS]

    # trial 1 was stopped by the server after 1 epoch; the rest ran full
    t0, t1, t2 = result["trials"]
    assert t1["stop_reason"] == "server" and t1["epochs_run"] == 1
    assert t0["epochs_run"] == 3 and t2["epochs_run"] == 3

    # per-epoch val_loss streamed to each run (what Hyperband decides on),
    # and every run finished with a best_val_loss summary
    for run, t in zip(fake.runs, result["trials"]):
        assert run.finished
        assert len(run.logged) == t["epochs_run"]
        assert all("val_loss" in rec for rec, _ in run.logged)
        assert run.summary["best_val_loss"] == t["best_val_loss"]

    # local artifacts still written (sweep_results.json is the contract
    # every downstream consumer reads, regardless of proposal source)
    saved = json.load(open(tmp_path / "sweep_results.json"))
    assert saved["sweep_id"] == "sw-fake-1"
    assert saved["best"]["trial_id"] == result["best"]["trial_id"]
    assert (tmp_path / "best_trial_params.npz").exists()
    assert result["best"]["best_val_loss"] == min(
        t["best_val_loss"] for t in result["trials"])


def test_rejoin_attaches_to_existing_sweep_id(tmp_path, toy):
    """The reference's crash-recovery story: rerun the agent with the
    sweep id — no new server-side sweep object is registered."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:8], y[:8], bs, min_one_batch=True))

    fake = _FakeWandbServer(PROPOSALS[:1])
    result = run_wandb_agent_sweep(
        _tiny, loader_factory, n_trials=1, max_epochs=1, min_iter=1,
        eta=2, seed=0, output_dir=str(tmp_path),
        space=SearchSpace(batch_sizes=(8,)), sweep_id="sw-existing",
        wandb_module=fake)
    assert fake.sweep_configs == []  # attached, not re-registered
    assert fake.agent_calls == [("sw-existing", 1)]
    assert result["sweep_id"] == "sw-existing"


def test_empty_validation_set_refused(tmp_path, toy):
    """Same contract as run_sweep: an empty val set would rank every
    server run on a constant 0.0 — refuse loudly."""
    x, y = toy

    def loader_factory(bs):
        return (ArrayLoader(x, y, bs, min_one_batch=True),
                ArrayLoader(x[:0], y[:0], bs))

    fake = _FakeWandbServer(PROPOSALS[:1])
    with pytest.raises(ValueError, match="validation set is empty"):
        run_wandb_agent_sweep(
            _tiny, loader_factory, n_trials=1, max_epochs=1, min_iter=1,
            eta=2, seed=0, output_dir=str(tmp_path),
            space=SearchSpace(batch_sizes=(8,)), wandb_module=fake)
