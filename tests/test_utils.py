"""Utils tests: .env loader, step timer, experiment logger, config CLI."""

import json
import os
import time

import numpy as np
import pytest

from image_enhancement_deglaring_tpu.utils import (
    ExperimentLogger,
    StepTimer,
    load_dotenv,
    set_seed,
)
from image_enhancement_deglaring_tpu.utils.config import TrainConfig, from_args


def test_load_dotenv(tmp_path, monkeypatch):
    envfile = tmp_path / ".env"
    envfile.write_text(
        "# comment\nFOO=bar\nexport QUOTED='hello world'\nEXISTING=new\n"
    )
    monkeypatch.setenv("EXISTING", "old")
    parsed = load_dotenv(str(envfile))
    assert parsed == {"FOO": "bar", "QUOTED": "hello world", "EXISTING": "new"}
    assert os.environ["FOO"] == "bar"
    assert os.environ["QUOTED"] == "hello world"
    assert os.environ["EXISTING"] == "old"  # no override by default


def test_load_dotenv_strips_unquoted_inline_comments(tmp_path):
    """python-dotenv semantics (what the reference loads with): an
    unquoted inline comment is stripped; a quoted value keeps everything
    inside the quotes."""
    envfile = tmp_path / ".env"
    envfile.write_text(
        "KEY=abc123 # personal key\n"
        "QUOTED='abc # not a comment'\n"
        "HASHED=a#b\n"  # no space before # -> part of the value
    )
    parsed = load_dotenv(str(envfile))
    assert parsed["KEY"] == "abc123"
    assert parsed["QUOTED"] == "abc # not a comment"
    assert parsed["HASHED"] == "a#b"


def test_step_timer():
    t = StepTimer(window=10)
    for _ in range(5):
        time.sleep(0.005)
        t.tick(4)
    assert 0 < t.steps_per_sec < 1000
    assert abs(t.items_per_sec - 4 * t.steps_per_sec) < 1e-6
    assert t.ms_per_step > 4


def test_experiment_logger(tmp_path):
    logger = ExperimentLogger(str(tmp_path), config={"lr": 1e-3})
    logger.log({"loss": 0.5, "arr": np.float32(1.5)}, step=1)
    logger.log({"loss": 0.4}, step=2)
    logger.set_summary(best_val_loss=0.4)
    logger.log_images("val", {"pred": np.zeros((8, 8), np.float32)}, step=2)

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert lines[0]["loss"] == 0.5 and lines[0]["arr"] == 1.5
    assert json.load(open(tmp_path / "summary.json")) == {"best_val_loss": 0.4}
    assert json.load(open(tmp_path / "config.json")) == {"lr": 1e-3}
    assert (tmp_path / "images" / "step_000002" / "val_pred.png").exists()


def test_config_from_args():
    cfg = from_args(TrainConfig, [
        "--batch_size", "16", "--data.image_size", "256", "--use_wandb", "true",
    ])
    assert cfg.batch_size == 16
    assert cfg.data.image_size == 256
    assert cfg.use_wandb is True
    # untouched fields keep the reference's tuned defaults
    assert cfg.lr == 0.002362532125818593


def test_set_seed_returns_key():
    key = set_seed(7, verbose=False)
    assert key.shape == (2,) or key.dtype.name.startswith("key")


def test_log_histograms(tmp_path):
    logger = ExperimentLogger(str(tmp_path))
    tree = {"layer": {"w": np.arange(100, dtype=np.float32)}}
    logger.log_histograms(tree, step=1, prefix="params")
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().splitlines()[-1])
    stats = rec["_histograms_params"]["params/layer/w"]
    assert stats["count"] == 100 and stats["median"] == 49.5


class _FakeWandbRun:
    def __init__(self):
        self.summary = {}


class _FakeWandb:
    """Minimal wandb stand-in recording every call (no network)."""

    def __init__(self):
        self.logged = []
        self.images = []
        self.histograms = []
        self.run = _FakeWandbRun()
        self.finished = False

    def init(self, **kwargs):
        self.init_kwargs = kwargs
        return self.run

    def log(self, metrics, step=None):
        self.logged.append((metrics, step))

    def Image(self, arr, caption=None):
        self.images.append((np.asarray(arr).shape, caption))
        return ("image", caption)

    def Histogram(self, arr):
        self.histograms.append(np.asarray(arr).size)
        return ("histogram", np.asarray(arr).size)

    def finish(self):
        self.finished = True

    def save(self, glob_str, base_path=None, policy="live"):
        self.saved = getattr(self, "saved", [])
        self.saved.append((glob_str, base_path, policy))


def test_wandb_mirroring_images_and_histograms(tmp_path, monkeypatch):
    """With use_wandb=True, scalars, images AND histograms all mirror to
    wandb (reference: optimized_train.py:125-159, :179)."""
    import sys

    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    logger = ExperimentLogger(str(tmp_path), use_wandb=True, project="p",
                              entity="team")
    assert logger._wandb is fake
    # --wandb_entity threads through (reference: optimized_train.py:50)
    assert fake.init_kwargs["project"] == "p"
    assert fake.init_kwargs["entity"] == "team"

    logger.log({"loss": 0.5}, step=1)
    logger.log_images("val", {"pred": np.zeros((8, 8), np.float32),
                              "target": np.ones((8, 8), np.float32)}, step=2)
    logger.log_histograms({"w": np.arange(10, dtype=np.float32)}, step=3,
                          prefix="grad")
    logger.set_summary(best_val_loss=0.4)
    logger.finish()

    assert ({"loss": 0.5}, 1) in fake.logged
    # images went up as a wandb.Image list under the tag
    img_logs = [m for m, s in fake.logged if "val" in m and s == 2]
    assert img_logs and img_logs[0]["val"] == [("image", "pred"), ("image", "target")]
    assert len(fake.images) == 2
    # histograms went up as wandb.Histogram objects
    hist_logs = [m for m, s in fake.logged
                 if "grad/w" in m and isinstance(m["grad/w"], tuple)]
    assert hist_logs and fake.histograms == [10]
    assert fake.run.summary["best_val_loss"] == 0.4
    assert fake.finished


def test_logger_save_warns_once_per_failure_type(tmp_path, monkeypatch):
    """Artifact-mirroring failures warn once per EXCEPTION TYPE per run:
    a transient ConnectionError must not consume the only warning and
    re-silence a later systematic TypeError (the failure class that once
    no-opped every upload unnoticed) — while repeats of the same type
    stay quiet so a flaky link can't spam the epoch loop."""
    import sys
    import warnings as _w

    class _BoomWandb(_FakeWandb):
        exc: Exception = None

        def save(self, *a, **k):
            raise self.exc

    fake = _BoomWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    logger = ExperimentLogger(str(tmp_path / "logs"), use_wandb=True)
    f = tmp_path / "w.npz"
    f.write_text("x")

    fake.exc = ConnectionError("net down")
    with pytest.warns(RuntimeWarning, match="ConnectionError"):
        logger.save(str(f))
    with _w.catch_warnings():  # same type again: silent
        _w.simplefilter("error")
        logger.save(str(f))
    fake.exc = TypeError("unexpected keyword")  # new type: warns again
    with pytest.warns(RuntimeWarning, match="TypeError"):
        logger.save(str(f))
    # the local audit trail recorded every attempt regardless
    lines = (tmp_path / "logs" / "artifacts.jsonl").read_text().splitlines()
    assert len(lines) == 3


def test_logger_save_mirrors_artifacts(tmp_path, monkeypatch):
    """logger.save uploads checkpoint artifacts to wandb like the
    reference's wandb.save (optimized_train.py:317,340) — directories
    (orbax) recursively, INCLUDING the nested data payloads
    (d/<hash>, ocdbt.process_0/d/<hash>; a one-level glob would mirror
    metadata without weights), files directly — and always records the
    path in artifacts.jsonl for offline runs."""
    import json as _json
    import sys

    fake = _FakeWandb()
    monkeypatch.setitem(sys.modules, "wandb", fake)
    logger = ExperimentLogger(str(tmp_path / "logs"), use_wandb=True)

    # mimic the orbax OCDBT layout: top-level metadata + nested payloads
    ckpt_dir = tmp_path / "best_model"
    (ckpt_dir / "d").mkdir(parents=True)
    (ckpt_dir / "ocdbt.process_0" / "d").mkdir(parents=True)
    (ckpt_dir / "_METADATA").write_text("m")
    (ckpt_dir / "d" / "abc123").write_text("w1")
    (ckpt_dir / "ocdbt.process_0" / "d" / "def456").write_text("w2")
    ckpt_file = tmp_path / "weights.npz"
    ckpt_file.write_text("y")

    logger.save(str(ckpt_dir))
    logger.save(str(ckpt_file))
    dir_saves = {g for g, b, _p in fake.saved if b == str(tmp_path)}
    assert dir_saves == {str(ckpt_dir / "_METADATA"),
                         str(ckpt_dir / "d" / "abc123"),
                         str(ckpt_dir / "ocdbt.process_0" / "d" / "def456")}
    assert (str(ckpt_file), None, "now") in fake.saved
    # every upload is a point-in-time copy (orbax rewrites dirs, so "live"
    # symlinks would dangle — see ExperimentLogger.save docstring)
    assert {p for _g, _b, p in fake.saved} == {"now"}

    lines = [_json.loads(line) for line in
             (tmp_path / "logs" / "artifacts.jsonl").read_text().splitlines()]
    assert [r["path"] for r in lines] == [str(ckpt_dir), str(ckpt_file)]

    # offline (no wandb): still records locally, never raises
    offline = ExperimentLogger(str(tmp_path / "logs2"))
    offline.save(str(ckpt_file))
    assert (tmp_path / "logs2" / "artifacts.jsonl").exists()


def test_pytree_npz_roundtrip(tmp_path):
    """The shared flat-npz convention round-trips nested pytrees exactly
    (one implementation for train CLI, sweep, extract_weights, loaders)."""
    import numpy as np

    from image_enhancement_deglaring_tpu.utils.pytree import (
        flatten_tree,
        load_npz_tree,
        unflatten_tree,
    )

    tree = {"a": {"b": np.arange(6).reshape(2, 3), "c": np.float32(1.5)},
            "d": np.ones((4,), np.int8)}
    flat = flatten_tree(tree)
    assert set(flat.keys()) == {"a/b", "a/c", "d"}
    back = unflatten_tree(flat)
    np.testing.assert_array_equal(back["a"]["b"], tree["a"]["b"])

    p = str(tmp_path / "t.npz")
    np.savez(p, **flat)
    loaded = load_npz_tree(p)
    np.testing.assert_array_equal(loaded["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(loaded["d"], tree["d"])
    assert loaded["a"]["c"] == np.float32(1.5)


def test_config_from_args_rejects_unknown_flags():
    """A misspelled flag must error (argparse exit), not silently fall back
    to the dataclass default and invalidate the experiment."""
    with pytest.raises(SystemExit):
        from_args(TrainConfig, ["--weight-decay", "1e-4"])


def test_explog_writes_strict_json_on_nonfinite(tmp_path):
    """Diverged runs log NaN losses; metrics.jsonl must stay RFC-8259
    (NaN -> null), or strict consumers reject the very lines that matter."""
    import json

    from image_enhancement_deglaring_tpu.utils.explog import ExperimentLogger

    logger = ExperimentLogger(str(tmp_path), run_name="nan_run")
    logger.log({"train_loss": float("nan"), "lr": float("inf"), "ok": 1.0})
    line = open(logger._metrics_path).readline()

    def _reject(_):
        raise ValueError("non-RFC-8259 constant")

    rec = json.loads(line, parse_constant=_reject)  # strict parse
    assert rec["train_loss"] is None and rec["lr"] is None
    assert rec["ok"] == 1.0
