"""Utils tests: .env loader, step timer, experiment logger, config CLI."""

import json
import os
import time

import numpy as np

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
