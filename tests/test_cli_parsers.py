"""Every CLI's flag surface parses with defaults (keeps the reference's
argparse contracts importable and stable)."""

import pytest


def test_train_parser_defaults():
    from image_enhancement_deglaring_tpu.cli.train import parse_args

    args = parse_args(["--data_dir", "SD1/train"])
    # the reference's tuned hyperparameters are the defaults
    assert args.lr == 0.002362532125818593
    assert args.weight_decay == 0.00006753784966611083
    assert args.batch_size == 32 and args.epochs == 50
    assert args.model == "basic" and args.image_size == 512
    assert args.patience == 10 and args.clip_grad_norm == 1.0


def test_train_coordinator_flags_require_distributed():
    """Explicit pod-launch flags without --distributed must refuse to run:
    silently ignoring them would start N INDEPENDENT trainings stomping
    one shared output_dir (the guard fires before any data/jax work, so
    the bogus data_dir is never touched)."""
    from image_enhancement_deglaring_tpu.cli.train import main

    for flags in (["--num_processes", "2"],
                  ["--coordinator_address", "host0:1234"],
                  ["--process_id", "0"]):
        with pytest.raises(SystemExit, match="--distributed"):
            main(["--data_dir", "/nonexistent"] + flags)


def test_evaluate_parser_defaults():
    from image_enhancement_deglaring_tpu.cli.evaluate import parse_args

    args = parse_args([])
    assert args.data_dir == "SD1/val"
    assert args.batch_size == 16 and args.image_size == 512
    # "auto" resolves to the artifact's family at load time; explicit
    # lightweight/optimized (the reference's choices) remain accepted
    assert args.model == "auto"
    assert parse_args(["--model", "lightweight"]).model == "lightweight"


def test_serve_parser_env_model_path(monkeypatch):
    # MODEL_PATH is read at parse time (cli/serve.py), not import time —
    # setenv alone is sufficient
    monkeypatch.setenv("MODEL_PATH", "/models/x.onnx")
    from image_enhancement_deglaring_tpu.cli import serve

    args = serve.parse_args([])
    assert args.model_path == "/models/x.onnx"
    assert args.port == 4000 and args.mode == "resize"
    assert args.profile_port == 0  # profiler server off by default


def test_sweep_parser_defaults():
    from image_enhancement_deglaring_tpu.cli.sweep import parse_args

    args = parse_args(["--data_dir", "SD1/train"])
    assert args.sweep_count == 20 and args.max_epochs == 50
    assert args.early_stop_min_iter == 10  # hyperband min_iter
    assert not args.resident_data
    assert parse_args(["--data_dir", "d", "--resident_data"]).resident_data
    # reference sweep fixes mixed_precision ON -> bf16 default
    assert args.compute_dtype == "bfloat16"
    # reference train_sweep supports all three families (sweep.py:135-143)
    assert args.model == "basic"
    assert args.halving == "compact"
    assert parse_args(["--data_dir", "d", "--halving", "mask"]
                      ).halving == "mask"
    assert parse_args(["--data_dir", "d", "--model", "enhanced"]
                      ).model == "enhanced"
    assert parse_args(["--data_dir", "d", "--compute_dtype", "float32"]
                      ).compute_dtype == "float32"


def test_enhance_parser_requires_input():
    from image_enhancement_deglaring_tpu.cli.enhance import parse_args

    with pytest.raises(SystemExit):
        parse_args([])
    args = parse_args(["--input", "x.png"])
    assert args.output_dir == "./results"


def test_test_api_parser():
    from image_enhancement_deglaring_tpu.cli.test_api import main  # noqa: F401


def test_reference_flag_compat():
    """Every flag a reference command line can carry parses here too
    (reference: optimized_train.py:35-59, sweep.py:23-38, main.py:13-21) —
    a migrating user's exact command must not die in argparse."""
    from image_enhancement_deglaring_tpu.cli.enhance import (
        parse_args as enhance_args,
    )
    from image_enhancement_deglaring_tpu.cli.sweep import (
        parse_args as sweep_args,
    )
    from image_enhancement_deglaring_tpu.cli.train import (
        parse_args as train_args,
    )

    t = train_args(["--data_dir", "d", "--use_amp", "--wandb_entity", "team",
                    "--prefetch_factor", "4", "--persistent_workers"])
    assert t.use_amp and t.wandb_entity == "team"
    assert t.prefetch_factor == 4 and t.persistent_workers

    s = sweep_args(["--data_dir", "d", "--sweep_project", "proj",
                    "--sweep_entity", "team", "--early_stop_patience", "7",
                    "--prefetch_factor", "3", "--persistent_workers"])
    assert s.wandb_project == "proj" and s.wandb_entity == "team"
    assert s.early_stop_patience == 7 and s.prefetch_factor == 3
    # our train-CLI-style spellings hit the same destinations
    s2 = sweep_args(["--data_dir", "d", "--wandb_project", "p2",
                     "--wandb_entity", "e2"])
    assert s2.wandb_project == "p2" and s2.wandb_entity == "e2"

    e = enhance_args(["--input", "x.png", "--batch_size", "4"])
    assert e.batch_size == 4


def test_train_use_amp_conflicts_with_float32():
    """--use_amp (reference mixed precision) + --compute_dtype float32 is a
    contradiction; refusing beats silently picking one."""
    from image_enhancement_deglaring_tpu.cli.train import main

    with pytest.raises(SystemExit, match="use_amp"):
        main(["--data_dir", "/nonexistent", "--use_amp",
              "--compute_dtype", "float32"])
