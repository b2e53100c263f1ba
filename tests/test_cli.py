"""CLI smoke tests over synthetic data: train -> evaluate -> export ->
extract -> enhance -> split/check round trips."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from image_enhancement_deglaring_tpu.data import generate_synthetic_sd1


@pytest.fixture(scope="module")
def sd1(tmp_path_factory):
    d = tmp_path_factory.mktemp("sd1cli")
    generate_synthetic_sd1(str(d), n_train=8, n_val=2, size=64, seed=0)
    return str(d)


@pytest.fixture(scope="module")
def trained(sd1, tmp_path_factory):
    out = tmp_path_factory.mktemp("train_out")
    from image_enhancement_deglaring_tpu.cli.train import main

    main([
        "--data_dir", f"{sd1}/train", "--output_dir", str(out),
        "--batch_size", "4", "--epochs", "1", "--image_size", "64",
        "--num_workers", "2", "--compute_dtype", "float32", "--n_devices", "1",
    ])
    return str(out)


def test_train_cli_outputs(trained):
    assert os.path.isdir(os.path.join(trained, "best_model"))
    assert os.path.isdir(os.path.join(trained, "final_model"))
    assert os.path.exists(os.path.join(trained, "model_weights.npz"))
    metrics = [json.loads(l) for l in
               open(os.path.join(trained, "logs", "metrics.jsonl"))]
    assert any("val_loss" in m for m in metrics)


def test_evaluate_cli(trained, sd1, capsys):
    from image_enhancement_deglaring_tpu.cli.evaluate import main

    main([
        "--data_dir", f"{sd1}/val", "--model_path",
        os.path.join(trained, "best_model"), "--batch_size", "2",
        "--image_size", "64", "--num_workers", "2",
    ])
    out = capsys.readouterr().out
    assert "L1 Loss:" in out and "PSNR:" in out and "SSIM:" in out
    results = open(os.path.join(trained, "evaluation_results.txt")).read()
    assert "Model type: CKPT" in results


def test_export_and_extract_cli(trained, tmp_path):
    from image_enhancement_deglaring_tpu.cli.export_onnx import main as export_main
    from image_enhancement_deglaring_tpu.cli.extract_weights import main as extract_main

    onnx_path = str(tmp_path / "exported.onnx")
    export_main(["--model_path", os.path.join(trained, "best_model"),
                 "--output", onnx_path])
    assert os.path.getsize(onnx_path) > 1_900_000  # ~486K f32 params

    npz_path = str(tmp_path / "weights.npz")
    extract_main([onnx_path, npz_path])
    data = np.load(npz_path)
    assert sum(v.size for v in data.values()) == 486409


def test_export_enhanced_from_orbax_dir(tmp_path):
    """cli.export_onnx must accept the repo's own training output for the
    stateful family: an orbax dir whose model_state carries batch_stats
    (previously only .pth/.onnx were accepted)."""
    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.cli.export_onnx import main as export_main
    from image_enhancement_deglaring_tpu.models import EnhancedUNet
    from image_enhancement_deglaring_tpu.train.checkpoint import save_checkpoint

    variables = jax.jit(EnhancedUNet().init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 1)))
    ckpt = str(tmp_path / "enhanced_ckpt")
    save_checkpoint(ckpt, params=variables["params"],
                    model_state={"batch_stats": variables["batch_stats"]})
    out = str(tmp_path / "enhanced.onnx")
    export_main(["--model", "enhanced", "--model_path", ckpt,
                 "--output", out])
    assert os.path.getsize(out) > 100_000


def test_enhance_cli(trained, tmp_path, rng):
    from image_enhancement_deglaring_tpu.cli.enhance import main

    img = (rng.random((80, 100)) * 255).astype(np.uint8)
    inp = str(tmp_path / "in.png")
    Image.fromarray(img).save(inp)
    out_dir = str(tmp_path / "results")
    main(["--input", inp, "--output_dir", out_dir, "--model_path",
          os.path.join(trained, "best_model"), "--image_size", "64",
          "--visualize"])
    out = Image.open(os.path.join(out_dir, "in.png"))
    assert out.mode == "L"
    assert os.path.exists(os.path.join(out_dir, "in_comparison.png"))


def test_split_image_cli(sd1, tmp_path):
    from image_enhancement_deglaring_tpu.cli.split_image import main

    src = os.path.join(sd1, "train")
    first = sorted(os.listdir(src))[0]
    rc = main([os.path.join(src, first), "-o", str(tmp_path)])
    assert rc == 0
    base = os.path.splitext(first)[0]
    for suffix in ("ground_truth", "glared", "mask"):
        img = Image.open(tmp_path / f"{base}_{suffix}.png")
        assert img.size == (64, 64)


def test_check_dataset_validator(sd1, capsys):
    from image_enhancement_deglaring_tpu.data.validate import main

    rc = main(sd1)  # synthetic 64px -> wrong dims for the 1536x512 contract
    out = capsys.readouterr().out
    assert rc == 1 and "incorrect dimensions" in out


def test_make_synthetic_cli(tmp_path):
    from image_enhancement_deglaring_tpu.cli.make_synthetic import main

    main(["--out_dir", str(tmp_path / "sd1"), "--n_train", "2", "--n_val", "1",
          "--size", "32"])
    from image_enhancement_deglaring_tpu.data import list_image_paths

    assert len(list_image_paths(str(tmp_path / "sd1" / "train"))) == 2
    assert len(list_image_paths(str(tmp_path / "sd1" / "val"))) == 1


def test_check_dataset_cli_missing_dir():
    from image_enhancement_deglaring_tpu.cli.check_dataset import main

    assert main(["/nonexistent/dataset/dir"]) == 1


def test_enhance_stem_collision_uniquified(tmp_path, monkeypatch):
    """scan.png + scan.jpg in one input dir must not clobber each other's
    PNG outputs."""
    import numpy as np
    from PIL import Image

    indir = tmp_path / "in"
    indir.mkdir()
    img = Image.fromarray(
        (np.random.default_rng(0).random((32, 32)) * 255).astype(np.uint8))
    img.save(indir / "scan.png")
    img.convert("RGB").save(indir / "scan.jpg")

    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.cli import enhance
    from image_enhancement_deglaring_tpu.models import LightweightUNet

    model = LightweightUNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 1)))["params"]
    monkeypatch.setattr(
        "image_enhancement_deglaring_tpu.eval.load_model_for_eval",
        lambda *a, **k: (model.apply, params))
    outdir = tmp_path / "out"
    enhance.main(["--input", str(indir), "--output_dir", str(outdir),
                  "--model_path", "ignored", "--image_size", "32"])
    names = sorted(p.name for p in outdir.iterdir())
    assert names == ["scan.png", "scan_1.png"]


# ------------------------------------------- round-3 cli/frontend review


def test_enhance_visualize_comparison_collision(tmp_path, monkeypatch):
    """An input literally named x_comparison.png must not be clobbered by
    x.png's --visualize figure (and vice versa)."""
    pytest.importorskip("matplotlib")
    import numpy as np
    from PIL import Image

    indir = tmp_path / "in"
    indir.mkdir()
    img = Image.fromarray(
        (np.random.default_rng(0).random((32, 32)) * 255).astype(np.uint8))
    img.save(indir / "x.png")
    img.save(indir / "x_comparison.png")

    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.cli import enhance
    from image_enhancement_deglaring_tpu.models import LightweightUNet

    model = LightweightUNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 1)))["params"]
    monkeypatch.setattr(
        "image_enhancement_deglaring_tpu.eval.load_model_for_eval",
        lambda *a, **k: (model.apply, params))
    outdir = tmp_path / "out"
    enhance.main(["--input", str(indir), "--output_dir", str(outdir),
                  "--model_path", "ignored", "--image_size", "32",
                  "--visualize"])
    names = sorted(p.name for p in outdir.iterdir())
    # 2 enhanced outputs + 2 distinct comparison figures, nothing clobbered
    assert len(names) == 4, names
    # BOTH inputs' enhanced outputs survive as 32x32 grayscale PNGs
    # (x.png's figure claimed out/x_comparison.png first, so the second
    # input's enhanced output was uniquified to x_comparison_1.png)
    for enhanced in ("x.png", "x_comparison_1.png"):
        out = Image.open(outdir / enhanced)
        assert out.size == (32, 32) and out.mode == "L", enhanced


def test_serve_cli_usage_errors_fail_before_model_load():
    """--workers usage errors must fail instantly, not after the model
    load + TPU warmup (minutes through a remote tunnel). Proven by the
    nonexistent model path: if validation ran after create_server, the
    error would be FileNotFoundError, not the usage SystemExit."""
    from image_enhancement_deglaring_tpu.cli import serve

    with pytest.raises(SystemExit, match="resize"):
        serve.main(["--workers", "2", "--mode", "tile",
                    "--model_path", "/nonexistent.onnx"])
    with pytest.raises(SystemExit, match="allow_reload"):
        serve.main(["--workers", "2", "--allow_reload",
                    "--model_path", "/nonexistent.onnx"])


def test_train_cli_distributed_single_process_warns(sd1, tmp_path,
                                                    monkeypatch, capsys):
    """--distributed resolving to ONE process must be loud: a failed
    auto-detect initialize on a pod would otherwise silently run N
    independent trainings into one shared output_dir. The run itself
    must still complete single-host (legitimate on a 1-host slice)."""
    from image_enhancement_deglaring_tpu.cli import train as train_cli
    from image_enhancement_deglaring_tpu.parallel import distributed

    # initialize() auto-detect in-process would try to start a real
    # coordinator; the warning under test only depends on process_count()
    monkeypatch.setattr(distributed, "initialize",
                        lambda **kw: None)
    train_cli.main([
        "--data_dir", f"{sd1}/train", "--output_dir", str(tmp_path),
        "--batch_size", "4", "--epochs", "1", "--image_size", "64",
        "--num_workers", "0", "--compute_dtype", "float32",
        "--distributed", "--n_devices", "1",
    ])
    captured = capsys.readouterr()
    assert "Distributed runtime: 1 process(es)" in captured.out
    assert "resolved to a SINGLE process" in captured.err
    assert os.path.isdir(os.path.join(str(tmp_path), "best_model"))


def test_train_cli_rejects_remat_for_unsupported_families(tmp_path):
    """--remat only exists on LightweightUNet; silently dropping it would
    leave the user OOMing with the memory knob doing nothing."""
    from image_enhancement_deglaring_tpu.cli import train as train_cli

    with pytest.raises(SystemExit, match="remat"):
        train_cli.main(["--data_dir", str(tmp_path), "--model", "enhanced",
                        "--remat", "--output_dir", str(tmp_path / "o")])


def test_evaluate_cli_rejects_undeterminable_artifact(tmp_path):
    from image_enhancement_deglaring_tpu.cli import evaluate as eval_cli

    weird = tmp_path / "model.bin"
    weird.write_bytes(b"\0")
    with pytest.raises(SystemExit, match="format"):
        eval_cli.main(["--model_path", str(weird),
                       "--data_dir", str(tmp_path)])


def test_test_api_unreachable_server_reports_failed(capsys):
    """An unreachable server is FAILED output + exit 1, not a traceback."""
    pytest.importorskip("requests")
    from image_enhancement_deglaring_tpu.cli.test_api import main

    rc = main(["--test", "ping", "--url", "http://127.0.0.1:1"])
    out = capsys.readouterr().out
    assert rc == 1 and "FAILED" in out


def test_crossval_artifact_script_runs(tmp_path):
    """The promotion gate must actually run end to end (it used the
    val_split=1.0 idiom the zero-train-batch guard rejects)."""
    import json as _json
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = os.path.join(repo, "scripts", "crossval_artifact.py")
    incumbent = os.path.join(repo, "deploy", "models", "best_model.onnx")
    # fresh interpreter: pin it to CPU — the container's device-plugin
    # sitecustomize would otherwise grab the (possibly down) TPU tunnel
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env.update(PYTHONPATH=repo, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script, "--candidate", incumbent,
         "--n", "4", "--size", "64", "--batch_size", "2"],
        capture_output=True, text=True, timeout=600, cwd=str(tmp_path),
        env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    verdict = _json.loads(proc.stdout.strip().splitlines()[-1])
    assert "candidate" in verdict and "incumbent" in verdict


def test_enhance_batch_size_matches_single(tmp_path, monkeypatch):
    """--batch_size N (reference: main.py:19) ships directory images to the
    device in batches; outputs must be identical to one-at-a-time runs —
    including a final short batch (3 images, batch 2)."""
    import numpy as np
    from PIL import Image

    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray((rng.random((32, 32)) * 255).astype(np.uint8)).save(
            indir / f"img{i}.png")

    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.cli import enhance
    from image_enhancement_deglaring_tpu.models import LightweightUNet

    model = LightweightUNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 1)))["params"]
    monkeypatch.setattr(
        "image_enhancement_deglaring_tpu.eval.load_model_for_eval",
        lambda *a, **k: (model.apply, params))

    out1 = tmp_path / "out1"
    outn = tmp_path / "outn"
    common = ["--input", str(indir), "--model_path", "ignored",
              "--image_size", "32"]
    enhance.main(common + ["--output_dir", str(out1)])
    enhance.main(common + ["--output_dir", str(outn), "--batch_size", "2"])
    names = sorted(p.name for p in out1.iterdir())
    assert names == sorted(p.name for p in outn.iterdir())
    for name in names:
        a = np.asarray(Image.open(out1 / name))
        b = np.asarray(Image.open(outn / name))
        np.testing.assert_array_equal(a, b)


def test_enhance_data_parallel_matches_single_device(tmp_path, monkeypatch):
    """--data_parallel shards the enhance batches across the 8-device CPU
    mesh (same resolver as cli.serve): outputs must match the single-chip
    run within the ±1-uint8 padded-batch GroupNorm tolerance, in BOTH
    resize and tile modes."""
    import numpy as np
    from PIL import Image

    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        Image.fromarray((rng.random((48, 48)) * 255).astype(np.uint8)).save(
            indir / f"img{i}.png")

    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.cli import enhance
    from image_enhancement_deglaring_tpu.models import LightweightUNet

    model = LightweightUNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 1)))["params"]
    monkeypatch.setattr(
        "image_enhancement_deglaring_tpu.eval.load_model_for_eval",
        lambda *a, **k: (model.apply, params))

    for mode in ("resize", "tile"):
        solo = tmp_path / f"solo_{mode}"
        dp = tmp_path / f"dp_{mode}"
        common = ["--input", str(indir), "--model_path", "ignored",
                  "--image_size", "32", "--mode", mode,
                  "--tile_overlap", "8"]
        enhance.main(common + ["--output_dir", str(solo)])
        enhance.main(common + ["--output_dir", str(dp), "--batch_size", "2",
                               "--data_parallel"])
        names = sorted(p.name for p in solo.iterdir())
        assert names == sorted(p.name for p in dp.iterdir())
        for name in names:
            a = np.asarray(Image.open(solo / name)).astype(np.int16)
            b = np.asarray(Image.open(dp / name)).astype(np.int16)
            assert np.abs(a - b).max() <= 1, (mode, name)


def test_enhance_batch_corrupt_file_keeps_earlier_outputs(tmp_path,
                                                          monkeypatch):
    """A corrupt file mid-chunk must not discard the outputs of earlier
    images in the same chunk (single-image failure-isolation parity):
    everything decoded before the bad file is inferred and written, then
    the error surfaces."""
    import numpy as np
    from PIL import Image

    indir = tmp_path / "in"
    indir.mkdir()
    rng = np.random.default_rng(0)
    Image.fromarray((rng.random((32, 32)) * 255).astype(np.uint8)).save(
        indir / "a.png")
    (indir / "b.png").write_bytes(b"not a png")
    Image.fromarray((rng.random((32, 32)) * 255).astype(np.uint8)).save(
        indir / "c.png")

    import jax
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.cli import enhance
    from image_enhancement_deglaring_tpu.models import LightweightUNet

    model = LightweightUNet()
    params = jax.jit(model.init)(jax.random.PRNGKey(0),
                                 jnp.zeros((1, 32, 32, 1)))["params"]
    monkeypatch.setattr(
        "image_enhancement_deglaring_tpu.eval.load_model_for_eval",
        lambda *a, **k: (model.apply, params))

    out = tmp_path / "out"
    with pytest.raises(Exception):
        enhance.main(["--input", str(indir), "--model_path", "ignored",
                      "--image_size", "32", "--output_dir", str(out),
                      "--batch_size", "3"])
    assert (out / "a.png").exists()  # decoded before b.png -> written
