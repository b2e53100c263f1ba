"""bench.py emission contract: the driver records its single JSON line,
so the shape and the frozen-denominator ratio must stay stable."""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def test_emit_uses_frozen_denominator(capsys):
    bench._emit(3500.0, 3500.0 / bench.FROZEN_CPU_IMG_S,
                cpu_img_s_live=6.1)
    rec = json.loads(capsys.readouterr().out)
    assert rec["unit"] == "images/sec/chip"
    assert rec["cpu_img_s"] == bench.FROZEN_CPU_IMG_S
    assert rec["cpu_img_s_live"] == 6.1
    # reproducibility contract: the ratio is exactly tpu/frozen — any two
    # runs differ only by the TPU side's ~0.5% variance
    assert rec["vs_baseline"] == round(3500.0 / bench.FROZEN_CPU_IMG_S, 2)


def test_emit_timeout_record_is_one_parseable_line(capsys):
    bench._emit(None, None, note="device benchmark timed out")
    out = capsys.readouterr().out
    assert out.count("\n") == 1
    rec = json.loads(out)
    assert rec["value"] is None and rec["vs_baseline"] is None


def test_cpu_baseline_reraises_watchdog_timeout(monkeypatch):
    """The SIGALRM watchdog exception must escape the helper's blanket
    Exception guard so main's fresh-process retry path stays reachable."""
    import image_enhancement_deglaring_tpu.modelio.torch_reference as tr

    def _boom(*a, **k):
        raise bench._Timeout()

    monkeypatch.setattr(tr, "torch_forward_lightweight", _boom)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    try:
        bench._cpu_baseline_throughput({})
    except bench._Timeout:
        pass
    else:
        raise AssertionError("_Timeout was swallowed")
