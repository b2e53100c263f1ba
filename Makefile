# Developer entry points.

.PHONY: test test-fast bench demo serve evaluate e2e e2e-tpu graft-check lint clean

test:
	python -m pytest tests/ -q

test-fast:
	python -m pytest tests/ -q -m "not slow"

# One-command lifecycle rehearsal (CPU, ~7 min): data gen -> validate ->
# sweep -> train best config -> ONNX export -> eval parity -> promotion
# gate -> serve -> API tests -> frontend proxy -> SIGTERM drain.
# e2e-tpu runs the same flow on the real chip (hardware-proven round 5;
# per-stage timings in docs/PERF.md). The day real SD1 appears: point the
# script at it.
e2e:
	python scripts/e2e_lifecycle.py

e2e-tpu:
	python scripts/e2e_lifecycle.py --tpu

bench:
	python bench.py

demo:
	python scripts/train_synthetic_demo.py

serve:
	python -m image_enhancement_deglaring_tpu.cli.serve

evaluate:
	python -m image_enhancement_deglaring_tpu.cli.evaluate \
	    --model_path deploy/models/best_model.onnx --data_dir SD1/val

graft-check:
	python -c "from __graft_entry__ import entry; import jax; fn, a = entry(); print(jax.jit(fn)(*a).shape)"
	python -c "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"

clean:
	rm -rf tests/.jax_cache .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
