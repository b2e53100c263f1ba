# Developer entry points.

.PHONY: test bench demo serve evaluate graft-check lint clean

test:
	python -m pytest tests/ -q

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
