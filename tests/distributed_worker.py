"""Subprocess body for the 2-process multi-host test (test_distributed.py).

Each process is one "host" of a 2-host slice: 4 virtual CPU devices each,
8 global. Runs a real `train_model` data-parallel over the GLOBAL mesh
with this host feeding its slice of every batch, then dumps the outcome
as JSON for the parent test to compare against a single-process run.

Launched as:  python distributed_worker.py <rank> <port> <out.json> <ckpt_dir>
with env JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=4
(and WITHOUT the axon sitecustomize on PYTHONPATH, so the env vars hold).
"""

import json
import sys

import numpy as np


def main() -> None:
    rank, port, out_path, ckpt_dir = (int(sys.argv[1]), sys.argv[2],
                                      sys.argv[3], sys.argv[4])
    import jax

    jax.config.update("jax_platforms", "cpu")

    from image_enhancement_deglaring_tpu.models import LightweightUNet
    from image_enhancement_deglaring_tpu.parallel import distributed
    from image_enhancement_deglaring_tpu.train.loop import train_model
    from tests.loaders import ArrayLoader

    distributed.initialize(f"localhost:{port}", 2, rank)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 8, len(jax.devices())
    mesh = distributed.global_mesh()

    # identical data/loaders on every host (seeded) — the multi-host input
    # contract; each host then slices its half of every global batch
    rng = np.random.default_rng(0)
    y = rng.random((16, 32, 32, 1)).astype(np.float32)
    x = np.clip(y + rng.normal(0, 0.15, y.shape), 0, 1).astype(np.float32)
    train = distributed.LocalSliceLoader(ArrayLoader(x[:8], y[:8], 8))
    val = distributed.LocalSliceLoader(ArrayLoader(x[8:], y[8:], 8))

    best_params, _, best_val, state = train_model(
        LightweightUNet(), train, val, epochs=2, lr=1e-3,
        output_dir=ckpt_dir, save_every=100, progress=False, mesh=mesh,
    )
    leaves = jax.tree_util.tree_leaves(best_params)
    out = {
        "rank": rank,
        "best_val": float(best_val),
        "param_abs_sum": float(sum(np.abs(np.asarray(l)).sum()
                                   for l in leaves)),
        "n_leaves": len(leaves),
        "step": int(np.asarray(state.step)),
    }

    # --- phase 2: resume with HOST-DIVERGENT paths. Rank 0's output_dir
    # holds the phase-1 best_model; rank 1's is empty AND rank 1's
    # resume_from points at a dir that does not exist (the "checkpoints
    # live on host-local disk" scenario). Host 0 is the only reader for
    # BOTH the checkpoint restore and the best-val bar; everything else
    # arrives by broadcast — a per-host read would crash rank 1 here and
    # desynchronize early stopping in general. epochs == the resumed
    # epoch count, so the loop body never runs and the returned values
    # ARE the seeded bar.
    resume_out = ckpt_dir if rank == 0 else ckpt_dir + "_rank1_localdisk"
    resume_src = (ckpt_dir if rank == 0
                  else ckpt_dir + "_missing_on_rank1") + "/best_model"
    r_params, _, r_best_val, _ = train_model(
        LightweightUNet(), train, val, epochs=2, lr=1e-3,
        output_dir=resume_out, save_every=100, progress=False, mesh=mesh,
        resume_from=resume_src,
    )
    out["resume_best_val"] = float(r_best_val)
    out["resume_param_abs_sum"] = float(
        sum(np.abs(np.asarray(l)).sum()
            for l in jax.tree_util.tree_leaves(r_params)))

    # --- phase 3: resume from a checkpoint that exists NOWHERE. Every
    # rank must raise the SAME loud error (host 0 broadcasts its failure)
    # instead of rank-local crashes that leave the others hanging in the
    # next collective.
    try:
        train_model(
            LightweightUNet(), train, val, epochs=2, lr=1e-3,
            output_dir=resume_out, save_every=100, progress=False,
            mesh=mesh, resume_from=ckpt_dir + "_nowhere/best_model",
        )
        out["resume_missing_err"] = ""
    except RuntimeError as e:
        out["resume_missing_err"] = str(e)

    # --- phase 4: resident + distributed (HBM-cached epochs over the
    # global mesh). The train loader exposes an indexable dataset, so each
    # host decodes ONLY its own rows of the padded cache; the val loader
    # does not, exercising the drain-and-slice fallback. Loaders are
    # GLOBAL (not host-sliced) — the cache assembly does the splitting.
    class _DS:
        augment = "none"

        def __init__(self, a, b):
            self.a, self.b = a, b

        def __len__(self):
            return len(self.a)

        def __getitem__(self, i):
            return self.a[i], self.b[i]

    train_res = ArrayLoader(x[:8], y[:8], 8)
    train_res.dataset = _DS(x[:8], y[:8])
    res_params, _, res_best, res_state = train_model(
        LightweightUNet(), train_res, ArrayLoader(x[8:], y[8:], 8),
        epochs=2, lr=1e-3, output_dir=ckpt_dir + "_res", save_every=100,
        progress=False, mesh=mesh, resident=True,
    )
    out["resident_best_val"] = float(res_best)
    out["resident_param_abs_sum"] = float(
        sum(np.abs(np.asarray(l)).sum()
            for l in jax.tree_util.tree_leaves(res_params)))
    out["resident_step"] = int(np.asarray(res_state.step))

    # --- phase 5: host-uniform preemption agreement — a signal landing on
    # ONE host must stop BOTH (the checkpoint write is collective)
    from image_enhancement_deglaring_tpu.train.preempt import (
        preemption_agreed,
    )

    out["preempt_agree_one_host"] = bool(preemption_agreed(rank == 1))
    out["preempt_agree_none"] = bool(preemption_agreed(False))

    # --- phase 6: multi-host sweep fan-out — the vmapped trial axis
    # shards over the GLOBAL mesh (one trial slot per chip across hosts),
    # every host feeds the same replicated data, halving is forced to mask
    # mode, and host 0 alone writes the results file / best-params npz
    import os

    from image_enhancement_deglaring_tpu.parallel import run_sweep
    from image_enhancement_deglaring_tpu.parallel.sweep import SearchSpace

    def sweep_loaders(bs):
        return ArrayLoader(x[:8], y[:8], bs), ArrayLoader(x[8:], y[8:], bs)

    sweep_dir = ckpt_dir + f"_sweep_r{rank}"  # per-rank dir: gating visible
    sres = run_sweep(
        LightweightUNet, sweep_loaders, n_trials=4, max_epochs=2,
        min_iter=1, eta=2, method="random", seed=5, mesh=mesh,
        output_dir=sweep_dir, space=SearchSpace(batch_sizes=(8,)))
    out["sweep_best_id"] = sres["best"]["trial_id"]
    out["sweep_best_val"] = sres["best"]["best_val_loss"]
    out["sweep_vals"] = [t["best_val_loss"] for t in sres["trials"]]
    out["sweep_wrote_results"] = os.path.exists(
        os.path.join(sweep_dir, "sweep_results.json"))
    out["sweep_wrote_params"] = os.path.exists(
        os.path.join(sweep_dir, "best_trial_params.npz"))

    # --- phase 7: preempted multi-host sweep -> journal exists on HOST 0
    # ONLY (per-rank dirs) -> resume must broadcast the journal bytes from
    # host 0 (_journal_bytes_all_hosts) so both hosts replay the same
    # restored history, and complete identically to an uninterrupted run
    class _Trig:
        # flips after n checks; both ranks count identically (same loop),
        # and preemption_agreed makes the decision collective anyway
        def __init__(self, n):
            self.n, self.c = n, 0

        @property
        def triggered(self):
            self.c += 1
            return self.c > self.n

    res_kw = dict(n_trials=2, max_epochs=1, min_iter=1, eta=2,
                  method="random", seed=7, mesh=mesh,
                  max_parallel_trials=1,
                  space=SearchSpace(batch_sizes=(8,)))
    full = run_sweep(LightweightUNet, sweep_loaders,
                     output_dir=ckpt_dir + f"_swfull_r{rank}", **res_kw)
    pre_dir = ckpt_dir + f"_swpre_r{rank}"
    # per-group checks with max_epochs=1: 1 between-groups + 1 epoch
    # boundary = 2; n=3 survives group 1 and trips inside group 2
    pre = run_sweep(LightweightUNet, sweep_loaders, output_dir=pre_dir,
                    preempt_guard=_Trig(3), **res_kw)
    out["swres_preempted"] = pre["preempted"]
    out["swres_pre_trials"] = len(pre["trials"])
    out["swres_journal_local"] = os.path.exists(
        os.path.join(pre_dir, "sweep_journal.jsonl"))  # host 0 only
    res = run_sweep(LightweightUNet, sweep_loaders, output_dir=pre_dir,
                    resume=True, **res_kw)
    out["swres_resumed_matches_full"] = (res["trials"] == full["trials"]
                                         and res["best"] == full["best"])
    out["swres_results_written"] = os.path.exists(
        os.path.join(pre_dir, "sweep_results.json"))  # host 0 only
    with open(out_path, "w") as f:
        json.dump(out, f)


if __name__ == "__main__":
    main()
