"""Sweep CLI (reference: sweep.py:23-38 flags; search space sweep.py:54-88)."""

from __future__ import annotations

import argparse


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Run a hyperparameter sweep for glare removal model")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./models")
    p.add_argument("--sweep_count", type=int, default=20)
    p.add_argument("--val_split", type=float, default=0.2)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--max_epochs", type=int, default=50)
    p.add_argument("--early_stop_patience", type=int, default=10,
                   help="retire a trial after this many epochs without val "
                        "improvement (reference sweep.py:35 passes the same "
                        "patience into every trial's train_model); 0 = off")
    p.add_argument("--early_stop_min_iter", type=int, default=10,
                   help="Hyperband min_iter (reference sweep.py:51)")
    p.add_argument("--eta", type=int, default=3,
                   help="successive-halving keep ratio (Hyperband eta)")
    p.add_argument("--parallel_trials", type=int, default=0,
                   help="cap trials per vmapped group (0 = whole group)")
    p.add_argument("--halving", type=str, default="compact",
                   choices=["compact", "mask"],
                   help="successive-halving mode: compact shrinks the "
                        "trial axis (recompiles each rung); mask keeps "
                        "shapes static (zero rung recompiles, dead slots "
                        "keep computing) — prefer mask when compiles "
                        "dominate (remote compile, short rungs)")
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--method", type=str, default="tpe",
                   choices=["tpe", "random", "wandb"],
                   help="tpe/random: local proposals, trials vmapped "
                        "lock-step across chips, works air-gapped, "
                        "journal+--resume for preemption. wandb: the W&B "
                        "SERVER proposes every trial (wandb.agent, "
                        "reference sweep semantics) — sequential trials, "
                        "requires network + auth; rejoin a crashed sweep "
                        "with --wandb_sweep_id")
    p.add_argument("--wandb_sweep_id", type=str, default=None,
                   help="with --method wandb: attach to this existing "
                        "server-side sweep instead of registering a new "
                        "one (the reference's agent-rejoin story, "
                        "sweep.py:241)")
    # the reference's train_sweep builds any of the three families from the
    # sweep config (reference: sweep.py:135-143; fixed to 'basic' at :86)
    p.add_argument("--model", type=str, default="basic",
                   choices=["basic", "enhanced", "optimized"],
                   help="architecture every trial trains (reference fixes "
                        "'basic'; 'enhanced' sweeps BatchNorm stats + "
                        "dropout per trial)")
    p.add_argument("--cache_images", action="store_true")
    p.add_argument("--resident_data", action="store_true",
                   help="decode the dataset once, keep it in device HBM "
                        "for the whole sweep, and run every trial-group "
                        "epoch as ONE compiled dispatch (on-device "
                        "shuffle + augmentation + lax.scan over steps); "
                        "the optimized augmentation stack runs on device")
    p.add_argument("--n_devices", type=int, default=0,
                   help="trial-parallel devices (0 = all local)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: run jax.distributed.initialize before "
                        "backend init and shard the vmapped trial axis "
                        "over the GLOBAL mesh (every chip of every host — "
                        "one trial per chip); launch the same command on "
                        "each host of the slice. Every host loads the "
                        "same data (trial groups replicate it); host 0 "
                        "writes results/artifacts")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (TPU VMs auto-detect; "
                        "required off-pod, e.g. CPU multi-process)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    # the reference's sweep fixes mixed_precision ON for every trial
    # (reference: sweep.py:80-87); bf16 compute is the TPU equivalent
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="trial compute dtype; params/optimizer stay f32 "
                        "(AMP semantics, the reference sweep's fixed "
                        "mixed_precision=true)")
    # the reference's sweep lives inside W&B (reference: sweep.py:231-241);
    # mirroring is opt-in here and degrades to local JSONL without network
    p.add_argument("--use_wandb", action="store_true",
                   help="mirror each finished trial to W&B as its own run")
    # --sweep_project/--sweep_entity are the reference's flag names
    # (reference: sweep.py:28-29); --wandb_* match our train CLI. The
    # default matches the reference's, so a migrating user relying on it
    # lands in the same W&B project (reference: sweep.py:28)
    p.add_argument("--wandb_project", "--sweep_project", type=str,
                   default="image-deglaring-sweep")
    p.add_argument("--wandb_entity", "--sweep_entity", type=str, default=None,
                   help="W&B entity (team) for mirrored trial runs")
    # loader-compatibility flags (reference: sweep.py:36-37): prefetch maps
    # to the DevicePrefetcher depth; the threaded loader keeps its workers
    # alive between epochs regardless, so persistent_workers is a no-op
    p.add_argument("--prefetch_factor", type=int, default=2,
                   help="device-prefetch depth per trial group")
    p.add_argument("--persistent_workers", action="store_true",
                   help="accepted for reference-command compatibility (the "
                        "threaded loader is always persistent)")
    p.add_argument("--resume", type=str, default=None, metavar="SWEEP_DIR",
                   help="continue a preempted sweep: pass its output dir "
                        "(the one holding sweep_journal.jsonl) along with "
                        "the SAME flags as the original run. Finished "
                        "trial groups restore from the journal without "
                        "retraining; the rest run live — the completed "
                        "sweep is identical to an uninterrupted one "
                        "(the W&B server's persistent-sweep analogue, "
                        "reference: sweep.py:231-241)")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.resume is not None:
        # the journal lives in the sweep's output dir; resuming INTO a
        # different dir would split the journal from the artifacts it
        # indexes (best_trial_params.npz), so --resume pins output_dir
        args.output_dir = args.resume
    if args.distributed:
        # must run before the first backend touch (jax.devices etc.)
        from ..parallel import distributed

        distributed.initialize(coordinator_address=args.coordinator_address,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    elif any(a is not None for a in (args.coordinator_address,
                                     args.num_processes, args.process_id)):
        # same guard as cli.train: explicit coordinator flags without
        # --distributed would run N INDEPENDENT sweeps stomping one
        # shared output_dir
        raise SystemExit(
            "--coordinator_address/--num_processes/--process_id require "
            "--distributed (refusing to fall back to an independent "
            "single-host sweep)")
    import jax

    from ..data import make_dataloaders
    from ..models import EnhancedUNet, LightweightUNet, OptimizedUNet
    from ..parallel import make_mesh, run_sweep
    from ..utils import ExperimentLogger, set_seed

    set_seed(args.seed)
    if args.distributed:
        import sys

        print(f"Distributed runtime: {jax.process_count()} process(es), "
              f"{len(jax.devices())} global device(s)")
        if jax.process_count() == 1:
            print("WARNING: --distributed resolved to a SINGLE process. "
                  "If this is one host of a pod, pass "
                  "--coordinator_address/--num_processes/--process_id "
                  "explicitly.", file=sys.stderr)
    if args.distributed and jax.process_count() > 1:
        if args.n_devices:
            raise SystemExit("--distributed spans the global mesh; "
                             "--n_devices applies to single-host runs only")
        # trial axis shards over every chip of every host — trial counts
        # pad up to the global device count inside VmappedTrialGroup
        mesh = make_mesh()
    else:
        # clamp like cli.train: make_mesh truncates to the devices that
        # exist, so a silently smaller mesh would leave the operator
        # believing more trial parallelism is active than is
        avail = len(jax.devices())
        n_dev = min(args.n_devices or avail, avail)
        if args.n_devices and args.n_devices > avail:
            print(f"requested --n_devices {args.n_devices}, but only "
                  f"{avail} available; using {n_dev}")
        mesh = make_mesh(n_dev) if n_dev > 1 else None

    loaders_cache = {}

    # --resident_data: host loaders only decode (augment='none'); the
    # optimized augmentation stack runs on device inside the scanned epoch
    augment_fn = None
    if args.resident_data:
        from ..ops.augment_device import device_augment_batch

        augment_fn = device_augment_batch

    def loader_factory(batch_size):
        if batch_size not in loaders_cache:
            loaders_cache[batch_size] = make_dataloaders(
                args.data_dir, batch_size=batch_size, val_split=args.val_split,
                seed=args.seed, image_size=args.image_size,
                num_workers=args.num_workers, cache_images=args.cache_images,
                augment="none" if args.resident_data else "optimized",
            )
        return loaders_cache[batch_size]

    # host 0 owns all telemetry (every host computes identical results;
    # N hosts each mirroring N runs would duplicate every trial in W&B)
    is_host0 = jax.process_index() == 0
    wandb_mirror = None
    if args.use_wandb and is_host0:
        try:
            from ..parallel.sweep import WandbSweepMirror

            wandb_mirror = WandbSweepMirror(project=args.wandb_project,
                                            entity=args.wandb_entity)
        except Exception as e:  # wandb missing/unconfigured: JSONL only
            print(f"wandb unavailable ({e}); sweep telemetry stays local")

    logger = (ExperimentLogger(f"{args.output_dir}/sweep_logs",
                               config=vars(args)) if is_host0 else None)
    import jax.numpy as jnp

    # restrict sampled batch sizes to those the train split can actually
    # fill: a sampled bs > split size would train ZERO steps per epoch
    # (drop_last), which make_dataloaders now rejects — filter the space
    # up front instead of crashing mid-sweep
    from ..data.pipeline import list_image_paths, seeded_split
    from ..parallel.sweep import SearchSpace

    n_train = len(seeded_split(list_image_paths(args.data_dir),
                               args.val_split, args.seed)[0])
    space = SearchSpace()
    usable = tuple(b for b in space.batch_sizes if b <= n_train)
    if not usable:
        raise SystemExit(
            f"train split has only {n_train} images — below the smallest "
            f"sweep batch size {min(space.batch_sizes)}")
    if usable != space.batch_sizes:
        print(f"Note: train split has {n_train} images; restricting sweep "
              f"batch sizes to {usable}")
        space = SearchSpace(batch_sizes=usable)

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    ctor = {"basic": LightweightUNet, "enhanced": EnhancedUNet,
            "optimized": OptimizedUNet}[args.model]

    if args.method == "wandb":
        # online controller: the W&B server proposes each trial and owns
        # early termination (reference semantics; sequential trials —
        # see docs/PARITY.md for the tradeoff vs local lock-step groups)
        if args.distributed:
            raise SystemExit("--method wandb runs trials sequentially from "
                             "server proposals; it does not compose with "
                             "--distributed (use --method tpe for "
                             "multi-host lock-step sweeps)")
        if args.resume:
            raise SystemExit("--method wandb sweeps resume SERVER-side: "
                             "rerun with --wandb_sweep_id <id> instead of "
                             "--resume")
        from ..parallel.sweep import run_wandb_agent_sweep

        try:
            result = run_wandb_agent_sweep(
                lambda: ctor(dtype=dtype), loader_factory,
                n_trials=args.sweep_count, max_epochs=args.max_epochs,
                min_iter=args.early_stop_min_iter, eta=args.eta,
                seed=args.seed, mesh=mesh, output_dir=args.output_dir,
                space=space, logger=logger,
                project=args.wandb_project, entity=args.wandb_entity,
                early_stop_patience=args.early_stop_patience,
                prefetch=args.prefetch_factor,
                sweep_id=args.wandb_sweep_id,
            )
        except Exception as e:
            raise SystemExit(
                f"--method wandb needs a reachable, authenticated W&B "
                f"server ({type(e).__name__}: {e}). Air-gapped or "
                f"offline, use --method tpe — same Bayesian family, "
                f"local proposals, trials vmapped across chips.")
        best = result["best"]
        print(f"Sweep {result['sweep_id']} completed (server-driven). "
              + ("No trial reached a finite validation loss"
                 if best is None else
                 f"Best trial: id={best['trial_id']} "
                 f"batch_size={best['batch_size']} lr={best['lr']:.6g} "
                 f"wd={best['wd']:.6g} "
                 f"val_loss={best['best_val_loss']:.4f}"))
        return

    from ..train.preempt import PreemptionGuard

    guard = PreemptionGuard()
    # result-determining flags beyond the schedule (which run_sweep pins
    # itself): a --resume with any of these drifted would otherwise mix
    # incomparable restored/live trial results silently
    import os as _os

    fingerprint = {
        "model": args.model,
        "data_dir": _os.path.abspath(args.data_dir),
        "image_size": args.image_size,
        "val_split": args.val_split,
        "compute_dtype": args.compute_dtype,
        "resident_data": bool(args.resident_data),
        "cache_images": bool(args.cache_images),
    }
    with guard:
        result = run_sweep(
            lambda: ctor(dtype=dtype), loader_factory,
            n_trials=args.sweep_count,
            max_epochs=args.max_epochs, min_iter=args.early_stop_min_iter,
            eta=args.eta, method=args.method, seed=args.seed, mesh=mesh,
            output_dir=args.output_dir, logger=logger, space=space,
            max_parallel_trials=args.parallel_trials,
            wandb_mirror=wandb_mirror,
            resident=args.resident_data, augment_fn=augment_fn,
            halving=args.halving,
            early_stop_patience=args.early_stop_patience,
            prefetch=args.prefetch_factor,
            preempt_guard=guard, resume=args.resume is not None,
            fingerprint=fingerprint,
        )
    if result.get("preempted"):
        # exit 0: a drained preemption is a clean stop, not a failure
        # (same contract as cli.train's SIGTERM drain)
        print(f"Sweep preempted: {len(result['trials'])} finished trial(s) "
              f"journaled in {args.output_dir}/sweep_journal.jsonl — "
              f"continue with the same flags plus --resume {args.output_dir}")
        return
    best = result["best"]
    if best is None:
        print("Sweep completed. No trial reached a finite validation loss "
              "(all diverged); see sweep_results.json")
        return
    print(f"Sweep completed. Best trial: id={best['trial_id']} "
          f"batch_size={best['batch_size']} lr={best['lr']:.6g} "
          f"wd={best['wd']:.6g} val_loss={best['best_val_loss']:.4f}")


if __name__ == "__main__":
    main()
