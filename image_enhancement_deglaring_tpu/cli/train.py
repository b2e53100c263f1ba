"""Training CLI (reference: optimized_train.py:35-60 flags and defaults)."""

from __future__ import annotations

import argparse
import os
import sys


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Train glare removal model")
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--output_dir", type=str, default="./models")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--lr", type=float, default=0.002362532125818593)
    p.add_argument("--val_split", type=float, default=0.2)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--save_every", type=int, default=10)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--model", type=str, default="basic",
                   choices=["basic", "enhanced", "optimized"])
    p.add_argument("--use_wandb", action="store_true")
    p.add_argument("--wandb_project", type=str, default="image-deglaring")
    p.add_argument("--wandb_entity", type=str, default=None,
                   help="W&B entity (team) name (reference: "
                        "optimized_train.py:50)")
    # reference-command compatibility (reference: optimized_train.py:51,
    # :58-59): AMP's TPU equivalent is bf16 compute, which is already the
    # default; prefetch_factor maps to the device-prefetch depth; the
    # threaded loader keeps workers alive between epochs regardless
    p.add_argument("--use_amp", action="store_true",
                   help="mixed precision = bf16 compute on TPU (the "
                        "default); conflicts with --compute_dtype float32")
    p.add_argument("--prefetch_factor", type=int, default=2,
                   help="batches decoded + transferred ahead of the step")
    p.add_argument("--persistent_workers", action="store_true",
                   help="accepted for reference-command compatibility (the "
                        "threaded loader is always persistent)")
    p.add_argument("--weight_decay", type=float, default=0.00006753784966611083)
    p.add_argument("--clip_grad_norm", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--log_images_every", type=int, default=5)
    p.add_argument("--image_size", type=int, default=512)
    p.add_argument("--validation_metrics_every", type=int, default=5)
    p.add_argument("--cache_images", action="store_true")
    p.add_argument("--augment", type=str, default="optimized",
                   choices=["optimized", "heavy", "none", "device"],
                   help="'device' runs the optimized stack ON TPU inside "
                        "the jitted train step (same distributions, "
                        "jax.random stream) — host workers only decode")
    # TPU-native additions
    p.add_argument("--resident_data", action="store_true",
                   help="cache the full decoded dataset in device HBM once "
                        "and run each epoch as ONE compiled dispatch "
                        "(on-device shuffle + augment + lax.scan over "
                        "steps); implies device-side augmentation "
                        "(--augment optimized auto-upgrades to device; "
                        "heavy is host-only and rejected)")
    p.add_argument("--resident_segments", type=int, default=8,
                   help="split each resident epoch into up to K scanned "
                        "dispatches with a preemption check between them: "
                        "SIGTERM drain latency is bounded by one segment "
                        "(~epoch/K) instead of the whole epoch; 1 = the "
                        "single-dispatch epoch (cost delta of K=8 measured "
                        "in docs/PERF.md)")
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"])
    p.add_argument("--n_devices", type=int, default=0,
                   help="data-parallel devices (0 = all local)")
    p.add_argument("--distributed", action="store_true",
                   help="multi-host: run jax.distributed.initialize before "
                        "backend init and train data-parallel over the "
                        "GLOBAL mesh (every chip of every host); launch "
                        "the same command on each host of the slice — "
                        "each feeds its slice of every batch, host 0 "
                        "writes checkpoints/logs")
    p.add_argument("--coordinator_address", type=str, default=None,
                   help="host:port of process 0 (TPU VMs auto-detect; "
                        "required off-pod, e.g. CPU multi-process)")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--resume", type=str, default=None,
                   help="checkpoint directory to resume from")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize blocks in backward (bigger batches)")
    p.add_argument("--watch_every", type=int, default=0,
                   help="log parameter histograms every N epochs (0 = off)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax profiler trace of the first epoch's "
                        "hot loop into this directory (TensorBoard-readable)")
    p.add_argument("--profile_steps", type=int, default=5,
                   help="number of train steps to trace when --profile_dir "
                        "is set")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.use_amp and args.compute_dtype == "float32":
        raise SystemExit("--use_amp requests mixed precision (bf16 on TPU) "
                         "but --compute_dtype float32 forbids it — drop one")
    if args.model != "basic" and args.remat:
        # only LightweightUNet implements block rematerialization; silently
        # dropping the flag would leave the user OOMing with the memory
        # knob they turned doing nothing. Checked before any data decode.
        raise SystemExit("--remat is supported only for --model basic")
    from ..utils.envfile import load_dotenv

    load_dotenv()  # reference parity: .env at train start (optimized_train.py:18-19)
    if args.distributed:
        # must run before the first backend touch (jax.devices etc.)
        from ..parallel import distributed

        distributed.initialize(coordinator_address=args.coordinator_address,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    elif any(a is not None for a in (args.coordinator_address,
                                     args.num_processes, args.process_id)):
        # without this, N pod hosts launched with explicit coordinator
        # flags but a forgotten --distributed would run N INDEPENDENT
        # trainings silently stomping one shared output_dir
        raise SystemExit(
            "--coordinator_address/--num_processes/--process_id require "
            "--distributed (refusing to fall back to an independent "
            "single-host run)")
    import jax.numpy as jnp

    from ..data import make_dataloaders
    from ..models import EnhancedUNet, LightweightUNet, OptimizedUNet, count_parameters
    from ..parallel import make_mesh
    from ..train import train_model
    from ..utils import ExperimentLogger, set_seed

    set_seed(args.seed)
    os.makedirs(args.output_dir, exist_ok=True)

    # --augment device: host workers only decode; the optimized stack runs
    # on TPU inside the jitted train step
    augment = args.augment
    if args.resident_data:
        if augment == "heavy":
            raise SystemExit("--resident_data caches raw pixels on device; "
                             "the heavy stack is host-only (cv2 warps/CLAHE)."
                             " Use --augment optimized|device|none.")
        if augment == "optimized":
            print("--resident_data: running the optimized augmentation "
                  "stack on device (same distributions, jax.random stream)")
            augment = "device"
    device_augment = augment == "device"
    train_loader, val_loader = make_dataloaders(
        args.data_dir, batch_size=args.batch_size, val_split=args.val_split,
        seed=args.seed, image_size=args.image_size, num_workers=args.num_workers,
        cache_images=args.cache_images,
        augment="none" if device_augment else augment,
    )
    print(f"Training samples: {train_loader.num_samples}, "
          f"Validation samples: {val_loader.num_samples}")

    dtype = jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32
    if args.model == "enhanced":
        model = EnhancedUNet(dtype=dtype)
    elif args.model == "optimized":
        model = OptimizedUNet(dtype=dtype)
    else:
        model = LightweightUNet(dtype=dtype, remat=args.remat)

    import jax

    if args.distributed:
        # surface what the runtime actually resolved to — a failed
        # auto-detect initialize leaves process_count()==1 on EVERY host
        # of a pod, and N independent "distributed" trainings silently
        # stomping one shared output_dir is far worse than a loud warning
        print(f"Distributed runtime: {jax.process_count()} process(es), "
              f"{len(jax.devices())} global device(s)")
        if jax.process_count() == 1:
            print("WARNING: --distributed resolved to a SINGLE process. "
                  "If this is one host of a pod, the coordinator was not "
                  "detected — pass --coordinator_address/--num_processes/"
                  "--process_id explicitly (explicit arguments fail loudly "
                  "instead of degrading).", file=sys.stderr)
    if args.distributed and jax.process_count() > 1:
        if args.n_devices:
            raise SystemExit("--distributed spans the global mesh; "
                             "--n_devices applies to single-host runs only")
        n_dev = len(jax.devices())
        mesh = make_mesh()  # every chip of every host
        if args.batch_size % n_dev != 0:
            raise SystemExit(f"--batch_size {args.batch_size} (global) must "
                             f"divide by {n_dev} global devices")
        if not args.resident_data:
            # each host feeds its slice of every (identically-seeded) batch
            from ..parallel.distributed import LocalSliceLoader

            train_loader = LocalSliceLoader(train_loader)
            val_loader = LocalSliceLoader(val_loader)
        # resident: loaders stay GLOBAL — cache_on_device decodes only this
        # host's rows and assembles the sharded HBM cache across processes
        # (train.resident._cache_multiprocess)
    else:
        # make_mesh truncates to the devices that actually exist, so clamp
        # the request before validating against it — checking the raw
        # --n_devices would reject batch sizes the real mesh shards fine
        # (and vice versa)
        n_dev = min(args.n_devices or len(jax.devices()), len(jax.devices()))
        mesh = make_mesh(n_dev) if n_dev > 1 else None
        if args.n_devices and args.n_devices > len(jax.devices()):
            print(f"requested --n_devices {args.n_devices}, but only "
                  f"{len(jax.devices())} available; using {n_dev}")
        if mesh is not None and args.batch_size % n_dev != 0:
            raise SystemExit(f"--batch_size {args.batch_size} must divide by "
                             f"{n_dev} devices")

    # host 0 owns the metrics stream (same rationale as checkpoint writes:
    # N hosts appending to one shared logs/ would interleave duplicates)
    logger = ExperimentLogger(
        os.path.join(args.output_dir, "logs"), use_wandb=args.use_wandb,
        project=args.wandb_project, entity=args.wandb_entity,
        config=vars(args),
    ) if jax.process_index() == 0 else None

    from ..train.preempt import PreemptionGuard

    guard = PreemptionGuard()
    with guard:
        best_params, best_model_state, best_val, _state = train_model(
            model, train_loader, val_loader, epochs=args.epochs, lr=args.lr,
            weight_decay=args.weight_decay, clip_grad_norm=args.clip_grad_norm,
            patience=args.patience, output_dir=args.output_dir,
            save_every=args.save_every,
            validation_metrics_every=args.validation_metrics_every,
            log_images_every=args.log_images_every, mesh=mesh, seed=args.seed,
            logger=logger, resume_from=args.resume, watch_every=args.watch_every,
            profile_dir=args.profile_dir, profile_steps=args.profile_steps,
            device_augment=device_augment, resident=args.resident_data,
            prefetch=args.prefetch_factor, preempt_guard=guard,
            resident_segments=args.resident_segments,
        )
    if guard.preempt_checkpoint is not None:
        # the exact-resume checkpoint is on disk (collective write inside
        # train_model); skip the final_model/weights work — the preemption
        # grace window may not cover it — and exit 0 so the orchestrator
        # treats this as a clean drain, not a crash. Gated on the
        # checkpoint actually existing, NOT guard.triggered: a signal
        # landing during the early-stopping epoch's validation/teardown
        # returns through the patience path without writing one, and
        # training is then COMPLETE — the final artifacts must be saved
        if logger is not None:
            logger.finish()
        print("Training preempted; resume with --resume "
              f"{guard.preempt_checkpoint}", flush=True)
        return

    from ..train import save_checkpoint

    # best_model_state carries the matching mutable collections (BatchNorm
    # batch_stats for EnhancedUNet) — final_model must stay loadable.
    # save_checkpoint is collective on multi-host (all processes call it;
    # orbax writes from the primary only)
    save_checkpoint(os.path.join(args.output_dir, "final_model"),
                    params=best_params, model_state=best_model_state or None,
                    val_loss=best_val)
    if jax.process_index() == 0:
        import numpy as np

        from ..utils.pytree import flatten_tree

        weights_tree = ({"params": best_params,
                         "batch_stats": best_model_state["batch_stats"]}
                        if best_model_state and "batch_stats" in best_model_state
                        else best_params)
        np.savez(os.path.join(args.output_dir, "model_weights.npz"),
                 **flatten_tree(weights_tree))
    from ..models import get_model_size_mb

    size_mb = get_model_size_mb(best_params)
    print(f"Training completed. Best validation loss: {best_val:.4f}")
    print(f"Final model size: {size_mb:.2f} MB "
          f"({count_parameters(best_params):,} parameters)")
    if logger is not None:
        logger.finish()


if __name__ == "__main__":
    main()
