"""Training CLI.

Implements — for real — the argparse surface the reference README documents
but its scripts don't implement (``/root/reference/README.md:44-65`` vs the
hard-coded opt dicts at ``train.py:31-50``): ``--dataset --model_size
--batch_size``, with ``--gpu_id`` generalised to ``--num_chips`` (a data
mesh over ICI instead of CUDA_VISIBLE_DEVICES).

Training semantics follow ``/root/reference/train.py:127-183``: epoch loop,
per-epoch validation PSNR on the uint8 grid, best + every-50-epochs
checkpoints, text log + TensorBoard scalars.
"""

from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from bayer_low_light_image_enhancement_tpu.core.mesh import create_mesh
from bayer_low_light_image_enhancement_tpu.data import (
    Loader,
    MCRDataset,
    SIDDataset,
    SyntheticBayerDataset,
    discover_sid_pairs,
    prefetch_to_device,
)
from bayer_low_light_image_enhancement_tpu.models.rawformer import (
    RawFormer,
    RawFormerConfig,
)
from bayer_low_light_image_enhancement_tpu.train.checkpoint import (
    BestTracker,
    CheckpointManager,
)
from bayer_low_light_image_enhancement_tpu.train.trainer import TrainConfig, Trainer
from bayer_low_light_image_enhancement_tpu.utils.logging import MetricsLogger


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Train RawFormer on SID/MCR (TPU)")
    p.add_argument("--dataset", default="SID", choices=["SID", "MCR", "synthetic"])
    p.add_argument("--model_size", default="S", choices=["S", "B", "L"])
    p.add_argument(
        "--model",
        default=None,
        help="registry model name (e.g. rawformer_wfb, flca_rawformer); "
        "overrides --model_size. See list_models().",
    )
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--patch_size", type=int, default=512)
    p.add_argument("--epochs", type=int, default=3000)
    p.add_argument("--base_lr", type=float, default=1e-4)
    p.add_argument("--loss", default="charbonnier", choices=["charbonnier", "l1", "mse", "sid_color"])
    p.add_argument("--num_chips", type=int, default=-1, help="-1 = all devices")
    p.add_argument(
        "--tensor_chips",
        type=int,
        default=1,
        help="tensor-parallel degree: Megatron column/row sharding of the "
        "transformer blocks over a `tensor` mesh axis (parallel/tensor.py); "
        "composes with data parallelism (num_chips counts data-parallel "
        "groups)",
    )
    p.add_argument("--data_root", default=".")
    p.add_argument("--cache_dir", default=None, help="decoded-ARW npz cache")
    p.add_argument("--save_dir", default="result")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--fp32", action="store_true", help="disable bf16 compute")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--remat", action="store_true", help="rematerialise forward in backward")
    p.add_argument(
        "--no_fused_train",
        action="store_true",
        help="disable the fused Pallas TransformerBlock forward+backward in "
        "training (default on for bf16 TPU training: 1.4x step time, "
        "BENCHMARKS.md)",
    )
    p.add_argument("--val_every", type=int, default=1)
    p.add_argument("--save_every", type=int, default=50)
    p.add_argument(
        "--loader",
        default="auto",
        choices=["auto", "python", "native"],
        help="training batch producer: the C++ engine (csrc/) when the "
        "dataset is RAM-resident, or the Python thread-pool Loader",
    )
    p.add_argument(
        "--device_prefetch",
        type=int,
        default=2,
        help="batches staged on device ahead of the step (0 = synchronous)",
    )
    p.add_argument(
        "--no_compact_h2d",
        action="store_true",
        help="ship fp32 batches instead of the 16-bit compact transfer "
        "(uint16 mosaic codes + ratio + uint16 GT decoded on device; "
        "native loader only)",
    )
    return p


def build_train_loader(args, train_ds):
    """Pick the batch producer: native C++ engine when possible.

    Returns (loader, kind). The native path replaces the reference's
    16-worker DataLoader (``/root/reference/train.py:99``) with one
    multithreaded C++ crop/flip/normalise/gather pass per batch.
    """
    if args.loader in ("auto", "native"):
        from bayer_low_light_image_enhancement_tpu.data.native import (
            NativeLoader,
            sampler_for_dataset,
        )

        compact = not getattr(args, "no_compact_h2d", False)
        sampler = sampler_for_dataset(train_ds, seed=args.seed, compact=compact)
        if sampler is not None:
            return (
                NativeLoader(train_ds, sampler, args.batch_size, seed=args.seed),
                "native (compact 16-bit H2D)" if compact else "native",
            )
        if args.loader == "native":
            raise SystemExit(
                "--loader native: the C++ engine is unavailable for this "
                "dataset (needs a compiler and a RAM-resident training split)"
            )
    return Loader(train_ds, args.batch_size, shuffle=True, seed=args.seed), "python"


def build_datasets(args):
    if args.dataset == "SID":
        tr_s, tr_l = discover_sid_pairs(args.data_root, "train")
        te_s, te_l = discover_sid_pairs(args.data_root, "test")
        train = SIDDataset(tr_s, tr_l, args.patch_size, True, args.cache_dir)
        val = SIDDataset(te_s, te_l, args.patch_size, False, args.cache_dir)
    elif args.dataset == "MCR":
        root = args.data_root
        paths = np.load(
            f"{root}/Mono_Colored_RAW_Paired_DATASET/random_path_list/train/train_c_path.npy",
            allow_pickle=True,
        ).tolist()
        rgbs = np.load(
            f"{root}/Mono_Colored_RAW_Paired_DATASET/random_path_list/train/train_rgb_path.npy",
            allow_pickle=True,
        ).tolist()
        te_paths = np.load(
            f"{root}/Mono_Colored_RAW_Paired_DATASET/random_path_list/test/test_c_path.npy",
            allow_pickle=True,
        ).tolist()
        te_rgbs = np.load(
            f"{root}/Mono_Colored_RAW_Paired_DATASET/random_path_list/test/test_rgb_path.npy",
            allow_pickle=True,
        ).tolist()
        train = MCRDataset(paths, rgbs, args.patch_size, True)
        val = MCRDataset(te_paths, te_rgbs, args.patch_size, False)
    else:
        train = SyntheticBayerDataset(
            num_images=16, full_size=(args.patch_size * 2, args.patch_size * 2 + 64),
            patch_size=args.patch_size, training=True,
        )
        val = SyntheticBayerDataset(
            num_images=4, full_size=(args.patch_size, args.patch_size),
            patch_size=args.patch_size, training=False, seed=1,
        )
    return train, val


def build_model(args):
    import jax.numpy as jnp

    dtype = jnp.float32 if getattr(args, "fp32", False) else jnp.bfloat16
    if getattr(args, "model", None):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.models.registry import is_raw_domain

        if is_raw_domain(args.model):
            raise SystemExit(
                f"model {args.model!r} is an enhancement-domain model "
                "(packed Bayer planes -> enhanced planes, [B,H,W,4] -> "
                "[B,H,W,4]); the RAW->RGB train/eval protocol does not "
                "apply — the reference only smoke-tests these "
                "(Transformer_FLCA_UNet.py:265-273). Use a RAW->RGB model "
                "or drive it via the Python API."
            )
        import jax

        if (
            jax.default_backend() == "tpu"
            and not getattr(args, "no_fused_train", False)
            and not getattr(args, "fp32", False)
        ):
            # Fused Pallas selective scan in TRAINING too: the scan has a
            # custom-VJP Pallas backward (kernels/ssm_scan.py), so SSM
            # models (WFB) train through the fused path. Same opt-out flag
            # as the fused TransformerBlock.
            try:
                return get_model(args.model, dtype=dtype, ssm_pallas=True)
            except TypeError:
                pass
        return get_model(args.model, dtype=dtype)
    return RawFormer(RawFormerConfig.from_size(args.model_size, dtype=dtype))


def main(argv=None):
    import jax.numpy as jnp

    args = build_parser().parse_args(argv)

    train_ds, val_ds = build_datasets(args)
    train_loader, loader_kind = build_train_loader(args, train_ds)
    print(f"training batch producer: {loader_kind}")
    val_loader = Loader(val_ds, min(args.batch_size, len(val_ds)), shuffle=False, drop_last=False)
    steps_per_epoch = max(1, len(train_loader))

    avail = len(jax.devices()) // max(1, args.tensor_chips)
    n_chips = args.num_chips if args.num_chips != -1 else avail
    if args.batch_size % n_chips != 0:
        # Largest chip count that divides the batch (batch is sharded over
        # the data axis; XLA requires even division).
        n_chips = max(d for d in range(1, n_chips + 1) if args.batch_size % d == 0)
        print(f"note: batch_size {args.batch_size} not divisible by device count; "
              f"using {n_chips} data-parallel chip(s)")
    mesh = create_mesh(data=n_chips, tensor=args.tensor_chips)
    model = build_model(args)
    trainer = Trainer(
        model,
        TrainConfig(
            base_lr=args.base_lr,
            total_epochs=args.epochs,
            steps_per_epoch=steps_per_epoch,
            loss=args.loss,
            remat=args.remat,
            fused_blocks=(
                not args.no_fused_train
                and not args.fp32
                and jax.default_backend() == "tpu"
            ),
        ),
        mesh=mesh,
    )

    save_root = f"{args.save_dir}/{args.dataset}"
    ckpt = CheckpointManager(f"{save_root}/weights")
    logger = MetricsLogger(f"{save_root}/log.txt", f"{save_root}/tb")
    best = BestTracker()

    sample = train_ds.sample(0, np.random.default_rng(0))
    state = trainer.init(jax.random.PRNGKey(args.seed), jnp.asarray(sample[0][None]))
    start_epoch = 0
    if args.resume:
        restored, step = ckpt.restore(state)
        if restored is not None:
            state = restored
            start_epoch = int(step) + 1
            print(f"resumed from epoch {step}")

    for epoch in range(start_epoch, args.epochs + 1):
        t0 = time.time()
        epoch_loss, n_steps = 0.0, 0
        batches = (tuple(b) for b in train_loader)
        if args.device_prefetch > 0:
            # Stage the H2D copy of batch N+1 while the chips run batch N.
            batches = prefetch_to_device(
                batches, sharding=trainer.batch_sharding, size=args.device_prefetch
            )
        for batch in batches:
            if args.device_prefetch <= 0:
                batch = trainer.shard_batch(batch)
            state, loss = trainer.train_step(state, batch)
            epoch_loss += float(loss)
            n_steps += 1

        avg_psnr = np.nan
        if epoch % args.val_every == 0:
            psnrs = []
            for batch in val_loader:
                inp, gt = batch[0], batch[1]
                _, per_image = trainer.eval_step(state.variables(), (inp, gt))
                psnrs.extend(np.asarray(per_image).tolist())
            avg_psnr = float(np.mean(psnrs)) if psnrs else np.nan
            if best.update(epoch, avg_psnr):
                ckpt.save(epoch, state, metrics={"psnr": avg_psnr})

        if epoch % args.save_every == 0 or epoch == args.epochs:
            ckpt.save(epoch, state)

        dt = time.time() - t0
        logger.log_epoch(epoch, args.epochs, dt, epoch_loss, avg_psnr, best.best_psnr, best.best_epoch)
        logger.log_scalars(
            epoch,
            {
                "valid_PSNR": avg_psnr,
                "best_PSNR": best.best_psnr,
                "best_epoch": best.best_epoch,
                "epoch_time": dt,
                "epoch_loss": epoch_loss,
            },
        )
        print(
            f"epoch {epoch}/{args.epochs} loss={epoch_loss:.4f} "
            f"psnr={avg_psnr:.3f} best={best.best_psnr:.3f}@{best.best_epoch} ({dt:.1f}s)"
        )

    ckpt.wait()
    logger.close()


if __name__ == "__main__":
    main()
