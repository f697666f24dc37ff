"""Evaluation CLI.

Reference: ``/root/reference/test.py`` — full-resolution batch-1 inference,
per-image PSNR/SSIM, Bayer channel-order correction heuristics, JPEG dumps
named with their metrics, CSV summary. Differences by design: metrics run
on-device in JAX (no skimage round-trip), and checkpoints are orbax trees
with an optional ``--pth`` path through the torch importer.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def correct_bayer_channels(rgb: np.ndarray, pattern: str = "RGGB") -> np.ndarray:
    """Channel permutation per CFA pattern (``test.py:17-29``)."""
    pattern = pattern.upper()
    if pattern == "BGGR":
        return rgb[..., [2, 1, 0]]
    if pattern == "GBRG":
        return rgb[..., [1, 0, 2]]
    if pattern == "GRBG":
        return rgb[..., [0, 2, 1]]
    return rgb


def auto_correct_rb(rgb: np.ndarray) -> np.ndarray:
    """Swap R/B if red is darker than blue (``test.py:31-40``)."""
    if rgb[..., 0].mean() < rgb[..., 2].mean():
        return rgb[..., [2, 1, 0]]
    return rgb


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate RawFormer on SID/MCR (TPU)")
    p.add_argument("--dataset", default="SID", choices=["SID", "MCR", "synthetic"])
    p.add_argument("--model_size", default="S", choices=["S", "B", "L"])
    p.add_argument("--model", default=None, help="registry model name; overrides --model_size")
    p.add_argument("--batch_size", type=int, default=1)
    p.add_argument("--patch_size", type=int, default=512, help="(synthetic dataset size)")
    p.add_argument("--bayer_pattern", default="RGGB")
    p.add_argument("--data_root", default=".")
    p.add_argument("--cache_dir", default=None)
    p.add_argument("--save_dir", default="result")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--pth", default=None, help="PyTorch .pth checkpoint to import")
    p.add_argument("--fp32", action="store_true")
    p.add_argument("--save_images", action="store_true")
    p.add_argument("--pad_to", type=int, default=16, help="pad H/W to multiple")
    p.add_argument(
        "--no_compact_h2d",
        action="store_true",
        help="ship fp32 frames instead of uint16 mosaic codes decoded "
        "on device (the 12MP fp32 copy dominates per-image eval latency "
        "on host-bound transports)",
    )
    p.add_argument(
        "--spatial_chips",
        type=int,
        default=1,
        help="shard full-resolution frames over N chips along H "
        "(halo-exchange tiling; 1 = monolithic)",
    )
    p.add_argument(
        "--spatial_w_chips",
        type=int,
        default=1,
        help="additionally shard frames along W over M chips (2D spatial "
        "mesh of spatial_chips x spatial_w_chips; supported by the full "
        "model zoo except WFB, whose raster-order SSM shards along H only)",
    )
    p.add_argument(
        "--no_fused",
        action="store_true",
        help="disable the fused TransformerBlock Pallas kernel at inference "
        "(single-chip TPU path only; it is auto-disabled elsewhere)",
    )
    return p


def main(argv=None):
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.cli.train_cli import (
        build_datasets,
        build_model,
    )
    from bayer_low_light_image_enhancement_tpu.train.metrics import psnr, ssim
    from bayer_low_light_image_enhancement_tpu.utils.logging import MetricsLogger

    args = build_parser().parse_args(argv)
    _, val_ds = build_datasets(args)
    model = build_model(args)

    if args.model and not args.no_fused and jax.default_backend() == "tpu":
        # Inference-only kernel flags (same param tree): the fused Pallas
        # selective scan triples WFB throughput (BENCHMARKS.md: 142 -> 46
        # ms/step at batch 2 @ 512^2). Models whose configs lack the flag
        # keep the plain build.
        from bayer_low_light_image_enhancement_tpu.models import get_model

        try:
            model = get_model(
                args.model,
                dtype=jnp.float32 if args.fp32 else jnp.bfloat16,
                ssm_pallas=True,
            )
        except TypeError:
            pass

    rng = np.random.default_rng(0)
    sample = val_ds.sample(0, rng)
    init_x = jnp.zeros((1, 64, 64, 1), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), init_x)

    if args.pth:
        from bayer_low_light_image_enhancement_tpu.compat.torch_import import (
            import_rawformer_state_dict,
            load_torch_checkpoint,
        )

        params = jax.tree.map(jnp.asarray, import_rawformer_state_dict(load_torch_checkpoint(args.pth)))
        print(f"imported torch checkpoint {args.pth}")
    elif args.ckpt:
        from bayer_low_light_image_enhancement_tpu.train.checkpoint import CheckpointManager
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            TrainConfig,
            Trainer,
            TrainState,
        )

        trainer = Trainer(model, TrainConfig())
        template = TrainState.create(params, trainer.tx)
        mgr = CheckpointManager(args.ckpt)
        restored, step = mgr.restore(template)
        if restored is None:
            raise SystemExit(f"no checkpoint found in {args.ckpt}")
        params = restored.variables()
        print(f"restored orbax checkpoint step {step}")

    if args.spatial_chips > 1 or args.spatial_w_chips > 1:
        from bayer_low_light_image_enhancement_tpu.core.mesh import AXES, create_mesh
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        mesh = create_mesh(
            data=1, spatial=args.spatial_chips, spatial_w=args.spatial_w_chips
        )
        w_ax = AXES.spatial_w if args.spatial_w_chips > 1 else None
        sp_axis = (AXES.spatial, w_ax) if w_ax else AXES.spatial
        dtype = jnp.float32 if args.fp32 else jnp.bfloat16
        if args.model:
            if w_ax and args.model == "rawformer_wfb":
                # Every other zoo model is verified numerically identical
                # under 2D (H x W) sharding
                # (tests/test_sharding.py::TestTiled2DVariants); WFB stays
                # H-only — its SSM consumes raster token order, which
                # W-sharding breaks up.
                raise SystemExit(
                    "--spatial_w_chips: rawformer_wfb is H-shardable only "
                    "(its selective scan needs raster-contiguous tokens); "
                    "use --spatial_chips"
                )
            from bayer_low_light_image_enhancement_tpu.models import get_model

            try:
                tiled_model = get_model(args.model, dtype=dtype, spatial_axis=AXES.spatial)
            except TypeError:
                raise SystemExit(
                    f"--spatial_chips: model {args.model!r} does not support "
                    "H-sharded inference (no spatial_axis in its config)"
                ) from None
        else:
            from bayer_low_light_image_enhancement_tpu.models.rawformer import (
                RawFormer,
                RawFormerConfig,
            )

            tiled_model = RawFormer(
                RawFormerConfig.from_size(
                    args.model_size, dtype=dtype, spatial_axis=sp_axis
                )
            )
        tiled_fwd = make_tiled_forward(tiled_model, mesh, spatial_w_axis=w_ax)
        # WFB halves each stage again through its in-stage Haar DWT, so its
        # per-shard H must be a multiple of 32 (vs 16 for the rest).
        h_mult = 32 if args.model == "rawformer_wfb" else 16
        args.pad_to = max(
            args.pad_to, h_mult * args.spatial_chips, 16 * args.spatial_w_chips
        )

        def fwd(p, x):
            return tiled_fwd(p, shard_image(x, mesh, spatial_w_axis=w_ax))

    elif not args.no_fused and jax.default_backend() == "tpu":
        # Single-chip full-res eval: TransformerBlocks run as the fused
        # Pallas kernel, and large canonical-RawFormer frames additionally
        # stream as H-bands riding the batch axis (round 5,
        # models/fused_apply.make_banded_forward: every op then runs at
        # crop-like batched geometry — measured 1.5x the monolithic 12MP
        # graph — while staying numerically identical to it).
        from bayer_low_light_image_enhancement_tpu.models.fused_apply import (
            make_banded_forward,
            make_fused_forward,
            pick_bands,
        )

        fused = make_fused_forward(model)
        band_ok = args.model is None  # canonical RawFormer S/B/L
        if band_ok:
            # Pad H so full frames split into 8 equal /16-divisible bands.
            args.pad_to = max(args.pad_to, 128)

        @jax.jit
        def fwd(p, x):
            k = (
                pick_bands(x.shape[1])
                if band_ok and x.shape[0] == 1 and x.shape[1] >= 1024
                else 1
            )
            y = (make_banded_forward(model, k) if k > 1 else fused)(p, x)
            return jnp.clip(y, 0.0, 1.0)
    else:
        fwd = jax.jit(lambda p, x: jnp.clip(model.apply(p, x), 0.0, 1.0))
    # Metrics consume the uint8 images directly (the reference computes
    # PSNR/SSIM on uint8 arrays, test.py:123-124) — shipping u8 instead of
    # the /255 fp32 round-trip is 4x less H2D and drops the float-rounding
    # quirk of floor(u8/255*255).
    metric_fn = jax.jit(
        lambda p_u8, g_u8: (
            psnr(p_u8.astype(jnp.float32), g_u8.astype(jnp.float32)),
            ssim(p_u8.astype(jnp.float32), g_u8.astype(jnp.float32)),
        )
    )

    # Compact H2D: ship uint16 mosaic codes and decode (clip/normalise/
    # ratio-amplify) on device — half the fp32 frame copy, numerically the
    # exact expression SIDDataset.sample evaluates on host.
    compact = (
        not args.no_compact_h2d
        and hasattr(val_ds, "device_normalize")
        and jax.default_backend() == "tpu"
    )
    if compact:
        from bayer_low_light_image_enhancement_tpu.ops.bayer import (
            normalize_mcr,
            normalize_sid,
        )

        val_ds.device_normalize = True
        decode_jit = jax.jit(
            normalize_mcr if args.dataset == "MCR" else normalize_sid
        )

    if args.model == "rawformer_wfb":
        # WFB needs H/W divisible by 32 even unsharded: space_to_depth +
        # three downsamples + the in-stage Haar DWT halving.
        args.pad_to = max(args.pad_to, 32)

    save_images_dir = os.path.join(args.save_dir, args.dataset, "images")
    save_csv = os.path.join(args.save_dir, args.dataset, "csv", "test_metrics.csv")
    if args.save_images:
        os.makedirs(save_images_dir, exist_ok=True)

    psnrs, ssims = [], []
    for idx in range(len(val_ds)):
        inp, gt, ratio = val_ds.sample(idx, rng)
        h, w = inp.shape[:2]
        ph = (-h) % args.pad_to
        pw = (-w) % args.pad_to
        x = np.pad(inp, ((0, ph), (0, pw), (0, 0)))[None]
        if compact:
            # Pad rows/cols arrive as code 0 -> clip to black level -> 0.0
            # after normalisation, identical to fp32 zero padding.
            x_dev = decode_jit(jnp.asarray(x), jnp.float32(ratio))
        else:
            x_dev = jnp.asarray(x)
        pred = np.asarray(fwd(params, x_dev))[0, :h, :w]

        pred_u8 = (np.clip(pred, 0, 1) * 255).astype(np.uint8)
        gt_u8 = (np.clip(gt, 0, 1) * 255).astype(np.uint8)
        pred_u8 = auto_correct_rb(correct_bayer_channels(pred_u8, args.bayer_pattern))
        gt_u8 = auto_correct_rb(correct_bayer_channels(gt_u8, args.bayer_pattern))

        p, s = metric_fn(jnp.asarray(pred_u8), jnp.asarray(gt_u8))
        p, s = float(p), float(s)
        psnrs.append(p)
        ssims.append(s)
        print(f"image:{idx}\tPSNR:{p:.4f}\tSSIM:{s:.4f}")

        if args.save_images:
            import imageio.v2 as imageio

            imageio.imwrite(os.path.join(save_images_dir, f"{idx}_gt.jpg"), gt_u8)
            imageio.imwrite(
                os.path.join(save_images_dir, f"{idx}_psnr_{p:.4f}_ssim_{s:.4f}.jpg"),
                pred_u8,
            )

    print(f"Average PSNR: {np.mean(psnrs):.4f}, Average SSIM: {np.mean(ssims):.4f}")
    MetricsLogger().write_metrics_csv(save_csv, psnrs, ssims)


if __name__ == "__main__":
    main()
