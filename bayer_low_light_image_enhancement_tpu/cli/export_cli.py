"""Export CLI: checkpoint -> AOT serving artifact (StableHLO).

The deployment surface the reference never had (its ``test.py`` re-runs the
full PyTorch stack per frame). Exports any registry model with weights from
an orbax checkpoint or a reference ``.pth`` file into a self-contained
artifact runnable without model code (serving/export.py).

Example:
  python -m bayer_low_light_image_enhancement_tpu.cli.export_cli \
      --model_size S --ckpt /run/weights --height 2848 --width 4256 \
      --out rawformer_s.bllx
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Export a serving artifact")
    p.add_argument("--model_size", default="S", choices=["S", "B", "L"])
    p.add_argument("--model", default=None, help="registry model name; overrides --model_size")
    p.add_argument("--ckpt", default=None, help="orbax checkpoint dir")
    p.add_argument("--pth", default=None, help="PyTorch .pth checkpoint to import")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--fp32", action="store_true")
    p.add_argument(
        "--platforms",
        default=None,
        help="comma-separated lowering platforms (default: current backend), "
        "e.g. cpu,tpu",
    )
    p.add_argument("--out", required=True, help="output artifact path (.bllx)")
    return p


def main(argv=None):
    import jax

    from bayer_low_light_image_enhancement_tpu.cli.train_cli import build_model
    from bayer_low_light_image_enhancement_tpu.serving.export import export_artifact
    from bayer_low_light_image_enhancement_tpu.serving.predictor import Predictor

    args = build_parser().parse_args(argv)
    model = build_model(args)

    if args.pth:
        predictor = Predictor.from_torch(model, args.pth, use_fused=False)
    elif args.ckpt:
        predictor = Predictor.from_orbax(model, args.ckpt, use_fused=False)
    else:
        import jax.numpy as jnp

        predictor = Predictor(
            model,
            model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 1))),
            use_fused=False,
        )
        print("WARNING: no --ckpt/--pth given; exporting with random init")

    platforms = args.platforms.split(",") if args.platforms else None
    meta = export_artifact(
        model,
        predictor.variables,
        args.out,
        batch=args.batch,
        height=args.height,
        width=args.width,
        platforms=platforms,
        meta_extra={"model": args.model or f"rawformer_{args.model_size.lower()}"},
    )
    print(f"exported {args.out}: {meta}")


if __name__ == "__main__":
    main()
