"""Headline benchmark: RawFormer-S RAW->RGB inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Protocol: batched 512x512 crops (the reference's training/eval patch size,
``/root/reference/train.py:35``), bf16 compute, steady-state steps after
warmup, megapixels of RAW input processed per second per chip.

``vs_baseline``: the reference publishes no throughput numbers (BASELINE.md),
so the baseline is the driver's north-star target of 5x an A100 running the
reference PyTorch stack. A100 reference throughput is estimated from the
model's FLOP count at 312 TFLOP/s fp16 peak and a measured-typical 15% MFU
for this kind of small-channel eager conv model:
  a100_mps = 312e12 * 0.15 / flops_per_megapixel
vs_baseline = our_mps / (5 * a100_mps). Assumptions are printed to stderr.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Compiles the EXACT fused scan program the bench runs, in a subprocess,
# populating the persistent compile cache; the in-process compile is then
# a cache hit. A deadline here bounds worst-case bench time.
_WARM = """
import bench
bench.build_bench(fused=True, compile_only=True)
print("WARM_OK")
"""


def _pallas_compiler_healthy(warm_timeout_s: float = 600.0) -> bool:
    """Deadline-bounded health gate: warm-compile the ACTUAL fused forward
    in a subprocess. The remote compile cache persists across processes,
    so on success the main process compiles in seconds; on deadline expiry
    (the remote Mosaic service intermittently degrades from ~seconds to
    many minutes per kernel — observed 2026-08-17) the bench falls back to
    the plain XLA path and still reports a real number. Probing a trivial
    or novel kernel instead would be wrong in both directions: a repeated
    kernel is cache-warm and hides degradation, while a novel kernel stays
    slow even after the actual bench kernels are already cached.

    Override with BENCH_FORCE_FUSED=1 (skip gate, always fused) or
    BENCH_NO_FUSED=1 (always XLA path).
    """
    if os.environ.get("BENCH_FORCE_FUSED") == "1":
        return True
    if os.environ.get("BENCH_NO_FUSED") == "1":
        return False
    try:
        r = subprocess.run(
            [sys.executable, "-c", _WARM],
            timeout=warm_timeout_s,
            capture_output=True,
            text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return r.returncode == 0 and "WARM_OK" in r.stdout
    except subprocess.TimeoutExpired:
        return False


# BENCH_BATCH: the batched-crop count. Exported so the warm subprocess
# (which inherits the environment) compiles the same program as main().
# Validated at import so misconfiguration fails loudly here instead of
# masquerading as a compiler-health failure inside the warm subprocess.
try:
    BATCH = int(os.environ.get("BENCH_BATCH", "8"))
except ValueError:
    raise SystemExit("BENCH_BATCH must be an integer >= 1")
if BATCH < 1:
    raise SystemExit("BENCH_BATCH must be >= 1")
H, W, STEPS = 512, 512, 50
# BENCH_INPUT: "u16" (default) feeds the production input path — uint16
# mosaic + per-image ratio through the fused Bayer pack kernel emitting
# bf16 straight into the embedding conv (kernels/bayer_pack.py). "f32"
# feeds the pre-normalised float path (the pre-round-3 protocol) for A/B.
INPUT = os.environ.get("BENCH_INPUT", "u16")
if INPUT not in ("u16", "f32"):
    raise SystemExit("BENCH_INPUT must be 'u16' or 'f32'")


def build_bench(fused: bool, compile_only: bool = False):
    """Build (run_n, params, x, model) for the bench program. The SAME
    function constructs the program in the warm subprocess and in main()
    so the persistent compile cache keys match exactly."""
    import jax
    import jax.numpy as jnp

    from bayer_low_light_image_enhancement_tpu.models.fused_apply import (
        make_fused_forward,
    )
    from bayer_low_light_image_enhancement_tpu.models.rawformer import (
        RawFormer,
        RawFormerConfig,
    )

    model = RawFormer(RawFormerConfig.from_size("S", dtype=jnp.bfloat16))
    apply_fn = make_fused_forward(model) if fused else model.apply
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (BATCH, H, W, 1)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x[:1, :64, :64])

    # Device-side loop: remote/tunneled backends can acknowledge dispatches
    # before execution finishes, so host-side per-call timing lies. A
    # lax.scan with a carried data dependency forces sequential execution
    # of STEPS forwards inside ONE dispatch; wall time / steps is honest
    # up to a single dispatch overhead.
    if INPUT == "u16":
        # Production input path: uint16 mosaic + ratio -> fused pack kernel
        # (bf16 out, clamp folded) -> prepacked forward. The pack runs as a
        # Pallas kernel on the fused path and as the XLA-fallback pack
        # otherwise (both inside the warm-compile gate).
        from bayer_low_light_image_enhancement_tpu.kernels.bayer_pack import (
            bayer_pack_normalize,
            bayer_pack_normalize_xla,
        )

        mosaic = jnp.asarray(
            rng.integers(0, 17000, (BATCH, H, W)).astype(np.uint16)
        )
        ratio = jnp.asarray(np.full((BATCH,), 300.0, np.float32))

        if fused:
            def pack(m, r):
                return bayer_pack_normalize(
                    m, r, out_dtype=jnp.bfloat16, clamp01=True
                )
        else:
            def pack(m, r):
                x4 = bayer_pack_normalize_xla(m, r, out_dtype=jnp.float32)
                return jnp.clip(x4, 0.0, 1.0).astype(jnp.bfloat16)

        @jax.jit
        def run_n(params, mosaic, ratio):
            # Pack INSIDE the scan body so every step pays the production
            # ingest cost (uint16 mosaic read + pack + forward); the ratio
            # carry serialises steps through the output.
            def body(carry_ratio, _):
                x4 = pack(mosaic, carry_ratio)
                y = apply_fn(params, x4, prepacked=True)
                nxt = carry_ratio + jnp.mean(y).astype(jnp.float32) * 1e-6
                return nxt, ()

            final, _ = jax.lax.scan(body, ratio, None, length=STEPS)
            return jnp.sum(final)

        args = (params, mosaic, ratio)
    else:
        @jax.jit
        def run_n(params, x):
            def body(carry, _):
                y = apply_fn(params, carry)
                # Feed a cheap function of the output back to serialise steps.
                nxt = x + jnp.mean(y, axis=-1, keepdims=True) * 1e-6
                return nxt, ()

            final, _ = jax.lax.scan(body, x, None, length=STEPS)
            return jnp.sum(final)

        args = (params, x)

    if compile_only:
        run_n.lower(*args).compile()
        return None
    return run_n, args, model


def main():
    import jax
    import jax.numpy as jnp
    # Production inference path (same as cli/test_cli.py): TransformerBlocks
    # at C<=64 run as the fused Pallas kernel on TPU; plain XLA elsewhere.
    # Gated by the deadline-bounded warm-compile (_pallas_compiler_healthy
    # docstring); the XLA fallback (~0.77x fused) still reports a real
    # number when the remote compile service is degraded.
    use_fused = jax.default_backend() == "tpu" and _pallas_compiler_healthy()
    if jax.default_backend() == "tpu" and not use_fused:
        print(
            "[bench] WARNING: fused warm-compile failed/slow; "
            "falling back to plain XLA path",
            file=sys.stderr,
        )
    run_n, args, model = build_bench(fused=use_fused)
    batch, h, w, steps = BATCH, H, W, STEPS

    # FLOP count from XLA's own cost analysis (fp32 lowering of one image).
    try:
        params = args[0]
        x1 = jnp.zeros((1, H, W, 1), jnp.float32)
        cost = jax.jit(model.apply).lower(params, x1).compile().cost_analysis()
        flops_per_image = float(cost.get("flops", 0.0))
    except Exception:
        flops_per_image = 0.0

    float(run_n(*args))  # warmup/compile (cache-hot after the gate)

    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        s = float(run_n(*args))
    dt = (time.perf_counter() - t0) / reps

    mp = batch * h * w / 1e6
    mps = mp * steps / dt

    flops_per_mp = (flops_per_image / (h * w / 1e6)) if flops_per_image else 3.5e12
    a100_mps = 312e12 * 0.15 / flops_per_mp
    target = 5.0 * a100_mps

    # Honest single-chip scoreboard: model FLOPs actually retired per second
    # against the chip's own bf16 peak (v5e ~197 TFLOP/s). Self-grading —
    # does not depend on the assumed A100 reference.
    TPU_PEAK_FLOPS = 197e12
    mfu = flops_per_mp * mps / TPU_PEAK_FLOPS if flops_per_image else None

    # Full-resolution operating point (the protocol a reference user runs:
    # batch-1 12MP Sony frame, /root/reference/test.py:72,107-116). Measured
    # on the same path the eval CLI uses. BENCH_NO_FULLRES=1 skips it (e.g.
    # when the remote Mosaic compiler is degraded).
    mp_s_fullres = None
    if os.environ.get("BENCH_NO_FULLRES") != "1":
        try:
            from bayer_low_light_image_enhancement_tpu.models.fused_apply import (
                make_banded_forward,
                make_fused_forward,
            )

            fr_h, fr_w = 2832, 4240  # Sony SID frame
            # H-band streaming (the eval CLI's default full-res path): pad H
            # so the frame splits into 8 equal /16-divisible bands; the rate
            # is reported against the REAL frame pixels, padding included in
            # the time (matching what an eval user pays).
            fr_hp = -(-fr_h // 128) * 128
            if use_fused:
                fwd = make_banded_forward(model, 8)
            else:
                fwd = model.apply
                fr_hp = fr_h  # monolithic path needs only the /16 grid
            xf = jnp.asarray(
                np.random.default_rng(1).uniform(0, 1, (1, fr_hp, fr_w, 1)),
                jnp.float32,
            )
            fr_steps = 6

            @jax.jit
            def run_fr(params, x):
                def body(carry, _):
                    y = fwd(params, carry)
                    bump = jnp.sum(y.astype(jnp.float32)) * 1e-20
                    return carry + bump.astype(carry.dtype), ()

                final, _ = jax.lax.scan(body, x, None, length=fr_steps)
                return jnp.sum(final.astype(jnp.float32))

            float(run_fr(args[0], xf))  # compile + warmup
            t0 = time.perf_counter()
            float(run_fr(args[0], xf))
            fr_dt = (time.perf_counter() - t0) / fr_steps
            mp_s_fullres = fr_h * fr_w / 1e6 / fr_dt
        except Exception as e:  # report the headline even if full-res fails
            print(f"[bench] full-res point failed: {e!r}", file=sys.stderr)

    print(
        f"[bench] {mps:.2f} MP/s/chip, {dt / steps * 1e3:.2f} ms/step "
        f"(batch {batch} @ {h}x{w}, input={INPUT}), flops/img={flops_per_image:.3e}, "
        f"assumed A100 ref={a100_mps:.1f} MP/s, target(5x)={target:.1f} MP/s",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "rawformer_s_inference_throughput",
                "value": round(mps, 3),
                "unit": "megapixels/sec/chip",
                "vs_baseline": round(mps / target, 4),
                "batch": batch,
                "h": h,
                "w": w,
                "steps": steps,
                "input": INPUT,
                # Self-grading fields (VERDICT r3 #5): MFU vs the chip's own
                # bf16 peak, and the batch-1 full-frame operating point.
                "mfu": round(mfu, 4) if mfu is not None else None,
                "mp_s_fullres": (
                    round(mp_s_fullres, 3) if mp_s_fullres is not None else None
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
