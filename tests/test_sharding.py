"""Multi-device tests on the 8-virtual-CPU-device mesh.

The TPU-world "test multi-node without a cluster" mechanism (SURVEY.md §4):
data-parallel training equivalence and halo-exchange spatial tiling
equivalence are both checked against single-device ground truth.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from bayer_low_light_image_enhancement_tpu.core.mesh import AXES, create_mesh
from bayer_low_light_image_enhancement_tpu.models.rawformer import RawFormer, RawFormerConfig
from bayer_low_light_image_enhancement_tpu.ops.conv import conv2d

RNG = np.random.default_rng(23)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


class TestHaloConv:
    def test_halo_conv_matches_unsharded(self):
        mesh = create_mesh(data=1, spatial=8)
        x = jnp.asarray(RNG.standard_normal((1, 64, 16, 4)).astype(np.float32))
        w = jnp.asarray(RNG.standard_normal((3, 3, 4, 6)).astype(np.float32))
        b = jnp.asarray(RNG.standard_normal(6).astype(np.float32))

        expected = conv2d(x, w, b)

        def local(x_l):
            return conv2d(x_l, w, b, spatial_axis=AXES.spatial)

        sharded = jax.jit(
            jax.shard_map(
                local, mesh=mesh,
                in_specs=P(None, AXES.spatial), out_specs=P(None, AXES.spatial),
            )
        )
        out = sharded(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-5, atol=1e-5)

    def test_halo_conv_5x5(self):
        mesh = create_mesh(data=1, spatial=8)
        x = jnp.asarray(RNG.standard_normal((1, 64, 8, 2)).astype(np.float32))
        w = jnp.asarray(RNG.standard_normal((5, 5, 2, 2)).astype(np.float32))
        expected = conv2d(x, w)

        def local(x_l):
            return conv2d(x_l, w, spatial_axis=AXES.spatial)

        sharded = jax.jit(
            jax.shard_map(
                local, mesh=mesh,
                in_specs=P(None, AXES.spatial), out_specs=P(None, AXES.spatial),
            )
        )
        np.testing.assert_allclose(
            np.asarray(sharded(x)), np.asarray(expected), rtol=1e-5, atol=1e-5
        )


class TestShardedAttention:
    def test_channel_attention_matches_unsharded(self):
        from bayer_low_light_image_enhancement_tpu.ops.attention import channel_attention

        mesh = create_mesh(data=1, spatial=8)
        b, h, w, c = 1, 32, 8, 8
        heads = 2
        q = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
        k = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
        v = jnp.asarray(RNG.standard_normal((b, h, w, c)).astype(np.float32))
        temp = jnp.asarray(RNG.uniform(0.5, 2.0, heads).astype(np.float32))

        expected = channel_attention(q, k, v, temp, heads)

        def local(q_l, k_l, v_l):
            return channel_attention(q_l, k_l, v_l, temp, heads, spatial_axis=AXES.spatial)

        spec = P(None, AXES.spatial)
        sharded = jax.jit(
            jax.shard_map(local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
        )
        np.testing.assert_allclose(
            np.asarray(sharded(q, k, v)), np.asarray(expected), rtol=2e-4, atol=2e-5
        )


class TestTiledRawFormer:
    @pytest.mark.slow
    def test_tiled_inference_matches_monolithic(self):
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        mesh = create_mesh(data=1, spatial=8)
        cfg = RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2))
        model_mono = RawFormer(cfg)
        model_tiled = RawFormer(
            RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2), spatial_axis=AXES.spatial)
        )

        # 8 shards x 16 rows each.
        x = jnp.asarray(RNG.uniform(0, 1, (1, 128, 32, 1)).astype(np.float32))
        variables = model_mono.init(jax.random.PRNGKey(0), x[:, :16])

        expected = jnp.clip(model_mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(model_tiled, mesh)
        out = fwd(variables, shard_image(x, mesh))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=1e-5
        )


@pytest.mark.slow
class TestTiledVariants:
    """H-sharded inference == monolithic for the guided model zoo.

    The reference evaluates every model full-frame (``test.py:107-116``); the
    tiler must therefore cover the variants, whose guidance paths add sharded
    bilinear resizes (all-gathered, ops/flca.py) and per-image global
    reductions (pmax luma norm, pmean SE pools, color anchors)."""

    def _check(self, name, n_shards=4, atol=2e-5):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        mesh = create_mesh(data=1, spatial=n_shards)
        kw = dict(dim=8, num_heads=(2, 2, 2, 2))
        model_mono = get_model(name, **kw)
        model_tiled = get_model(name, spatial_axis=AXES.spatial, **kw)

        x = jnp.asarray(RNG.uniform(0, 1, (1, 16 * n_shards, 32, 1)).astype(np.float32))
        variables = model_mono.init(jax.random.PRNGKey(0), x[:, :16])
        expected = jnp.clip(model_mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(model_tiled, mesh)
        out = fwd(variables, shard_image(x, mesh))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=atol
        )

    def test_flca_rawformer_tiled(self):
        self._check("flca_rawformer")

    def test_truecolor_tiled(self):
        self._check("truecolor_rawformer")

    def test_bayertorgb_tiled(self):
        self._check("bayertorgb_rawformer")

    def test_multilvl_flca_tiled(self):
        self._check("multilvl_flca_rawformer")


class TestTiled2D:
    """2D (H x W) spatial sharding == monolithic for the canonical model.

    The reference evaluates full frames monolithically (test.py:107-116);
    2D spatial meshes extend the halo-exchange story to both image axes
    (conv halos ppermute along each axis; attention grams psum over the
    axis pair)."""

    def test_rawformer_2d_tiled_matches_monolithic(self):
        from bayer_low_light_image_enhancement_tpu.models.rawformer import (
            RawFormer,
            RawFormerConfig,
        )
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        mesh = create_mesh(data=1, spatial=2, spatial_w=2)
        axes = (AXES.spatial, AXES.spatial_w)
        mono = RawFormer(RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2)))
        tiled = RawFormer(
            RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2), spatial_axis=axes)
        )

        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 64, 1)).astype(np.float32))
        variables = mono.init(jax.random.PRNGKey(0), x[:, :16, :32])
        expected = jnp.clip(mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(
            tiled, mesh, spatial_axis=AXES.spatial, spatial_w_axis=AXES.spatial_w
        )
        out = fwd(
            variables,
            shard_image(x, mesh, spatial_w_axis=AXES.spatial_w),
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=2e-5
        )


class TestShardedResize:
    def test_sharded_resize_matches_global(self):
        from bayer_low_light_image_enhancement_tpu.ops.flca import resize_bilinear

        mesh = create_mesh(data=1, spatial=8)
        x = jnp.asarray(RNG.standard_normal((2, 32, 12, 3)).astype(np.float32))
        for h_out, w_out in [(64, 24), (16, 6), (32, 5), (128, 12)]:
            expected = resize_bilinear(x, h_out, w_out)

            def local(x_l):
                return resize_bilinear(x_l, h_out // 8, w_out, AXES.spatial)

            sharded = jax.jit(
                jax.shard_map(
                    local, mesh=mesh,
                    in_specs=P(None, AXES.spatial), out_specs=P(None, AXES.spatial),
                )
            )
            np.testing.assert_allclose(
                np.asarray(sharded(x)), np.asarray(expected), rtol=1e-6, atol=1e-6,
                err_msg=f"resize to ({h_out},{w_out})",
            )


class TestDataParallelEquivalence:
    @pytest.mark.slow
    def test_dp_train_step_matches_single_device(self):
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            TrainConfig,
            Trainer,
        )

        cfg = RawFormerConfig(dim=8, num_heads=(2, 2, 2, 2))
        model = RawFormer(cfg)
        x = jnp.asarray(RNG.uniform(0, 1, (8, 32, 32, 1)).astype(np.float32))
        y = jnp.asarray(RNG.uniform(0, 1, (8, 32, 32, 3)).astype(np.float32))

        t_single = Trainer(model, TrainConfig(base_lr=1e-3, warmup_epochs=1))
        s_single = t_single.init(jax.random.PRNGKey(0), x[:1])
        s1, loss1 = t_single.train_step(s_single, (x, y))

        mesh = create_mesh(data=8)
        t_dp = Trainer(model, TrainConfig(base_lr=1e-3, warmup_epochs=1), mesh=mesh)
        s_dp = t_dp.init(jax.random.PRNGKey(0), x[:1])
        bx, by = t_dp.shard_batch((x, y))
        s2, loss2 = t_dp.train_step(s_dp, (bx, by))

        np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
        p1 = jax.tree.leaves(s1.params)
        p2 = jax.tree.leaves(s2.params)
        for a, b in zip(p1, p2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


class TestShardedSSM:
    """Cross-device selective scan (sequence parallelism over the spatial
    mesh axis): exact vs the single-device scan. Ref: the CUDA Mamba scan
    at ``/root/reference/RawFomer_WFB_FFAB/model.py:146-172`` is monolithic;
    the TPU version lifts the in-chip chunk-carry algebra to the mesh."""

    def test_selective_scan_sharded_matches(self):
        from bayer_low_light_image_enhancement_tpu.ops.ssm import selective_scan

        bsz, L, d, n = 2, 64, 8, 4
        u = jnp.asarray(RNG.standard_normal((bsz, L, d)).astype(np.float32))
        delta = jnp.asarray(
            np.abs(RNG.standard_normal((bsz, L, d))).astype(np.float32) * 0.5
        )
        A = -jnp.asarray(np.abs(RNG.standard_normal((d, n))).astype(np.float32))
        Bm = jnp.asarray(RNG.standard_normal((bsz, L, n)).astype(np.float32))
        Cm = jnp.asarray(RNG.standard_normal((bsz, L, n)).astype(np.float32))
        Dskip = jnp.asarray(RNG.standard_normal(d).astype(np.float32))

        expected = selective_scan(u, delta, A, Bm, Cm, Dskip, chunk_size=16)

        mesh = create_mesh(data=1, spatial=4)
        seq = P(None, AXES.spatial, None)

        def local(u_, d_, b_, c_):
            return selective_scan(
                u_, d_, A, b_, c_, Dskip, chunk_size=8, axis_name=AXES.spatial
            )

        sharded = jax.shard_map(
            local, mesh=mesh, in_specs=(seq, seq, seq, seq), out_specs=seq
        )
        got = sharded(u, delta, Bm, Cm)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
        )

    def test_mamba_block_sharded_matches(self):
        """MambaBlock under sequence sharding (incl. the causal depthwise
        conv's cross-shard warm-up tokens)."""
        from bayer_low_light_image_enhancement_tpu.ops.ssm import MambaBlock

        bsz, L, d = 1, 64, 8
        x = jnp.asarray(RNG.standard_normal((bsz, L, d)).astype(np.float32) * 0.3)
        mono = MambaBlock(d_model=d, d_state=4)
        v = mono.init(jax.random.PRNGKey(0), x)
        expected = mono.apply(v, x)

        mesh = create_mesh(data=1, spatial=4)
        seq = P(None, AXES.spatial, None)
        tiled = MambaBlock(d_model=d, d_state=4, axis_name=AXES.spatial)

        sharded = jax.shard_map(
            lambda xv: tiled.apply(v, xv), mesh=mesh, in_specs=(seq,),
            out_specs=seq,
        )
        got = sharded(x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), rtol=2e-5, atol=2e-5
        )


class TestTiledWFB:
    """H-sharded WFB inference == monolithic: DWT/IWT stay local (even
    per-shard H), FEB gathers its FFT island, WM runs the cross-device
    chunk-carry scan with conv warm-up halos. Ref: the reference evaluates
    WFB full-frame monolithically (``RawFomer_WFB_FFAB/test.py:71-92``)."""

    @pytest.mark.slow
    def test_wfb_tiled_matches_monolithic(self):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        n_shards = 4
        mesh = create_mesh(data=1, spatial=n_shards)
        model_mono = get_model("rawformer_wfb", dim=8)
        model_tiled = get_model("rawformer_wfb", dim=8, spatial_axis=AXES.spatial)

        # Per-shard H must be a multiple of 32: the U-Net's /16 plus the
        # in-stage Haar DWT halving at the bottleneck.
        x = jnp.asarray(
            RNG.uniform(0, 1, (1, 32 * n_shards, 32, 1)).astype(np.float32)
        )
        variables = model_mono.init(jax.random.PRNGKey(0), x[:, :32])
        expected = jnp.clip(model_mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(model_tiled, mesh)
        out = fwd(variables, shard_image(x, mesh))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=2e-5
        )

    def test_wfb_rejects_w_sharding(self):
        from bayer_low_light_image_enhancement_tpu.models import get_model

        model = get_model(
            "rawformer_wfb", dim=8, spatial_axis=(AXES.spatial, AXES.spatial_w)
        )
        x = jnp.zeros((1, 16, 16, 1), jnp.float32)
        with pytest.raises(ValueError, match="H-axis only"):
            model.init(jax.random.PRNGKey(0), x)


class TestTiledFLCAUNet:
    """H-sharded FLCA-UNet == monolithic: gather-kv token attention at the
    bottleneck, dilated/strided halo convs, psum'd SE pools and luma max.
    Ref: full-frame eval at ``/root/reference/test.py:107-116``."""

    def _check(self, name):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        n_shards = 4
        mesh = create_mesh(data=1, spatial=n_shards)
        kw = dict(base=8, blocks=(1, 1, 1), heads=2)
        model_mono = get_model(name, **kw)
        model_tiled = get_model(name, spatial_axis=AXES.spatial, **kw)

        x = jnp.asarray(
            RNG.uniform(0, 1, (1, 16 * n_shards, 32, 4)).astype(np.float32)
        )
        variables = model_mono.init(jax.random.PRNGKey(0), x[:, :16])
        expected = jnp.clip(model_mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(model_tiled, mesh)
        out = fwd(variables, shard_image(x, mesh))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=2e-5
        )

    @pytest.mark.slow
    def test_flca_unet_tiled(self):
        self._check("flca_unet")

    @pytest.mark.slow
    def test_unet_luma_dwt_tiled(self):
        self._check("unet_luma_dwt")


class TestTiledWavKANAndLumaMHSA:
    """H-sharded inference == monolithic for the remaining RAW->RGB
    variants: WavKAN (psum'd channel attention + halo convs; KANLinear is
    per-pixel) and the luma-MHSA RawFormer (gather-kv token attention at
    every stage, pmean'd inverse-luma bias, pmin/pmax luma norm)."""

    def _check(self, name, **kw):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        n_shards = 4
        mesh = create_mesh(data=1, spatial=n_shards)
        model_mono = get_model(name, **kw)
        model_tiled = get_model(name, spatial_axis=AXES.spatial, **kw)

        x = jnp.asarray(
            RNG.uniform(0, 1, (1, 16 * n_shards, 32, 1)).astype(np.float32)
        )
        variables = model_mono.init(jax.random.PRNGKey(0), x[:, :16])
        expected = jnp.clip(model_mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(model_tiled, mesh)
        out = fwd(variables, shard_image(x, mesh))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=2e-5
        )

    @pytest.mark.slow
    def test_wavkan_tiled(self):
        self._check("wavkan_rawformer", dim=8, num_heads=(2, 2, 2, 2))

    @pytest.mark.slow
    def test_luma_mhsa_tiled(self):
        self._check("luma_mhsa_rawformer", dim=8, num_heads=(2, 2, 2, 2))


class TestTiledRawDomainVariants:
    """H-sharded == monolithic for the enhancement-domain (packed-planes)
    models: InstanceNorm stats pmean across shards, gather-kv token
    attention per stage, large-kernel (7/15/31) pool splits via halo or
    gather fallback."""

    def _check(self, name, **kw):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        n_shards = 4
        mesh = create_mesh(data=1, spatial=n_shards)
        model_mono = get_model(name, **kw)
        model_tiled = get_model(name, spatial_axis=AXES.spatial, **kw)

        x = jnp.asarray(
            RNG.uniform(0, 1, (1, 16 * n_shards, 32, 4)).astype(np.float32)
        )
        variables = model_mono.init(jax.random.PRNGKey(0), x[:, :16])
        expected = jnp.clip(model_mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(model_tiled, mesh)
        out = fwd(variables, shard_image(x, mesh))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=3e-5
        )

    @pytest.mark.slow
    def test_lumachroma_transformer_tiled(self):
        self._check("lumachroma_transformer", base=8, num_blocks=1, heads=2)

    @pytest.mark.slow
    def test_simple_flca_unet_tiled(self):
        self._check("simple_flca_unet", base_ch=8, heads=2)


@pytest.mark.slow
class TestTiled2DVariants:
    """2D (H x W) sharding == monolithic for the guided variants: the
    sharded guidance resize gathers/blocks BOTH axes (ops/flca.py) and the
    global reductions (pmax luma norm, pmean SE pools) cross the axis pair."""

    def _check2d(self, name, atol=2e-5):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        mesh = create_mesh(data=1, spatial=2, spatial_w=2)
        axes = (AXES.spatial, AXES.spatial_w)
        kw = dict(dim=8, num_heads=(2, 2, 2, 2))
        model_mono = get_model(name, **kw)
        model_tiled = get_model(name, spatial_axis=axes, **kw)

        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 64, 1)).astype(np.float32))
        variables = model_mono.init(jax.random.PRNGKey(0), x[:, :16, :32])
        expected = jnp.clip(model_mono.apply(variables, x), 0.0, 1.0)

        fwd = make_tiled_forward(
            model_tiled, mesh, spatial_axis=AXES.spatial,
            spatial_w_axis=AXES.spatial_w,
        )
        out = fwd(variables, shard_image(x, mesh, spatial_w_axis=AXES.spatial_w))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=atol
        )

    def test_flca_rawformer_2d(self):
        self._check2d("flca_rawformer")

    def test_truecolor_2d(self):
        self._check2d("truecolor_rawformer")

    def test_multilvl_flca_2d(self):
        self._check2d("multilvl_flca_rawformer")

    def test_bayertorgb_2d(self):
        self._check2d("bayertorgb_rawformer")

    def test_wavkan_2d(self):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        mesh = create_mesh(data=1, spatial=2, spatial_w=2)
        axes = (AXES.spatial, AXES.spatial_w)
        kw = dict(dim=8, num_heads=(2, 2, 2, 2))
        mono = get_model("wavkan_rawformer", **kw)
        tiled = get_model("wavkan_rawformer", spatial_axis=axes, **kw)
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 64, 1)).astype(np.float32))
        v = mono.init(jax.random.PRNGKey(0), x[:, :16, :32])
        expected = jnp.clip(mono.apply(v, x), 0.0, 1.0)
        fwd = make_tiled_forward(
            tiled, mesh, spatial_axis=AXES.spatial, spatial_w_axis=AXES.spatial_w
        )
        out = fwd(v, shard_image(x, mesh, spatial_w_axis=AXES.spatial_w))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=2e-5
        )

    def _check2d_raw(self, name, in_ch=4, **kw):
        from bayer_low_light_image_enhancement_tpu.models import get_model
        from bayer_low_light_image_enhancement_tpu.parallel.tiled import (
            make_tiled_forward,
            shard_image,
        )

        mesh = create_mesh(data=1, spatial=2, spatial_w=2)
        axes = (AXES.spatial, AXES.spatial_w)
        mono = get_model(name, **kw)
        tiled = get_model(name, spatial_axis=axes, **kw)
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 64, in_ch)).astype(np.float32))
        v = mono.init(jax.random.PRNGKey(0), x[:, :16, :32])
        expected = jnp.clip(mono.apply(v, x), 0.0, 1.0)
        fwd = make_tiled_forward(
            tiled, mesh, spatial_axis=AXES.spatial, spatial_w_axis=AXES.spatial_w
        )
        out = fwd(v, shard_image(x, mesh, spatial_w_axis=AXES.spatial_w))
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(expected), rtol=1e-4, atol=2e-5
        )

    def test_flca_unet_2d(self):
        self._check2d_raw("flca_unet", base=8, blocks=(1, 1, 1), heads=2)

    def test_unet_luma_dwt_2d(self):
        self._check2d_raw("unet_luma_dwt", base=8, blocks=(1, 1, 1), heads=2)

    def test_simple_flca_unet_2d(self):
        self._check2d_raw("simple_flca_unet", base_ch=8, heads=2)

    def test_lumachroma_2d(self):
        self._check2d_raw("lumachroma_transformer", base=8, num_blocks=1, heads=2)

    def test_luma_mhsa_2d(self):
        self._check2d_raw("luma_mhsa_rawformer", in_ch=1, dim=8, num_heads=(2, 2, 2, 2))
