"""Tests for the WFB family: selective SSM, FFT blocks, WMB, full model."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from bayer_low_light_image_enhancement_tpu.ops.ssm import (
    MambaBlock,
    selective_scan,
    selective_scan_ref,
)

pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

RNG = np.random.default_rng(11)


class TestSelectiveScan:
    @pytest.mark.parametrize("l,chunk", [(33, 256), (64, 16), (48, 12)])
    def test_parallel_matches_sequential(self, l, chunk):
        # Covers: single-chunk path, evenly-chunked path (carried state).
        b, d, n = 2, 6, 4
        u = jnp.asarray(RNG.standard_normal((b, l, d)).astype(np.float32))
        delta = jnp.asarray(RNG.uniform(0.01, 0.5, (b, l, d)).astype(np.float32))
        A = -jnp.asarray(RNG.uniform(0.1, 2.0, (d, n)).astype(np.float32))
        B = jnp.asarray(RNG.standard_normal((b, l, n)).astype(np.float32))
        C = jnp.asarray(RNG.standard_normal((b, l, n)).astype(np.float32))
        D = jnp.asarray(RNG.standard_normal(d).astype(np.float32))
        y_par = selective_scan(u, delta, A, B, C, D, chunk_size=chunk)
        y_seq = selective_scan_ref(u, delta, A, B, C, D)
        np.testing.assert_allclose(np.asarray(y_par), np.asarray(y_seq), rtol=1e-4, atol=1e-4)

    def test_ssm_is_causal(self):
        """Changing a late token must not affect earlier outputs."""
        b, l, d, n = 1, 16, 3, 4
        u1 = RNG.standard_normal((b, l, d)).astype(np.float32)
        u2 = u1.copy()
        u2[:, -1] += 10.0
        delta = jnp.asarray(RNG.uniform(0.01, 0.5, (b, l, d)).astype(np.float32))
        A = -jnp.asarray(RNG.uniform(0.1, 2.0, (d, n)).astype(np.float32))
        B = jnp.asarray(RNG.standard_normal((b, l, n)).astype(np.float32))
        C = jnp.asarray(RNG.standard_normal((b, l, n)).astype(np.float32))
        y1 = np.asarray(selective_scan(jnp.asarray(u1), delta, A, B, C))
        y2 = np.asarray(selective_scan(jnp.asarray(u2), delta, A, B, C))
        np.testing.assert_allclose(y1[:, :-1], y2[:, :-1], atol=1e-5)
        assert abs(y1[0, -1] - y2[0, -1]).max() > 1e-3

    def test_mamba_block_shapes(self):
        m = MambaBlock(d_model=8, d_state=8, d_conv=4, expand=2)
        x = jnp.asarray(RNG.standard_normal((2, 20, 8)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == x.shape
        assert np.all(np.isfinite(np.asarray(y)))


class TestFEBParity:
    def test_dft_backend_matches_fft(self, monkeypatch):
        """The DFT-matmul spectrum backend (round 4: replaces XLA's slow
        small-extent rfft2/irfft2 dispatches on TPU) must agree with the
        FFT path through a full FFAB at fp32 tolerance, and round-trip the
        raw transform exactly."""
        from bayer_low_light_image_enhancement_tpu.ops.fft import (
            FFAB,
            _irfft2_dft,
            _rfft2_dft,
        )

        x = jnp.asarray(RNG.standard_normal((2, 12, 16, 8)), jnp.float32)
        ortho = 1.0 / float(np.sqrt(12 * 16))
        re, im = _rfft2_dft(x, ortho)
        ref = np.fft.rfft2(np.asarray(x), axes=(1, 2)) * ortho
        np.testing.assert_allclose(np.asarray(re), ref.real, atol=1e-5)
        np.testing.assert_allclose(np.asarray(im), ref.imag, atol=1e-5)
        # Structurally-real bins are EXACT zeros (no eps-snap needed).
        assert float(jnp.max(jnp.abs(im[:, 0, 0]))) == 0.0
        back = _irfft2_dft(re, im, 12, 16, float(np.sqrt(12 * 16)))
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)

        m = FFAB()
        p = m.init(jax.random.PRNGKey(0), x)
        monkeypatch.setenv("BAYER_TPU_FFT_DFT", "0")
        a = m.apply(p, x)
        monkeypatch.setenv("BAYER_TPU_FFT_DFT", "1")
        b = m.apply(p, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_feb_matches_reference(self):
        from conftest import add_reference_to_path

        add_reference_to_path()
        import blocks as ref_blocks

        from bayer_low_light_image_enhancement_tpu.ops.fft import FEB

        c = 8
        ref = ref_blocks.FEB(c).eval()
        x = RNG.standard_normal((1, c, 12, 16)).astype(np.float32)
        with torch.no_grad():
            # Reference pipeline with the SAME signed-zero canonicalisation
            # our FEB applies (adding +0 turns -0.0 imag into +0.0, pinning
            # angle() at the branch cut to +pi): ref.forward's output is
            # FFT-backend-dependent at the DC/Nyquist bins, so exact parity
            # is only defined modulo that convention.
            xt = torch.clamp(torch.from_numpy(x), -10, 10)
            freq = torch.fft.rfft2(ref.fpre(xt), norm="ortho")
            re, im = torch.real(freq), torch.imag(freq)
            im = torch.where(im.abs() <= 1e-6 * (re.abs() + 1e-12), torch.zeros_like(im), im)
            freq = torch.complex(re, im)
            mag = torch.clamp(ref.process1(torch.abs(freq) + 1e-6), 0, 1e4)
            pha = ref.process2(torch.angle(freq))
            spec = torch.complex(mag * torch.cos(pha), mag * torch.sin(pha))
            out = torch.fft.irfft2(spec, s=(12, 16), norm="ortho")
            ref_out = torch.clamp(out + xt, -10, 10).numpy()
            ref_out_fw = ref(torch.from_numpy(x)).numpy()

        sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

        def cw(w):
            return np.transpose(w, (2, 3, 1, 0))

        feb = FEB()
        params = {
            "params": {
                "fpre": {"kernel": jnp.asarray(cw(sd["fpre.weight"])), "bias": jnp.asarray(sd["fpre.bias"])},
                "process1_0": {"kernel": jnp.asarray(cw(sd["process1.0.weight"])), "bias": jnp.asarray(sd["process1.0.bias"])},
                "process1_1": {"kernel": jnp.asarray(cw(sd["process1.2.weight"])), "bias": jnp.asarray(sd["process1.2.bias"])},
                "process2_0": {"kernel": jnp.asarray(cw(sd["process2.0.weight"])), "bias": jnp.asarray(sd["process2.0.bias"])},
                "process2_1": {"kernel": jnp.asarray(cw(sd["process2.2.weight"])), "bias": jnp.asarray(sd["process2.2.bias"])},
            }
        }
        out = np.asarray(feb.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1))))
        np.testing.assert_allclose(
            out, ref_out.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )
        # Against the untouched reference forward, deviation stays bounded by
        # the branch-cut ambiguity.
        assert np.abs(out - ref_out_fw.transpose(0, 2, 3, 1)).max() < 0.05


class TestWFBModel:
    @pytest.fixture(scope="class")
    def wfb(self):
        from bayer_low_light_image_enhancement_tpu.models.wfb import (
            RawFormerWFB,
            RawFormerWFBConfig,
        )

        model = RawFormerWFB(RawFormerWFBConfig(dim=8))
        x = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 1)).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        return model, variables, x

    def test_forward_shape(self, wfb):
        model, variables, x = wfb
        y = model.apply(variables, x, train=False)
        assert y.shape == (1, 32, 32, 3)
        assert np.all(np.isfinite(np.asarray(y)))

    def test_has_batch_stats(self, wfb):
        _, variables, _ = wfb
        assert "batch_stats" in variables

    def test_train_step_updates_batch_stats(self, wfb):
        from bayer_low_light_image_enhancement_tpu.train.trainer import (
            TrainConfig,
            Trainer,
        )

        model, variables, x = wfb
        trainer = Trainer(model, TrainConfig(base_lr=1e-3, warmup_epochs=1))
        y = jnp.asarray(RNG.uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        state = trainer.init(jax.random.PRNGKey(1), x)
        before = jax.tree.leaves(state.batch_stats)[0].copy()
        state, loss = trainer.train_step(state, (x, y))
        after = jax.tree.leaves(state.batch_stats)[0]
        assert np.isfinite(float(loss))
        assert not np.allclose(np.asarray(before), np.asarray(after))


class TestConvBNFusion:
    def test_fuse_matches_eval_bn(self):
        from bayer_low_light_image_enhancement_tpu.ops.conv import conv2d
        from bayer_low_light_image_enhancement_tpu.ops.rep_conv import (
            Conv2dBN,
            fuse_conv_bn,
        )

        m = Conv2dBN(features=6, kernel_size=3)
        x = jnp.asarray(RNG.standard_normal((1, 8, 8, 4)).astype(np.float32))
        variables = m.init(jax.random.PRNGKey(0), x)
        # Perturb running stats so fusion is non-trivial.
        variables = jax.tree.map(lambda a: a, variables)
        bs = variables["batch_stats"]["bn"]
        bs = {
            "mean": jnp.asarray(RNG.standard_normal(6).astype(np.float32)),
            "var": jnp.asarray(RNG.uniform(0.5, 2.0, 6).astype(np.float32)),
        }
        variables = {
            "params": variables["params"],
            "batch_stats": {"bn": bs},
        }
        y_bn = m.apply(variables, x, train=False)
        k, b = fuse_conv_bn(
            variables["params"]["c"]["kernel"],
            variables["params"]["bn"]["scale"],
            variables["params"]["bn"]["bias"],
            bs["mean"],
            bs["var"],
        )
        y_fused = conv2d(x, k, b)
        np.testing.assert_allclose(np.asarray(y_bn), np.asarray(y_fused), rtol=1e-4, atol=1e-5)
