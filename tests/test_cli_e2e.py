"""End-to-end CLI tests on the CPU backend (tiny shapes)."""

import os
import subprocess
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(entry, args, timeout=900):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = REPO
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    return subprocess.run(
        [sys.executable, os.path.join(REPO, entry)] + args,
        capture_output=True, text=True, timeout=timeout, env=env, cwd=REPO,
    )


class TestTrainCLI:
    def test_synthetic_train_and_eval(self, tmp_path):
        save = str(tmp_path / "run")
        res = _run_cli(
            "train.py",
            ["--dataset", "synthetic", "--patch_size", "32", "--batch_size", "2",
             "--epochs", "1", "--model_size", "S", "--save_dir", save,
             "--save_every", "1"],
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert os.path.exists(os.path.join(save, "synthetic", "log.txt"))

        res = _run_cli(
            "test.py",
            ["--dataset", "synthetic", "--patch_size", "32",
             "--ckpt", os.path.join(save, "synthetic", "weights"),
             "--save_dir", str(tmp_path / "eval")],
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "Average PSNR" in res.stdout
        csv = os.path.join(str(tmp_path / "eval"), "synthetic", "csv", "test_metrics.csv")
        assert os.path.exists(csv)


class TestPthImportCLI:
    def test_eval_from_torch_checkpoint(self, tmp_path):
        torch = pytest.importorskip("torch")
        sys.path.insert(0, os.path.join(REPO, "tests"))
        from torch_oracle import RawFormerOracle

        torch.manual_seed(0)
        oracle = RawFormerOracle(dim=32, num_heads=(8, 8, 8, 8))
        pth = str(tmp_path / "RawFormer_S_SID.pth")
        torch.save({"epoch": 3, "state_dict": oracle.state_dict()}, pth)

        res = _run_cli(
            "test.py",
            ["--dataset", "synthetic", "--patch_size", "32", "--model_size", "S",
             "--pth", pth, "--save_dir", str(tmp_path / "eval"), "--fp32"],
        )
        assert res.returncode == 0, res.stderr[-2000:]
        assert "imported torch checkpoint" in res.stdout
        assert "Average PSNR" in res.stdout


class TestMCRPipeline:
    def test_mcr_dataset_from_png(self, tmp_path):
        imageio = pytest.importorskip("imageio.v2")
        from bayer_low_light_image_enhancement_tpu.data.mcr import MCRDataset

        rng = np.random.default_rng(0)
        raw_paths, rgb_paths = [], []
        for k in range(2):
            # Filenames follow the MCR convention the amplification parser
            # expects: [-23:-20] image number, [-8:-4] hex exposure.
            name = f"C0{k:04d}_48mp_0x8_0x00ff.png"
            raw = rng.integers(0, 255, (64, 80), dtype=np.uint8)
            rgb = rng.integers(0, 255, (64, 80, 3), dtype=np.uint8)
            rp = str(tmp_path / ("raw_" + name))
            gp = str(tmp_path / ("rgb_" + name))
            imageio.imwrite(rp, raw)
            imageio.imwrite(gp, rgb)
            raw_paths.append(rp)
            rgb_paths.append(gp)

        ds = MCRDataset(raw_paths, rgb_paths, patch_size=32, training=True)
        inp, gt, amp = ds.sample(0, np.random.default_rng(1))
        assert inp.shape == (32, 32, 1)
        assert gt.shape == (32, 32, 3)
        # img_num 0 < 500 -> gt_expo 12287; expo 0x00ff = 255.
        assert float(amp) == pytest.approx(12287 / 255)

        ds_eval = MCRDataset(raw_paths, rgb_paths, training=False)
        inp, gt, _ = ds_eval.sample(1, np.random.default_rng(2))
        assert inp.shape == (64, 80, 1)
