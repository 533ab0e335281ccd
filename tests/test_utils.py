"""Tests for config loader, profiler, orbax checkpoints, torch conversion."""
import numpy as np
import pytest
import yaml

import jax
import jax.numpy as jnp

from onepose_plus_plus_tpu.utils import (
    SimpleProfiler,
    build_profiler,
    convert_torch_state_dict,
    load_checkpoint,
    load_config,
    save_checkpoint,
)


class TestConfigLoader:
    @pytest.fixture
    def configs_dir(self, tmp_path):
        (tmp_path / "preprocess").mkdir()
        (tmp_path / "config.yaml").write_text(
            yaml.safe_dump({"work_dir": ".", "type": None, "a": {"b": 1}})
        )
        (tmp_path / "preprocess" / "sfm_test.yaml").write_text(
            yaml.safe_dump({"type": "sfm", "a": {"c": 2}, "down_ratio": 5})
        )
        return str(tmp_path)

    def test_group_selector_merges(self, configs_dir):
        cfg = load_config(configs_dir, ["+preprocess=sfm_test.yaml"])
        assert cfg.type == "sfm"
        assert cfg.a.b == 1 and cfg.a.c == 2  # deep merge
        assert cfg.down_ratio == 5

    def test_group_selector_without_extension(self, configs_dir):
        cfg = load_config(configs_dir, ["+preprocess=sfm_test"])
        assert cfg.type == "sfm"

    def test_dotted_override(self, configs_dir):
        cfg = load_config(
            configs_dir,
            ["+preprocess=sfm_test", "a.b=42", "down_ratio=1", "flag=true"],
        )
        assert cfg.a.b == 42 and cfg.down_ratio == 1 and cfg.flag is True

    def test_get_path(self, configs_dir):
        cfg = load_config(configs_dir, [])
        assert cfg.get_path("a.b") == 1
        assert cfg.get_path("a.zzz", "dflt") == "dflt"

    def test_bad_arg_raises(self, configs_dir):
        with pytest.raises(ValueError):
            load_config(configs_dir, ["no_equals_sign"])
        with pytest.raises(FileNotFoundError):
            load_config(configs_dir, ["+preprocess=nope"])


class TestProfiler:
    def test_simple_profiler_records(self):
        p = SimpleProfiler()
        with p.record("stage_a"):
            pass
        with p.record("stage_a"):
            pass
        with p.record("stage_b"):
            pass
        assert p.counts["stage_a"] == 2
        s = p.summary()
        assert "stage_a" in s and "stage_b" in s

    def test_registry(self):
        assert build_profiler(None).summary() == ""
        assert isinstance(build_profiler("inference"), SimpleProfiler)
        with pytest.raises(ValueError):
            build_profiler("wat")

    def test_advanced_profiler_per_action_stats(self, tmp_path):
        """Reference AdvancedProfiler parity (profiler.py:196-254): each
        action gets its own cProfile aggregation in the summary + a
        dumpable .pstats file."""
        p = build_profiler("advanced")
        with p.record("pnp"):
            sum(range(1000))
        with p.record("pnp"):
            sorted([3, 1, 2])
        with p.record("match"):
            pass
        s = p.summary()
        assert "pnp" in s and "match" in s
        assert "cumulative" in s  # per-action pstats sections present
        p.dump(str(tmp_path / "prof"))
        import glob as _glob

        assert len(_glob.glob(str(tmp_path / "prof.*.pstats"))) == 2

    def test_chrome_trace_profiler_export(self, tmp_path):
        """Chrome-trace (catapult JSON) export of recorded actions — the
        host-side analogue of the reference PyTorch chrome-trace profiler."""
        import json

        p = build_profiler("chrome")
        with p.record("stage_a"):
            pass
        with p.record("stage_b"):
            pass
        out = tmp_path / "trace.json"
        p.export_chrome_trace(str(out))
        blob = json.load(open(out))
        names = {e["name"] for e in blob["traceEvents"]}
        assert names == {"stage_a", "stage_b"}
        assert all(e["ph"] == "X" and e["dur"] >= 0 for e in blob["traceEvents"])


class TestOrbax:
    def test_roundtrip(self, tmp_path):
        tree = {
            "params": {"w": jnp.ones((3, 4)), "b": jnp.zeros(4)},
            "step": jnp.asarray(7),
        }
        p = str(tmp_path / "ckpt")
        save_checkpoint(p, tree)
        out = load_checkpoint(p)
        np.testing.assert_allclose(np.asarray(out["params"]["w"]), 1.0)
        assert int(np.asarray(out["step"])) == 7


class TestTorchConversion:
    def _variables(self):
        from onepose_plus_plus_tpu.config import (
            CoarseMatchingConfig,
            OnePosePlusConfig,
            TransformerConfig,
            FineConfig,
        )
        from onepose_plus_plus_tpu.models.onepose_plus import OnePosePlusModel

        cfg = OnePosePlusConfig(
            coarse=TransformerConfig(d_model=256, nhead=8, layer_iter_n=1),
            coarse_matching=CoarseMatchingConfig(max_matches=8),
            fine=FineConfig(
                transformer=TransformerConfig(d_model=128, nhead=8, layer_iter_n=1)
            ),
        )
        model = OnePosePlusModel(cfg)
        batch = {
            "query_image": jnp.zeros((1, 64, 64, 1)),
            "keypoints3d": jnp.zeros((1, 32, 3)),
            "descriptors3d": jnp.zeros((1, 32, 128)),
            "descriptors3d_coarse": jnp.zeros((1, 32, 256)),
        }
        return model, model.init(jax.random.PRNGKey(0), batch, train=False)

    @pytest.mark.slow
    def test_backbone_and_transformer_mapping(self):
        _, variables = self._variables()
        rng = np.random.default_rng(0)
        sd = {
            # conv: OIHW, bn: 1d, linear: [out, in]
            "matcher.backbone.conv1.weight": rng.standard_normal((128, 1, 7, 7)).astype(np.float32),
            "backbone.bn1.weight": rng.standard_normal(128).astype(np.float32),
            "backbone.bn1.bias": rng.standard_normal(128).astype(np.float32),
            "backbone.bn1.running_mean": rng.standard_normal(128).astype(np.float32),
            "backbone.bn1.running_var": np.abs(rng.standard_normal(128)).astype(np.float32),
            "backbone.bn1.num_batches_tracked": np.asarray(5),
            "backbone.layer1.0.conv1.weight": rng.standard_normal((128, 128, 3, 3)).astype(np.float32),
            "backbone.layer2.0.downsample.0.weight": rng.standard_normal((196, 128, 1, 1)).astype(np.float32),
            "backbone.layer2.0.downsample.1.weight": rng.standard_normal(196).astype(np.float32),
            "loftr_coarse.layers.0.q_proj.weight": rng.standard_normal((256, 256)).astype(np.float32),
            "loftr_coarse.layers.0.mlp.0.weight": rng.standard_normal((512, 512)).astype(np.float32),
            "loftr_coarse.layers.0.mlp.2.weight": rng.standard_normal((256, 512)).astype(np.float32),
            "loftr_coarse.layers.0.norm1.weight": rng.standard_normal(256).astype(np.float32),
            "loftr_coarse.layers.0.norm1.bias": rng.standard_normal(256).astype(np.float32),
            "totally.unknown.weight": rng.standard_normal((3, 3)).astype(np.float32),
        }
        out, report = convert_torch_state_dict(sd, variables)
        assert "totally.unknown.weight" in report["skipped"]
        assert len(report["converted"]) == 13
        # conv transposed OIHW->HWIO
        np.testing.assert_allclose(
            np.asarray(out["params"]["backbone"]["conv1"]["kernel"]),
            sd["matcher.backbone.conv1.weight"].transpose(2, 3, 1, 0),
        )
        # bn routed: weight->scale, stats->batch_stats
        np.testing.assert_allclose(
            np.asarray(out["params"]["backbone"]["bn1"]["BatchNorm_0"]["scale"]),
            sd["backbone.bn1.weight"],
        )
        np.testing.assert_allclose(
            np.asarray(
                out["batch_stats"]["backbone"]["bn1"]["BatchNorm_0"]["mean"]
            ),
            sd["backbone.bn1.running_mean"],
        )
        # downsample.0/.1 split into conv/bn
        np.testing.assert_allclose(
            np.asarray(
                out["params"]["backbone"]["layer2_0"]["downsample_conv"]["kernel"]
            ),
            sd["backbone.layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0),
        )
        # linear transposed; mlp.2 -> mlp_1; layernorm weight -> scale
        np.testing.assert_allclose(
            np.asarray(
                out["params"]["loftr_coarse"]["layer_0"]["q_proj"]["kernel"]
            ),
            sd["loftr_coarse.layers.0.q_proj.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(
                out["params"]["loftr_coarse"]["layer_0"]["mlp_1"]["kernel"]
            ),
            sd["loftr_coarse.layers.0.mlp.2.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(
                out["params"]["loftr_coarse"]["layer_0"]["norm1"]["scale"]
            ),
            sd["loftr_coarse.layers.0.norm1.weight"],
        )

    @pytest.mark.slow
    def test_strict_raises_on_shape_mismatch(self):
        _, variables = self._variables()
        sd = {"backbone.conv1.weight": np.zeros((64, 1, 7, 7), np.float32)}
        with pytest.raises(ValueError):
            convert_torch_state_dict(sd, variables, strict=True)


class TestPlotting:
    def test_figures_render(self):
        from onepose_plus_plus_tpu.utils import (
            figure_to_array,
            plot_image_pair_matches,
            plot_matches_on_image,
            plot_reprojection_comparison,
        )

        rng = np.random.default_rng(0)
        img = rng.random((64, 64)).astype(np.float32)
        pts = rng.uniform(0, 63, (20, 2))
        conf = rng.random(20)
        f1 = plot_matches_on_image(img, pts, conf, "t")
        f2 = plot_reprojection_comparison(img, pts, pts + 1.0, "t")
        f3 = plot_image_pair_matches(img, img, pts, pts, conf)
        for f in (f1, f2, f3):
            arr = figure_to_array(f)
            assert arr.ndim == 3 and arr.shape[2] == 3 and arr.max() > 0


def test_override_scientific_notation_floats():
    """Hydra/OmegaConf parse dot-less scientific notation as float; YAML 1.1
    alone would yield the string "1e-6" (caught by the verify drive:
    model.match_coarse.thr=1e-6 reached the matcher as a str)."""
    from onepose_plus_plus_tpu.utils.config_loader import _parse_value

    assert _parse_value("1e-6") == 1e-6
    assert isinstance(_parse_value("1e-6"), float)
    assert _parse_value("1e6x") == "1e6x"
    assert _parse_value("3.3") == 3.3
