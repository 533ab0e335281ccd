"""Unit tests for visualization outputs, single-process comm, profiling trace,
and template utils."""
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


class TestVisualization:
    def test_demo_frame_and_video(self, tmp_path):
        from onepose_plus_plus_tpu.utils import make_video, save_demo_frame
        from onepose_plus_plus_tpu.utils.visualization import project_box_corners

        rng = np.random.default_rng(0)
        img = rng.random((64, 64)).astype(np.float32)
        K = np.array([[100.0, 0, 32], [0, 100, 32], [0, 0, 1]])
        T = np.eye(4)
        T[2, 3] = 1.0
        corners = np.array(
            [[x, y, z] for x in (-0.1, 0.1) for y in (-0.1, 0.1) for z in (-0.1, 0.1)]
        )
        uv = project_box_corners(corners, T, K)
        assert np.all(np.isfinite(uv)) and uv.shape == (8, 2)
        paths = []
        for i in range(3):
            p = str(tmp_path / f"{i}.png")
            save_demo_frame(img, T, K, corners, p, inliers=42)
            assert os.path.exists(p)
            paths.append(p)
        out = str(tmp_path / "demo.mp4")
        make_video(paths, out, fps=5)
        assert os.path.exists(out) and os.path.getsize(out) > 0

    def test_save_ply_roundtrippable(self, tmp_path):
        from onepose_plus_plus_tpu.eval import load_ply_vertices
        from onepose_plus_plus_tpu.utils import save_ply

        pts = np.random.default_rng(1).standard_normal((10, 3))
        p = str(tmp_path / "pc.ply")
        save_ply(p, pts, colors=np.full((10, 3), 128))
        back = load_ply_vertices(p)
        np.testing.assert_allclose(back, pts, rtol=1e-5)


class TestComm:
    def test_single_process_shortcuts(self):
        from onepose_plus_plus_tpu.parallel import (
            all_gather_arrays,
            all_gather_objects,
            gather_metrics,
            is_main_process,
            rank,
            world_size,
        )

        assert world_size() == 1 and rank() == 0 and is_main_process()
        arr = all_gather_arrays(np.ones(3))
        assert arr.shape == (1, 3)
        objs = all_gather_objects({"a": [1, 2]})
        assert objs == [{"a": [1, 2]}]
        assert gather_metrics({"R": [1.0]}) == [{"R": [1.0]}]


class TestProfilingTrace:
    @pytest.mark.slow
    def test_trace_writes_artifacts(self, tmp_path):
        import jax.numpy as jnp

        from onepose_plus_plus_tpu.utils import annotate, trace

        with trace(str(tmp_path)):
            with annotate("hot_section"):
                _ = jnp.sum(jnp.ones((8, 8))).block_until_ready()
        # jax profiler writes a plugins/profile directory
        found = list(tmp_path.rglob("*.xplane.pb")) + list(
            tmp_path.rglob("*.trace.json.gz")
        )
        assert found, list(tmp_path.rglob("*"))


class TestTemplateUtils:
    def test_format_and_flatten(self):
        from onepose_plus_plus_tpu.utils import flatten_config, format_config

        cfg = {"a": {"b": 1, "c": "x"}, "d": True}
        s = format_config(cfg)
        assert "a:" in s and "b: 1" in s
        flat = flatten_config(cfg)
        assert flat == {"a.b": 1, "a.c": "x", "d": True}
