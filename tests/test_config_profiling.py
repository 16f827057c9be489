"""Config override layer + profiling helpers."""

import json

import numpy as np
import jax.numpy as jnp
import pytest

from pfilter_tpu import config as cfgmod
from pfilter_tpu.utils.profiling import StageTimer


def test_dotted_overrides_and_types():
    cfg = cfgmod.load_config(
        "kitti", cli_overrides=["odometry.theta_p=0.7", "mode=bpf", "capacity.knn_tiles=32"]
    )
    assert cfg.odometry.theta_p == 0.7
    assert cfg.mode == "bpf"
    assert cfg.capacity.knn_tiles == 32 and isinstance(cfg.capacity.knn_tiles, int)


def test_yaml_overrides(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("odometry:\n  map_resolution: 0.8\nlidar:\n  num_lines: 32\n")
    cfg = cfgmod.load_config("default", yaml_path=p)
    assert cfg.odometry.map_resolution == 0.8
    assert cfg.lidar.num_lines == 32


def test_unknown_field_rejected():
    with pytest.raises(KeyError):
        cfgmod.load_config("default", cli_overrides=["odometry.nope=1"])
    with pytest.raises(KeyError):
        cfgmod.load_config("nope")


def test_stage_timer(tmp_path):
    path = tmp_path / "stages.jsonl"
    st = StageTimer(jsonl_path=str(path))
    for _ in range(3):
        with st.stage("work") as out:
            out["result"] = jnp.ones(16).sum()
    st.close()
    s = st.summary()
    assert s["work"]["n"] == 3 and s["work"]["mean_ms"] >= 0
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) == 3 and lines[0]["stage"] == "work"
    assert "work" in st.report()


def test_pick_candidates_validation():
    with pytest.raises(ValueError, match="pick_candidates"):
        cfgmod.FeatureConfig(max_edge_per_sector=40, suppression_radius=5)


def test_tile_cap_key_overflow_raises():
    from pfilter_tpu.ops import knn_tiled

    tmap = knn_tiled.build_tiled(
        jnp.zeros((256, 3), jnp.float32),
        jnp.zeros((256, 2), jnp.float32),
        jnp.zeros(256, bool),
        jnp.zeros(3, jnp.float32),
        8,
        4,
        896,  # > max supported: packed key lane bits overflow
    )
    with pytest.raises(ValueError, match="overflows the packed kNN key"):
        knn_tiled.query_tiled_sorted(
            tmap,
            jnp.zeros((8, 3), jnp.float32),
            jnp.zeros(65, jnp.int32),
            8,
            4,
            896,
            interpret=True,
        )
