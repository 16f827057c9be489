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
