"""The yaml loader must ingest the reference's own shipped configs."""

from pathlib import Path

import pytest

from segs_slam_tpu.io.config_yaml import load_mapper_yaml, parse_opencv_yaml

REF_CFG = Path("/root/reference/cfg/gaussian_mapper/RGB-D/Replica/replica_rgbd.yaml")


@pytest.mark.skipif(not REF_CFG.exists(), reason="reference cfg not mounted")
def test_load_reference_replica_config():
    model, opt, mapper, extras = load_mapper_yaml(REF_CFG)
    # spot-check against the file's values
    assert model.feat_dim == 32
    assert model.n_offsets == 10
    assert model.voxel_size == 0.001
    assert model.appearance_dim == 32
    assert model.embedding_dim == 179
    assert not model.add_opacity_dist
    assert opt.iterations == 30_000
    assert opt.offset_lr_init == 0.07
    assert opt.update_until == 25_500
    assert opt.densify_grad_threshold == 0.0002
    assert opt.use_frequency_regularization
    assert opt.use_multi_resolution
    assert opt.lambda_frequency_high == 0.01
    assert mapper.min_num_initial_map_kfs == 10
    assert mapper.new_keyframe_times_of_use == 8
    assert extras["z_far"] == 100.0
    assert not extras["gaus_pyramid_do"]


def test_parse_handles_comments_and_directives(tmp_path):
    p = tmp_path / "c.yaml"
    p.write_text("""%YAML:1.0
# comment
Model.feat_dim: 16  # trailing
Model.voxel_size: 0.01
Name.string: hello
""")
    y = parse_opencv_yaml(p)
    assert y == {"Model.feat_dim": 16, "Model.voxel_size": 0.01,
                 "Name.string": "hello"}
