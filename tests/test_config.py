"""Config loader behavior, incl. the scientific-notation float resolver."""

import textwrap

from pytorch_pose_estimation_tpu.config import get_configs, make_model_name


def test_scientific_notation_floats(tmp_path):
    p = tmp_path / "cfg.yaml"
    p.write_text(textwrap.dedent("""
        lr: 1e-3
        wd: 5e-3
        plain: 0.9
        sci_full: 1.5e-4
        name: 'abc'
        flag: True
        steps: [105000]
    """))
    cfg = get_configs(str(p))
    assert isinstance(cfg["lr"], float) and cfg["lr"] == 1e-3
    assert isinstance(cfg["wd"], float) and cfg["wd"] == 5e-3
    assert cfg["plain"] == 0.9
    assert cfg["sci_full"] == 1.5e-4
    assert cfg["name"] == "abc"
    assert cfg["flag"] is True
    assert cfg["steps"] == [105000]


def test_make_model_name():
    assert make_model_name({"model": "simple-baselines-pose",
                            "dataset_name": "coco-keypoints"}) == \
        "simple-baselines-pose_coco-keypoints"


def test_shipped_configs_parse():
    for name in ("sbp_coco", "spm_coco", "sbp_pis"):
        cfg = get_configs(f"configs/{name}.yaml")
        assert "input_size" in cfg and "num_keypoints" in cfg
        assert isinstance(cfg["optimizer_options"]["lr"], float)
