import textwrap

from de6d_tpu.config import Config, cfg_from_list, cfg_from_yaml_file


def test_config_attr_access():
    c = Config({"A": {"B": [1, 2, {"C": 3}]}})
    assert c.A.B[2].C == 3
    c.A.D = {"E": 5}
    assert c["A"]["D"].E == 5


def test_yaml_base_config(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text(
        textwrap.dedent(
            """
            DATA_CONFIG:
              POINT_CLOUD_RANGE: [0, -40, -3, 70.4, 40, 1]
              SAMPLE: 10
            """
        )
    )
    child = tmp_path / "configs" / "kitti_models" / "model.yaml"
    child.parent.mkdir(parents=True)
    child.write_text(
        textwrap.dedent(
            f"""
            _BASE_CONFIG_: {base}
            CLASS_NAMES: [Car]
            DATA_CONFIG:
              SAMPLE: 20
            """
        )
    )
    cfg = cfg_from_yaml_file(str(child))
    assert cfg.DATA_CONFIG.POINT_CLOUD_RANGE[3] == 70.4
    assert cfg.DATA_CONFIG.SAMPLE == 20  # child overrides base
    assert cfg.CLASS_NAMES == ["Car"]
    assert cfg.TAG == "model"
    assert cfg.EXP_GROUP_PATH == "kitti_models"


def test_cfg_from_list():
    cfg = Config({"MODEL": {"HEAD": {"THRESH": 0.1, "K": 100}}})
    cfg_from_list(["MODEL.HEAD.THRESH", "0.7", "MODEL.HEAD.K", "256"], cfg)
    assert cfg.MODEL.HEAD.THRESH == 0.7
    assert cfg.MODEL.HEAD.K == 256
