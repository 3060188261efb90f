import pytest

from gslidar_tpu.config import Config, MissingMandatoryValue, load_run_config


def test_merge_and_attr_access(tmp_path):
    base = tmp_path / "base.yaml"
    base.write_text("a: 1\nnested:\n  x: 1\n  y: 2\nmodel_path: '???'\n")
    scene = tmp_path / "scene.yaml"
    scene.write_text("nested:\n  y: 3\nlist_val: [1, 2]\n")

    cfg = load_run_config(str(base), str(scene),
                          ["nested.x=9", "model_path=out", "flag=true"])
    assert cfg.a == 1
    assert cfg.nested.x == 9
    assert cfg.nested.y == 3
    assert cfg.list_val == [1, 2]
    assert cfg.model_path == "out"
    assert cfg.flag is True


def test_mandatory_raises():
    cfg = Config({"model_path": "???"})
    with pytest.raises(MissingMandatoryValue):
        _ = cfg.model_path
    assert cfg.get("model_path", "dflt") == "dflt"


def test_update_and_items():
    cfg = Config({"a": {"b": 1}})
    Config.update(cfg, "a.c.d", 5)
    assert cfg.a.c.d == 5
    keys = dict(cfg.items())
    assert "a" in keys


def test_cli_parsing_types():
    cfg = Config.from_cli(["lr=1e-3", "n=3", "name=foo", "xs=[1,2]",
                           "--flag", "nullv=null"])
    assert cfg.lr == pytest.approx(1e-3)
    assert cfg.n == 3
    assert cfg.name == "foo"
    assert cfg.xs == [1, 2]
    assert cfg.nullv is None
    assert "--flag" not in cfg
