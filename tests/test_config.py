import os

import pytest
import yaml

from mlinerf_tpu.config import (
    AttrDict,
    Config,
    load_yaml_with_parents,
    parse_cmdline_arguments,
    recursive_update_strict,
)


def test_attrdict_access():
    d = AttrDict({"a": {"b": [1, 2]}, "c": 3})
    assert d.a.b == [1, 2]
    assert d.c == 3
    d.a.x = {"y": 4}
    assert d.a.x.y == 4


def test_parent_inheritance(tmp_path):
    parent = tmp_path / "parent.yaml"
    child = tmp_path / "child.yaml"
    parent.write_text("a: 1\nnested:\n    x: 1\n    y: 2\n")
    child.write_text(f"_parent_: {parent}\nnested:\n    y: 99\nb: 2\n")
    cfg = load_yaml_with_parents(str(child))
    assert cfg.a == 1 and cfg.b == 2
    assert cfg.nested.x == 1 and cfg.nested.y == 99


def test_parent_relative_path(tmp_path):
    (tmp_path / "parent.yaml").write_text("a: 1\n")
    (tmp_path / "child.yaml").write_text("_parent_: parent.yaml\nb: 2\n")
    cfg = load_yaml_with_parents(str(tmp_path / "child.yaml"))
    assert cfg.a == 1 and cfg.b == 2


def test_scientific_notation_floats(tmp_path):
    f = tmp_path / "c.yaml"
    f.write_text("lr: 5e-4\nbig: 1e5\n")
    cfg = load_yaml_with_parents(str(f))
    assert isinstance(cfg.lr, float) and cfg.lr == 5e-4
    assert cfg.big == 1e5


def test_cli_override_parsing():
    out = parse_cmdline_arguments(["--a.b=3", "--c", "--d!", "--e.f=[1,2]", "--g="])
    assert out == {"a": {"b": 3}, "c": True, "d": False, "e": {"f": [1, 2]}, "g": None}


def test_strict_update_rejects_unknown():
    d = AttrDict({"a": {"b": 1}})
    with pytest.raises(KeyError):
        recursive_update_strict(d, {"a": {"zzz": 2}})


def test_full_config_with_overrides(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text("max_iter: 100\nmodel:\n    type: nerf\n")
    cfg = Config(str(f), cli_args=["--max_iter=50"])
    assert cfg.max_iter == 50
    assert cfg.model.type == "nerf"
    assert cfg.logging_iter == 100  # from base defaults


def test_save_config_roundtrip(tmp_path):
    f = tmp_path / "exp.yaml"
    f.write_text("max_iter: 7\n")
    cfg = Config(str(f))
    cfg.save_config(str(tmp_path / "log"))
    with open(tmp_path / "log" / "config.yaml") as fh:
        loaded = yaml.safe_load(fh)
    assert loaded["max_iter"] == 7
