"""Config system tests: include resolution, recursive merge, CLI coercion.

Mirrors reference semantics of src/utils/config_utils.py (see SURVEY.md §2.9).
"""

import os
import textwrap

import pytest

from multi_modal_foundation_model_tpu.config import (
    Config,
    coerce_value,
    config_from_kwargs,
    default_config_path,
    load_config,
    update_config,
)


def test_attribute_access_nested():
    cfg = Config({"a": {"b": {"c": 3}}})
    assert cfg.a.b.c == 3
    with pytest.raises(AttributeError):
        _ = cfg.missing


def test_include_resolution(tmp_path):
    inner = tmp_path / "inner.yaml"
    inner.write_text("x: 1\ny: [1, 2]\n")
    outer = tmp_path / "outer.yaml"
    outer.write_text(f"model: include:{inner.name}\nz: 2\n")
    cfg = load_config(str(outer))
    assert cfg.model.x == 1
    assert cfg.model.y == [1, 2]
    assert cfg.z == 2


def test_include_nested_chain(tmp_path):
    a = tmp_path / "a.yaml"
    a.write_text("leaf: 7\n")
    b = tmp_path / "b.yaml"
    b.write_text(f"sub: include:{a.name}\n")
    c = tmp_path / "c.yaml"
    c.write_text(f"top: include:{b.name}\n")
    cfg = load_config(str(c))
    assert cfg.top.sub.leaf == 7


def test_update_config_merge_overrides_and_creates():
    default = {"a": {"b": 1, "c": 2}, "d": 3}
    override = {"a": {"b": 10, "new": 5}, "e": 4}
    cfg = update_config(default, override)
    assert cfg.a.b == 10
    assert cfg.a.c == 2
    assert cfg.a.new == 5
    assert cfg.d == 3
    assert cfg.e == 4


def test_update_config_none_returns_default():
    cfg = update_config({"a": 1})
    assert cfg.a == 1


def test_coerce_value():
    assert coerce_value("1") == 1
    assert coerce_value("-3") == -3
    assert coerce_value("0.5") == 0.5
    assert coerce_value("true") is True
    assert coerce_value("False") is False
    assert coerce_value("null") is None
    assert coerce_value("[1, 2.5, x]") == [1, 2.5, "x"]
    assert coerce_value("hello") == "hello"


def test_config_from_kwargs_dotted():
    cfg = config_from_kwargs({"model.masker.ratio": "0.3", "training.num_epochs": "5"})
    assert cfg.model.masker.ratio == 0.3
    assert cfg.training.num_epochs == 5


def test_packaged_configs_load():
    mm = load_config(default_config_path("multi_modal/mm.yaml"))
    assert mm.encoder.transformer.hidden_size == 256
    assert mm.masker.mode == "temporal"
    trainer = load_config(default_config_path("multi_modal/trainer_mm.yaml"))
    assert trainer.training.train_batch_size == 16
    assert trainer.optimizer.lr == 1.0e-4

    # the reference entry-script pattern: include the model config by key
    cfg = config_from_kwargs({"model": "include:multi_modal/mm.yaml"})
    cfg = update_config(default_config_path("multi_modal/trainer_mm.yaml"), cfg)
    assert cfg.model.encoder.transformer.n_layers == 5
    assert cfg.training.num_epochs == 2000


def test_reference_style_src_configs_path_maps_to_package():
    cfg = config_from_kwargs({"model": "include:src/configs/multi_modal/mm.yaml"})
    assert cfg.model.decoder.transformer.n_heads == 8


def test_to_dict_roundtrip():
    cfg = Config({"a": {"b": [1, 2]}})
    plain = cfg.to_dict()
    assert plain == {"a": {"b": [1, 2]}}
    assert type(plain["a"]) is dict


def test_nested_mutation_through_attribute_persists():
    """cfg.section["key"] = v must mutate cfg itself, not a wrapped copy
    (the entry scripts poke loaded configs this way, e.g. num_epochs)."""
    from multi_modal_foundation_model_tpu.config import Config

    cfg = Config({"training": {"num_epochs": 2000}, "model": {"m": {"r": 1}}})
    cfg.training["num_epochs"] = 4
    assert cfg["training"]["num_epochs"] == 4
    cfg.model.m["r"] = 9
    assert cfg["model"]["m"]["r"] == 9
