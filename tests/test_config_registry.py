"""Config loading (YAML, inheritance, interpolation), language codes,
and the component registry."""

import pyarrow as pa
import pytest

from patapsco_ray import registry
from patapsco_ray.pipelines.runner import _load_config
from patapsco_ray.text.langid import lang_to_two, standardize_lang


def test_yaml_config_with_interpolation(tmp_path):
    p = tmp_path / "c.yml"
    p.write_text(
        "run:\n  name: myrun\n  path: /tmp/runs/{run.name}\n"
        "documents:\n  input:\n    format: parquet\n    path: /data\n"
    )
    cfg = _load_config(p)
    assert cfg["run"]["path"] == "/tmp/runs/myrun"


def test_config_inheritance():
    cfg = _load_config({
        "base": {"k1": 0.9, "b": 0.4},
        "retrieve": {"inherit": "base", "b": 0.75},
    })
    # explicit keys win; inherited fill the rest (config.py:444-490)
    assert cfg["retrieve"] == {"k1": 0.9, "b": 0.75}


def test_json_config(tmp_path):
    p = tmp_path / "c.json"
    p.write_text('{"run": {"name": "x"}}')
    assert _load_config(p)["run"]["name"] == "x"


def test_lang_codes():
    assert standardize_lang("en") == "eng"
    assert standardize_lang("ENG") == "eng"
    assert standardize_lang("zh") == "zho"
    assert standardize_lang("chi") == "zho"
    assert lang_to_two("zho") == "zh"
    with pytest.raises(ValueError):
        standardize_lang("xx")


def test_registry_roundtrip():
    def custom_reader(path, lang):
        return pa.table({"doc_id": ["1"], "text": ["hi"], "lang": [lang]})

    registry.register("documents", "myformat", custom_reader)
    try:
        assert registry.resolve("documents", "myformat") is custom_reader
        assert registry.resolve("documents", "nope") is None
        assert "myformat" in registry.registered("documents")
    finally:
        registry._REGISTRY["documents"].pop("myformat")
    with pytest.raises(ValueError):
        registry.register("bogus_kind", "x", custom_reader)


def test_cli_override_parsing():
    from patapsco_ray.__main__ import _apply_override

    cfg = {"retrieve": {"k1": 0.9}}
    _apply_override(cfg, "retrieve.k1=1.2")
    _apply_override(cfg, "retrieve.name=qld")
    _apply_override(cfg, "run.path=/tmp/x")
    assert cfg["retrieve"] == {"k1": 1.2, "name": "qld"}
    assert cfg["run"]["path"] == "/tmp/x"
