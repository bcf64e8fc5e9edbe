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


# ---- strict config validation (reference config.py Extra.forbid +
# job.py:929-962 plan cross-checks) ----

import json as _json

from patapsco_ray.pipelines import ConfigError, Runner
from patapsco_ray.pipelines.runner import _validate_config


def _base_cfg(**over):
    cfg = {
        "run": {"name": "t", "path": "/tmp/cfgtest_run"},
        "documents": {"input": {"format": "parquet",
                                "path": "/tmp/docs.parquet"}},
        "queries": [["1", "hello world"]],
    }
    cfg.update(over)
    return cfg


def test_valid_config_accepted():
    Runner(_base_cfg(text={"stem": "porter"},
                     retrieve={"name": "qld", "mu": 500}))


def test_typoed_text_key_raises():
    with pytest.raises(ConfigError, match="stemm"):
        Runner(_base_cfg(text={"stemm": "porter"}))


def test_unknown_top_level_section_raises():
    with pytest.raises(ConfigError, match="retreive"):
        Runner(_base_cfg(retreive={"name": "bm25"}))


def test_nested_typo_raises():
    cfg = _base_cfg()
    cfg["documents"]["input"]["patth"] = "/x"
    with pytest.raises(ConfigError, match="patth"):
        Runner(cfg)


def test_invalid_enum_value_raises():
    with pytest.raises(ConfigError, match="dpr"):
        Runner(_base_cfg(retrieve={"name": "dpr"}))
    with pytest.raises(ConfigError, match="zigzag"):
        Runner(_base_cfg(index={"strategy": "zigzag"}))


def test_missing_required_fields_raise():
    cfg = _base_cfg()
    del cfg["documents"]["input"]["path"]
    with pytest.raises(ConfigError, match="documents.input.path"):
        Runner(cfg)
    cfg = _base_cfg()
    del cfg["queries"]
    with pytest.raises(ConfigError, match="topics"):
        Runner(cfg)
    with pytest.raises(ConfigError, match="script"):
        Runner(_base_cfg(rerank={"name": "shell"}))
    with pytest.raises(ConfigError, match="psq"):
        Runner(_base_cfg(retrieve={"psq": {"threshold": 0.9}}))


def test_comment_allowed_everywhere():
    cfg = _base_cfg(text={"stem": False, "comment": "why"})
    cfg["comment"] = "top"
    cfg["documents"]["comment"] = "docs"
    Runner(cfg)


def test_registered_custom_format_passes_enum_check():
    registry.register("documents", "weird", lambda p, l: None)
    try:
        cfg = _base_cfg()
        cfg["documents"]["input"]["format"] = "weird"
        _validate_config(cfg)
    finally:
        registry._REGISTRY["documents"].pop("weird")
    cfg = _base_cfg()
    cfg["documents"]["input"]["format"] = "weird"
    with pytest.raises(ConfigError, match="weird"):
        _validate_config(cfg)


def test_store_source_cross_check(tmp_path):
    store = tmp_path / "database"
    store.mkdir()
    (store / ".config.json").write_text(_json.dumps(
        {"documents": {"input": {"path": "/a/corpus1.parquet"}}}))
    ok = _base_cfg()
    ok["documents"]["input"]["path"] = "/elsewhere/corpus1.parquet"
    Runner._check_store_source(store, ok)  # same basename: fine
    bad = _base_cfg()
    bad["documents"]["input"]["path"] = "/a/corpus2.parquet"
    with pytest.raises(ConfigError, match="do not match"):
        Runner._check_store_source(store, bad)
    # missing artifact config only warns (reference behavior)
    (store / ".config.json").unlink()
    Runner._check_store_source(store, bad)


def test_resumed_index_text_mismatch_raises(tmp_path):
    run_path = tmp_path / "run"
    (run_path / "index").mkdir(parents=True)
    (run_path / "index" / "manifest.json").write_text(_json.dumps({
        "text_config": {"tokenize": "whitespace", "stopwords": "lucene",
                        "stem": "porter", "lowercase": True},
        "segments": [], "ndocs": 0, "total_tf": 0, "avgdl": 0.0,
    }))
    cfg = _base_cfg(text={"stem": False})
    cfg["run"]["path"] = str(run_path)
    with pytest.raises(ConfigError, match="does not match"):
        Runner(cfg).run()
