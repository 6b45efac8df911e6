"""ConfigNode semantics (parity with reference OrderedNamespace tests,
test/test_dict.py:7-67): merge, nesting, attr access, pickling."""

import pickle

from speechclip_tpu.config import ConfigNode, load_config


def test_basic_attr_and_item_access():
    cfg = ConfigNode({"a": 1, "b": {"c": [1, 2], "d": {"e": "x"}}})
    assert cfg.a == 1
    assert cfg["b"].c == [1, 2]
    assert cfg.b.d.e == "x"
    cfg.b.d.f = 3
    assert cfg["b"]["d"]["f"] == 3


def test_merge_later_wins_and_recurses():
    a = ConfigNode({"x": 1, "sub": {"p": 1, "q": 2}})
    b = {"sub": {"q": 3, "r": 4}, "y": 5}
    merged = a.merged(b)
    assert merged.sub.p == 1 and merged.sub.q == 3 and merged.sub.r == 4
    assert merged.x == 1 and merged.y == 5
    # original untouched
    assert a.sub.q == 2


def test_multiple_sources_ctor():
    cfg = ConfigNode({"a": 1}, {"a": 2, "b": 3})
    assert cfg.a == 2 and cfg.b == 3


def test_pickle_roundtrip():
    cfg = ConfigNode({"a": {"b": {"c": 42}}, "lst": [{"k": 1}]})
    restored = pickle.loads(pickle.dumps(cfg))
    assert isinstance(restored, ConfigNode)
    assert restored.a.b.c == 42
    assert restored.lst[0].k == 1


def test_get_set_path_and_overrides(tmp_path):
    yaml_file = tmp_path / "c.yaml"
    yaml_file.write_text("model:\n  dim: 8\n  lr: 1.0e-4\ndata:\n  name: flickr\n")
    cfg = load_config(str(yaml_file), overrides=["model.dim=16", "data.new.flag=true"])
    assert cfg.model.dim == 16
    assert cfg.model.lr == 1e-4
    assert cfg.data.name == "flickr"
    assert cfg.data.new.flag is True
    assert cfg.get_path("missing.path", "dflt") == "dflt"


def test_to_dict_deep():
    cfg = ConfigNode({"a": {"b": 1}})
    d = cfg.to_dict()
    assert type(d) is dict and type(d["a"]) is dict
