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


def test_bench_variant_config_switch():
    """Drift guard for the shared bench variant switch
    (config.bench_variant_config): the per-script copies it replaced once
    diverged (bench_variants lost the large normalize_hiddenstates flag),
    so pin the fields that distinguish the presets and the branch gating.
    Large preset diffs mirror the reference's shipped base->large YAML
    diffs (config/speechCLIP/model_large/*)."""
    import pytest

    from speechclip_tpu.config import bench_variant_config

    base = bench_variant_config("base")
    assert base.audio_encoder.name == "hubert"
    assert base.clip.name == "ViT-B/32"
    assert base.model_settings.cascaded_objective_weight > 0
    assert base.model_settings.parallel_objective_weight > 0

    par = bench_variant_config("base_par")
    assert par.model_settings.cascaded_objective_weight == 0.0
    assert par.model_settings.parallel_objective_weight > 0

    casc = bench_variant_config("large_casc")
    assert casc.model_settings.parallel_objective_weight == 0.0
    assert casc.model_settings.cascaded_objective_weight > 0
    # the drift-prone large flags, all of them
    assert casc.audio_encoder.name == "hubert_large_ll60k"
    assert casc.audio_encoder.normalize_hiddenstates is True
    assert casc.clip.name == "ViT-L/14"
    assert casc.cl_loss.args.temperature_trainable is True
    for b in ("parallel_branch", "cascaded_branch"):
        assert casc.model_settings[b].transformer_args.d_model == 1024
        assert casc.model_settings[b].transformer_args.dim_feedforward == 4096

    with pytest.raises(ValueError, match="unknown bench variant"):
        bench_variant_config("huge_par")


def test_copy_construction_does_not_alias_subtrees():
    """ConfigNode(base) / assignment must SNAPSHOT nested nodes: the old
    by-reference _wrap made the copy share base's subtrees, so merging into
    the copy silently rewrote base's hyperparameters."""
    base = ConfigNode({"trainer": {"max_steps": 100}, "seed": 1})
    derived = ConfigNode(base)
    derived.merge_({"trainer": {"max_steps": 5}})
    assert derived.trainer.max_steps == 5
    assert base.trainer.max_steps == 100  # base untouched

    other = ConfigNode({})
    other["trainer"] = base.trainer
    other.trainer.max_steps = 7
    assert base.trainer.max_steps == 100
