"""Tests for DCASE class mappings."""

import pytest

from audiblelight_tpu.class_mappings import (
    ALL_MAPPINGS,
    ClassMapping,
    DCASE2023Task3,
    DCASE2025Task4,
    get_class_mapping_from_string,
    infer_id_and_label_from_inputs,
    sanitize_class_mapping,
)


def test_mapping_sizes():
    assert len(DCASE2023Task3()) == 13
    assert len(DCASE2025Task4()) == 18


def test_getitem_bidirectional():
    m = DCASE2023Task3()
    assert m["femaleSpeech"] == 0
    assert m[0] == "femaleSpeech"
    assert m["knock"] == 12
    with pytest.raises(KeyError):
        _ = m["nonexistent"]


def test_infer_from_filepath():
    m = DCASE2023Task3()
    idx, cls = m.infer_label_idx_from_filepath("/data/soundevents/maleSpeech/train/x.wav")
    assert (idx, cls) == (1, "maleSpeech")
    idx, cls = m.infer_label_idx_from_filepath("/data/unknown/x.wav")
    assert (idx, cls) == (None, None)


def test_infer_from_filepath_ambiguous_raises():
    m = DCASE2023Task3()
    with pytest.raises(ValueError):
        m.infer_label_idx_from_filepath("/data/maleSpeech/femaleSpeech/x.wav")


def test_infer_missing_values():
    m = DCASE2023Task3()
    assert m.infer_missing_values(None, "music") == (8, "music")
    assert m.infer_missing_values(8, None) == (8, "music")
    assert m.infer_missing_values(3, "telephone") == (3, "telephone")


def test_validate_mapping():
    with pytest.raises(ValueError):
        ClassMapping({"a": 0, "b": 2})  # non-contiguous
    with pytest.raises(ValueError):
        ClassMapping({"a": 0, "b": 0})  # duplicates
    with pytest.raises(TypeError):
        ClassMapping({1: 0})  # bad key type


def test_sanitize_class_mapping():
    assert isinstance(sanitize_class_mapping("DCASE2023Task3"), DCASE2023Task3)
    assert isinstance(sanitize_class_mapping(DCASE2023Task3), DCASE2023Task3)
    inst = DCASE2023Task3()
    assert sanitize_class_mapping(inst) is inst
    custom = sanitize_class_mapping({"a": 0, "b": 1})
    assert custom["b"] == 1
    assert sanitize_class_mapping(None) is None
    with pytest.raises(TypeError):
        sanitize_class_mapping(3.14)


def test_get_class_mapping_from_string_case_insensitive():
    assert get_class_mapping_from_string("dcase2023task3") is DCASE2023Task3
    with pytest.raises(ValueError):
        get_class_mapping_from_string("DCASE1999Task9")


def test_infer_id_and_label_from_inputs():
    m = DCASE2023Task3()
    # both given -> trusted
    assert infer_id_and_label_from_inputs(5, "whatever", m) == (5, "whatever")
    # one given -> inferred
    assert infer_id_and_label_from_inputs(None, "music", m) == (8, "music")
    # neither given -> from filepath
    assert infer_id_and_label_from_inputs(
        None, None, m, "/d/bell/x.wav"
    ) == (11, "bell")
    # nothing available
    assert infer_id_and_label_from_inputs(None, None, None, None) == (None, None)


def test_all_mappings_are_valid():
    for cls in ALL_MAPPINGS:
        inst = cls()
        inst.validate_mapping()
        inv = inst.mapping_inverted
        assert len(inv) == len(inst)
