"""Config preset invariants: num_classes follows the datasets override, and
head/task list lengths must agree (silently mis-sized heads train garbage)."""
import pytest

from mdilss_tpu import config as C


def test_presets_default_num_classes_match_reference():
    assert C.step1().num_classes == (20,)
    assert C.step2().num_classes == (20, 20)
    assert C.step2("CS_IDD").num_classes == (20, 27)
    assert C.step3().num_classes == (20, 20, 27)
    assert C.multitask().num_classes == (20, 20, 27)
    assert C.ft_step(2).num_classes == (20, 20)
    assert C.ft_step(3).num_classes == (20, 20, 27)
    assert C.singletask("IDD").num_classes == (27,)


def test_num_classes_follows_datasets_override():
    """datasets=... without num_classes derives the right per-head counts
    instead of keeping the preset order's defaults."""
    assert C.singletask(datasets=("IDD",)).num_classes == (27,)
    assert C.step2(datasets=("cityscapes", "IDD")).num_classes == (20, 27)
    assert C.multitask(datasets=("cityscapes", "IDD")).num_classes == (20, 27)


def test_mismatched_lengths_rejected():
    with pytest.raises(ValueError, match="same length"):
        C.step2(num_classes=(20,))
