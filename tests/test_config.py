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


def test_ft_order_maps_to_domain_chain():
    """ft --order exposes the reference ft trainers' --dataset-old/new domain
    choice (main_ftp1_enc_newbn.py:463-499); the last domain is the one being
    fine-tuned, so current_task must point at it."""
    cfg = C.ft_step(order="CS_IDD")
    assert cfg.datasets == ("cityscapes", "IDD")
    assert cfg.num_classes == (20, 27)
    assert cfg.model == "erfnet_ftp1" and cfg.current_task == 1

    cfg = C.ft_step(order="CS_IDD_BDD")  # notebook cell 22's chain
    assert cfg.datasets == ("cityscapes", "IDD", "BDD")
    assert cfg.num_classes == (20, 27, 20)
    assert cfg.model == "erfnet_ftp2" and cfg.current_task == 2

    # defaults unchanged: no order behaves exactly like the old --heads-only CLI
    assert C.ft_step().datasets == ("cityscapes", "BDD")
    assert C.ft_step(order="CS_BDD_IDD").datasets == C.ft_step(3).datasets


def test_ft_order_validation():
    with pytest.raises(ValueError, match="unknown ft order"):
        C.ft_step(order="BDD_CS")
    # order and an inconsistent explicit n_heads must not silently pick one
    with pytest.raises(ValueError, match="n_heads"):
        C.ft_step(n_heads=3, order="CS_IDD")
    # consistent pairing is fine
    assert C.ft_step(n_heads=2, order="CS_IDD").num_classes == (20, 27)


def test_num_classes_follows_datasets_override():
    """datasets=... without num_classes derives the right per-head counts
    instead of keeping the preset order's defaults."""
    assert C.singletask(datasets=("IDD",)).num_classes == (27,)
    assert C.step2(datasets=("cityscapes", "IDD")).num_classes == (20, 27)
    assert C.multitask(datasets=("cityscapes", "IDD")).num_classes == (20, 27)


def test_mismatched_lengths_rejected():
    with pytest.raises(ValueError, match="same length"):
        C.step2(num_classes=(20,))


def test_unknown_dataset_without_num_classes_rejected():
    """A custom dataset name can't derive a head size — the error must say
    to pass num_classes, not die with a bare KeyError."""
    with pytest.raises(ValueError, match="num_classes explicitly"):
        C.singletask(datasets=("my_custom_set",))
    # and WITH an explicit num_classes it goes through
    assert C.singletask(datasets=("my_custom_set",), num_classes=(7,)).num_classes == (7,)


def test_device_cache_value_validated(tmp_path):
    """Unparseable device_cache budgets fail with a message listing the
    accepted forms, not an opaque int() ValueError."""
    from mdilss_tpu.train.protocols import build_trainer

    cfg = C.step1(synthetic=True, synthetic_size=4, batch_size=2,
                  height=16, width=32, num_epochs=1, device_cache="8GiB",
                  savedir=str(tmp_path))
    with pytest.raises(ValueError, match="integer byte budget"):
        build_trainer(cfg)._device_cache_budget()
