"""Metric goldens: IoUEvaluator vs the reference iouEval (torch oracle)."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from _reference_loader import load_reference_module
from mdilss_tpu.metrics import IoUEvaluator, confusion_matrix, iou_from_confusion


def _run_reference(preds_batches, targets_batches, num_classes, ignore_index):
    ref = load_reference_module("iouEval.py")
    ev = ref.iouEval(num_classes, ignore_index)
    for p, t in zip(preds_batches, targets_batches):
        ev.addBatch(
            torch.from_numpy(p[:, None].astype(np.int64)),
            torch.from_numpy(t[:, None].astype(np.int64)),
        )
    miou, per_class = ev.getIoU()
    return float(miou), per_class.numpy()


@pytest.mark.parametrize("num_classes,ignore_index", [(20, 19), (27, 26), (5, 99)])
def test_iou_matches_reference(rng, num_classes, ignore_index):
    preds = [rng.integers(0, num_classes, size=(2, 16, 24)) for _ in range(3)]
    targs = [rng.integers(0, num_classes, size=(2, 16, 24)) for _ in range(3)]

    ref_miou, ref_per_class = _run_reference(preds, targs, num_classes, ignore_index)

    ev = IoUEvaluator(num_classes, ignore_index)
    for p, t in zip(preds, targs):
        ev.add_batch(p, t)
    miou, per_class = ev.get_iou()

    np.testing.assert_allclose(miou, ref_miou, rtol=1e-6)
    np.testing.assert_allclose(per_class, ref_per_class, rtol=1e-6)


def test_predicted_ignore_counts_as_fn_not_fp():
    """A pixel predicted as the ignore class is a miss for its true class but
    must not create a false positive anywhere (iouEval.py:51)."""
    c, ign = 4, 3
    preds = np.full((1, 2, 2), ign)
    targs = np.zeros((1, 2, 2), dtype=np.int64)
    ev = IoUEvaluator(c, ign)
    ev.add_batch(preds, targs)
    miou, per_class = ev.get_iou()
    assert per_class[0] == 0.0  # class 0: 4 fn, 0 tp
    assert per_class[1] == 0.0 and per_class[2] == 0.0  # absent classes: 0/eps
    assert miou == 0.0


def test_target_ignore_counts_nowhere():
    c, ign = 4, 3
    preds = np.zeros((1, 2, 2), dtype=np.int64)
    targs = np.full((1, 2, 2), ign)
    ev = IoUEvaluator(c, ign)
    ev.add_batch(preds, targs)
    _, per_class = ev.get_iou()
    np.testing.assert_array_equal(per_class, np.zeros(3))  # no tp/fp/fn anywhere


def test_perfect_prediction_gives_miou_1(rng):
    c, ign = 6, 5
    targs = rng.integers(0, c - 1, size=(2, 8, 8))
    ev = IoUEvaluator(c, ign)
    ev.add_batch(targs, targs)
    miou, _ = ev.get_iou()
    assert miou == pytest.approx(1.0)


def test_confusion_matrix_counts(rng):
    c = 7
    p = rng.integers(0, c, size=(3, 10, 11))
    t = rng.integers(0, c, size=(3, 10, 11))
    cm = np.asarray(confusion_matrix(p, t, num_classes=c))
    # brute-force oracle
    ref = np.zeros((c, c), dtype=np.int64)
    for ti, pi in zip(t.reshape(-1), p.reshape(-1)):
        ref[ti, pi] += 1
    np.testing.assert_array_equal(cm, ref)
