"""parity-check runbook tests: the nine-setting Evaluation-notebook gate as
one command (round-4 verdict ask #5).

End-to-end against random-weight checkpoints exported in the reference's own
filenames (the notebook cells' files, expected_miou.json _source lines) plus
a synthetic cityscapes PNG tree: expect-gate FAILURES are the correct outcome
(random weights cannot hit recorded mIoUs) — what these tests pin is the
COMMAND PATH: checkpoint discovery per setting, the right --kind/--datasets
per setting, manifest overrides, and the one-JSON report, so that the day
real data + Drive checkpoints mount, parity is one command.
"""
import json
import os

import numpy as np
import pytest

import jax

from mdilss_tpu.ckpt import export_state_dict
from mdilss_tpu.models import erfnet_multihead, erfnet_rap
from mdilss_tpu.parity import SETTINGS, run_parity_check

H, W = 32, 64


def _save_ref_ckpt(path, params, bn, kind):
    import torch

    sd = export_state_dict(params, bn, kind=kind, prefix="module.")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    torch.save(
        {"epoch": 0, "arch": kind, "best_acc": 0.0, "optimizer": {},
         "state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()}},
        path,
    )


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    """Random-weight checkpoints for all nine settings under the reference's
    own filenames (tiny heads keep CPU compiles cheap; evaluate_checkpoint
    sizes everything from the checkpoint's inferred num_classes)."""
    root = tmp_path_factory.mktemp("parity_ckpts")
    key = jax.random.key(0)

    def rap(ncls):
        return erfnet_rap.init(key, list(ncls), len(ncls))

    def heads(ncls):
        return erfnet_multihead.init(key, list(ncls))

    p, b = rap([6])
    _save_ref_ckpt(str(root / "model_best_cityscapes_RAP_FT_step1.pth.tar"), p, b, "rap")
    p, b = rap([6, 7])
    _save_ref_ckpt(str(root / "model_best_BDD_erfnet_RA_parallel_step2.pth.tar"), p, b, "rap")
    _save_ref_ckpt(str(root / "model_best_IDD_CS-IDD_step2.pth.tar"), p, b, "rap")
    p, b = rap([5, 6, 7])
    _save_ref_ckpt(str(root / "CS1_BDD2_IDD3" / "model_best_IDD_step3.pth.tar"), p, b, "rap")
    _save_ref_ckpt(
        str(root / "CS1_IDD2_BDD3" / "checkpoint_BDD_OURS-CS1_IDD2_BDD3_step3.pth.tar"),
        p, b, "rap")
    for name in ("model_best_cityscapes_prenc", "checkpoint_BDD_prenc",
                 "checkpoint_IDD_prenc"):
        p, b = heads([6])
        p = {"encoder": p["encoder"], "decoder": p["decoders"][0]}
        b = {"encoder": b["encoder"], "decoder": b["decoders"][0]}
        _save_ref_ckpt(str(root / "single-task" / f"{name}.pth.tar"), p, b, "erfnet")
    p, b = heads([6, 7])
    _save_ref_ckpt(
        str(root / "FineTune" / "checkpoint_erfnet_ftp1_CStoBDD-final.pth.tar"),
        p, b, "ftp1")
    p, b = heads([5, 6, 7])
    _save_ref_ckpt(
        str(root / "FineTune" / "model_best_erfnet_ftp2_CSBDDtoIDD-FT.pth.tar"),
        p, b, "ftp2")
    _save_ref_ckpt(
        str(root / "FineTune" / "model_best_erfnet_ftp2_FT_CS1_IDD2_BDD3.pth.tar"),
        p, b, "ftp2")
    return root


@pytest.mark.slow
def test_parity_check_all_nine_settings(ckpt_root):
    """Every recorded setting resolves its checkpoint, evaluates with the
    right kind/datasets, and fails its gate (random weights) — no setting may
    be missing or error."""
    report = run_parity_check(str(ckpt_root), synthetic=True, height=H, width=W)
    assert set(report["settings"]) == set(SETTINGS)
    for setting, entry in report["settings"].items():
        assert entry["status"] == "fail", (setting, entry)
        # evaluated exactly the recorded domains, in the setting's order
        assert set(entry["results"]) == set(entry["expected"]), setting
    assert report["ok"] is False
    assert report["summary"] == {"pass": 0, "fail": 9, "missing_checkpoint": 0,
                                 "error": 0, "total": 9}


def test_parity_check_pattern_resolution(ckpt_root):
    """Filename patterns pick the intended notebook file per setting (the
    CS_BDD vs CS_IDD and the two step-3 orderings must not cross-match)."""
    from mdilss_tpu.parity import _candidate_checkpoints, _resolve

    cands = _candidate_checkpoints(str(ckpt_root))
    want = {
        "step1": "model_best_cityscapes_RAP_FT_step1.pth.tar",
        "step2_CS_BDD": "model_best_BDD_erfnet_RA_parallel_step2.pth.tar",
        "step2_CS_IDD": "model_best_IDD_CS-IDD_step2.pth.tar",
        "step3_CS_BDD_IDD": os.path.join("CS1_BDD2_IDD3", "model_best_IDD_step3.pth.tar"),
        "step3_CS_IDD_BDD": os.path.join(
            "CS1_IDD2_BDD3", "checkpoint_BDD_OURS-CS1_IDD2_BDD3_step3.pth.tar"),
        "ft_step2_CS_BDD": os.path.join(
            "FineTune", "checkpoint_erfnet_ftp1_CStoBDD-final.pth.tar"),
        "ft_step3_CS_BDD_IDD": os.path.join(
            "FineTune", "model_best_erfnet_ftp2_CSBDDtoIDD-FT.pth.tar"),
        "ft_step3_CS_IDD_BDD": os.path.join(
            "FineTune", "model_best_erfnet_ftp2_FT_CS1_IDD2_BDD3.pth.tar"),
    }
    for setting, expected_rel in want.items():
        got = _resolve(SETTINGS[setting][0]["patterns"], cands)
        assert got == expected_rel, (setting, got)
    # singletask: three per-domain jobs, each its own file
    for job, base in zip(SETTINGS["singletask"],
                         ("model_best_cityscapes_prenc", "checkpoint_BDD_prenc",
                          "checkpoint_IDD_prenc")):
        got = _resolve(job["patterns"], cands)
        assert got == os.path.join("single-task", f"{base}.pth.tar"), (base, got)


def test_parity_check_missing_and_unknown(tmp_path):
    report = run_parity_check(str(tmp_path), settings=["step1"], synthetic=True,
                              height=H, width=W)
    assert report["settings"]["step1"]["status"] == "missing_checkpoint"
    assert report["ok"] is False
    with pytest.raises(ValueError, match="unknown setting"):
        run_parity_check(str(tmp_path), settings=["step99"])


@pytest.mark.slow
def test_parity_check_manifest_override_and_real_tree(ckpt_root, tmp_path):
    """parity_manifest.json overrides discovery, and a real (synthetic-PNG)
    cityscapes tree under --data-root is read through make_source — the full
    non-synthetic command path for one setting."""
    from PIL import Image

    # tiny cityscapes val tree (labels within the checkpoint's 6 classes)
    cs = tmp_path / "cs"
    (cs / "leftImg8bit" / "val" / "c").mkdir(parents=True)
    (cs / "gtFine" / "val" / "c").mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(rng.integers(0, 255, (H, W, 3), dtype=np.uint8)).save(
            cs / "leftImg8bit" / "val" / "c" / f"c_{i:06d}_leftImg8bit.png")
        lab = rng.choice([0, 1, 255], size=(H, W)).astype(np.uint8)
        Image.fromarray(lab, mode="L").save(
            cs / "gtFine" / "val" / "c" / f"c_{i:06d}_gtFine_labelTrainIds.png")

    # a validly-shaped step-1 checkpoint under a name NO pattern matches:
    # only the manifest can reach it
    import shutil

    (ckpt_root / "renamed").mkdir(exist_ok=True)
    shutil.copy(ckpt_root / "model_best_cityscapes_RAP_FT_step1.pth.tar",
                ckpt_root / "renamed" / "oddly_named.pth.tar")
    manifest = {"step1": "renamed/oddly_named.pth.tar"}
    with open(ckpt_root / "parity_manifest.json", "w") as f:
        json.dump(manifest, f)
    try:
        report = run_parity_check(
            str(ckpt_root), settings=["step1"], synthetic=False,
            data_roots={"cityscapes": str(cs)}, height=H, width=W,
        )
    finally:
        os.unlink(ckpt_root / "parity_manifest.json")
    entry = report["settings"]["step1"]
    # the manifest's checkpoint was used, not the pattern match...
    assert entry["checkpoints"][0].endswith(os.path.join("renamed", "oddly_named.pth.tar"))
    # ...and cityscapes was evaluated from the PNG tree (gate fails, as random
    # weights must)
    assert entry["status"] == "fail" and "cityscapes" in entry["results"]
