"""Composed END-TO-END eval parity against the reference's full torch stack.

Every piece of the eval path is individually golden-tested (model logits,
iouEval semantics, transforms, decode); this module tests the COMPOSITION —
the exact workflow a user of the reference runs to evaluate a released
checkpoint (Evaluation_Notebook.ipynb cells 3-5):

  reference side: dataset_custom.py loaders (recursive walk + suffix filters
  + sort) -> torchvision Resize(BILINEAR/NEAREST) + ToTensor + ToLabel +
  Relabel(255, C-1) -> Net_RAP forward -> outputs.max(1)[1] -> iouEval.py
  one-hot tp/fp/fn -> per-class IoU;

  our side: the same on-disk PNG tree through `mdilss_tpu eval` — pth_tar
  conversion (ckpt/pth_converter.py), data/sources.py indexing,
  transforms.decode_pair, prepare_batch relabel, jitted argmax,
  metrics.IoUEvaluator confusion matrix.

Composition bugs (file ordering/pairing, palette decode mode, resize seam,
relabel constant, argmax dtype) are precisely what the unit goldens miss;
this is the strongest available proxy for the real-data parity that is
environment-blocked (no datasets/checkpoints mountable; BASELINE.md).

Exactness strategy: in float32, cross-implementation logit differences
(~1e-5, golden-test bound 2e-4) flip argmax on pixels whose top-2 gap is
below the error — an irreducible O(few)-pixel noise over ~57k pixels, so
the f32 arm asserts a pixel budget. The f64 arm removes the mechanism:
forward differences drop to ~1e-13 against top-2 gaps ~1e-5, so confusion
counts — and therefore per-class IoU, computed by the identical
tp/(tp+fp+fn+1e-15) f64 expression on both sides — must be BIT-IDENTICAL.
"""
import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from PIL import Image
from torch.utils.data import DataLoader

import jax

from _reference_loader import load_reference_module


# torchvision is not installed in this environment; these are its exact
# PIL-input semantics (torchvision.transforms.functional.resize dispatches a
# PIL image straight to img.resize((w, h), interpolation); to_tensor is
# HWC->CHW float32 / 255) so the oracle matches notebook cell 3 bit-for-bit.
class Compose:
    def __init__(self, fns):
        self.fns = fns

    def __call__(self, x):
        for f in self.fns:
            x = f(x)
        return x


class Resize:
    def __init__(self, size, interpolation):
        self.size = size  # [h, w]
        self.interpolation = interpolation

    def __call__(self, img):
        return img.resize((self.size[1], self.size[0]), self.interpolation)


class ToTensor:
    def __call__(self, img):
        arr = np.array(img, np.uint8)
        return torch.from_numpy(arr).permute(2, 0, 1).float().div(255)

HEIGHT, WIDTH = 64, 128       # eval size (notebook: 512x1024)
NATIVE_H, NATIVE_W = 96, 160  # on-disk size != eval size: exercises resize
NUMC_CS, NUMC_IDD = 20, 27


def _save_label(arr: np.ndarray, path: str):
    """Palettized label PNG ('P' mode, identity grayscale palette) — the
    format of real *_labelTrainIds.png files; the reference opens with
    .convert('P') (dataset_custom.py:106), ours decodes indices directly."""
    im = Image.fromarray(arr, mode="P")
    im.putpalette([v for i in range(256) for v in (i, i, i)])
    im.save(path)


def _write_tree(root: str, *, n: int, num_classes: int, label_suffix: str,
                seed: int) -> None:
    """CS-convention tree: <root>/leftImg8bit/val/<city>/... +
    <root>/gtFine/val/<city>/...; two 'cities' so the recursive walk + global
    sort (dataset_custom.py:85-93 vs data/sources.py) is actually exercised."""
    rng = np.random.default_rng(seed)
    for i in range(n):
        city = ["aa", "ab"][i % 2]
        for sub in ("leftImg8bit/val/" + city, "gtFine/val/" + city):
            os.makedirs(os.path.join(root, sub), exist_ok=True)
        img = rng.integers(0, 256, (NATIVE_H, NATIVE_W, 3), dtype=np.uint8)
        lbl = rng.integers(0, num_classes - 1, (NATIVE_H, NATIVE_W)).astype(np.uint8)
        lbl[rng.random((NATIVE_H, NATIVE_W)) < 0.07] = 255  # ignore pixels
        stem = f"{city}_{i:03d}"
        Image.fromarray(img).save(
            os.path.join(root, "leftImg8bit/val", city, f"{stem}_leftImg8bit.png"))
        _save_label(lbl, os.path.join(
            root, "gtFine/val", city, f"{stem}_gtFine_{label_suffix}"))


def _reference_eval(model, dataset, task: int, num_cls: int, ref_iou,
                    dtype: torch.dtype, fwd=None):
    """Notebook cell 5's eval loop, verbatim semantics on CPU: bs-1 loader,
    eval mode, argmax -> iouEval.addBatch(pred.unsqueeze(1), target).
    `fwd(model, images, task)` overrides the forward call for model families
    whose head selection is not a positional task index (ftp1's
    decoder_old=/decoder_new= flags, erfnet_ftp1.py:143-149)."""
    loader = DataLoader(dataset, num_workers=0, batch_size=1, shuffle=False)
    model.eval()
    ev = ref_iou.iouEval(num_cls, num_cls - 1)
    with torch.no_grad():
        for images, labels, _fn, _fnGt in loader:
            if fwd is None:
                outputs = model(images.to(dtype), task)
            else:
                outputs = fwd(model, images.to(dtype), task)
            ev.addBatch(outputs.max(1)[1].unsqueeze(1).data, labels.data)
    miou, per_class = ev.getIoU()
    return float(miou), per_class.numpy().astype(np.float64)


@pytest.fixture(scope="module")
def parity_setup(tmp_path_factory):
    """On-disk trees (CS + IDD conventions) and a reference-format checkpoint
    of a random-weight 2-head Net_RAP."""
    tmp = tmp_path_factory.mktemp("eval_parity")
    cs_root, idd_root = str(tmp / "cs"), str(tmp / "idd")
    _write_tree(cs_root, n=4, num_classes=NUMC_CS,
                label_suffix="labelTrainIds.png", seed=11)
    _write_tree(idd_root, n=3, num_classes=NUMC_IDD,
                label_suffix="labellevel3Ids.png", seed=22)

    ref_rap = load_reference_module("models/erfnet_RA_parallel.py")
    torch.manual_seed(7)
    model = ref_rap.Net([NUMC_CS, NUMC_IDD], nb_tasks=2, cur_task=1)
    model.eval()
    ckpt = str(tmp / "model_best.pth.tar")
    torch.save(
        {"epoch": 1, "arch": "Net",
         "state_dict": {"module." + k: v for k, v in model.state_dict().items()}},
        ckpt,
    )

    dc = load_reference_module("dataset_custom.py")
    tr = load_reference_module("transform.py")
    input_transform = Compose([Resize([HEIGHT, WIDTH], Image.BILINEAR),
                               ToTensor()])
    tt_cs = Compose([Resize([HEIGHT, WIDTH], Image.NEAREST), tr.ToLabel(),
                     tr.Relabel(255, NUMC_CS - 1)])
    tt_idd = Compose([Resize([HEIGHT, WIDTH], Image.NEAREST), tr.ToLabel(),
                      tr.Relabel(255, NUMC_IDD - 1)])
    ds_cs = dc.cityscapes(cs_root, input_transform, tt_cs, "val")
    ds_idd = dc.IDD(idd_root, input_transform, tt_idd, "val")
    assert len(ds_cs) == 4 and len(ds_idd) == 3
    ref_iou = load_reference_module("iouEval.py")
    return dict(cs_root=cs_root, idd_root=idd_root, ckpt=ckpt, model=model,
                ds_cs=ds_cs, ds_idd=ds_idd, ref_iou=ref_iou)


@pytest.mark.slow
def test_composed_eval_parity_f64_bit_identical(parity_setup):
    """f64 both sides: per-class IoU bit-identical, mIoU to >=12 decimals."""
    s = parity_setup
    model = s["model"].double()
    ref = {
        "cityscapes": _reference_eval(model, s["ds_cs"], 0, NUMC_CS,
                                      s["ref_iou"], torch.float64),
        "IDD": _reference_eval(model, s["ds_idd"], 1, NUMC_IDD,
                               s["ref_iou"], torch.float64),
    }
    from mdilss_tpu.evaluate import evaluate_checkpoint

    try:
        results, per_class = evaluate_checkpoint(
            s["ckpt"], kind="rap", datasets=["cityscapes", "IDD"],
            data_roots={"cityscapes": s["cs_root"], "IDD": s["idd_root"]},
            height=HEIGHT, width=WIDTH, compute_dtype="float64",
            return_per_class=True,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    for d in ("cityscapes", "IDD"):
        ref_miou, ref_pc = ref[d]
        # identical confusion counts => the shared tp/(tp+fp+fn+1e-15) f64
        # expression must produce bit-identical per-class IoU
        np.testing.assert_array_equal(per_class[d], ref_pc, err_msg=d)
        assert abs(results[d] - ref_miou) < 1e-12, (d, results[d], ref_miou)


@pytest.mark.slow
def test_cli_f64_flag_matches_library(parity_setup, capsys):
    """`eval --f64` wires through to compute_dtype=float64: the CLI's
    (4-decimal-rounded) output equals the library f64 evaluation."""
    s = parity_setup
    from mdilss_tpu.cli import main as cli_main
    from mdilss_tpu.evaluate import evaluate_checkpoint

    try:
        lib = evaluate_checkpoint(
            s["ckpt"], kind="rap", datasets=["cityscapes", "IDD"],
            data_roots={"cityscapes": s["cs_root"], "IDD": s["idd_root"]},
            height=HEIGHT, width=WIDTH, compute_dtype="float64",
        )
        capsys.readouterr()
        cli_main([
            "eval", s["ckpt"], "--kind", "rap",
            "--datasets", "cityscapes", "IDD",
            "--data-root", f"cityscapes={s['cs_root']}",
            "--data-root", f"IDD={s['idd_root']}",
            "--height", str(HEIGHT), "--width", str(WIDTH), "--f64",
        ])
    finally:
        jax.config.update("jax_enable_x64", False)
    out = capsys.readouterr().out.strip().splitlines()
    got = json.loads(out[-1])
    for d in ("cityscapes", "IDD"):
        assert got[d] == round(lib[d], 4)


@pytest.mark.slow
def test_composed_eval_parity_ftp1_f64(parity_setup):
    """Same composed parity for the NAMED-head family: an ftp1 checkpoint
    (decoder_old / decoder_new named modules, erfnet_ftp1.py:139-141) through
    `evaluate_checkpoint(kind='ftp1')` with num_classes INFERRED from the
    checkpoint — locking the named-head mapping (evaluate.infer_num_classes)
    plus the ftp1 converter against the reference's flag-selected forward."""
    s = parity_setup
    ref_ft = load_reference_module("models/erfnet_ftp1.py")
    torch.manual_seed(13)
    model = ref_ft.Net(NUMC_CS, NUMC_IDD)  # f32: the reference ckpt format
    model.eval()
    ckpt = os.path.join(os.path.dirname(s["ckpt"]), "ftp1_best.pth.tar")
    torch.save(
        {"epoch": 1, "arch": "Net",
         "state_dict": {"module." + k: v for k, v in model.state_dict().items()}},
        ckpt,
    )

    def ft_fwd(m, images, task):
        return m(images, decoder_old=(task == 0), decoder_new=(task == 1))

    model_f64 = model.double()  # both sides upcast the same f32 weights
    ref = {
        "cityscapes": _reference_eval(model_f64, s["ds_cs"], 0, NUMC_CS,
                                      s["ref_iou"], torch.float64, fwd=ft_fwd),
        "IDD": _reference_eval(model_f64, s["ds_idd"], 1, NUMC_IDD,
                               s["ref_iou"], torch.float64, fwd=ft_fwd),
    }
    from mdilss_tpu.evaluate import evaluate_checkpoint

    try:
        results, per_class = evaluate_checkpoint(
            ckpt, kind="ftp1", datasets=["cityscapes", "IDD"],
            data_roots={"cityscapes": s["cs_root"], "IDD": s["idd_root"]},
            height=HEIGHT, width=WIDTH, compute_dtype="float64",
            return_per_class=True,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    for d in ("cityscapes", "IDD"):
        ref_miou, ref_pc = ref[d]
        np.testing.assert_array_equal(per_class[d], ref_pc, err_msg=d)
        assert abs(results[d] - ref_miou) < 1e-12, (d, results[d], ref_miou)


def _write_bdd_tree(root: str, *, n: int, seed: int) -> None:
    """BDD100k convention: <root>/images/val + <root>/labels/val, FLAT
    listdir (no city subdirs), labels end `_train_id.png`
    (dataset_custom.py:167-184 vs data/sources.py bdd100k_index)."""
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "images/val"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels/val"), exist_ok=True)
    for i in range(n):
        img = rng.integers(0, 256, (NATIVE_H, NATIVE_W, 3), dtype=np.uint8)
        lbl = rng.integers(0, NUMC_CS - 1, (NATIVE_H, NATIVE_W)).astype(np.uint8)
        lbl[rng.random((NATIVE_H, NATIVE_W)) < 0.07] = 255
        Image.fromarray(img).save(os.path.join(root, "images/val", f"b{i:03d}.png"))
        _save_label(lbl, os.path.join(root, "labels/val", f"b{i:03d}_train_id.png"))


@pytest.mark.slow
def test_composed_eval_parity_ftp2_f64(parity_setup, tmp_path):
    """Composed parity for the 3-head ftp2 family (CS -> BDD -> IDD
    fine-tuning baseline): decoder_old1 / decoder_old2 / decoder_new NAMED
    modules selected by forward flags (erfnet_ftp2.py:135-152), through
    kind='ftp2' with checkpoint-inferred [20, 20, 27] — also the only
    composed test of the BDD flat-listdir convention."""
    s = parity_setup
    bdd_root = str(tmp_path / "bdd")
    _write_bdd_tree(bdd_root, n=3, seed=33)
    dc = load_reference_module("dataset_custom.py")
    tr = load_reference_module("transform.py")
    input_transform = Compose([Resize([HEIGHT, WIDTH], Image.BILINEAR),
                               ToTensor()])
    tt_bdd = Compose([Resize([HEIGHT, WIDTH], Image.NEAREST), tr.ToLabel(),
                      tr.Relabel(255, NUMC_CS - 1)])
    ds_bdd = dc.BDD(bdd_root, input_transform, tt_bdd, "val")
    assert len(ds_bdd) == 3

    ref_ft2 = load_reference_module("models/erfnet_ftp2.py")
    torch.manual_seed(23)
    model = ref_ft2.Net(NUMC_CS, NUMC_CS, NUMC_IDD)
    model.eval()
    ckpt = os.path.join(os.path.dirname(s["ckpt"]), "ftp2_best.pth.tar")
    torch.save(
        {"epoch": 1, "arch": "Net",
         "state_dict": {"module." + k: v for k, v in model.state_dict().items()}},
        ckpt,
    )

    def ft2_fwd(m, images, task):
        return m(images, decoder_old1=(task == 0), decoder_old2=(task == 1),
                 decoder_new=(task == 2))

    model_f64 = model.double()
    ref = {
        "cityscapes": _reference_eval(model_f64, s["ds_cs"], 0, NUMC_CS,
                                      s["ref_iou"], torch.float64, fwd=ft2_fwd),
        "BDD": _reference_eval(model_f64, ds_bdd, 1, NUMC_CS,
                               s["ref_iou"], torch.float64, fwd=ft2_fwd),
        "IDD": _reference_eval(model_f64, s["ds_idd"], 2, NUMC_IDD,
                               s["ref_iou"], torch.float64, fwd=ft2_fwd),
    }
    from mdilss_tpu.evaluate import evaluate_checkpoint

    try:
        results, per_class = evaluate_checkpoint(
            ckpt, kind="ftp2", datasets=["cityscapes", "BDD", "IDD"],
            data_roots={"cityscapes": s["cs_root"], "BDD": bdd_root,
                        "IDD": s["idd_root"]},
            height=HEIGHT, width=WIDTH, compute_dtype="float64",
            return_per_class=True,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    for d in ("cityscapes", "BDD", "IDD"):
        ref_miou, ref_pc = ref[d]
        np.testing.assert_array_equal(per_class[d], ref_pc, err_msg=d)
        assert abs(results[d] - ref_miou) < 1e-12, (d, results[d], ref_miou)


@pytest.mark.slow
def test_composed_eval_parity_multitask_f64(parity_setup):
    """Composed parity for the MULTITASK family: erfnet_multi_task.Net is a
    shared plain encoder + per-task decoder ModuleList (erfnet_multi_task.py:
    146-159, forward(input, task) indexes decoder[task]) — the joint-training
    baseline's eval path, through `evaluate_checkpoint(kind='multi_task')`
    with checkpoint-inferred class counts."""
    s = parity_setup
    ref_mt = load_reference_module("models/erfnet_multi_task.py")
    torch.manual_seed(17)
    model = ref_mt.Net([NUMC_CS, NUMC_IDD], nb_tasks=2, cur_task=1)
    model.eval()
    ckpt = os.path.join(os.path.dirname(s["ckpt"]), "multitask_best.pth.tar")
    torch.save(
        {"epoch": 1, "arch": "Net",
         "state_dict": {"module." + k: v for k, v in model.state_dict().items()}},
        ckpt,
    )
    model_f64 = model.double()
    ref = {
        "cityscapes": _reference_eval(model_f64, s["ds_cs"], 0, NUMC_CS,
                                      s["ref_iou"], torch.float64),
        "IDD": _reference_eval(model_f64, s["ds_idd"], 1, NUMC_IDD,
                               s["ref_iou"], torch.float64),
    }
    from mdilss_tpu.evaluate import evaluate_checkpoint

    try:
        results, per_class = evaluate_checkpoint(
            ckpt, kind="multi_task", datasets=["cityscapes", "IDD"],
            data_roots={"cityscapes": s["cs_root"], "IDD": s["idd_root"]},
            height=HEIGHT, width=WIDTH, compute_dtype="float64",
            return_per_class=True,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    for d in ("cityscapes", "IDD"):
        ref_miou, ref_pc = ref[d]
        np.testing.assert_array_equal(per_class[d], ref_pc, err_msg=d)
        assert abs(results[d] - ref_miou) < 1e-12, (d, results[d], ref_miou)


@pytest.mark.slow
def test_composed_eval_parity_erfnet_f64(parity_setup):
    """Composed parity for the SINGLE-TASK family: plain erfnet.Net (one
    encoder + one decoder, task-less forward — erfnet.py:140-151), the
    per-domain fine-tuning baseline, through kind='erfnet' whose apply_fn
    drops the task argument (evaluate.py)."""
    s = parity_setup
    ref_erf = load_reference_module("models/erfnet.py")
    torch.manual_seed(19)
    model = ref_erf.Net(NUMC_CS)
    model.eval()
    ckpt = os.path.join(os.path.dirname(s["ckpt"]), "erfnet_best.pth.tar")
    torch.save(
        {"epoch": 1, "arch": "Net",
         "state_dict": {"module." + k: v for k, v in model.state_dict().items()}},
        ckpt,
    )
    model_f64 = model.double()
    ref_miou, ref_pc = _reference_eval(
        model_f64, s["ds_cs"], 0, NUMC_CS, s["ref_iou"], torch.float64,
        fwd=lambda m, images, task: m(images))
    from mdilss_tpu.evaluate import evaluate_checkpoint

    try:
        results, per_class = evaluate_checkpoint(
            ckpt, kind="erfnet", datasets=["cityscapes"],
            data_roots={"cityscapes": s["cs_root"]},
            height=HEIGHT, width=WIDTH, compute_dtype="float64",
            return_per_class=True,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_array_equal(per_class["cityscapes"], ref_pc)
    assert abs(results["cityscapes"] - ref_miou) < 1e-12


@pytest.mark.slow
def test_composed_eval_parity_voc12_f64(parity_setup, tmp_path, monkeypatch):
    """Composed parity for the VOC12 convention — the last dataset_custom
    class (dataset_custom.py:43-73): FLAT <root>/images/*.jpg +
    <root>/labels/*.png keyed off the LABEL basenames, JPEG image decode,
    21 classes — over a plain erfnet head. Locks the jpeg decode path and
    the label-keyed pairing (data/sources.py voc12_index) end to end.

    Evaluating a non-train subset of the reference's FLAT layout (identical
    to its train set) is exactly the aliasing data/sources.py now refuses by
    default — this parity comparison is the legitimate use, so it runs under
    the explicit opt-in."""
    monkeypatch.setenv("MDILSS_ALLOW_FLAT_VOC12", "1")
    s = parity_setup
    NUMC_VOC = 21
    root = str(tmp_path / "voc")
    os.makedirs(os.path.join(root, "images"), exist_ok=True)
    os.makedirs(os.path.join(root, "labels"), exist_ok=True)
    rng = np.random.default_rng(44)
    for i in range(3):
        img = rng.integers(0, 256, (NATIVE_H, NATIVE_W, 3), dtype=np.uint8)
        lbl = rng.integers(0, NUMC_VOC - 1, (NATIVE_H, NATIVE_W)).astype(np.uint8)
        lbl[rng.random((NATIVE_H, NATIVE_W)) < 0.07] = 255
        Image.fromarray(img).save(os.path.join(root, "images", f"v{i:03d}.jpg"))
        _save_label(lbl, os.path.join(root, "labels", f"v{i:03d}.png"))

    dc = load_reference_module("dataset_custom.py")
    tr = load_reference_module("transform.py")
    input_transform = Compose([Resize([HEIGHT, WIDTH], Image.BILINEAR),
                               ToTensor()])
    tt = Compose([Resize([HEIGHT, WIDTH], Image.NEAREST), tr.ToLabel(),
                  tr.Relabel(255, NUMC_VOC - 1)])
    ds_voc = dc.VOC12(root, input_transform, tt)
    assert len(ds_voc) == 3

    ref_erf = load_reference_module("models/erfnet.py")
    torch.manual_seed(29)
    model = ref_erf.Net(NUMC_VOC)
    model.eval()
    ckpt = os.path.join(os.path.dirname(s["ckpt"]), "voc_best.pth.tar")
    torch.save(
        {"epoch": 1, "arch": "Net",
         "state_dict": {"module." + k: v for k, v in model.state_dict().items()}},
        ckpt,
    )

    # VOC12's loader returns (image, label) only — adapt to _reference_eval's
    # 4-tuple loop with a thin wrapper dataset
    class WithNames(torch.utils.data.Dataset):
        def __len__(self):
            return len(ds_voc)

        def __getitem__(self, i):
            img, lbl = ds_voc[i]
            return img, lbl, "", ""

    model_f64 = model.double()
    ref_miou, ref_pc = _reference_eval(
        model_f64, WithNames(), 0, NUMC_VOC, s["ref_iou"], torch.float64,
        fwd=lambda m, images, task: m(images))
    from mdilss_tpu.evaluate import evaluate_checkpoint

    try:
        results, per_class = evaluate_checkpoint(
            ckpt, kind="erfnet", datasets=["VOC12"],
            data_roots={"VOC12": root},
            height=HEIGHT, width=WIDTH, compute_dtype="float64",
            return_per_class=True,
        )
    finally:
        jax.config.update("jax_enable_x64", False)

    np.testing.assert_array_equal(per_class["VOC12"], ref_pc)
    assert abs(results["VOC12"] - ref_miou) < 1e-12


@pytest.mark.slow
def test_composed_eval_parity_f32_cli(parity_setup, capsys):
    """The default-f32 CLI (`python -m mdilss_tpu eval`) against the torch
    f32 stack: identical up to an argmax-tie pixel budget.

    ~57k evaluated pixels x P(top-2 gap < cross-impl error ~1e-5) bounds
    expected flips to O(1); each flip moves one class's IoU by at most
    1/region-size (~1/500). Any composition bug moves orders of magnitude
    more: wrong pairing scrambles ~all pixels, a palette/relabel bug hits
    the 7% ignore mass, a one-row resize seam is 128 px."""
    s = parity_setup
    model = s["model"].float()
    ref = {
        "cityscapes": _reference_eval(model, s["ds_cs"], 0, NUMC_CS,
                                      s["ref_iou"], torch.float32),
        "IDD": _reference_eval(model, s["ds_idd"], 1, NUMC_IDD,
                               s["ref_iou"], torch.float32),
    }
    from mdilss_tpu.cli import main as cli_main

    cli_main([
        "eval", s["ckpt"], "--kind", "rap", "--datasets", "cityscapes", "IDD",
        "--data-root", f"cityscapes={s['cs_root']}",
        "--data-root", f"IDD={s['idd_root']}",
        "--height", str(HEIGHT), "--width", str(WIDTH),
    ])
    out = capsys.readouterr().out.strip().splitlines()
    results = json.loads(out[-1])
    assert set(results) == {"cityscapes", "IDD"}
    for d, (ref_miou, _) in ref.items():
        assert abs(results[d] - ref_miou) < 2e-3, (d, results[d], ref_miou)
