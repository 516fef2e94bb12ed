"""Command-line interface: `python -m mdilss_tpu <command> ...`.

Commands mirror the reference's six trainer entry points plus evaluation and
checkpoint conversion:

  step1       train_RAPFT_step1.py        (RAP on Cityscapes)
  step2       train_new_task_step2.py     (CS -> BDD | CS -> IDD)
  step3       train_new_task_step3.py     (CS|BDD -> IDD | CS|IDD -> BDD)
  multitask   train_multi_task.py         (joint baseline; the reference file
                                           has a SyntaxError and cannot run)
  ft          main_ftp1_enc_newbn.py / main_FT2_flexible_new.py
  eval        Evaluation_Notebook.ipynb
  convert     .pth.tar -> Orbax (and back via --export)
  bench       bench.py
"""
from __future__ import annotations

import argparse
import json
import os
import sys

from . import config as C


def _add_common(p: argparse.ArgumentParser):
    p.add_argument("--platform", choices=("cpu", "tpu", "axon"), default=None,
                   help="force a JAX backend (env JAX_PLATFORMS may be "
                        "overridden by site plugins; this flag always wins)")
    p.add_argument("--savedir", default="runs/dev")
    p.add_argument("--state", help="init checkpoint (.pth.tar or orbax dir)")
    p.add_argument("--num-epochs", type=int, default=150)
    p.add_argument("--batch-size", type=int, default=6)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--lr", type=float, default=5e-4)
    p.add_argument("--shared-lr", type=float, default=None)
    p.add_argument("--lambdac", type=float, default=0.1)
    p.add_argument("--kld", choices=("faithful", "corrected"), default="faithful")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--resume", action="store_true")
    p.add_argument("--iou-train", action="store_true",
                   help="compute train IoU in the train step (reference --iouTrain)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--remat", action="store_true")
    p.add_argument("--fused-train", action="store_true",
                   help="experimental: Pallas fused training blocks")
    p.add_argument("--no-device-cache", action="store_true",
                   help="disable the device-resident uint8 dataset cache")
    p.add_argument("--spatial-shards", type=int, default=1,
                   help="shard image height over a spatial mesh axis (devices "
                        "split as data x spatial; XLA inserts conv halo "
                        "exchanges). Default 1 = pure data parallelism.")
    p.add_argument("--dtype", choices=("float32", "bfloat16"), default="float32")
    p.add_argument("--synthetic", action="store_true", help="synthetic data smoke run")
    p.add_argument("--synthetic-size", type=int, default=24)
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of a few train steps here")
    p.add_argument("--compilation-cache", default="~/.cache/mdilss_tpu/xla",
                   metavar="DIR|off",
                   help="persistent XLA compilation cache (keyed by HLO hash; "
                        "'off' disables). Makes restarts/resumes compile-free.")
    p.add_argument(
        "--data-root", action="append", default=[], metavar="NAME=PATH",
        help="dataset root, e.g. --data-root cityscapes=/data/cs (repeatable)",
    )


def _common_kwargs(args) -> dict:
    roots = dict(kv.split("=", 1) for kv in args.data_root)
    return dict(
        savedir=args.savedir, state=args.state, num_epochs=args.num_epochs,
        batch_size=args.batch_size, height=args.height, width=args.width,
        lr=args.lr, shared_lr=args.shared_lr, lambda_c=args.lambdac, kld=args.kld,
        num_workers=args.num_workers, resume=args.resume, seed=args.seed,
        iou_train=args.iou_train,
        remat=args.remat, compute_dtype=args.dtype, synthetic=args.synthetic,
        fused_train=args.fused_train,
        device_cache="off" if args.no_device_cache else "auto",
        synthetic_size=args.synthetic_size, data_roots=roots,
        profile_dir=args.profile_dir, spatial_shards=args.spatial_shards,
    )


def main(argv=None):
    parser = argparse.ArgumentParser(prog="mdilss_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    # the reference step-1 trainer's model factory (train_RAPFT_step1.py:451-460);
    # the four non-RAP entries are reconstructions (models/erfnet_ablations.py)
    _MODELS = ("erfnet_RA_parallel", "erfnet_bn", "erfnet_onlyRAP",
               "erfnet_RA_series", "erfnet_RCM")

    p1 = sub.add_parser("step1", help="RAP-FT step 1 on Cityscapes")
    p1.add_argument("--pretrained-encoder", help="ImageNet encoder .pth.tar")
    p1.add_argument("--model", choices=_MODELS, default="erfnet_RA_parallel")
    _add_common(p1)

    p2 = sub.add_parser("step2", help="incremental step 2 with distillation")
    p2.add_argument("--order", choices=("CS_BDD", "CS_IDD"), default="CS_BDD")
    p2.add_argument("--model", choices=_MODELS, default="erfnet_RA_parallel")
    _add_common(p2)

    p3 = sub.add_parser("step3", help="incremental step 3 (two KLD terms)")
    p3.add_argument("--order", choices=("CS_BDD_IDD", "CS_IDD_BDD"), default="CS_BDD_IDD")
    p3.add_argument("--single-phase", action="store_true",
                    help="fused single-backward variant instead of the faithful two-phase step")
    p3.add_argument("--teacher-dropout", action="store_true",
                    help="live Dropout2d on the teacher's KD forwards (the "
                         "reference's train-mode model_old; measured "
                         "immaterial — see docs/DESIGN.md)")
    p3.add_argument("--model", choices=_MODELS, default="erfnet_RA_parallel")
    _add_common(p3)

    pm = sub.add_parser("multitask", help="joint multi-task baseline")
    pm.add_argument("--pretrained-encoder", help="ImageNet encoder .pth.tar "
                    "(the reference passes it as --state, train_multi_task.py:414-423)")
    _add_common(pm)

    ps = sub.add_parser("single", help="independent single-task ERFNet baseline")
    ps.add_argument("--dataset", default="cityscapes",
                    choices=("cityscapes", "BDD", "IDD", "IDD_union", "VOC12"))
    ps.add_argument("--pretrained-encoder", help="ImageNet encoder .pth.tar "
                    "(main.py --pretrainedEncoder, trainer_single_task.sh:46)")
    _add_common(ps)

    pf = sub.add_parser("ft", help="fine-tuning baselines (2 or 3 heads)")
    pf.add_argument("--heads", type=int, choices=(2, 3), default=None)
    pf.add_argument("--order", choices=tuple(sorted(C.FT_ORDERS)), default=None,
                    help="domain chain (last = the domain being fine-tuned; "
                         "the reference's --dataset-old/--dataset-new, "
                         "main_ftp1_enc_newbn.py:463-499). Defaults to CS_BDD "
                         "(2 heads) / CS_BDD_IDD (3 heads)")
    pf.add_argument("--feature-extraction", action="store_true",
                    help="train only the new head (FE) instead of encoder+head (FT)")
    _add_common(pf)

    pl = sub.add_parser(
        "pipeline",
        help="chain step1 -> step2 -> step3 through <savedir>/<stage>/best "
             "(trainer_OURS.sh:49-63 as one command)",
    )
    pl.add_argument("--order", choices=("CS_BDD_IDD", "CS_IDD_BDD"), default="CS_BDD_IDD")
    pl.add_argument("--pretrained-encoder", help="ImageNet encoder .pth.tar for step 1")
    pl.add_argument("--with-baselines", action="store_true",
                    help="also run the ft chain and joint multitask baselines")
    pl.add_argument("--stages", nargs="+", default=["step1", "step2", "step3"],
                    choices=("step1", "step2", "step3"))
    _add_common(pl)

    pe = sub.add_parser("eval", help="evaluate a checkpoint per domain")
    pe.add_argument("ckpt")
    pe.add_argument("--kind", choices=("rap", "erfnet", "multi_task", "ftp1", "ftp2", "erfnet_bn", "erfnet_onlyRAP", "erfnet_RA_series", "erfnet_RCM"), default="rap")
    pe.add_argument("--datasets", nargs="+", default=["cityscapes", "BDD", "IDD"])
    pe.add_argument("--num-classes", type=int, nargs="+", default=None,
                    help="per-head class counts (default: inferred from the "
                         "checkpoint's head shapes)")
    pe.add_argument("--batch-size", type=int, default=1)
    pe.add_argument("--height", type=int, default=512)
    pe.add_argument("--width", type=int, default=1024)
    pe.add_argument("--synthetic", action="store_true")
    pe.add_argument("--data-root", action="append", default=[], metavar="NAME=PATH")
    pe.add_argument("--expect", metavar="SETTING", default=None,
                    help="compare against the reference record "
                         "(expected_miou.json, e.g. step3_CS_BDD_IDD); exits "
                         "nonzero when any domain deviates beyond --expect-tol")
    pe.add_argument("--expect-tol", type=float, default=0.5,
                    help="tolerance in mIoU percentage points (default 0.5)")
    pe.add_argument("--f64", action="store_true",
                    help="run the forward in float64 — bit-stable parity "
                         "against reference torch evaluations (slower)")

    def _add_analysis_common(p):
        p.add_argument("ckpt")
        p.add_argument("--kind", choices=("rap", "erfnet", "multi_task", "ftp1", "ftp2", "erfnet_bn", "erfnet_onlyRAP", "erfnet_RA_series", "erfnet_RCM"),
                       default="rap")
        p.add_argument("--dataset", default="cityscapes")
        p.add_argument("--subset", default="val")
        p.add_argument("--task", type=int, default=0)
        p.add_argument("--num-classes", type=int, nargs="+", default=None,
                       help="per-head class counts (default: inferred from "
                            "the checkpoint's head shapes)")
        p.add_argument("--height", type=int, default=512)
        p.add_argument("--width", type=int, default=1024)
        p.add_argument("--synthetic", action="store_true")
        p.add_argument("--data-root", action="append", default=[], metavar="NAME=PATH")

    pt = sub.add_parser("tsne", help="latent-space t-SNE plot (Plot_Tsne_Notebook)")
    _add_analysis_common(pt)
    pt.add_argument("--which", choices=("encoder", "penultimate", "logits"),
                    default="encoder")
    pt.add_argument("--out", default="tsne_plots/tsne.png")
    pt.add_argument("--n-samples", type=int, default=20000)
    pt.add_argument("--first-image", action="store_true",
                    help="use the first val image instead of the notebook's "
                         "17-unique-labels diversity pick")

    pp = sub.add_parser("predict", help="write colorized prediction maps")
    _add_analysis_common(pp)
    pp.add_argument("--out-dir", default="predictions")
    pp.add_argument("--max-images", type=int, default=None)
    pp.add_argument("--save-gt", action="store_true")

    pw = sub.add_parser("weights", help="compute class weights over train labels "
                                        "(cal_class_weights.py workflow)")
    pw.add_argument("--dataset", default="cityscapes")
    pw.add_argument("--subset", default="train")
    pw.add_argument("--q", type=float, default=1.1,
                    help="w = 1/ln(q + p); reference used 1.1 (decoder), 1.2 (encoder)")
    pw.add_argument("--height", type=int, default=512)
    pw.add_argument("--width", type=int, default=1024)
    pw.add_argument("--max-images", type=int, default=None)
    pw.add_argument("--data-root", action="append", default=[], metavar="NAME=PATH")

    px = sub.add_parser(
        "export",
        help="export per-head self-contained StableHLO serving artifacts "
             "(jax.export; params baked in, no model code needed at serving time)",
    )
    px.add_argument("ckpt", help=".pth.tar or Orbax dir")
    px.add_argument("out_dir")
    px.add_argument("--kind", choices=("rap", "erfnet", "multi_task", "ftp1", "ftp2",
                                       "erfnet_bn", "erfnet_onlyRAP",
                                       "erfnet_RA_series", "erfnet_RCM"),
                    default="rap")
    px.add_argument("--num-classes", type=int, nargs="+", default=None,
                    help="per-head class counts (default: inferred from the "
                         "checkpoint's head shapes)")
    px.add_argument("--tasks", type=int, nargs="+", default=None,
                    help="head indices to export (default: all)")
    px.add_argument("--batch-size", type=int, default=1,
                    help="0 exports a symbolic (shape-polymorphic) batch dim")
    px.add_argument("--height", type=int, default=512)
    px.add_argument("--width", type=int, default=1024)
    px.add_argument("--output", choices=("logits", "labels"), default="logits",
                    help="'labels' bakes the argmax in (int32 maps; ~40x "
                         "smaller device->host per image)")
    px.add_argument("--dtype", choices=("bfloat16", "float32"), default="bfloat16")
    px.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])

    py = sub.add_parser(
        "parity-check",
        help="evaluate ALL recorded reference settings (expected_miou.json) "
             "from a checkpoint directory and emit one pass/fail JSON report "
             "(the Evaluation notebook's cells 8-22 as a single command)",
    )
    py.add_argument("ckpt_root", help="directory holding the released/exported "
                    "checkpoints (optionally with a parity_manifest.json)")
    py.add_argument("--data-root", action="append", default=[], metavar="NAME=PATH")
    py.add_argument("--settings", nargs="+", default=None,
                    help="subset of settings (default: all nine; validated "
                         "against parity.SETTINGS)")
    py.add_argument("--tol", type=float, default=0.5,
                    help="per-domain tolerance in mIoU points (default 0.5)")
    py.add_argument("--out", default=None, help="also write the report JSON here")
    py.add_argument("--synthetic", action="store_true",
                    help="dry-run the full command path on synthetic sources "
                         "(every gate then fails; for testing the runbook)")
    py.add_argument("--batch-size", type=int, default=1)
    py.add_argument("--height", type=int, default=512)
    py.add_argument("--width", type=int, default=1024)
    py.add_argument("--f64", action="store_true",
                    help="bit-stable f64 forward (slower; see eval --f64)")

    pc = sub.add_parser("convert", help="convert .pth.tar <-> framework params")
    pc.add_argument("src")
    pc.add_argument("dst")
    pc.add_argument("--kind", default="rap")
    pc.add_argument("--nb-tasks", type=int, default=1)
    pc.add_argument("--num-classes", type=int, nargs="+", default=None,
                    help="per-task class counts (export direction; default 20 per task)")
    pc.add_argument("--export", action="store_true",
                    help="reverse direction: Orbax dir -> reference-format .pth.tar")

    pb = sub.add_parser("bench", help="throughput benchmark (one JSON line; bench.py)")
    pb.add_argument("--mesh", default=None, help="DxS: sharded mesh bench instead")
    pb.add_argument("--steps", type=int, default=None)
    pb.add_argument("--passes", type=int, default=None)
    pb.add_argument("--bench-batch", type=int, default=None, dest="bench_batch")
    pb.add_argument("--bench-height", type=int, default=None, dest="bench_height")
    pb.add_argument("--bench-width", type=int, default=None, dest="bench_width")
    pb.add_argument("--bench-dtype", choices=("bf16", "f32"),
                    default=None, dest="bench_dtype",
                    help="compute dtype for the bench arms (bench.py --dtype)")
    pb.add_argument("--json-out", default=None, dest="bench_json_out",
                    help="write the full result JSON here (bench.py --json-out)")

    args = parser.parse_args(argv)

    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)

    cc = getattr(args, "compilation_cache", None)
    if cc and cc != "off":
        import os as _os

        import jax

        cc_dir = _os.path.expanduser(cc)
        _os.makedirs(cc_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cc_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

    if args.cmd == "bench":
        import importlib.util as _ilu

        bench_path = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
        )
        if not os.path.exists(bench_path):
            raise SystemExit("bench.py not found next to the package (repo checkout only)")
        spec = _ilu.spec_from_file_location("mdilss_bench", bench_path)
        mod = _ilu.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # same platform honoring as `python bench.py`: the PJRT plugin
        # registration pins the config platform at import, so JAX_PLATFORMS
        # alone never selects the virtual CPU mesh for `bench --mesh`
        plat = os.environ.get("JAX_PLATFORMS")
        if plat:
            import jax

            jax.config.update("jax_platforms", plat)
        # same fail-fast as `python bench.py`: a hung device tunnel must
        # produce a diagnostic, not hang the caller at PJRT init
        ok, reason = mod._device_reachable()
        if not ok:
            raise SystemExit(f"bench: device backend unreachable ({reason}) "
                             "— no measurement taken")
        bargs = mod.build_args().parse_args([])
        for src, dst in (("mesh", "mesh"), ("steps", "steps"),
                         ("passes", "passes"), ("bench_batch", "batch"),
                         ("bench_height", "height"), ("bench_width", "width"),
                         ("bench_dtype", "dtype"), ("bench_json_out", "json_out")):
            v = getattr(args, src, None)
            if v is not None:
                setattr(bargs, dst, v)
        if bargs.mesh:
            mod.mesh_bench(bargs)
        else:
            mod.main(bargs)
        return

    if args.cmd == "eval":
        from .evaluate import check_expected, evaluate_checkpoint

        roots = dict(kv.split("=", 1) for kv in args.data_root)
        results = evaluate_checkpoint(
            args.ckpt, kind=args.kind, datasets=args.datasets,
            num_classes=args.num_classes, data_roots=roots,
            batch_size=args.batch_size, height=args.height, width=args.width,
            synthetic=args.synthetic,
            compute_dtype="float64" if args.f64 else "float32",
        )
        print(json.dumps({k: round(v, 4) for k, v in results.items()}))
        if args.expect:
            ok, report = check_expected(
                results, args.expect, tolerance_points=args.expect_tol
            )
            print(report)
            if not ok:
                raise SystemExit(1)
        return

    if args.cmd == "parity-check":
        from .parity import run_parity_check

        roots = dict(kv.split("=", 1) for kv in args.data_root)
        report = run_parity_check(
            args.ckpt_root, data_roots=roots, settings=args.settings,
            tolerance_points=args.tol, synthetic=args.synthetic,
            batch_size=args.batch_size, height=args.height, width=args.width,
            compute_dtype="float64" if args.f64 else "float32",
        )
        if args.out:
            with open(args.out, "w") as f:
                json.dump(report, f, indent=2)
        print(json.dumps(report))
        if not report["ok"]:
            raise SystemExit(1)
        return

    if args.cmd in ("tsne", "predict"):
        from .analysis.names import NAMES_BY_DATASET
        from .data import SyntheticSource, make_source
        from .evaluate import load_checkpoint

        roots = dict(kv.split("=", 1) for kv in args.data_root)
        if args.num_classes is None:
            from .evaluate import infer_num_classes

            args.num_classes = infer_num_classes(args.ckpt)
            print(f"inferred num_classes {args.num_classes} from {args.ckpt}")
        nc = args.num_classes[args.task]
        apply_fn, params, bn = load_checkpoint(
            args.ckpt, kind=args.kind, num_classes=args.num_classes
        )
        if args.synthetic or args.dataset not in roots:
            source = SyntheticSource(nc, n=8, height=args.height, width=args.width)
        else:
            source = make_source(args.dataset, roots[args.dataset], args.subset)
        if args.cmd == "tsne":
            from .analysis.tsne import run_tsne

            out = run_tsne(
                apply_fn, params, bn, source, task=args.task, num_classes=nc,
                out_path=args.out, which=args.which, n_samples=args.n_samples,
                class_names=NAMES_BY_DATASET.get(args.dataset, NAMES_BY_DATASET["cityscapes"]),
                select=(lambda labels, n: True) if args.first_image else None,
                height=args.height, width=args.width,
            )
            print(json.dumps({"image": out["image"], "plot": out["plot"],
                              "n_points": int(len(out["labels"]))}))
        else:
            from .analysis.predict import save_predictions

            written = save_predictions(
                apply_fn, params, bn, source, task=args.task, num_classes=nc,
                out_dir=args.out_dir, max_images=args.max_images,
                save_gt=args.save_gt, height=args.height, width=args.width,
            )
            print(json.dumps({"written": len(written), "out_dir": args.out_dir}))
        return

    if args.cmd == "weights":
        import numpy as np

        from .data import make_source
        from .data.class_weights import compute_class_weights
        from .data.transforms import decode_pair

        roots = dict(kv.split("=", 1) for kv in args.data_root)
        source = make_source(args.dataset, roots[args.dataset], args.subset)
        pairs = source.pairs[: args.max_images]

        def labels():
            for ip, lp in pairs:
                yield decode_pair(ip, lp, height=args.height, width=args.width,
                                  label_map=source.label_map)[1]

        w = compute_class_weights(labels(), source.num_classes, q=args.q)
        print(json.dumps({"dataset": args.dataset, "n_images": len(pairs),
                          "weights": [round(float(v), 6) for v in w]}))
        return

    if args.cmd == "export":
        from .serving import export_checkpoint

        meta = export_checkpoint(
            args.ckpt, kind=args.kind, num_classes=args.num_classes,
            out_dir=args.out_dir, tasks=args.tasks,
            height=args.height, width=args.width,
            batch_size=args.batch_size or None, output=args.output,
            compute_dtype=args.dtype, platforms=tuple(args.platforms),
        )
        print(json.dumps(meta))
        return

    if args.cmd == "convert":
        from .ckpt import convert_state_dict, export_state_dict, load_pth_tar, orbax_io
        from .train import steps

        import jax

        if args.export:
            # Orbax dir -> reference-format .pth.tar (torch-loadable: the
            # checkpoint dict shape of train_RAPFT_step1.py:364-370 with
            # DataParallel 'module.'-prefixed keys)
            from .evaluate import infer_num_classes, load_checkpoint

            ncls = args.num_classes or infer_num_classes(args.src)
            _, params, bn = load_checkpoint(args.src, kind=args.kind, num_classes=ncls)
            sd = export_state_dict(params, bn, kind=args.kind, prefix="module.")
            import torch

            torch.save(
                {
                    "epoch": 0,
                    "arch": args.kind,
                    "state_dict": {k: torch.from_numpy(v.copy()) for k, v in sd.items()},
                    "best_acc": 0.0,
                    "optimizer": {},
                },
                args.dst,
            )
        else:
            params, bn = convert_state_dict(
                load_pth_tar(args.src), kind=args.kind, nb_tasks=args.nb_tasks
            )
            orbax_io.save(args.dst, 0, steps.init_train_state(params, bn),
                          best_acc=0.0, rng=jax.random.key(0))
        print(f"converted {args.src} -> {args.dst}")
        return

    from .train.protocols import build_trainer

    kw = _common_kwargs(args)
    if args.cmd == "pipeline":
        from .train.pipeline import run_pipeline

        savedir = kw.pop("savedir")
        state = kw.pop("state")
        results = run_pipeline(
            order=args.order, savedir=savedir, common=kw, state=state,
            pretrained_encoder=args.pretrained_encoder,
            with_baselines=args.with_baselines, stages=tuple(args.stages),
        )
        print(json.dumps({
            stage: {k: v for k, v in row.items() if isinstance(v, (int, float))}
            for stage, row in results.items()
        }))
        return
    if args.cmd == "step1":
        cfg = C.step1(pretrained_encoder=args.pretrained_encoder, model=args.model, **kw)
    elif args.cmd == "step2":
        cfg = C.step2(order=args.order, model=args.model, **kw)
    elif args.cmd == "step3":
        if args.teacher_dropout and args.single_phase:
            raise SystemExit("--teacher-dropout requires the faithful "
                             "two-phase step (drop --single-phase)")
        cfg = C.step3(order=args.order, two_phase=not args.single_phase,
                      teacher_dropout=args.teacher_dropout,
                      model=args.model, **kw)
    elif args.cmd == "multitask":
        cfg = C.multitask(pretrained_encoder=args.pretrained_encoder, **kw)
    elif args.cmd == "single":
        cfg = C.singletask(dataset=args.dataset,
                           pretrained_encoder=args.pretrained_encoder, **kw)
    elif args.cmd == "ft":
        cfg = C.ft_step(n_heads=args.heads, order=args.order,
                        finetune=not args.feature_extraction, **kw)
    else:
        raise SystemExit(f"unknown command {args.cmd}")

    trainer = build_trainer(cfg)
    final = trainer.fit()
    print(json.dumps({k: v for k, v in final.items() if isinstance(v, (int, float))}))


if __name__ == "__main__":
    main()
