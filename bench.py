"""Benchmark: ERFNet-RAP incremental-training throughput on one TPU chip.

Prints ONE compact JSON line: {"metric", "value", "unit", "vs_baseline",
...numeric extras}; the full result including the methodology notes is
written to bench_full.json (--json-out) — the printed line stays small so
the driver's bounded stdout-tail window always holds the whole line.

Headline metric — step-2 (CS->BDD) TRAINING throughput, images/sec/chip, at
the reference configuration: 512x1024 inputs, batch 6, the full proposed
method per step (3 model forwards: current task + student prev-task +
frozen-teacher prev-task; weighted CE + 0.1 * KLD; Adam with differential
LRs and freeze masks). The loop includes the production input path
(device-cached dataset, on-device gather + augmentation).

Noise discipline: every arm (cached train / host-streamed train / step-3
cached / step-3 hybrid) is measured over >= 3 INTERLEAVED passes — the
backend drifts +-5% across tunnel windows, so sequential one-shot arms are
not comparable run-over-run. The reported value is the per-arm median;
`noise_pct` = 100 * (max - min) / median over the passes.

Step 3 reports TWO projections (trainer_OURS.sh:63's ~96 h on 4x1080Ti is
the baseline):
  * mesh-cache: from the fully device-cached arm — valid when the dataset
    fits in HBM, i.e. sharded over a v4-8's data axis (data/device_cache.py).
  * single-chip: from the HYBRID-cache arm — the IDD train set (~13.7 GiB
    uint8) exceeds one chip's cache budget (50% of 16 GB), so a single chip
    caches ~59% of the rows and streams the rest (HybridCache); the arm
    reproduces that cached fraction with a budget-exceeding synthetic set.

Baseline derivation (BASELINE.md): the reference trains step 2 in "30-40
hours" on 2x GTX 1080 Ti (README.md:14; trainer_files/trainer_OURS.sh:57) =
150 epochs x 7000 BDD train images / 35 h midpoint ~= 8.33 img/s for the
2-GPU rig, i.e. 4.17 img/s per accelerator. vs_baseline = ours_per_chip /
4.17.

`--mesh DxS` instead runs the SHARDED step-2 train step over a data x
spatial device mesh (per-chip batch 6 each) and reports per-chip img/s plus
scaling efficiency vs a same-run 1-device mesh — one command away from real
multi-chip numbers when hardware appears; smoke-tested on the virtual
8-device CPU mesh (tests/test_bench_mesh.py).
"""
from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

import numpy as np

BASELINE_IMG_PER_SEC_PER_GPU = 150 * 7000 / (35 * 3600) / 2  # ~4.17
IDD_TRAIN_IMAGES = 6993

# Memory-roofline floor for the step-2 train step (docs/DESIGN.md
# "Step-time attribution + roofline"): ~27 GB of minimal HBM traffic per
# bs-6 step at perfect fusion, over the v5e's ~819 GB/s. The compute floor
# (2.88 TFLOP / 197 TFLOP/s ~= 15 ms) is HALF the bandwidth floor — every
# factorized conv runs at 32-64 FLOP/B vs the chip's ~240 FLOP/B ridge —
# so % of the HBM roofline is the honest utilization headline, not MFU.
STEP2_MIN_TRAFFIC_GB = 27.0
V5E_HBM_GBPS = 819.0
STEP2_ROOFLINE_MS = 1000.0 * STEP2_MIN_TRAFFIC_GB / V5E_HBM_GBPS  # ~33 ms


def _median(xs):
    return float(statistics.median(xs))


def _noise_pct(xs):
    med = _median(xs)
    return round(100.0 * (max(xs) - min(xs)) / med, 1) if med else 0.0


def build_args():
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--mesh", default=None,
                   help="DxS (data x spatial), e.g. 4x2: run the sharded "
                        "step-2 train step over the mesh instead of the "
                        "single-chip bench")
    p.add_argument("--steps", type=int,
                   default=int(os.environ.get("MDILSS_BENCH_STEPS", "24")))
    p.add_argument("--passes", type=int,
                   default=int(os.environ.get("MDILSS_BENCH_PASSES", "3")))
    p.add_argument("--batch", type=int,
                   default=int(os.environ.get("MDILSS_BENCH_BATCH", "6")),
                   help="per-chip batch size")
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--width", type=int, default=1024)
    p.add_argument("--dtype", default=os.environ.get("MDILSS_BENCH_DTYPE", "bf16"))
    p.add_argument("--json-out", default=None, dest="json_out",
                   help="write the FULL result JSON (incl. methodology notes) "
                        "here (default bench_full.json); the printed line "
                        "carries the numbers only")
    return p


def main(args) -> None:
    import jax
    import jax.numpy as jnp

    # persistent executable cache: the trainer-tax arm compiles the pjit'd
    # production step twice (two epoch sizes) and a cold through-tunnel
    # compile costs minutes; cache hits make reruns compile-free. Keyed by
    # HLO hash — stale entries impossible.
    os.makedirs("/tmp/mdilss_xla_cache", exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", "/tmp/mdilss_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from mdilss_tpu.data import CLASS_WEIGHTS
    from mdilss_tpu.data.transforms import augment_batch
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.models.topology import make_dropout_masks
    from mdilss_tpu.train import masks, steps

    batch = args.batch
    height, width = args.height, args.width
    n_steps = args.steps
    n_passes = max(1, args.passes)

    C = 20
    s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
    t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
    lr_tree = masks.rap_lr_tree(s_params, current_task=1, shared_lr=5e-6, ds_lr=5e-4)

    # production config: bf16 activations (f32 params/accum) + remat
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    def apply_fn(p, s, x, task, **kw):
        # logits stay in compute dtype; losses upcast inside their fusions
        return erfnet_rap.apply(p, s, x.astype(dtype), task, remat=True, **kw)

    step = jax.jit(
        steps.make_distill_step(
            apply_fn,
            current_task=1,
            prev_tasks=(0,),
            class_weight=CLASS_WEIGHTS["BDD"],
            lr_tree=lr_tree,
            num_epochs=150,
        ),
        donate_argnums=(0,),
    )
    ts = steps.init_train_state(s_params, s_bn)
    teacher = steps.ModelState(t_params, t_bn)

    # a few distinct host batches, cycled — includes H2D in the measured loop
    rng_np = np.random.default_rng(0)
    host_batches = [
        (
            rng_np.integers(0, 256, size=(batch, height, width, 3), dtype=np.uint8),
            rng_np.integers(0, C, size=(batch, height, width)).astype(np.uint8),
        )
        for _ in range(4)
    ]

    key = jax.random.key(7)
    mask_rng = np.random.default_rng(3)

    from mdilss_tpu.data.loader import device_prefetch

    def batches(n):
        for i in range(n):
            yield host_batches[i % len(host_batches)]

    def run_one(batch_pair, ts):
        nonlocal key
        key, k_aug, k_drop = jax.random.split(key, 3)
        imgs, lbls = batch_pair
        x, y = augment_batch(imgs, lbls, k_aug, num_classes=C, out_dtype=dtype)
        masks = [make_dropout_masks(mask_rng, batch) for _ in range(2)]
        ts, m = step(ts, teacher, x, y, masks, k_drop, 1)
        return ts, m

    # warmup (compile). NOTE: on remote-tunnel backends block_until_ready can
    # return before execution completes; fetching a scalar output is the only
    # reliable synchronization, so every timing below syncs via float(...).
    for bp in device_prefetch(batches(2)):
        ts, m = run_one(bp, ts)
    float(m["loss"])

    # HEADLINE INPUT PATH: the uint8 dataset lives in a device-resident cache
    # (uploaded once; data/device_cache.py: the CS train set fits one chip's
    # HBM), each step gathers its batch on device. Per-step H2D is the batch
    # indices. Measured over a real cache built through the loader, including
    # the gather + on-device augmentation.
    from mdilss_tpu.data.device_cache import DeviceCache, HybridCache
    from mdilss_tpu.data.loader import Loader, SyntheticSource

    cache = DeviceCache(Loader(
        SyntheticSource(C, n=4 * batch, height=height, width=width),
        batch_size=batch, height=height, width=width, shuffle=True,
    ))
    cache_iter = []
    for e in range(1 + n_steps // max(len(cache.loader), 1)):
        cache_iter.extend(cache.epoch_batches(e))
    ts, m = run_one(cache_iter[0][:2], ts)
    float(m["loss"])

    def arm_train_cached(ts_box):
        t0 = time.perf_counter()
        for i in range(n_steps):
            imgs, lbls, _ = cache_iter[i % len(cache_iter)]
            ts_box[0], m = run_one((imgs, lbls), ts_box[0])
        float(m["loss"])  # true sync: depends on the whole step chain
        return batch * n_steps / (time.perf_counter() - t0)

    # secondary arm: fully host-streamed pipeline (every batch crosses H2D;
    # the first epoch / cache-disabled path). device_prefetch keeps the next
    # transfers in flight under the current step's compute.
    n_stream = max(6, n_steps // 2)

    def arm_train_streamed(ts_box):
        t0 = time.perf_counter()
        for bp in device_prefetch(batches(n_stream), depth=3):
            ts_box[0], m = run_one(bp, ts_box[0])
        float(m["loss"])
        return batch * n_stream / (time.perf_counter() - t0)

    # STEP-3 arms (the published wall-clock target). The faithful two-phase
    # protocol — 5 forwards (IDD head; BDD,CS student; BDD,CS teacher), CE
    # backward+Adam then summed-KLD backward+Adam
    # (train_new_task_step3.py:317-356) — at the reference config.
    C3 = 27
    s3_params, s3_bn = erfnet_rap.init(jax.random.key(2), [C, C, C3], 3)
    t3_params, t3_bn = erfnet_rap.init(jax.random.key(3), [C, C], 2)
    lr3 = masks.rap_lr_tree(s3_params, current_task=2, shared_lr=5e-6, ds_lr=5e-4)
    step3 = jax.jit(
        steps.make_two_phase_distill_step(
            apply_fn,
            current_task=2,
            prev_tasks=(1, 0),
            class_weight=CLASS_WEIGHTS["IDD"],
            lr_tree=lr3,
            num_epochs=150,
        ),
        donate_argnums=(0,),
    )
    ts3 = steps.init_train_state(s3_params, s3_bn)
    teacher3 = steps.ModelState(t3_params, t3_bn)

    def run_one3(batch_pair, ts3):
        nonlocal key
        key, k_aug, k_drop = jax.random.split(key, 3)
        imgs, lbls = batch_pair
        x, y = augment_batch(imgs, lbls, k_aug, num_classes=C3, out_dtype=dtype)
        masks3 = [make_dropout_masks(mask_rng, batch) for _ in range(3)]
        ts3, m = step3(ts3, teacher3, x, y, masks3, k_drop, 1)
        return ts3, m

    ts3, m3 = run_one3(cache_iter[0][:2], ts3)  # compile
    float(m3["loss"])
    n3 = max(6, n_steps // 2)
    # the hybrid arm needs MORE steps than the others: its per-step time
    # carries host-decode thread jitter, and at n3=12 the round-3 noise_pct
    # hit 68.8% — too noisy to headline a wall-clock projection from.
    # 30 steps brought it to 24.5% (r4 builder run); 60 averages each pass
    # over more tunnel-drift windows for ~11 s/pass extra.
    n_hyb = max(60, n_steps)

    def arm_step3_cached(ts3_box):
        t0 = time.perf_counter()
        for i in range(n3):
            imgs, lbls, _ = cache_iter[i % len(cache_iter)]
            ts3_box[0], m = run_one3((imgs, lbls), ts3_box[0])
        float(m["loss"])
        return batch * n3 / (time.perf_counter() - t0)

    # hybrid-cache arm: the realistic SINGLE-CHIP step-3 input path. The IDD
    # train set (6993 rows x 2 MiB = ~13.7 GiB uint8) exceeds one v5e's
    # cache budget (50% of 16 GB -> 8 GiB = 4096 rows = 58.6% cached); this
    # arm reproduces that cached fraction with a budget-exceeding synthetic
    # set, so the uncached 41% of each batch crosses H2D (overlapped with
    # device compute by HybridCache's producer thread) exactly as a real
    # single-chip run would.
    hyb_n, hyb_k = 41, 24  # 58.5% cached, ~ IDD's 4096/6993
    hybrid = HybridCache(
        Loader(SyntheticSource(C, n=hyb_n, height=height, width=width, seed=9),
               batch_size=batch, height=height, width=width, shuffle=True,
               num_threads=4),
        hyb_k,
    )

    def arm_step3_hybrid(ts3_box):
        t0 = time.perf_counter()
        done = 0
        epoch = 0
        m = None
        while done < n_hyb:
            for imgs, lbls, _ in hybrid.epoch_batches(epoch):
                ts3_box[0], m = run_one3((imgs, lbls), ts3_box[0])
                done += 1
                if done >= n_hyb:
                    break
            epoch += 1
        float(m["loss"])
        return batch * n_hyb / (time.perf_counter() - t0)

    # warm the hybrid gather/scatter programs (one per uncached-count)
    for imgs, lbls, _ in hybrid.epoch_batches(0):
        ts3, m3 = run_one3((imgs, lbls), ts3)
    float(m3["loss"])

    # ---- interleaved passes: each arm measured n_passes times, medians ----
    ts_box, ts3_box = [ts], [ts3]
    arms = {
        "train_cached": (arm_train_cached, ts_box),
        "train_streamed": (arm_train_streamed, ts_box),
        "step3_cached": (arm_step3_cached, ts3_box),
        "step3_hybrid": (arm_step3_hybrid, ts3_box),
    }
    samples = {k: [] for k in arms}
    for _ in range(n_passes):
        for name, (fn, box) in arms.items():
            samples[name].append(fn(box))
    med = {k: _median(v) for k, v in samples.items()}
    noise = {k: _noise_pct(v) for k, v in samples.items()}

    train_ips = med["train_cached"]

    # TRAINER TAX: the published wall-clock projections must rest on the code
    # users actually run, not this file's hand-assembled loop. Run the
    # production Trainer (train/loop.py: real config, build_trainer wiring,
    # device cache, per-batch rng replicate / mask gen / shard_batch / metric
    # accumulation) at the bench config, at TWO epoch sizes, and split
    # steady-state epoch time into per-STEP time (the slope — what scales
    # with training) and per-EPOCH fixed cost (the intercept: metric-drain
    # round trips, cache reshuffle, epoch re-keying — amortized over ~1166
    # steps/epoch in a real BDD run, vs the tiny arm sizes here which would
    # otherwise masquerade as per-step tax).
    def measure_trainer_epoch(steps_per_epoch: int) -> float:
        import shutil
        import tempfile

        from mdilss_tpu import config as C
        from mdilss_tpu.train.protocols import build_trainer

        savedir = tempfile.mkdtemp(prefix="mdilss_trainer_tax_")
        cfg = C.step2(
            savedir=savedir, synthetic=True,
            synthetic_size=steps_per_epoch * batch, batch_size=batch,
            height=height, width=width,
            # LR-schedule horizon matches the bench arm's jitted step
            # (num_epochs is baked into the compiled program); epochs RUN
            # is the range below, not this
            num_epochs=150, eval_every=1000, eval_old_every=1000,
            compute_dtype="bfloat16" if args.dtype == "bf16" else "float32",
            remat=True, device_cache="auto", iou_train=False,
        )
        tr = build_trainer(cfg)
        epoch_secs = []
        for epoch in range(1, 4):  # epoch 1 pays compile + cache build
            stats = tr.train_epoch(epoch)  # includes the end-of-epoch drain sync
            epoch_secs.append(stats["epoch_seconds"])
        shutil.rmtree(savedir, ignore_errors=True)
        return _median(epoch_secs[1:])

    n_lo, n_hi = 20, 60
    # drift robustness: the tunnel drifts in multi-second windows and drift
    # only ever ADDS time, so measure each size twice interleaved
    # (lo,hi,lo,hi) and slope through the per-size minima — one slow window
    # can then inflate at most one of the four samples without biasing both
    # endpoints the same way.
    tax_samples = {n_lo: [], n_hi: []}
    for _ in range(2):
        for n in (n_lo, n_hi):
            tax_samples[n].append(measure_trainer_epoch(n))
    t_lo, t_hi = min(tax_samples[n_lo]), min(tax_samples[n_hi])
    trainer_step_ms = 1000.0 * (t_hi - t_lo) / (n_hi - n_lo)
    trainer_epoch_fixed_ms = max(0.0, 1000.0 * t_lo - n_lo * trainer_step_ms)
    trainer_ips = 1000.0 * batch / trainer_step_ms
    bench_step_ms = 1000.0 * batch / train_ips
    trainer_tax_pct = round(100.0 * (trainer_step_ms / bench_step_ms - 1.0), 1)

    step3_mesh_hours = 150 * IDD_TRAIN_IMAGES / med["step3_cached"] / 3600
    step3_single_hours = 150 * IDD_TRAIN_IMAGES / med["step3_hybrid"] / 3600
    # explicit interval from the pass spread: the hybrid arm carries
    # host-decode jitter, so a point projection alone overstates certainty
    step3_single_hours_range = [
        round(150 * IDD_TRAIN_IMAGES / max(samples["step3_hybrid"]) / 3600, 2),
        round(150 * IDD_TRAIN_IMAGES / min(samples["step3_hybrid"]) / 3600, 2),
    ]
    del ts3_box[0], teacher3  # release HBM before the inference section

    # secondary: pure inference throughput (argmax masks), eval mode.
    # K forwards chained inside ONE jit: per-call dispatch through the device
    # tunnel costs ~20 ms and would otherwise dominate the measurement.
    # Methodology notes (both matter; violating either inflated round-1's
    # number to a physically impossible 2367 img/s = 780 TFLOP/s):
    #   * DISTINCT device-resident inputs per call — the backend elides
    #     repeated executions of an identical (executable, args) pair;
    #   * sync EVERY result, not just the last — otherwise earlier chains
    #     may still be queued when the clock stops.
    K_INNER = 10

    # Measures the default XLA path (what evaluate.py serves). The Pallas
    # fused-infer path (ops/pallas/nb1d.py) ties it within tunnel noise:
    # interleaved same-process A/B medians 1884 (XLA) vs 1831 (fused) img/s
    # with +-5% drift inside each arm — see docs/DESIGN.md.
    @jax.jit
    def infer_chain(p, s, x):
        acc = jnp.int32(0)
        for i in range(K_INNER):
            logits, _ = erfnet_rap.apply(p, s, x.astype(dtype) * (1 + 1e-6 * i), 1)
            acc += jnp.argmax(logits, -1).sum().astype(jnp.int32)
        return acc

    xs = [jnp.asarray(rng_np.random((batch, height, width, 3), np.float32))
          for _ in range(4)]
    ts = ts_box[0]
    int(infer_chain(ts.params, ts.bn, xs[0]))
    reps = max(n_steps // K_INNER, 2)

    # Same noise discipline as the train arms (round-3 verdict: the single
    # timed block couldn't distinguish tunnel drift from regression across
    # the 2367->1991->1730 round series): >=3 passes, median + noise_pct.
    def arm_infer():
        t0 = time.perf_counter()
        accs = [infer_chain(ts.params, ts.bn, xs[r % len(xs)])
                for r in range(reps)]
        for a in accs:
            int(a)
        return batch * reps * K_INNER / (time.perf_counter() - t0)

    infer_samples = [arm_infer() for _ in range(max(3, n_passes))]
    infer_ips = _median(infer_samples)
    noise["infer"] = _noise_pct(infer_samples)

    step_ms = 1000.0 * batch / train_ips
    result = {
        "metric": "erfnet_rap_step2_train_images_per_sec_per_chip",
        "value": round(train_ips, 2),
        "unit": f"img/s/chip ({height}x{width}, bs={batch}, CE+KLD "
                "distillation, device-cached dataset + on-device "
                f"gather/augment; median of {n_passes} interleaved passes)",
        "vs_baseline": round(train_ips / BASELINE_IMG_PER_SEC_PER_GPU, 2),
        "extras": {
            "host_streamed_train_images_per_sec": round(med["train_streamed"], 2),
            "trainer_images_per_sec": round(trainer_ips, 2),
            "trainer_tax_pct": trainer_tax_pct,
            "trainer_step_ms": round(trainer_step_ms, 1),
            "trainer_epoch_fixed_ms": round(trainer_epoch_fixed_ms, 1),
            "trainer_epoch_samples_s": {
                str(n): [round(s, 3) for s in v]
                for n, v in tax_samples.items()},
            "trainer_tax_note": "production Trainer (train/loop.py via "
                                "build_trainer, step2 synthetic + device "
                                "cache, bench config): per-step time is the "
                                "slope of steady-state epoch time over two "
                                "epoch sizes (20/60 steps); the intercept is "
                                "the per-epoch fixed cost (metric drain, "
                                "cache reshuffle) that amortizes over ~1166 "
                                "steps/epoch in a real BDD run",
            "infer_images_per_sec_per_chip": round(infer_ips, 2),
            "infer_path": "xla (pallas-fused path ties within noise: "
                          "interleaved medians 1884 vs 1831 img/s)",
            "step_ms": round(step_ms, 1),
            "noise_pct": noise,
            "pct_of_hbm_roofline": round(100 * STEP2_ROOFLINE_MS / step_ms, 1),
            "roofline_note": "bandwidth-bound: min HBM traffic "
                             f"~{STEP2_MIN_TRAFFIC_GB:.0f} GB/step / "
                             f"{V5E_HBM_GBPS:.0f} GB/s = "
                             f"{STEP2_ROOFLINE_MS:.0f} ms floor; compute "
                             "floor 2.88 TFLOP / 197 TFLOP/s = 15 ms; conv "
                             "intensity 32-64 FLOP/B vs ~240 ridge "
                             "(docs/DESIGN.md 'Step-time attribution')",
            "baseline_img_per_sec_per_gpu": round(BASELINE_IMG_PER_SEC_PER_GPU, 2),
            "baseline_source": "README.md:14 35h midpoint, 2x1080Ti, 150ep x 7000 imgs",
            "step3_cached_images_per_sec_per_chip": round(med["step3_cached"], 2),
            "step3_hybrid_images_per_sec_per_chip": round(med["step3_hybrid"], 2),
            "step3_step_ms": round(1000.0 * batch / med["step3_cached"], 1),
            "step3_projected_hours_single_chip": round(step3_single_hours, 2),
            "step3_projected_hours_single_chip_range": step3_single_hours_range,
            "step3_projected_hours_mesh_cache": round(step3_mesh_hours, 2),
            "step3_baseline_hours": 96,
            "step3_speedup_one_chip_vs_4x1080ti": round(96 / step3_single_hours, 1),
            "step3_source": "two-phase, 5 fwd + 2 Adam steps/batch; 150 ep x "
                            "6993 IDD train imgs vs trainer_OURS.sh:63 ~96h; "
                            "single-chip projection uses the hybrid-cache arm "
                            "(58.5% cached, rest streamed — the honest one-chip "
                            "input path for IDD's ~13.7 GiB); mesh-cache "
                            "projection assumes the set fits sharded (v4-8). "
                            "CAVEAT: the streamed fraction here rides the dev "
                            "tunnel's ~100 MB/s H2D; a production host's "
                            "PCIe/DMA rates would push the single-chip "
                            "projection toward the cached number",
            "device": str(jax.devices()[0]),
        },
    }
    emit_result(result, args)


# Keys whose values are measurement prose, not numbers: they live in the full
# JSON artifact only. The driver stores a bounded TAIL of stdout and parses
# its last line — round 4's line outgrew that window and parsed as null, so
# the printed line must stay compact (the numbers) while the notes go to the
# artifact file.
_NOTE_KEYS = ("trainer_tax_note", "roofline_note", "step3_source",
              "baseline_source", "infer_path", "trainer_epoch_samples_s")


def emit_result(result: dict, args) -> None:
    """Write the FULL result (notes included) to --json-out, then print the
    compact one-line JSON as the very last line of stdout (stderr flushed
    first so late library warnings cannot interleave into it)."""
    out_path = getattr(args, "json_out", None) or "bench_full.json"
    try:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    except OSError as e:
        print(f"note: could not write {out_path}: {e}", file=sys.stderr)
    compact = dict(result)
    compact["extras"] = {k: v for k, v in result.get("extras", {}).items()
                         if k not in _NOTE_KEYS}
    compact["extras"]["full_json"] = out_path
    sys.stderr.flush()
    sys.stdout.flush()
    print(json.dumps(compact), flush=True)


def mesh_bench(args) -> None:
    """--mesh DxS: sharded step-2 train step over the first D*S devices.

    Per-chip batch stays at `--batch` (global batch = batch * D); reports
    global and per-chip img/s plus scaling efficiency vs a same-run 1-device
    mesh. On real multi-chip hardware this is the one command that produces
    the v4-8 numbers BASELINE.md targets."""
    import jax
    import jax.numpy as jnp

    from mdilss_tpu.data import CLASS_WEIGHTS
    from mdilss_tpu.data.transforms import augment_batch
    from mdilss_tpu.models import erfnet_rap
    from mdilss_tpu.models.topology import make_dropout_masks
    from mdilss_tpu.parallel import (jit_distill_step, make_mesh, replicate,
                                     shard_batch)
    from mdilss_tpu.train import masks, steps

    data, spatial = (int(v) for v in args.mesh.lower().split("x"))
    n_dev = data * spatial
    if len(jax.devices()) < n_dev:
        print(json.dumps({
            "metric": "erfnet_rap_step2_train_images_per_sec_mesh",
            "value": 0.0, "unit": "img/s", "vs_baseline": 0.0,
            "extras": {"error": f"need {n_dev} devices for mesh "
                                f"{args.mesh}, have {len(jax.devices())}"},
        }))
        sys.exit(1)

    C = 20
    height, width = args.height, args.width
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    rng_np = np.random.default_rng(0)
    mask_rng = np.random.default_rng(3)

    def build(mesh, batch):
        s_params, s_bn = erfnet_rap.init(jax.random.key(0), [C, C], 2)
        t_params, t_bn = erfnet_rap.init(jax.random.key(1), [C], 1)
        lr_tree = masks.rap_lr_tree(s_params, current_task=1,
                                    shared_lr=5e-6, ds_lr=5e-4)

        def apply_fn(p, s, x, task, **kw):
            return erfnet_rap.apply(p, s, x.astype(dtype), task, remat=True, **kw)

        step = jit_distill_step(
            steps.make_distill_step(
                apply_fn, current_task=1, prev_tasks=(0,),
                class_weight=CLASS_WEIGHTS["BDD"], lr_tree=lr_tree,
                num_epochs=150,
            ),
            mesh,
        )
        ts = replicate(mesh, steps.init_train_state(s_params, s_bn))
        teacher = replicate(mesh, steps.ModelState(t_params, t_bn))
        key = [jax.random.key(7)]

        # pre-generate a few distinct host batches (as main() does): serial
        # host RNG scales with the data degree while the device work
        # parallelizes, so generating inside the timed loop would understate
        # scaling_efficiency
        host_batches = [
            (rng_np.integers(0, 256, (batch, height, width, 3), np.uint8),
             rng_np.integers(0, C, (batch, height, width)).astype(np.uint8))
            for _ in range(4)
        ]

        def run_one(i, ts):
            key[0], k_aug, k_drop = jax.random.split(key[0], 3)
            imgs, lbls = host_batches[i % len(host_batches)]
            # augment THEN place on the mesh (loop.py order): the augment
            # jit's output sharding does not preserve the spatial axis, and
            # jit_distill_step's in_shardings are strict about the batch spec
            x, y = augment_batch(jnp.asarray(imgs), jnp.asarray(lbls), k_aug,
                                 num_classes=C, out_dtype=dtype)
            x, y = shard_batch(mesh, x, y)
            m = [make_dropout_masks(mask_rng, batch) for _ in range(2)]
            return step(ts, teacher, x, y, m, k_drop, 1)

        return run_one, ts

    def timed(run_one, ts, n):
        ts, m = run_one(0, ts)  # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(n):
            ts, m = run_one(i + 1, ts)
        float(m["loss"])
        return (time.perf_counter() - t0), ts

    n = args.steps
    run1, ts1 = build(make_mesh(1, spatial=1), args.batch)
    dt1, _ = timed(run1, ts1, n)
    ips1 = args.batch * n / dt1

    runN, tsN = build(make_mesh(n_dev, spatial=spatial), args.batch * data)
    dtN, _ = timed(runN, tsN, n)
    ipsN = args.batch * data * n / dtN
    per_chip = ipsN / n_dev
    eff = per_chip / (ips1 / 1)

    print(json.dumps({
        "metric": "erfnet_rap_step2_train_images_per_sec_mesh",
        "value": round(ipsN, 2),
        "unit": f"img/s global (mesh {data}x{spatial}, per-chip batch {args.batch})",
        "vs_baseline": round(ipsN / BASELINE_IMG_PER_SEC_PER_GPU, 2),
        "extras": {
            "mesh": {"data": data, "spatial": spatial},
            "per_chip_images_per_sec": round(per_chip, 2),
            "single_device_images_per_sec": round(ips1, 2),
            "scaling_efficiency": round(eff, 3),
            "device": str(jax.devices()[0]),
        },
    }))


def _device_reachable(timeout_s: int = 180):
    """Probe the default backend in a SUBPROCESS with a hard timeout.

    The axon TPU tunnel can hang at PJRT client init during outages (any
    jax.devices() call blocks forever, unkillable from inside the process);
    probing out-of-process lets the bench fail fast with a diagnostic line
    instead of hanging the driver. Returns (ok, reason)."""
    import subprocess

    code = ("import os, jax; "
            "p = os.environ.get('JAX_PLATFORMS'); "
            "p and jax.config.update('jax_platforms', p); "
            "import jax.numpy as jnp; "
            "print(float((jnp.ones((8,8)) @ jnp.ones((8,8))).sum()))")
    try:
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False, f"probe hung >{timeout_s}s (tunnel outage?)"
    if proc.returncode != 0:
        tail = proc.stderr.decode(errors="replace").strip().splitlines()[-3:]
        return False, f"probe exited {proc.returncode}: {' | '.join(tail)}"
    return True, "ok"


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    cli = build_args().parse_args()
    # The axon sitecustomize pins the config platform at register() time, so
    # the JAX_PLATFORMS env var alone does NOT select the backend (conftest.py
    # hits the same thing). Honor it explicitly so `JAX_PLATFORMS=cpu
    # XLA_FLAGS=--xla_force_host_platform_device_count=8 bench.py --mesh 4x2`
    # really runs on the virtual CPU mesh.
    _plat = os.environ.get("JAX_PLATFORMS")
    if _plat:
        import jax
        jax.config.update("jax_platforms", _plat)
    # Tunnel outages are often transient: retry the probe a few times before
    # declaring the round unmeasurable.
    # 5 default: the tunnel's observed failure mode is INTERMITTENT (some
    # probes hang while others in the same window succeed), so extra attempts
    # buy real success probability, not just outage-waiting
    attempts = max(1, int(os.environ.get("MDILSS_BENCH_PROBE_ATTEMPTS", "5")))
    reachable, reason = False, ""
    for i in range(attempts):
        reachable, reason = _device_reachable()
        if reachable:
            break
        if i + 1 < attempts:
            print(f"device probe {i + 1}/{attempts} failed ({reason}); "
                  f"retrying in 60s", file=sys.stderr)
            time.sleep(60)
    if not reachable:
        print(json.dumps({
            "metric": "erfnet_rap_step2_train_images_per_sec_per_chip",
            "value": 0.0, "unit": "img/s/chip", "vs_baseline": 0.0,
            "extras": {
                "error": f"device backend unreachable after {attempts} "
                         f"probes; last probe: {reason} — no measurement "
                         f"taken this run",
                # deliberately NO numbers here: prior real measurements live
                # in README 'Performance' and BENCH_r0*.json, keyed to their
                # own runs (advisor r2: stale values must not be ingestible
                # as this run's metrics)
                "prior_measurements": "see README.md Performance / BENCH_r02.json",
            },
        }))
        sys.exit(1)
    if cli.mesh:
        mesh_bench(cli)
    else:
        main(cli)
