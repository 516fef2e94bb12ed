"""Mechanically sync the published perf numbers to a bench artifact.

Round 4's verdict: README.md's performance table and docs/DESIGN.md's
headline numbers kept drifting from the driver-captured BENCH_r*.json —
different measurement windows of a drifting dev-tunnel published as if they
were one number. This tool makes the docs a FUNCTION of one named artifact:

    python tools/render_bench.py <bench.json>          # rewrite the blocks
    python tools/render_bench.py --check               # verify, exit 1 on drift

<bench.json> is either a full bench artifact (bench.py --json-out) or a
driver BENCH_r*.json (its "parsed" field is used; refuses if null). The
rewritten regions are delimited by `<!-- BENCH:BEGIN source=... -->` /
`<!-- BENCH:END -->` markers in README.md and docs/DESIGN.md; everything
between them is generated — hand edits there do not survive. `--check`
re-renders from the source named IN the marker and diffs, so
tests/test_docs_bench_sync.py can gate drift in CI without a device.
"""
from __future__ import annotations

import argparse
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BEGIN_RE = re.compile(r"<!-- BENCH:BEGIN source=(\S+) -->")
END = "<!-- BENCH:END -->"


def load_artifact(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and "metric" not in d:  # driver BENCH_r*.json wrapper
        if d["parsed"] is None:
            raise SystemExit(
                f"{path}: driver artifact has parsed=null (its stdout tail "
                "truncated the result line); use a bench.py --json-out "
                "artifact instead"
            )
        d = d["parsed"]
    if "value" not in d or "extras" not in d:
        raise SystemExit(f"{path}: not a bench result artifact")
    return d


def _fmt_hours(extras) -> str:
    rng = extras.get("step3_projected_hours_single_chip_range")
    band = f" [{rng[0]}, {rng[1]}]" if rng else ""
    return f"{extras['step3_projected_hours_single_chip']} h{band}"


def render_readme_block(src_rel: str, d: dict) -> str:
    """The README performance table, generated. Rows whose keys are absent in
    the artifact are omitted (older artifacts lack e.g. the trainer-tax arm)."""
    x = d["extras"]
    noise = x.get("noise_pct", {})

    def n(arm):
        return f"; noise_pct {noise[arm]}" if arm in noise else ""

    rows = [
        ("Step-2 training, device-cached dataset (CE + KLD distillation, "
         "3 forwards + backward + Adam, on-device gather/augment)",
         f"**{d['value']} img/s/chip** ({x['step_ms']} ms/step; "
         f"{x['pct_of_hbm_roofline']} % of the HBM roofline{n('train_cached')})"),
        (f"vs reference ({x['baseline_img_per_sec_per_gpu']} img/s per "
         "1080 Ti, derived from its published wall-clocks)",
         f"**{d['vs_baseline']}× per accelerator**"),
    ]
    if "step3_cached_images_per_sec_per_chip" in x:
        rows.append((
            "Step-3 training, fully cached (5 forwards, two-phase CE-then-KLD "
            "optimizer, 3 tasks)",
            f"{x['step3_cached_images_per_sec_per_chip']} img/s/chip "
            f"({x['step3_step_ms']} ms/step{n('step3_cached')}) → 150 epochs "
            f"of IDD ≈ **{x['step3_projected_hours_mesh_cache']} h** when the "
            "set fits in HBM (sharded v4-8 cache) vs "
            f"~{x['step3_baseline_hours']} h on 4×1080 Ti"))
    if "step3_hybrid_images_per_sec_per_chip" in x:
        rows.append((
            "Step-3 training, honest single-chip input path (hybrid cache: "
            "~59 % resident, rest streamed through the dev-tunnel's "
            "~100 MB/s H2D)",
            f"{x['step3_hybrid_images_per_sec_per_chip']} img/s/chip"
            f"{n('step3_hybrid')} → **{_fmt_hours(x)} projected "
            f"({x['step3_speedup_one_chip_vs_4x1080ti']}× vs ~96 h)**; "
            "tunnel-limited — a real host's H2D would close most of the gap "
            "to the cached rate"))
    if "host_streamed_train_images_per_sec" in x:
        rows.append((
            "Step-2 training, fully host-streamed through the dev-tunnel link",
            f"{x['host_streamed_train_images_per_sec']} img/s/chip"
            f"{n('train_streamed')} — the H2D-bound arms inherit the "
            "tunnel's window drift; that is what `noise_pct` exposes"))
    if "trainer_step_ms" in x:
        rows.append((
            "Production `Trainer` vs the bench loop (same step, same cache)",
            f"{x['trainer_step_ms']} vs {x['step_ms']} ms/step → **trainer "
            f"tax {x['trainer_tax_pct']} %** + {x['trainer_epoch_fixed_ms']} "
            "ms/epoch fixed (amortizes over ~1166 steps/epoch in a real BDD "
            "run); measured as the slope of steady-state epoch time over "
            "20/60-step epochs"))
    if "infer_images_per_sec_per_chip" in x:
        rows.append((
            "Inference (XLA path = serving default; Pallas-fused path ties it)",
            f"{x['infer_images_per_sec_per_chip']} img/s/chip{n('infer')}"))

    lines = [f"<!-- BENCH:BEGIN source={src_rel} -->",
             "| Metric | Value |", "|---|---|"]
    lines += [f"| {k} | {v} |" for k, v in rows]
    lines += [
        "",
        f"Source run: `{src_rel}` (device {x.get('device', '?')}). This table "
        "is GENERATED — edit via `python tools/render_bench.py " + src_rel +
        "`. Each arm's `noise_pct` = 100·(max−min)/median over ≥3 interleaved "
        "passes; numbers from other windows (e.g. the driver's BENCH_r*.json "
        "series) drift within those bands.",
        END,
    ]
    return "\n".join(lines)


def render_design_block(src_rel: str, d: dict) -> str:
    x = d["extras"]
    parts = [
        f"<!-- BENCH:BEGIN source={src_rel} -->",
        f"Current headline ({src_rel}): step-2 train **{d['value']} img/s/chip "
        f"= {x['step_ms']} ms/step = {x['pct_of_hbm_roofline']}% of the HBM "
        f"roofline** ({d['vs_baseline']}× the reference per accelerator).",
    ]
    if "trainer_step_ms" in x:
        parts.append(
            f"Production-Trainer tax: {x['trainer_step_ms']} vs "
            f"{x['step_ms']} ms/step = {x['trainer_tax_pct']}%, plus "
            f"{x['trainer_epoch_fixed_ms']} ms/epoch fixed (the post-fix "
            "intercept; it grew from the pre-fix 16 ms because the "
            "lagged-sync deferral moved the per-batch metric fetches into "
            "the epoch-end drain).")
    if "step3_projected_hours_single_chip" in x:
        parts.append(
            f"Step-3 projection: {_fmt_hours(x)} single-chip (hybrid cache) / "
            f"{x['step3_projected_hours_mesh_cache']} h mesh-cached, vs ~96 h "
            f"on 4×1080 Ti = {x['step3_speedup_one_chip_vs_4x1080ti']}×.")
    parts.append(END)
    return "\n".join(parts)


def _splice(text: str, block: str, path: str) -> str:
    m = BEGIN_RE.search(text)
    if not m:
        raise SystemExit(f"{path}: no '<!-- BENCH:BEGIN source=... -->' marker")
    end = text.find(END, m.start())
    if end < 0:
        raise SystemExit(f"{path}: no '{END}' marker after BEGIN")
    return text[: m.start()] + block + text[end + len(END):]


def targets():
    return [
        (os.path.join(REPO, "README.md"), render_readme_block),
        (os.path.join(REPO, "docs", "DESIGN.md"), render_design_block),
    ]


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("source", nargs="?", default=None,
                    help="bench artifact; --check defaults to the source "
                         "named in README's marker")
    ap.add_argument("--check", action="store_true",
                    help="verify the docs match the artifact; exit 1 on drift")
    args = ap.parse_args(argv)

    if args.source is None:
        if not args.check:
            ap.error("a source artifact is required unless --check")
        with open(os.path.join(REPO, "README.md")) as f:
            m = BEGIN_RE.search(f.read())
        if not m:
            raise SystemExit("README.md has no BENCH:BEGIN marker to check")
        args.source = os.path.join(REPO, m.group(1))

    src_rel = os.path.relpath(os.path.abspath(args.source), REPO)
    d = load_artifact(args.source)
    drift = False
    for path, renderer in targets():
        with open(path) as f:
            text = f.read()
        new = _splice(text, renderer(src_rel, d), path)
        if args.check:
            if new != text:
                print(f"DRIFT: {path} disagrees with {src_rel}")
                drift = True
        elif new != text:
            with open(path, "w") as f:
                f.write(new)
            print(f"rewrote {path} from {src_rel}")
        else:
            print(f"{path}: already in sync")
    if args.check:
        print("docs in sync" if not drift else "docs OUT OF SYNC")
        sys.exit(1 if drift else 0)


if __name__ == "__main__":
    main()
