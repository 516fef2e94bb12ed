"""bench.py output contract: the printed line must stay COMPACT.

The driver stores a bounded tail of stdout and json-parses its last line;
round 4's result line (notes inline) outgrew the window and was recorded as
parsed=null (BENCH_r04.json). emit_result therefore writes the full result to
a JSON artifact and prints a numbers-only line — these tests pin that split
and a hard size bound on the line.
"""
import importlib.util
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(REPO, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_emit_result_compact_line_and_full_artifact(tmp_path, capsys):
    bench = _bench()
    result = {
        "metric": "erfnet_rap_step2_train_images_per_sec_per_chip",
        "value": 54.71,
        "unit": "img/s/chip (512x1024, bs=6, CE+KLD distillation, "
                "device-cached dataset; median of 3 interleaved passes)",
        "vs_baseline": 13.12,
        "extras": {
            "step_ms": 109.7,
            "noise_pct": {"train_cached": 0.6, "infer": 2.8},
            "trainer_tax_note": "x" * 500,
            "roofline_note": "y" * 400,
            "step3_source": "z" * 600,
            "baseline_source": "w" * 100,
            "infer_path": "v" * 100,
            "trainer_epoch_samples_s": {"20": [2.29], "60": [6.74]},
            "step3_projected_hours_single_chip": 8.65,
            "device": "TPU v5 lite0",
        },
    }

    class A:
        json_out = str(tmp_path / "full.json")

    bench.emit_result(result, A())
    line = capsys.readouterr().out.strip().splitlines()[-1]
    # parseable, small, numbers present, prose absent
    compact = json.loads(line)
    assert len(line) < 1200, len(line)
    assert compact["value"] == 54.71
    assert compact["extras"]["step_ms"] == 109.7
    assert compact["extras"]["noise_pct"]["infer"] == 2.8
    for note in bench._NOTE_KEYS:
        assert note not in compact["extras"]
    assert compact["extras"]["full_json"] == A.json_out
    # the artifact carries everything, notes included
    full = json.load(open(A.json_out))
    assert full["extras"]["trainer_tax_note"] == "x" * 500
    assert full["extras"]["step3_source"] == "z" * 600
    assert full["value"] == 54.71


def test_emit_result_survives_unwritable_artifact(capsys):
    """A read-only cwd must not kill the measurement: the compact line still
    prints (the driver's record) even when the artifact write fails."""
    bench = _bench()

    class A:
        json_out = "/nonexistent_dir_xyz/full.json"

    bench.emit_result({"metric": "m", "value": 1.0, "unit": "u",
                       "vs_baseline": 1.0, "extras": {}}, A())
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["value"] == 1.0


def test_real_r5_artifact_compact_line_fits_tail_window(tmp_path, capsys):
    """The committed round-5 artifact, re-emitted, must produce a printed line
    comfortably inside the driver's observed ~1.8 KB stdout-tail window —
    if extras grow past this, move keys into _NOTE_KEYS instead."""
    bench = _bench()
    full = json.load(open(os.path.join(REPO, "docs", "bench_r05.json")))

    class A:
        json_out = str(tmp_path / "full.json")

    bench.emit_result(full, A())
    line = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(line)["value"] == full["value"]
    assert len(line) < 1500, len(line)
