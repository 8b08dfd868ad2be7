"""The reference's real production budget, end to end (VERDICT r4 item 1).

The one workload the reference demonstrably ran is 50 passes over the
3,086,282-frame "erokia" corpus — 154,314,100 frames, 37,674 batches @ 4096,
checkpoint every 754 batches (/root/reference/kelsey_iterable.ini:22-36).
This harness drives that exact budget through the PRODUCTION CLI
(``python train_iterable.py --config …``) on real hardware, with:

  * a deterministic erokia-scale corpus (34 wav files × 90,773 streaming
    windows each = 3,086,282 frames; ~2.5 h of synthesized audio, pcm16);
  * the real checkpoint cadence (754), retention (keep_checkpoints=8),
    histogram cadence, eval reconstructions, async checkpoint boundaries;
  * a guaranteed MID-RUN SIGTERM on the first leg plus timeout-SIGTERM
    legs afterwards (the axon tunnel stochastically hangs long processes —
    CLAUDE.md; every leg is a bounded subprocess resumed with --resume);
  * a small-scale interrupted-vs-uninterrupted A/B on the same model
    shape proving the resume is BIT-seamless (identical Loss/Batch
    sequences);
  * a machine-readable report (docs/RUN.json) + the docs/RUN.md summary:
    loss curve, steady rates, wall split, artifact inventory, and the
    gap-free per-batch loss trail across legs.

Stages (each idempotent; state accumulates in docs/RUN.json):

    python benchmarks/erokia_run.py --stage corpus   # build + verify corpus
    python benchmarks/erokia_run.py --stage ab       # seamlessness A/B
    python benchmarks/erokia_run.py --stage full     # the 154 M-frame run
    python benchmarks/erokia_run.py --stage report   # write docs/RUN.md
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

SR = 44100
SEG = 1024
HOP = 128
BATCH = 4096
N_FILES = 34
FRAMES_PER_FILE = 90_773                      # 3,086,282 = 34 x 90,773
SAMPLES_PER_FILE = (FRAMES_PER_FILE - 1) * HOP + SEG   # 11,619,840 (128 | n)
TOTAL_FRAMES_CORPUS = N_FILES * FRAMES_PER_FILE        # 3,086,282
TOTAL_FRAMES_BUDGET = TOTAL_FRAMES_CORPUS * 50         # 154,314,100
TOTAL_BATCHES = TOTAL_FRAMES_BUDGET // BATCH           # 37,674
CKPT_INTERVAL = 754                                    # reference cadence

REPORT_JSON = REPO / "docs" / "RUN.json"
REPORT_MD = REPO / "docs" / "RUN.md"


# ----------------------------------------------------------------- state --

def load_state() -> dict:
    if REPORT_JSON.exists():
        return json.loads(REPORT_JSON.read_text())
    return {}


def save_state(state: dict) -> None:
    REPORT_JSON.parent.mkdir(exist_ok=True)
    REPORT_JSON.write_text(json.dumps(state, indent=1))


# ---------------------------------------------------------------- corpus --

def synth_wave(i: int, n: int) -> np.ndarray:
    """Deterministic per-file 'instrument' signal: a low fundamental with
    detuned partials, a slow amplitude envelope, and a little noise — broad
    spectral content the VAE can actually learn, reproducible bit-for-bit
    from the file index."""
    rng = np.random.default_rng(1000 + i)
    t = np.arange(n, dtype=np.float64) / SR
    f0 = 55.0 * 2.0 ** ((i % 13) / 12.0 + (i // 13) * 0.5)
    phase = rng.uniform(0, 2 * np.pi, 4)
    wave = (0.34 * np.sin(2 * np.pi * f0 * t + phase[0])
            + 0.20 * np.sin(2 * np.pi * f0 * 2.005 * t + phase[1])
            + 0.12 * np.sin(2 * np.pi * f0 * 3.99 * t + phase[2])
            + 0.06 * np.sin(2 * np.pi * f0 * 5.03 * t + phase[3]))
    env = 0.55 + 0.40 * np.sin(2 * np.pi * (0.11 + 0.013 * i) * t)
    wave = wave * env + 0.04 * rng.standard_normal(n)
    return np.clip(wave, -0.99, 0.99).astype(np.float32)


def stage_corpus(root: Path, state: dict) -> None:
    from rawaudiovae_kelsey_tpu.data.datasets import StreamingFrameDataset
    from rawaudiovae_kelsey_tpu.io import write_wav

    audio = root / "audio"
    test = root / "test_audio"
    audio.mkdir(parents=True, exist_ok=True)
    test.mkdir(parents=True, exist_ok=True)
    t0 = time.monotonic()
    built = 0
    for i in range(N_FILES):
        p = audio / f"erokia_{i:02d}.wav"
        # pcm16 payload = 2 bytes/sample + 58-byte header
        want = SAMPLES_PER_FILE * 2 + 58
        if p.exists() and abs(p.stat().st_size - want) <= 64:
            continue
        write_wav(p, synth_wave(i, SAMPLES_PER_FILE), SR, subtype="pcm16")
        built += 1
        print(f"corpus: {p.name} written ({i + 1}/{N_FILES})", flush=True)
    for j in range(2):
        p = test / f"erokia_test_{j}.wav"
        if not p.exists():
            write_wav(p, synth_wave(100 + j, 3 * SR), SR, subtype="pcm16")
    # verify the frame count THROUGH the real loader (the same
    # streaming-window math the trainer uses)
    ds = StreamingFrameDataset(audio, SR, HOP, SEG, shuffle=False)
    counts = ds.frame_counts()
    total = int(sum(counts))
    assert total == TOTAL_FRAMES_CORPUS, (total, TOTAL_FRAMES_CORPUS)
    state["corpus"] = {
        "root": str(root),
        "files": N_FILES,
        "frames_per_file": FRAMES_PER_FILE,
        "total_frames": total,
        "reference_erokia_frames": 3086282,
        "samples_per_file": SAMPLES_PER_FILE,
        "disk_bytes": sum(f.stat().st_size for f in audio.glob("*.wav")),
        "built_files": built,
        "build_s": round(time.monotonic() - t0, 1),
    }
    save_state(state)
    print(f"corpus ok: {total:,} frames "
          f"({state['corpus']['disk_bytes'] / 1e6:,.0f} MB)", flush=True)


# ------------------------------------------------------------------- ini --

INI = """\
[audio]
sampling_rate = 44100
hop_length = 128
segment_length = 1024

[dataset]
datapath = {datapath}
test_dataset = test_audio
generate_test = True

[VAE]
latent_dim = 256
n_units = 2048
kl_beta = 0.0001

[training]
epochs = 50
total_num_frames = {total_frames}
learning_rate = 0.0001
batch_size = 4096
checkpoint_interval = {interval}
keep_checkpoints = 8
loss_reduction = mean

[extra]
description = {description}

[tpu]
precision = bfloat16
backend = best
device_resident = always
histogram_interval = {interval}
async_checkpoint = true
"""


def write_ini(path: Path, datapath: Path, description: str,
              total_frames: int, interval: int) -> Path:
    path.write_text(INI.format(datapath=datapath, description=description,
                               total_frames=total_frames,
                               interval=interval))
    return path


# ------------------------------------------------------------------ legs --

PROBE_SRC = """
import time, numpy as np, jax
x = np.ones((5, 1024, 1024), np.float32)  # 20 MB
t0 = time.perf_counter()
d = jax.device_put(x)
s = float(jax.device_get(d.sum()))
print(f"PROBE_MBPS {20.0 / (time.perf_counter() - t0):.2f}")
"""


def tunnel_mbps(timeout: float = 90.0):
    """20 MB upload+reduce+fetch in a bounded subprocess → measured MB/s,
    or None when the tunnel is wedged (the axon link collapses for hours
    at a time — a leg launched into that burns its whole window in the
    corpus upload and leaves nothing to resume)."""
    try:
        proc = subprocess.run([sys.executable, "-c", PROBE_SRC],
                              capture_output=True, text=True,
                              timeout=timeout, cwd=REPO)
        for line in proc.stdout.splitlines():
            if line.startswith("PROBE_MBPS"):
                return float(line.split()[1])
    except subprocess.TimeoutExpired:
        pass
    return None


def wait_for_tunnel(state: dict, min_mbps: float = 3.0,
                    max_wait_s: float = 3600.0) -> bool:
    """Block (probing every ~3 min) until the link clears ``min_mbps``;
    probe history lands in the report so link weather is attributable."""
    t0 = time.monotonic()
    probes = state.setdefault("tunnel_probes", [])
    while True:
        mbps = tunnel_mbps()
        probes.append({"t": time.strftime("%H:%M:%S"), "mbps": mbps})
        del probes[:-60]          # keep the report bounded across retries
        save_state(state)
        if mbps is not None and mbps >= min_mbps:
            return True
        if time.monotonic() - t0 > max_wait_s:
            return False
        print(f"tunnel degraded ({mbps} MB/s); waiting...", flush=True)
        time.sleep(170)

def run_leg(ini: Path, *, resume: bool, timeout: float,
            term_after_marker: float = 0.0,
            marker: str = "Checkpoint - Batch",
            grace: float = 300.0) -> dict:
    """One bounded production-CLI leg.  ``term_after_marker`` > 0 sends an
    explicit SIGTERM that long after the first ``marker`` line (the
    guaranteed mid-run kill); otherwise SIGTERM fires at ``timeout``.
    Either way the trainer's GracefulInterrupt writes an interrupt
    checkpoint and the next leg resumes from it."""
    cmd = [sys.executable, str(REPO / "train_iterable.py"),
           "--config", str(ini)] + (["--resume"] if resume else [])
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = str(REPO / ".jax_cache")
    t0 = time.monotonic()
    proc = subprocess.Popen(cmd, cwd=REPO, env=env, text=True,
                            stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, bufsize=1)
    lines: list = []          # (t_rel, line)
    marker_t = [None]

    def reader():
        for line in proc.stdout:
            t = time.monotonic() - t0
            lines.append((round(t, 2), line.rstrip("\n")))
            if marker_t[0] is None and marker in line:
                marker_t[0] = t

    th = threading.Thread(target=reader, daemon=True)
    th.start()
    reason = "finished"
    while proc.poll() is None:
        now = time.monotonic() - t0
        if term_after_marker and marker_t[0] is not None \
                and now >= marker_t[0] + term_after_marker:
            reason = "explicit-sigterm"
            proc.terminate()
            break
        if now >= timeout:
            reason = "timeout-sigterm"
            proc.terminate()
            break
        time.sleep(0.25)
    if reason != "finished":
        try:
            proc.wait(timeout=grace)   # graceful interrupt checkpoint
        except subprocess.TimeoutExpired:
            reason += "+kill"
            proc.kill()
            proc.wait(timeout=60)
    th.join(timeout=10)
    wall = time.monotonic() - t0
    return {"reason": reason, "rc": proc.returncode,
            "wall_s": round(wall, 1), "lines": lines}


def parse_leg(leg: dict) -> dict:
    """Extract the run-report facts from one leg's timed stdout."""
    import re

    out = {"reason": leg["reason"], "rc": leg["rc"],
           "wall_s": leg["wall_s"]}
    windows = []
    for t, line in leg["lines"]:
        m = re.search(r"Device-resident stream: ([\d,]+) frames "
                      r"\(([\d,]+) MB", line)
        if m:
            out["resident_frames"] = int(m.group(1).replace(",", ""))
            out["resident_MB"] = int(m.group(2).replace(",", ""))
            out["t_resident_s"] = t
        if re.match(r"Batch \d+/\d+", line) and "t_first_batch_s" not in out:
            out["t_first_batch_s"] = t
        m = re.search(r"Checkpoint - Batch (\d+) \(([\d,]+) frames/s\)",
                      line)
        if m:
            windows.append((int(m.group(1)),
                            float(m.group(2).replace(",", ""))))
        m = re.search(r"Resident stream e2e: (\d+) batches in ([\d.]+)s = "
                      r"([\d,]+) frames/s", line)
        if m:
            out["e2e_batches"] = int(m.group(1))
            out["e2e_wall_s"] = float(m.group(2))
            out["e2e_frames_per_s"] = float(m.group(3).replace(",", ""))
        m = re.search(r"Interrupted at batch (\d+)", line)
        if m:
            out["interrupted_at_batch"] = int(m.group(1))
        if "Training Finished" in line:
            out["finished"] = True
        m = re.search(r"^Batch (\d+)/(\d+)", line)
        if m:
            out["last_batch_dispatched"] = int(m.group(1))
    if windows:
        rates = [r for _, r in windows]
        out["ckpt_windows"] = len(windows)
        out["window_rate_median"] = float(np.median(rates))
        out["window_rate_max"] = float(np.max(rates))
        out["first_window_batch"] = windows[0][0]
        out["last_window_batch"] = windows[-1][0]
    # keep only the interesting lines in the report (head of startup, all
    # checkpoints, the tail) — full logs would be megabytes
    keep = [(t, ln) for t, ln in leg["lines"]
            if not ln.startswith("Batch ")]
    out["log_excerpt"] = keep[-80:]
    return out


# ------------------------------------------------------------- loss trail --

def loss_history(desc_dir: Path) -> dict:
    """Merged Loss/Batch trail over every run-NNN leg under one
    description dir; collisions with DIFFERENT values are an error (a
    resumed leg must never re-train a batch)."""
    from tensorboard.backend.event_processing import event_file_loader

    hist: dict = {}
    collisions = 0
    for f in sorted(desc_dir.glob("run-*/logs/events.out.tfevents.*")):
        for e in event_file_loader.LegacyEventFileLoader(str(f)).Load():
            for v in e.summary.value:
                if v.tag == "Loss/Batch":
                    if e.step in hist and hist[e.step] != v.simple_value:
                        collisions += 1
                    hist[int(e.step)] = float(v.simple_value)
    return {"hist": hist, "collisions": collisions}


def trail_summary(hist: dict, expected_n: int) -> dict:
    steps = sorted(hist)
    gaps = expected_n - len(steps)
    curve = {str(s): round(hist[s], 6)
             for s in steps[:: max(1, len(steps) // 200)]}
    return {
        "batches_logged": len(steps),
        "expected": expected_n,
        "gap_free": bool(len(steps) == expected_n
                         and steps[0] == 0 and steps[-1] == expected_n - 1),
        "missing": gaps,
        "first_loss": hist[steps[0]] if steps else None,
        "last_loss": hist[steps[-1]] if steps else None,
        "min_loss": min(hist.values()) if steps else None,
        "loss_curve_sampled": curve,
    }


# -------------------------------------------------------------------- ab --

def stage_ab(root: Path, state: dict, timeout: float,
             min_mbps: float = 3.0) -> None:
    """Interrupted+resumed vs uninterrupted, SAME seed/order/model shape
    (2-file subset corpus, 3000-batch budget): the Loss/Batch sequences
    must be IDENTICAL — the bit-seamlessness certificate behind the full
    run's gap-free trail."""
    import shutil

    if state.get("ab_seamlessness", {}).get("bit_identical"):
        print("ab: already recorded bit_identical; skipping", flush=True)
        return
    ab_root = root.parent / (root.name + "_ab")
    audio = ab_root / "audio"
    if not audio.exists():
        audio.mkdir(parents=True)
        for i in range(2):
            src = root / "audio" / f"erokia_{i:02d}.wav"
            os.symlink(src, audio / src.name)
        os.symlink(root / "test_audio", ab_root / "test_audio")

    # budget sized so the loop OUTLASTS the kill: 3000 batches across 20
    # checkpoint boundaries (each with an on-loop eval reconstruction +
    # state snapshot) keeps the trainer alive well past marker+3s — a
    # 300-batch budget finished before the SIGTERM could land
    n_batches = 3000
    interval = 150
    runs = {}
    legs_record = {}
    for name, desc in (("uninterrupted", "erokia_ab_a"),
                       ("interrupted", "erokia_ab_b")):
        desc_dir = ab_root / desc
        if desc_dir.exists():
            shutil.rmtree(desc_dir)
        ini = write_ini(ab_root / f"{desc}.ini", ab_root, desc,
                        n_batches * BATCH, interval)
        if not wait_for_tunnel(state, min_mbps=min_mbps):
            raise SystemExit("ab: tunnel stayed degraded for an hour")
        legs = []
        if name == "uninterrupted":
            legs.append(parse_leg(run_leg(ini, resume=False,
                                          timeout=timeout)))
        else:
            # leg 1: explicit SIGTERM 3 s after the first checkpoint
            leg1 = parse_leg(run_leg(ini, resume=False, timeout=timeout,
                                     term_after_marker=3.0))
            legs.append(leg1)
            if leg1.get("finished") and \
                    leg1.get("interrupted_at_batch") is None:
                raise SystemExit(
                    "ab: the interrupted leg FINISHED before the SIGTERM "
                    "landed — grow n_batches or shrink term_after_marker")
            # resume legs until finished
            for _ in range(6):
                leg = parse_leg(run_leg(ini, resume=True, timeout=timeout))
                legs.append(leg)
                if leg.get("finished"):
                    break
        legs_record[name] = legs
        runs[name] = loss_history(desc_dir)
        print(f"ab {name}: {len(runs[name]['hist'])} batches logged, "
              f"legs={len(legs)}", flush=True)

    a, b = runs["uninterrupted"]["hist"], runs["interrupted"]["hist"]
    keys = sorted(a)
    identical = (sorted(b) == keys
                 and all(a[k] == b[k] for k in keys))
    max_delta = max((abs(a[k] - b[k]) for k in keys if k in b),
                    default=float("nan"))
    state["ab_seamlessness"] = {
        "batches": n_batches,
        "checkpoint_interval": interval,
        "uninterrupted_batches": len(a),
        "interrupted_batches": len(b),
        "interrupted_legs": len(legs_record["interrupted"]),
        "interrupted_at": [leg.get("interrupted_at_batch")
                           for leg in legs_record["interrupted"]
                           if leg.get("interrupted_at_batch") is not None],
        "collisions": runs["interrupted"]["collisions"],
        "bit_identical": bool(identical),
        "max_abs_loss_delta": float(max_delta),
        "legs": {k: [{kk: vv for kk, vv in leg.items()
                      if kk != "log_excerpt"} for leg in v]
                 for k, v in legs_record.items()},
    }
    save_state(state)
    print(f"ab: bit_identical={identical} max_delta={max_delta}",
          flush=True)
    if not identical:
        raise SystemExit("A/B seamlessness FAILED — see docs/RUN.json")


# ------------------------------------------------------------------ full --

def stage_full(root: Path, state: dict, leg_timeout: float,
               max_legs: int, min_mbps: float = 3.0) -> None:
    import shutil

    desc = "kelsey_erokia_tpu"
    desc_dir = root / desc
    if state.get("full", {}).get("complete") and not desc_dir.exists():
        print("full: already recorded complete; corpus workspace gone — "
              "keeping the recorded result", flush=True)
        return
    fresh = not state.get("full", {}).get("legs")
    if fresh and desc_dir.exists():
        shutil.rmtree(desc_dir)
    ini = write_ini(root / "kelsey_erokia_tpu.ini", root, desc,
                    TOTAL_FRAMES_BUDGET, CKPT_INTERVAL)
    legs = state.setdefault("full", {}).setdefault("legs", [])
    done = any(leg.get("finished") for leg in legs)
    while not done and len(legs) < max_legs:
        if not wait_for_tunnel(state, min_mbps=min_mbps):
            print("full: tunnel stayed degraded for an hour; aborting "
                  "stage (re-invoke later)", flush=True)
            break
        first = len(legs) == 0
        leg = parse_leg(run_leg(
            ini, resume=not first,
            # leg 1 is ALWAYS killed mid-run (the verdict's kill+resume
            # requirement): SIGTERM 20 s after its first checkpoint
            timeout=(leg_timeout * 2 if first else leg_timeout),
            term_after_marker=(20.0 if first else 0.0)))
        legs.append(leg)
        state["full"]["legs"] = legs
        save_state(state)
        print(f"full leg {len(legs)}: reason={leg['reason']} "
              f"wall={leg['wall_s']}s "
              f"last_batch={leg.get('last_batch_dispatched')}",
              flush=True)
        done = leg.get("finished", False)
        if not done and leg.get("last_batch_dispatched") is None \
                and len(legs) >= 2:
            # two legs with zero progress — the tunnel is down; stop
            # burning budget, the harness can be re-invoked later
            print("full: no progress two legs running; aborting stage",
                  flush=True)
            break

    if not done:
        # nonzero exit so a retry wrapper can re-invoke when the tunnel
        # heals; every completed leg is already checkpointed in the state
        raise SystemExit("full: incomplete (tunnel or leg budget) — "
                         "re-invoke to continue from the recorded legs")
    if done:
        trail = loss_history(desc_dir)
        summary = trail_summary(trail["hist"], TOTAL_BATCHES)
        summary["collisions"] = trail["collisions"]
        # artifact inventory across every leg's run dir
        inv = {}
        for run_dir in sorted(desc_dir.glob("run-*")):
            ckpts = sorted(p.name for p in
                           (run_dir / "model" / "checkpoints").glob(
                               "ckpt_*.npz"))
            inv[run_dir.name] = {
                "checkpoints": ckpts,
                "best_model": (run_dir / "model" / "best_model.npz"
                               ).exists(),
                "last_model": (run_dir / "model" / "last_model.npz"
                               ).exists(),
                "config_snapshot": (run_dir / "config.ini").exists(),
                "reconstructions": len(list(
                    (run_dir / "audio_logs").glob("test_reconst_*.wav"))),
                "tb_events": len(list(
                    (run_dir / "logs").glob("events.*"))),
            }
        # final reconstruction quality: MSE between the eval fixture's
        # ground truth and the LAST periodic reconstruction the production
        # loop wrote (the reference's perceptual-monitoring artifact,
        # tests.py:41 / train_iterable.py:228-251 — here scored, not just
        # listened to)
        quality = None
        from rawaudiovae_kelsey_tpu.io import read_wav
        recons = sorted(desc_dir.glob(
            "run-*/audio_logs/test_reconst_*.wav"))
        origs = sorted(desc_dir.glob("run-*/audio_logs/test_original.wav"))
        if recons and origs:
            ref, _ = read_wav(origs[-1])
            first, _ = read_wav(recons[0])
            last, _ = read_wav(recons[-1])
            n = min(len(ref), len(first), len(last))
            quality = {
                "against": str(origs[-1].relative_to(desc_dir)),
                "first_ckpt_mse": float(np.mean(
                    (ref[:n] - first[:n]) ** 2)),
                "final_mse": float(np.mean((ref[:n] - last[:n]) ** 2)),
                "final_reconstruction": recons[-1].name,
            }
        walls = [leg["wall_s"] for leg in legs]
        startup = [leg.get("t_first_batch_s") for leg in legs
                   if leg.get("t_first_batch_s") is not None]
        state["full"].update({
            "complete": True,
            "budget_frames": TOTAL_FRAMES_BUDGET,
            "budget_batches": TOTAL_BATCHES,
            "checkpoint_interval": CKPT_INTERVAL,
            "n_legs": len(legs),
            "wall_s_total": round(sum(walls), 1),
            "wall_s_per_leg": walls,
            "startup_s_per_leg": startup,
            "kill_resume_proven": any(
                leg["reason"].startswith(("explicit-sigterm",
                                          "timeout-sigterm"))
                for leg in legs[:-1]),
            "loss_trail": summary,
            "reconstruction_quality": quality,
            "artifacts": inv,
        })
        save_state(state)
        print(f"full: COMPLETE in {len(legs)} legs, "
              f"{sum(walls):.0f}s wall, gap_free="
              f"{summary['gap_free']}", flush=True)


# ---------------------------------------------------------------- report --

def stage_report(state: dict) -> None:
    ab = state.get("ab_seamlessness", {})
    full = state.get("full", {})
    corpus = state.get("corpus", {})
    legs = full.get("legs", [])
    trail = full.get("loss_trail", {})
    rates = [leg.get("window_rate_median") for leg in legs
             if leg.get("window_rate_median")]
    e2e = [leg.get("e2e_frames_per_s") for leg in legs
           if leg.get("e2e_frames_per_s")]
    q = full.get("reconstruction_quality")
    if q:
        qline = (f"- Final reconstruction quality vs the eval fixture's "
                 f"`{q['against']}`: MSE {q['first_ckpt_mse']:.6f} at the "
                 f"first checkpoint → **{q['final_mse']:.6f}** at the last "
                 f"(`{q['final_reconstruction']}`).")
    else:
        qline = "- Reconstruction quality: n/a (no wavs found)."
    if not (ab.get("bit_identical") is not None and full.get("complete")):
        # partial state (the axon link can stay collapsed for hours —
        # CLAUDE.md): write an honest status report instead of crashing on
        # missing fields; a later complete run overwrites it
        probes = state.get("tunnel_probes", [])
        ok = [p["mbps"] for p in probes if p.get("mbps")]
        REPORT_MD.write_text("\n".join([
            "# The reference's production run — status: INCOMPLETE",
            "",
            "The harness (benchmarks/erokia_run.py) is blocked on tunnel "
            "health, not on code: every leg gates on a measured link probe "
            "and the axon link stayed below the 3 MB/s floor.",
            "",
            f"- Corpus: **{corpus.get('total_frames', 0):,} frames** built "
            f"and loader-verified (reference erokia count exactly).",
            f"- A/B seamlessness: "
            f"{'PROVEN bit-identical' if ab.get('bit_identical') else 'not yet run'}.",
            f"- Full-run legs recorded: {len(legs)} "
            f"(complete: {bool(full.get('complete'))}).",
            f"- Tunnel probes this session: {len(probes)} "
            f"({len(ok)} returned at all; best "
            f"{max(ok) if ok else 0:.2f} MB/s — gate is 3 MB/s).",
            "",
            "Re-invoke `python benchmarks/erokia_run.py` when the link "
            "heals; every stage is idempotent and resumes from "
            "docs/RUN.json.",
        ]) + "\n")
        print(f"partial report written: {REPORT_MD}", flush=True)
        return
    lines = [
        "# The reference's production run, end to end",
        "",
        "The one workload `/root/reference` demonstrably ran: 50 passes "
        "over the 3,086,282-frame erokia corpus — 154,314,100 frames, "
        f"{TOTAL_BATCHES:,} batches @ 4096, checkpoint every "
        f"{CKPT_INTERVAL} (reference kelsey_iterable.ini:22-36).  Driven "
        "here through the production CLI (`python train_iterable.py "
        "--config …`) on one TPU v5e, with a mid-run SIGTERM kill + "
        "resume.  Machine-readable twin: docs/RUN.json (regenerate with "
        "`python benchmarks/erokia_run.py`).",
        "",
        "## Corpus",
        "",
        f"- {corpus.get('files')} wav files × "
        f"{corpus.get('frames_per_file'):,} streaming windows = "
        f"**{corpus.get('total_frames'):,} frames** (the reference's "
        "erokia count exactly), "
        f"{corpus.get('disk_bytes', 0) / 1e6:,.0f} MB pcm16, "
        "deterministic synthesis (benchmarks/erokia_run.py:synth_wave).",
        "",
        "## Resume bit-seamlessness (A/B)",
        "",
        f"- Same budget ({ab.get('batches')} batches), same seed: one run "
        "uninterrupted, one SIGTERM-killed mid-run "
        f"(at batch {ab.get('interrupted_at')}) and resumed with "
        "`--resume`.",
        f"- Loss/Batch sequences **bit-identical: "
        f"{ab.get('bit_identical')}** (max |Δ| = "
        f"{ab.get('max_abs_loss_delta')}); "
        f"{ab.get('collisions', 0)} re-trained batches.",
        "",
        "## The full 154 M-frame run",
        "",
        f"- **Complete: {full.get('complete', False)}** in "
        f"{full.get('n_legs')} bounded legs "
        f"(walls: {full.get('wall_s_per_leg')} s; total "
        f"{full.get('wall_s_total')} s incl. per-leg corpus decode, "
        "6.3 GB device upload, compile-cache hits, and checkpoint "
        "boundaries).",
        f"- Mid-run kill+resume proven: "
        f"{full.get('kill_resume_proven')} (leg reasons: "
        f"{[leg.get('reason') for leg in legs]}).",
        f"- Loss trail: {trail.get('batches_logged'):,} / "
        f"{trail.get('expected'):,} batches logged, gap-free = "
        f"**{trail.get('gap_free')}** across legs "
        f"(collisions {trail.get('collisions')}); loss "
        f"{trail.get('first_loss'):.6f} → {trail.get('last_loss'):.6f} "
        f"(min {trail.get('min_loss'):.6f}).",
        qline,
        f"- Steady checkpoint-window rates (boundary I/O excluded): "
        f"median per leg {rates} frames/s; whole-loop e2e incl. "
        f"checkpoints: {e2e} frames/s.",
        f"- Startup per leg (decode + upload + compile to first batch): "
        f"{full.get('startup_s_per_leg')} s.",
        "",
        "## Artifacts (per leg run dir)",
        "",
        "```json",
        json.dumps(full.get("artifacts", {}), indent=1),
        "```",
        "",
        "Retention (`keep_checkpoints = 8`) bounds each leg's periodic "
        "checkpoints; best/last models and the config snapshot are never "
        "pruned.  Reconstructions are written at every checkpoint "
        "(`generate_test = True`), matching the reference's eval fixture "
        "(tests.py:13-42).",
    ]
    REPORT_MD.write_text("\n".join(lines) + "\n")
    print(f"report written: {REPORT_MD}", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", type=Path, default=Path("/tmp/erokia"))
    ap.add_argument("--stage", choices=["corpus", "ab", "full", "report",
                                        "all"], default="all")
    # Sized to the 3 MB/s tunnel gate: the AB uninterrupted run must fit
    # ONE leg, and its 20 checkpoint boundaries drain ~1.9 GB of state
    # over the link (~10.5 min at the gate minimum) + startup.
    ap.add_argument("--leg-timeout", type=float, default=600.0)
    ap.add_argument("--ab-timeout", type=float, default=900.0)
    ap.add_argument("--max-legs", type=int, default=12)
    ap.add_argument("--min-mbps", type=float, default=3.0,
                    help="tunnel-health gate: minimum measured link MB/s "
                         "before a leg may launch (lower deliberately on a "
                         "stable-but-slow link; drains scale walls 1/rate)")
    args = ap.parse_args()

    state = load_state()
    if args.stage in ("corpus", "all"):
        stage_corpus(args.root, state)
    if args.stage in ("ab", "all"):
        stage_ab(args.root, state, args.ab_timeout, args.min_mbps)
    if args.stage in ("full", "all"):
        stage_full(args.root, state, args.leg_timeout, args.max_legs,
                   args.min_mbps)
    if args.stage in ("report", "all"):
        stage_report(state)


if __name__ == "__main__":
    main()
