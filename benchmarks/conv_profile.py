"""Whole-step profiler trace for the conv1d family (VERDICT r4 item 7).

docs/PERF.md's conv1d roofline attributes the residual composite gap from
PER-LAYER probes; this probe backs it with a real whole-step trace: one
chained conv1d train dispatch under ``jax.profiler.trace``, the device
timeline parsed and aggregated per op, bucketed into conv / matmul /
fusion(elementwise) / copy-transpose / other.  Prints one JSON line and
writes the aggregate to ``benchmarks/conv_profile_<batch>.json`` for the
docs to cite.

Run from the repo root on TPU:

    python benchmarks/conv_profile.py [--batch 4096] [--chain 20]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def parse_trace(trace_dir: Path) -> dict:
    """Aggregate the busiest device track's complete events by name."""
    files = glob.glob(str(trace_dir / "**" / "*.trace.json.gz"),
                      recursive=True)
    if not files:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    with gzip.open(files[0], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    per_pid = defaultdict(float)
    per_pid_ops = defaultdict(lambda: defaultdict(float))
    for e in events:
        if e.get("ph") == "X" and "dur" in e:
            per_pid[e["pid"]] += e["dur"]
            per_pid_ops[e["pid"]][e.get("name", "?")] += e["dur"]
    # the device track: largest total duration among pids whose name does
    # NOT look like a host python thread
    device_pid = None
    for pid in sorted(per_pid, key=per_pid.get, reverse=True):
        name = pid_names.get(pid, "")
        if "python" not in name.lower() and "host" not in name.lower():
            device_pid = pid
            break
    if device_pid is None:
        device_pid = max(per_pid, key=per_pid.get)
    ops = per_pid_ops[device_pid]
    return {
        "tracks": {str(p): {"name": pid_names.get(p, ""),
                            "total_us": round(t, 1)}
                   for p, t in sorted(per_pid.items(),
                                      key=lambda kv: -kv[1])[:8]},
        "device_pid": str(device_pid),
        "device_track_name": pid_names.get(device_pid, ""),
        "ops": dict(sorted(ops.items(), key=lambda kv: -kv[1])),
    }


def bucket(ops: dict) -> dict:
    """Conv / matmul / elementwise-fusion / copy-layout / other buckets —
    XLA op names carry their HLO opcode prefix."""
    buckets = defaultdict(float)
    for name, us in ops.items():
        low = name.lower()
        if "conv" in low:
            buckets["convolution"] += us
        elif "dot" in low or "matmul" in low or "gemm" in low:
            buckets["matmul"] += us
        elif low.startswith(("fusion", "loop_fusion", "input_fusion",
                             "output_fusion")) or "fusion" in low:
            buckets["fusion_elementwise"] += us
        elif any(k in low for k in ("copy", "transpose", "reshape",
                                    "bitcast", "pad", "slice")):
            buckets["copy_layout"] += us
        elif any(k in low for k in ("all-reduce", "allreduce", "infeed",
                                    "outfeed")):
            buckets["comms_io"] += us
        else:
            buckets["other"] += us
    total = sum(buckets.values()) or 1.0
    return {k: {"us": round(v, 1), "pct": round(100 * v / total, 1)}
            for k, v in sorted(buckets.items(), key=lambda kv: -kv[1])}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--chain", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench
    from rawaudiovae_kelsey_tpu.models import build_model
    from rawaudiovae_kelsey_tpu.parallel import build_train_step
    from rawaudiovae_kelsey_tpu.train import TrainState, build_optimizer

    cfg = bench._build_cfg("conv1d", args.batch, "bfloat16", "xla")
    model = build_model(cfg)
    opt = build_optimizer(cfg)
    params = model.init(jax.random.PRNGKey(0))
    state = TrainState.create(params, opt.init(params), seed=0)
    one_step = build_train_step(model, cfg, opt, donate=False)
    chain = args.chain

    @jax.jit
    def step(state, batch):
        def body(s, _):
            s, m = one_step(s, batch)
            return s, m["loss"]
        s, losses = jax.lax.scan(body, state, None, length=chain)
        return s, losses[-1]

    rng = np.random.default_rng(0)
    batch = jnp.asarray(
        rng.uniform(-1, 1, (args.batch, cfg.audio.segment_length))
        .astype(np.float32))

    # warmup + value fetch (tunnel rule: async compile outlives block)
    for _ in range(2):
        state, loss = step(state, batch)
    float(jax.device_get(loss))

    t0 = time.perf_counter()
    state, loss = step(state, batch)
    float(jax.device_get(loss))
    rate = args.batch * chain / (time.perf_counter() - t0)

    with tempfile.TemporaryDirectory(prefix="conv_prof_") as d:
        jax.profiler.start_trace(d)
        state, loss = step(state, batch)
        float(jax.device_get(loss))
        jax.profiler.stop_trace()
        agg = parse_trace(Path(d))

    ops = agg.pop("ops")
    device_total_us = sum(ops.values())
    result = {
        "metric": "conv1d_profile",
        "batch": args.batch,
        "chain": chain,
        "frames_per_sec_untraced": round(rate, 1),
        "device_total_us": round(device_total_us, 1),
        "per_step_us": round(device_total_us / chain, 1),
        "buckets": bucket(ops),
        "top_ops": [
            {"name": k[:120], "us": round(v, 1),
             "pct": round(100 * v / max(device_total_us, 1), 1)}
            for k, v in list(ops.items())[:25]
        ],
        **agg,
    }
    out = REPO / "benchmarks" / f"conv_profile_{args.batch}.json"
    out.write_text(json.dumps(result, indent=1))
    print(json.dumps({k: v for k, v in result.items()
                      if k not in ("top_ops", "tracks")}))
    print(f"full aggregate: {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
