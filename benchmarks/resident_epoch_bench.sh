#!/bin/sh
# Resident-epoch e2e throughput probe: the round-2 comparison setup
# (120 s synthetic corpus, dense 1024/2048/256, batch 4096, bf16,
# checkpoint interval 20, 60 epochs).  Run from the repo root on TPU:
#   sh benchmarks/resident_epoch_bench.sh
# Round-2 figure: 2.81 M frames/s warm with 3 compiles (k=21/20/19);
# round 3 targets one compile + >=3.5 M via the fixed-group masked-tail
# formulation and the per-epoch whole-matrix shuffle.
# DURATION (seconds of synthetic corpus, default 120) and EPOCHS (default
# 60) probe the shuffle-tax amortization: per-epoch device work grows with
# the corpus while the permutation+gather overhead grows slower.
# RNG=tpu_prng + RESIDENT_SHUFFLE=block reproduces the configs/perf_bf16.ini
# composite.
# INTERVAL (checkpoint cadence, default 20) isolates the boundary cost:
# INTERVAL=100000 runs the whole budget boundary-free (the device-rate e2e).
set -e
D=$(mktemp -d)
DURATION=${DURATION:-120} EPOCHS=${EPOCHS:-60} RNG=${RNG:-threefry} \
INTERVAL=${INTERVAL:-20} ASYNC=${ASYNC:-true} \
RESIDENT_SHUFFLE=${RESIDENT_SHUFFLE:-global} python - "$D" <<'EOF'
import os, sys, pathlib
import numpy as np
sys.path.insert(0, ".")
from rawaudiovae_kelsey_tpu.io import write_wav
d = pathlib.Path(sys.argv[1])
(d/"audio").mkdir(); (d/"test_audio").mkdir()
sr = 44100
dur = int(os.environ.get("DURATION", "120"))
rng = np.random.default_rng(0)
t = np.arange(dur*sr)/sr
sig = np.zeros(dur*sr, np.float32)
for f in (220., 440., 587., 880.):
    sig += (0.2*np.sin(2*np.pi*f*t)).astype(np.float32)
sig += rng.normal(0, .01, sig.shape).astype(np.float32)
write_wav(d/"audio"/"corpus.wav", sig, sr)
write_wav(d/"test_audio"/"t.wav", sig[:sr], sr)
(d/"bench.ini").write_text(f"""
[audio]
sampling_rate = 44100
hop_length = 128
segment_length = 1024
[dataset]
datapath = {d}
test_dataset = test_audio
generate_test = False
[VAE]
latent_dim = 256
n_units = 2048
kl_beta = 0.0001
[training]
epochs = {os.environ.get("EPOCHS", "60")}
learning_rate = 0.0001
batch_size = 4096
checkpoint_interval = {os.environ.get("INTERVAL", "20")}
loss_reduction = mean
[extra]
description = resident_bench
[tpu]
precision = bfloat16
device_resident = always
resident_shuffle = {os.environ.get("RESIDENT_SHUFFLE", "global")}
async_checkpoint = {os.environ.get("ASYNC", "true")}
rng = {os.environ.get("RNG", "threefry")}
""")
print(d)
EOF
python train.py --config "$D/bench.ini" 2>&1 | grep -E "frames/s|compile|Resident|resident" | tail -20
rm -rf "$D"
