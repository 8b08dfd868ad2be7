#!/bin/sh
# Resident-stream e2e throughput probe: the round-2 comparison setup
# (120 s synthetic corpus, dense 1024/2048/256, batch 4096, bf16,
# 8.2 M-frame budget, checkpoint windows of 500 batches).  Run from the
# repo root on TPU:
#   sh benchmarks/resident_stream_bench.sh
# Round-2 figure: 3.9-4.3 M frames/s e2e (per-step in-scan row gather);
# round 3 pre-gathers each chunk's rows in one bandwidth pass
# (train/stream.py pregather) — this script measures that delta.
set -e
D=$(mktemp -d)
python - "$D" <<'EOF'
import sys, pathlib
import numpy as np
sys.path.insert(0, ".")
from rawaudiovae_kelsey_tpu.io import write_wav
d = pathlib.Path(sys.argv[1])
(d/"audio").mkdir(); (d/"test_audio").mkdir()
sr = 44100
rng = np.random.default_rng(0)
t = np.arange(120*sr)/sr
sig = np.zeros(120*sr, np.float32)
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
epochs = 50
total_num_frames = 8192000
learning_rate = 0.0001
batch_size = 4096
checkpoint_interval = 500
loss_reduction = mean
[extra]
description = resident_stream_bench
[tpu]
precision = bfloat16
device_resident = always
""")
print(d)
EOF
python train_iterable.py --config "$D/bench.ini" 2>&1 | \
    grep -E "frames/s|Resident|resident|stream" | tail -20
rm -rf "$D"
