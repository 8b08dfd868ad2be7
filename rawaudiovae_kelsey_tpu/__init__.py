"""rawaudiovae_kelsey_tpu — a TPU-native raw-audio VAE framework.

A from-scratch JAX / XLA / Pallas / pjit rebuild of the capabilities of
``kelseyicotton/rawaudiovae_kelsey`` (reference mounted read-only at
``/root/reference``): training dense / deep / conv1d variational autoencoders
directly on raw 44.1 kHz waveform frames, streaming and map-style wav-folder
ingest, INI-compatible configuration, run workspaces, TensorBoard-compatible
metrics, checkpoint/resume, periodic test-set reconstruction, and a batched
inference API (encode → latent interpolation → decode → resynthesis).

Layer map (mirrors SURVEY.md §1, rebuilt TPU-first):

==========  =====================================================================
subpackage  role
==========  =====================================================================
config      INI surface of the reference (`default.ini`) → typed dataclasses;
            run-workspace manager (`run-{:03d}` semantics of train.py:93-111)
io          WAV codec + polyphase resampler (replaces librosa/torchaudio/
            soundfile, none of which exist here) + optional C++ fast path
data        corpus building, frame extraction (AudioDataset/IterableAudioDataset/
            TestDataset contracts of rawvae/dataset.py), batching, device prefetch
models      pure-functional VAE families (dense per rawvae/model.py:5-35, deep/
            wide, conv1d) and the loss (rawvae/model.py:38-46 numerics)
ops         Pallas TPU kernels for the hot path + XLA reference implementations
parallel    jax.sharding meshes, pjit train-step builder, microbatch accumulation
train       drivers (epoch per train.py, streaming per train_iterable.py),
            optimizer, checkpoint/resume, train state
eval        held-out reconstruction fixture (rawvae/tests.py:13-42 contract)
infer       trajectory encode, interpolation modes, SOM consumption, resynthesis,
            batched inference service, export (replaces export-onnx.ipynb)
observe     TensorBoard event writer (pure-python TFRecord/proto), console Tee,
            step timing / frames-per-second accounting
compat      PyTorch checkpoint import/export for bit-for-float parity testing
==========  =====================================================================
"""

__version__ = "0.1.0"

import os as _os

_req = _os.environ.get("JAX_PLATFORMS", "")
if _req and all(p.strip() in ("cpu", "tpu", "gpu", "cuda", "rocm")
                for p in _req.split(",")):
    # Some PJRT plugins (e.g. tunneled TPU backends) register themselves
    # regardless of JAX_PLATFORMS, silently overriding the documented env
    # var.  When the user asks for a BUILT-IN platform (JAX_PLATFORMS=cpu),
    # re-assert the choice through the config API, which the plugin cannot
    # override.  Plugin platform names are left to normal discovery —
    # enforcing them would break in processes where the plugin can't load.
    try:
        import jax as _jax

        _jax.config.update("jax_platforms", _req)
    except Exception:  # noqa: BLE001 — never block import on backend quirks
        pass
del _os, _req

from rawaudiovae_kelsey_tpu.config import Config, load_config  # noqa: F401
