"""PyTorch checkpoint interop.

The reference checkpoints are ``torch.save`` dicts
``{'epoch'|'batch_id', 'state_dict', 'optimizer'}`` (train.py:206-239) whose
``state_dict`` carries ``fc{1,21,22,3,4}.{weight,bias}`` tensors with
``nn.Linear`` layout ``weight: (out, in)`` computing ``x @ W.T + b``.  Our
functional params store ``w: (in, out)`` computing ``x @ W + b``, so import
transposes each weight.  This importer exists for the bit-for-float parity
requirement in BASELINE.json: load the same weights into both frameworks and
compare encode/decode outputs.

torch (CPU build) is an optional dependency: only this module imports it, and
only inside functions, so the rest of the framework never touches it.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Dict, Mapping, Union

import numpy as np

from rawaudiovae_kelsey_tpu.models.vae import Params

_DENSE_LAYERS = ("fc1", "fc21", "fc22", "fc3", "fc4")


def state_dict_to_params(state_dict: Mapping[str, Any]) -> Params:
    """Convert a reference VAE ``state_dict`` (torch tensors or ndarrays) to
    the functional params pytree."""
    params: Params = {}
    for name in _DENSE_LAYERS:
        wkey, bkey = f"{name}.weight", f"{name}.bias"
        if wkey not in state_dict or bkey not in state_dict:
            raise KeyError(f"state_dict missing {wkey}/{bkey}")
        w = _to_numpy(state_dict[wkey])
        b = _to_numpy(state_dict[bkey])
        params[name] = {"w": np.ascontiguousarray(w.T), "b": b}
    return params


def params_to_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """Inverse of :func:`state_dict_to_params` (numpy arrays, torch layout)."""
    out: Dict[str, np.ndarray] = {}
    for name in _DENSE_LAYERS:
        out[f"{name}.weight"] = np.ascontiguousarray(
            np.asarray(params[name]["w"]).T
        )
        out[f"{name}.bias"] = np.asarray(params[name]["b"])
    return out


def _install_rawvae_stub() -> None:
    """Make the reference's whole-module pickles loadable without the
    reference package: ``best_model.pt``/``last_model.pt`` were saved with
    ``torch.save(model)`` (train.py:243-244), so unpickling needs an
    importable ``rawvae.model.VAE`` class.  We synthesize a minimal stand-in
    (unpickling restores state via ``__dict__``, so an empty nn.Module
    subclass suffices)."""
    import sys
    import types

    import torch

    if "rawvae.model" in sys.modules:
        return

    class VAE(torch.nn.Module):  # matches the pickled class path
        pass

    pkg = types.ModuleType("rawvae")
    mod = types.ModuleType("rawvae.model")
    mod.VAE = VAE
    pkg.model = mod
    sys.modules.setdefault("rawvae", pkg)
    sys.modules["rawvae.model"] = mod


def load_torch_checkpoint(path: Union[str, Path]) -> Params:
    """Load a reference ``ckpt_NNNNN`` file, a bare state_dict file, or a
    whole-module pickle (``best_model.pt``) into a params pytree.  Requires
    the torch CPU build."""
    import torch

    try:
        obj = torch.load(Path(path), map_location="cpu", weights_only=False)
    except ModuleNotFoundError:
        # whole-module pickle referencing the (absent) reference package
        _install_rawvae_stub()
        obj = torch.load(Path(path), map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    if not isinstance(obj, dict):
        # whole-module pickle (best_model.pt / last_model.pt, train.py:243-244)
        obj = obj.state_dict()
    return state_dict_to_params(obj)


def _to_numpy(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    # Always materialize a copy: jnp.asarray zero-copies aligned numpy arrays
    # on CPU, so returning a view of a live torch tensor would let later
    # in-place torch mutations (e.g. optimizer steps) corrupt the JAX params.
    return np.array(t, dtype=np.float32, copy=True)
