"""Model export — the TPU-native replacement for export-onnx.ipynb.

The reference exported ``torch.onnx.export(raw_model, torch.randn(1024),
"rawaudiovae.onnx")`` (export-onnx cell 11): the full forward (encode +
stochastic reparameterize + decode) at a fixed (1024,) input.  Here:

  * :func:`export_stablehlo` serializes the jitted forward via ``jax.export``
    — portable, versioned StableHLO runnable by any JAX/XLA runtime (the
    ecosystem analog of an ONNX graph);
  * :func:`export_npz` writes the weights as plain npz with torch-layout
    names, loadable by anything (including back into the reference's
    PyTorch code via ``compat.params_to_state_dict`` naming);
  * both a stochastic graph (reference parity: RNG key input) and a
    deterministic z = mu graph (quirk #13 extension) are exported.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from rawaudiovae_kelsey_tpu.models.registry import ModelDef
from rawaudiovae_kelsey_tpu.models.vae import reparameterize


def make_forward_fn(model: ModelDef, deterministic: bool = False):
    """The exported computation: flat (segment,) or (B, segment) audio in →
    ``(recon, mu, logvar)`` out — the reference VAE.forward contract
    (model.py:32-35) that torch.onnx.export serialized, so latent
    consumers of the reference artifact find the same output surface
    here."""
    if deterministic:
        def fwd(params, x):
            x = x.reshape(-1, model.segment_length)
            mu, logvar = model.encode(params, x)
            return model.decode(params, mu), mu, logvar
        return fwd

    def fwd(params, key, x):
        x = x.reshape(-1, model.segment_length)
        mu, logvar = model.encode(params, x)
        z = reparameterize(key, mu, logvar)
        return model.decode(params, z), mu, logvar
    return fwd


def export_stablehlo(model: ModelDef, params, path: Path,
                     batch: int = 1, deterministic: bool = False) -> Path:
    """Serialize the forward graph (weights baked in) to ``path``.  Reload
    with :func:`load_stablehlo`."""
    from jax import export as jexport

    x_spec = jax.ShapeDtypeStruct((batch, model.segment_length), jnp.float32)
    if deterministic:
        fn = jax.jit(lambda x: make_forward_fn(model, True)(params, x))
        exported = jexport.export(fn)(x_spec)
    else:
        key_spec = jax.ShapeDtypeStruct((2,), jnp.uint32)
        fn = jax.jit(
            lambda key, x: make_forward_fn(model, False)(params, key, x)
        )
        exported = jexport.export(fn)(key_spec, x_spec)
    data = exported.serialize()
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(data)
    return path


def load_stablehlo(path: Path):
    """Deserialize an exported graph; returns a callable."""
    from jax import export as jexport

    exported = jexport.deserialize(Path(path).read_bytes())
    return exported.call


def export_npz(model: ModelDef, params, path: Path) -> Path:
    """Weights-only export.  For the dense family the keys are the torch
    state-dict names (fc1.weight, …) in torch layout, so the file round-trips
    into the reference implementation."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    params = jax.device_get(params)
    if model.name == "dense":
        from rawaudiovae_kelsey_tpu.compat import params_to_state_dict

        arrays = params_to_state_dict(params)
    else:
        flat, _ = jax.tree_util.tree_flatten_with_path(params)
        arrays = {
            ".".join(str(getattr(p, "key", getattr(p, "idx", p)))
                     for p in kp): np.asarray(leaf)
            for kp, leaf in flat
        }
    with open(path, "wb") as fh:
        np.savez(fh, **arrays)
    return path
