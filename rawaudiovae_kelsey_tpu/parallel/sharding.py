"""Parameter sharding rules.

Dense VAE tensor parallelism (Megatron-style split of the ``n_units`` hidden
dimension over the ``model`` axis):

    fc1   w (seg, units)    → P(None, 'model')   column-parallel
    fc1   b (units,)        → P('model')
    fc21  w (units, latent) → P('model', None)   row-parallel (XLA psums)
    fc22  w (units, latent) → P('model', None)
    fc3   w (latent, units) → P(None, 'model')   column-parallel
    fc3   b (units,)        → P('model')
    fc4   w (units, seg)    → P('model', None)   row-parallel
    other biases            → replicated

The deep-MLP variant shards every hidden×hidden weight on its larger axis the
same way; conv variants replicate (their params are small).  We only *annotate*
— GSPMD inserts the all-reduces at the row-parallel boundaries.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rawaudiovae_kelsey_tpu.parallel.mesh import MODEL_AXIS

_DENSE_W_SPECS = {
    "fc1": P(None, MODEL_AXIS),
    "fc21": P(MODEL_AXIS, None),
    "fc22": P(MODEL_AXIS, None),
    "fc3": P(None, MODEL_AXIS),
    "fc4": P(MODEL_AXIS, None),
}
_DENSE_B_SPECS = {
    "fc1": P(MODEL_AXIS),
    "fc21": P(),
    "fc22": P(),
    "fc3": P(MODEL_AXIS),
    "fc4": P(),
}


def dense_param_specs(params: Any) -> Any:
    """PartitionSpec pytree for the dense VAE params layout."""
    return {
        name: {"w": _DENSE_W_SPECS[name], "b": _DENSE_B_SPECS[name]}
        for name in params
    }


def _deep_linear_spec(w_shape) -> P:
    """Shard a hidden Linear on whichever dim is a hidden dim; keep the
    reparameterized latent/segment dims replicated by sharding the larger
    axis (column-parallel) — safe because consecutive splits alternate with
    XLA-inserted collectives."""
    fan_in, fan_out = w_shape
    if fan_out >= fan_in:
        return P(None, MODEL_AXIS)
    return P(MODEL_AXIS, None)


def param_specs(model_name: str, params: Any, model_parallel: int) -> Any:
    """PartitionSpec pytree for any registered model family.  With
    ``model_parallel == 1`` everything is replicated."""
    if model_parallel <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    if model_name == "dense":
        return dense_param_specs(params)
    if model_name == "deep":
        def spec_layer(layer):
            wspec = _deep_linear_spec(layer["w"].shape)
            bspec = P(MODEL_AXIS) if wspec == P(None, MODEL_AXIS) else P()
            return {"w": wspec, "b": bspec}
        return {
            "enc": [spec_layer(l) for l in params["enc"]],
            "dec": [spec_layer(l) for l in params["dec"]],
            "mu_head": spec_layer(params["mu_head"]),
            "logvar_head": spec_layer(params["logvar_head"]),
        }
    # conv1d and anything else: replicate (small params)
    return jax.tree_util.tree_map(lambda _: P(), params)


def shard_params(params: Any, mesh: Mesh, specs: Any) -> Any:
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    return jax.device_put(params, shardings)


def named_shardings(mesh: Mesh, specs: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
