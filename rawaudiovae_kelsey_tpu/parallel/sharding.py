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


_COL = {"w": P(None, MODEL_AXIS), "b": P(MODEL_AXIS)}  # output sharded
_ROW = {"w": P(MODEL_AXIS, None), "b": P()}            # input sharded, psum


def _deep_chain_specs(n: int) -> list:
    """Megatron alternation for a Linear chain: column-parallel then
    row-parallel, pairwise — layer k's sharded output feeds layer k+1's
    sharded input with NO collective between them; one reduce per pair.
    (The old larger-dim rule made every constant-width hidden layer
    column-parallel — an activation all-gather per layer — and feature-
    sharded the segment axis on boundary layers where seg > hidden.)"""
    return [dict(_COL) if i % 2 == 0 else dict(_ROW) for i in range(n)]


def param_specs(model_name: str, params: Any, model_parallel: int) -> Any:
    """PartitionSpec pytree for any registered model family.  With
    ``model_parallel == 1`` everything is replicated."""
    if model_parallel <= 1:
        return jax.tree_util.tree_map(lambda _: P(), params)
    if model_name == "dense":
        return dense_param_specs(params)
    if model_name == "deep":
        enc = _deep_chain_specs(len(params["enc"]))
        dec = _deep_chain_specs(len(params["dec"]))
        if len(dec) % 2 == 1:
            # the final decoder layer produces the SEGMENT axis — keep it
            # replicated (row-parallel) even if the alternation lands on
            # column-parallel here
            dec[-1] = dict(_ROW)
        # heads consume the last encoder activation: row-parallel if that
        # activation is feature-sharded (last enc layer was column-
        # parallel), else replicated (latent dims are small)
        head = (dict(_ROW) if len(params["enc"]) % 2 == 1
                else {"w": P(), "b": P()})
        return {
            "enc": enc,
            "dec": dec,
            "mu_head": dict(head),
            "logvar_head": dict(head),
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
