"""Sharding rules and the sharded train step.

Data parallelism: every GraphBatch leaf is sharded on its leading (graph)
axis over 'data'. Tensor parallelism: weight matrices of the attention and
feedforward blocks are sharded over 'model' on the feature axis the MXU
contracts over last; everything else is replicated. XLA/GSPMD inserts the
psum/all-gather collectives — no hand-written NCCL-equivalents, per the
TPU-first design (SURVEY.md §2.8).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def shard_batch(batch, mesh: Mesh):
    """Place a GraphBatch with leading-axis sharding over 'data'."""
    def place(leaf):
        spec = P("data") if hasattr(leaf, "ndim") and leaf.ndim >= 1 else P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))
    return jax.tree_util.tree_map(place, batch)


# Megatron-style pairing: column-parallel producers followed by
# row-parallel consumers (one psum per block). Module names per tier:
#   GraphiT encoder: qkv -> out_proj, ff1 -> ff2
#   SAN/LSPE tiers:  Q/K/V/Q_2/K_2/E/E_2 -> O_h/O_p, ffn1 -> ffn2
#   GatedGCN:        A1/A2/B1/B2/B3/C1/C2 (independent, column ok)
_TP_COL_NAMES = {"qkv", "qkv_kernel", "ff1", "Q", "K", "V", "Q_2", "K_2",
                 "E", "E_2", "ffn1", "A1", "A2", "B1", "B2", "B3",
                 "C1", "C2", "fc"}
_TP_ROW_NAMES = {"out_proj", "out_proj_kernel", "ff2", "O_h", "O_p",
                 "ffn2"}


def _param_spec(path_parts, leaf) -> P:
    ndim = getattr(leaf, "ndim", 0)
    names = set(path_parts)
    if ndim == 2:
        if names & _TP_COL_NAMES:
            return P(None, "model")
        if names & _TP_ROW_NAMES:
            return P("model", None)
    if ndim == 1 and names & _TP_COL_NAMES:
        return P("model")
    return P()


def shard_params(params, mesh: Mesh):
    """Megatron-style TP layout for the encoder blocks; replicate the rest.

    qkv / first FFN matmul are column-parallel, out_proj / second FFN are
    row-parallel, so a layer needs only one psum (inserted by GSPMD) per
    block.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, leaf in flat:
        parts = [getattr(p, "key", getattr(p, "name", str(p)))
                 for p in path]
        spec = _param_spec([str(p) for p in parts], leaf)
        # only shard if the dimension divides evenly
        axis_size = mesh.shape["model"]
        ok = True
        for dim, name in enumerate(spec):
            if name == "model" and leaf.shape[dim] % axis_size:
                ok = False
        spec = spec if ok else P()
        leaves.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def make_sharded_train_step(step_fn: Callable, mesh: Mesh):
    """Jit a (state, batch, rng) -> (state, loss) step under the mesh.

    Inputs already carry shardings from shard_batch/shard_params; jit
    propagates them and GSPMD partitions the computation (gradients are
    psummed over 'data' automatically since params are replicated on it).
    """
    @jax.jit
    def sharded(state, batch, rng):
        return step_fn(state, batch, rng)
    return sharded
