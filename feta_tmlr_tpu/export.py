"""Ahead-of-time model export (StableHLO) for deployment.

The reference deploys nothing — training scripts re-instantiate torch
modules from source every run. A production TPU serving path wants the
opposite: a self-contained artifact, compiled once, loadable without the
Python model zoo. `jax.export` gives exactly that — the jitted forward
is lowered to StableHLO, serialized to bytes, and re-loaded (optionally
in a process that has no flax/model code) with `call`-able semantics.

Usage:
    art = export_predict(model, variables, sample_batch)   # Exported
    save_exported(art, "model.stablehlo")
    ...
    fn = load_exported("model.stablehlo")                  # callable
    logits = fn(batch)            # same bucketed static shapes as sample

Shapes are static per bucket (the serving design bucketizes anyway —
serve.py); export one artifact per bucket you serve. Variables are baked
into the artifact as constants by default (`bake_variables=True`), so
the file is the whole model; pass False to keep them as a runtime
argument (smaller file, params supplied at call time).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import export as jexport

from feta_tmlr_tpu.data.batch import GraphBatch
from feta_tmlr_tpu.data.wire import from_wire

_REGISTERED = False


def _ensure_registered():
    """GraphBatch must be serialization-registered for jax.export to
    encode in/out trees. Safe to call more than once."""
    global _REGISTERED
    if _REGISTERED:
        return
    # flax.struct dataclasses flatten with an empty auxdata tuple (every
    # field is a child; None fields are empty subtrees), so the auxdata
    # codec is trivial
    try:
        jexport.register_pytree_node_serialization(
            GraphBatch,
            serialized_name="feta_tmlr_tpu.GraphBatch",
            serialize_auxdata=lambda aux: b"",
            deserialize_auxdata=lambda data: (),
        )
    except ValueError:
        pass          # already registered in this process
    _REGISTERED = True


def export_predict(model, variables, sample_batch: GraphBatch,
                   bake_variables: bool = True,
                   platforms: Optional[list] = None) -> jexport.Exported:
    """Export the deterministic forward at `sample_batch`'s shapes.

    Returns a `jax.export.Exported`; `.call(batch)` runs it, and
    `save_exported` persists it. `platforms` defaults to the current
    backend; pass e.g. ["tpu", "cpu"] for a multi-platform artifact.
    """
    _ensure_registered()

    if bake_variables:
        def fwd(batch):
            b = from_wire(batch)
            out = model.apply(variables, b, deterministic=True)
            return out[0] if isinstance(out, tuple) else out
        args = (jax.tree.map(jnp.asarray, sample_batch),)
    else:
        def fwd(variables, batch):
            b = from_wire(batch)
            out = model.apply(variables, b, deterministic=True)
            return out[0] if isinstance(out, tuple) else out
        args = (jax.tree.map(jnp.asarray, variables),
                jax.tree.map(jnp.asarray, sample_batch))

    exp = jexport.export(jax.jit(fwd), platforms=platforms)(*args)
    return exp


def save_exported(exp: jexport.Exported, path: str) -> None:
    with open(path, "wb") as f:
        f.write(exp.serialize())


def load_exported(path: str):
    """Load a serialized artifact; returns a callable running the
    exported computation (jit-compiled on first call)."""
    _ensure_registered()
    with open(path, "rb") as f:
        exp = jexport.deserialize(f.read())
    return jax.jit(exp.call)
