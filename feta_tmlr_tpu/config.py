"""Global runtime toggles."""

from __future__ import annotations

import os

# Use the fused Pallas modulation kernel inside attention layers when
# running on TPU (pair-masked/packed batches fall back to the jnp path).
# auto: enabled on non-CPU backends. Override with FETA_PALLAS=0/1.
_env = os.environ.get("FETA_PALLAS")
PALLAS_MODULATION = None if _env is None else _env == "1"


def use_pallas_modulation() -> bool:
    if PALLAS_MODULATION is not None:
        return PALLAS_MODULATION
    import jax
    try:
        return jax.devices()[0].platform != "cpu"
    except Exception:
        return False
