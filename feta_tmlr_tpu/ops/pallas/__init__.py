from feta_tmlr_tpu.ops.pallas.modulation import fused_modulated_attention

__all__ = ["fused_modulated_attention"]
