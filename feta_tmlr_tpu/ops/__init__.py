from feta_tmlr_tpu.ops.laplacian import (
    cheb_scaled_laplacian,
    gcn_norm_dense,
)
from feta_tmlr_tpu.ops.cheb import cheb_filter_dynamic, cheb_filter_scalar_coeff
from feta_tmlr_tpu.ops.attention import kernel_modulated_attention
from feta_tmlr_tpu.ops.masking import pair_mask, masked_mean
from feta_tmlr_tpu.ops.segment import (
    segment_softmax,
    coo_spmm,
)

__all__ = [
    "cheb_scaled_laplacian",
    "gcn_norm_dense",
    "cheb_filter_dynamic",
    "cheb_filter_scalar_coeff",
    "kernel_modulated_attention",
    "pair_mask",
    "masked_mean",
    "segment_softmax",
    "coo_spmm",
]
