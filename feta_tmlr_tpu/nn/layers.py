"""Encoder layers: the reconstructed GraphiT attention layer.

`GraphiTEncoderLayer` is the TPU-native rebuild of the reference's
`DiffTransformerEncoderLayer`, which is *absent from the snapshot*
(transformer/layers.py is a stray copy of gckn/layers.py; SURVEY.md §2.7).
The contract is reconstructed from its call sites:
  - ctor (d_model, nb_heads, dim_feedforward, dropout, batch_norm)
    (transformer/models.py:405-406,505-506)
  - forward(src, pe, degree, src_mask, src_key_padding_mask, need_heads)
    returning (out, attn[B,H,N,N], out_each_head[B,N,H,dh])
    (transformer/models.py:92-93,166-167,275,179-186)
  - post-attention structure follows torch.nn.TransformerEncoderLayer
    (residual -> norm1 -> FFN(relu) -> residual -> norm2), with a
    batch-norm variant selected by the `batch_norm` flag.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from feta_tmlr_tpu.ops.attention import modulated_attention_from_scores
from feta_tmlr_tpu.ops.masking import masked_mean


class AttnColStats(NamedTuple):
    """Detached coefficient-head statistics emitted in place of the dense
    [B, H, N, N] attention matrix by the streamed need_heads flash path:
    s[b, h, j] = sum_i gcn_norm_directed(attn)[b, h, i, j] — exactly what
    FilterCoefficientHead derives from dense attention."""

    s: jax.Array          # [B, H, N]


class MaskedBatchNorm(nn.Module):
    """BatchNorm over features, statistics taken over valid nodes only.

    The reference's `batch_norm=True` path normalizes flattened (B*N, D)
    activations with nn.BatchNorm1d; with padding, unmasked statistics would
    be polluted by phantom zeros, so we mask them.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x, node_mask, use_running_average: bool = True):
        d = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((d,), jnp.float32))
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((d,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (d,))
        bias = self.param("bias", nn.initializers.zeros, (d,))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            m = node_mask.astype(x.dtype)[..., None]
            cnt = jnp.maximum(m.sum(), 1.0)
            mean = (x * m).sum(axis=(0, 1)) / cnt
            var = (((x - mean) ** 2) * m).sum(axis=(0, 1)) / cnt
            if not self.is_initializing():
                ra_mean.value = (
                    self.momentum * ra_mean.value + (1 - self.momentum) * mean)
                ra_var.value = (
                    self.momentum * ra_var.value + (1 - self.momentum) * var)
        y = (x - mean) * jnp.reciprocal(jnp.sqrt(var + self.epsilon))
        return y * scale + bias


class GraphiTEncoderLayer(nn.Module):
    """Kernel-modulated multi-head attention + FFN block.

    Returns (out [B,N,D], attn [B,H,N,N], out_each_head [B,N,H,dh]);
    `out_each_head` is the per-head attention output before the output
    projection, which the FeTA block filters spectrally.
    """

    d_model: int
    n_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1
    batch_norm: bool = False
    compute_dtype: Optional[object] = None   # None -> FETA_COMPUTE_DTYPE env

    @nn.compact
    def __call__(self, x, pe, node_mask, degree=None, deterministic=True,
                 pair_mask=None, need_heads=True):
        from feta_tmlr_tpu.config import default_compute_dtype
        # mixed precision: matmuls/einsums run in cdt (bf16 on request),
        # params + residual stream + softmax + norms stay f32
        cdt = self.compute_dtype or default_compute_dtype()
        b, n, d = x.shape
        h = self.n_heads
        dh = d // h
        assert d == self.d_model and dh * h == d, (
            f"d_model={self.d_model} must equal input dim {d} and divide "
            f"evenly by n_heads={h}")

        # One qkv projection (torch MultiheadAttention layout), but scores
        # are computed as x (Wq_h Wk_h^T) x^T + rank-1 bias corrections:
        # contracting q_h k_h^T directly over dh (= 8 here) runs the MXU at
        # dh/128 lane utilization, while both matmuls of the associative
        # regrouping contract over the full d_model. Mathematically
        # identical (verified against the torch twin in tests/test_parity).
        wqkv = self.param(
            "qkv",
            lambda rng, shape: nn.initializers.lecun_normal()(rng, shape),
            (d, 3 * d)).reshape(d, 3, h, dh)
        bqkv = self.param("qkv_bias", nn.initializers.zeros,
                          (3 * d,)).reshape(3, h, dh)
        wq, wk, wv = wqkv[:, 0], wqkv[:, 1], wqkv[:, 2]    # [d, h, dh]
        bq, bk, bv = bqkv[0], bqkv[1], bqkv[2]             # [h, dh]

        xc = x.astype(cdt)
        a_mix = jnp.einsum("dhe,ghe->hdg", wq, wk).astype(cdt)  # [h, d, d]
        xa = jnp.einsum("bnd,hdg->bhng", xc, a_mix)
        c_q = jnp.einsum("bnd,dhe,he->bnh", x, wq, bk)     # q-side bias term
        c_k = jnp.einsum("bmd,dhe,he->bmh", x, wk, bq)
        c_0 = jnp.einsum("he,he->h", bq, bk)

        v_nhd = (jnp.einsum("bnd,dhe->bnhe", xc, wv.astype(cdt))
                 + bv.astype(cdt))                           # [B,N,H,dh]

        w_out = self.param("out_proj_kernel",
                           nn.initializers.lecun_normal(), (d, d))
        b_out = self.param("out_proj_bias", nn.initializers.zeros, (d,))

        from feta_tmlr_tpu.config import use_pallas_modulation
        # shape-based auto gate (config.PALLAS_AUTO_N): the measured
        # large-N win (1.42x at N=1024, examples/pallas_largen_ab.py)
        # was taken with BOTH kernels on — the flash path here for
        # need_heads=False layers and the row-tiled modulation kernel
        # for need_heads=True (FILTERED) layers — so the gate applies
        # to both
        use_pallas = pair_mask is None and use_pallas_modulation(n)

        import os as _os
        _impl = _os.environ.get("FETA_PALLAS_IMPL", "flash")
        if need_heads and use_pallas and _impl == "flash" \
                and _os.environ.get("FETA_FLASH_NEED_HEADS", "1") == "1":
            # streamed FILTERED-layer path (round-5): per-head outputs +
            # the coefficient head's detached column statistics come out
            # of the flash kernel directly — no [B, H, N, N] attention
            # tensor in HBM on this layer either (previously only the
            # need_heads=False layers had a flash path, capping the
            # full-model large-N win at 1.10-1.25x; BASELINE.md round 4).
            from feta_tmlr_tpu.ops.pallas.flash_attention import \
                flash_graphit_attention_heads
            mod_dt = (cdt if cdt != jnp.float32 and _os.environ.get(
                "FETA_BF16_MODULATION", "1") == "1" else None)
            v_heads = v_nhd.transpose(0, 2, 1, 3)        # [B,H,N,dh]
            out_each_head, s = flash_graphit_attention_heads(
                xa, x, c_q, c_k, c_0, v_heads, node_mask, pe=pe,
                degree=degree, mod_dtype=mod_dt)
            out_each_head = out_each_head.astype(jnp.float32)
            attn_out = (out_each_head.reshape(b, n, d).astype(cdt)
                        @ w_out.astype(cdt)).astype(jnp.float32) + b_out
            attn = AttnColStats(s=s)
        elif not need_heads and use_pallas and _impl != "modulation":
            # fully fused flash path: the [H, N, N] score/attention tensors
            # never reach HBM. Default impl is the query/key-blocked
            # online-softmax kernel (ops/pallas/flash_attention.py), which
            # compiles at any N; FETA_PALLAS_IMPL=fused selects the older
            # single-block kernel (VMEM-bound to N<=512);
            # FETA_PALLAS_IMPL=modulation routes need_heads=False layers
            # through the row-tiled modulation kernel below instead (XLA
            # score matmul + one fused modulation-chain kernel) — the
            # small-N/large-B configuration of the batch-sweep A/B.
            if _impl == "fused":
                from feta_tmlr_tpu.ops.pallas.fused_attention import \
                    fused_graphit_attention as _fused_attn
            else:
                from feta_tmlr_tpu.ops.pallas.flash_attention import \
                    flash_graphit_attention as _fused_attn
            vw = jnp.einsum("bmhe,hef->bhmf", v_nhd,
                            w_out.reshape(h, dh, d).astype(cdt))
            kw = {}
            if _impl != "fused":
                # bf16 pe/degree/mask streams under the bf16 compute
                # policy — the FETA_BF16_MODULATION policy applied to the
                # flash kernel's dominant HBM stream (chain stays f32)
                mod_dt = (cdt if cdt != jnp.float32 and _os.environ.get(
                    "FETA_BF16_MODULATION", "1") == "1" else None)
                kw["mod_dtype"] = mod_dt
            attn_out = _fused_attn(
                xa, x, c_q, c_k, c_0, vw, node_mask, pe=pe,
                degree=degree, **kw) + b_out
            attn = None
            out_each_head = None
        else:
            # score matmul in cdt, bias/softmax math back in f32
            scores = jnp.einsum("bhng,bmg->bhnm", xa, xc) \
                .astype(jnp.float32)
            scores = (scores + c_q.transpose(0, 2, 1)[:, :, :, None]
                      + c_k.transpose(0, 2, 1)[:, :, None, :]
                      + c_0[None, :, None, None])
            scores = scores / jnp.sqrt(jnp.asarray(dh, jnp.float32))
            from feta_tmlr_tpu.ops.pallas.modulation import \
                modulation_tile_feasible
            if use_pallas and modulation_tile_feasible(h, n, 4):
                from feta_tmlr_tpu.ops.pallas import \
                    fused_modulated_attention
                attn = fused_modulated_attention(scores, node_mask, pe=pe,
                                                 degree=degree)
            else:
                import os
                mod_dt = (cdt if cdt != jnp.float32 and os.environ.get(
                    "FETA_BF16_MODULATION", "1") == "1" else None)
                _, attn = modulated_attention_from_scores(
                    scores, None, node_mask, pe=pe, degree=degree,
                    pair_mask=pair_mask, values_needed=False,
                    modulation_dtype=mod_dt)

            attn_c = attn.astype(cdt)
            if need_heads:
                # FeTA consumer path: materialize per-head outputs (the
                # reference's need_heads=True contract, models.py:166-167)
                heads = jnp.einsum("bhqk,bkhd->bhqd", attn_c, v_nhd)
                out_each_head = heads.transpose(0, 2, 1, 3)  # [B,N,H,dh]
                attn_out = (out_each_head.reshape(b, n, d)
                            @ w_out.astype(cdt)).astype(jnp.float32) + b_out
                out_each_head = out_each_head.astype(jnp.float32)
            else:
                # fused attn@V@Wout: contract (head, key) jointly
                vw = jnp.einsum("bmhe,hef->bhmf", v_nhd,
                                w_out.reshape(h, dh, d).astype(cdt))
                attn_out = jnp.einsum("bhnm,bhmf->bnf", attn_c, vw) \
                    .astype(jnp.float32) + b_out
                out_each_head = None

        drop = lambda t: nn.Dropout(self.dropout)(
            t, deterministic=deterministic)

        x = x + drop(attn_out)
        x = self._norm(x, node_mask, "norm1", deterministic)

        ff = nn.Dense(self.dim_feedforward, name="ff1", dtype=cdt)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(self.d_model, name="ff2", dtype=cdt)(ff)
        x = x + drop(ff.astype(jnp.float32))
        x = self._norm(x, node_mask, "norm2", deterministic)

        mask_f = node_mask.astype(x.dtype)[..., None]
        if out_each_head is not None:
            out_each_head = out_each_head * mask_f[:, :, None, :]
        return x * mask_f, attn, out_each_head

    def _norm(self, x, node_mask, name, deterministic):
        if self.batch_norm:
            return MaskedBatchNorm(name=name)(
                x, node_mask, use_running_average=deterministic)
        # epsilon matches torch.nn.LayerNorm (the reference's norm)
        return nn.LayerNorm(epsilon=1e-5, name=name)(x)
