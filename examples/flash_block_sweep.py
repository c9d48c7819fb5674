"""On-chip flash-attention block-shape sweep (VERDICT r3 item 4).

Times the query/key-blocked flash GraphiT kernel's fwd+bwd at kernel
level (no full-model compile) across block sizes and N, interleaved in
one process, against the XLA fused chain twin at the same shapes. Also
A/Bs the bf16 modulation-stream io (mod_dtype) against f32 — the pe
stream is the kernel's dominant HBM traffic at large N.

Prints one JSON line per (N, variant). Usage:
    python examples/flash_block_sweep.py [N1,N2,...]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

from feta_tmlr_tpu.utils.profiling import timed_steps

SHAPES = {512: 4, 1024: 2, 2048: 1, 4096: 1}   # N -> B
H, D = 8, 64


def _inputs(n, b, rng):
    f32, bf16 = jnp.float32, jnp.bfloat16
    mk = lambda *shape: jnp.asarray(
        rng.standard_normal(shape), f32)
    xa = mk(b, H, n, D).astype(bf16)
    x = mk(b, n, D).astype(bf16)
    cq, ck = mk(b, n, H), mk(b, n, H)
    c0 = mk(H)
    vw = mk(b, H, n, D).astype(bf16)
    pe = jnp.exp(-0.1 * jnp.abs(mk(b, n, n)))       # positive kernel
    deg = jnp.abs(mk(b, n)) + 0.5
    mask = jnp.ones((b, n), bool)
    return xa, x, cq, ck, c0, vw, pe, deg, mask


def _xla_chain(xa, x, cq, ck, c0, vw, pe, deg, mask):
    from feta_tmlr_tpu.ops.attention import modulated_attention_from_scores
    scores = jnp.einsum("bhng,bmg->bhnm", xa, x).astype(jnp.float32)
    scores = (scores + cq.transpose(0, 2, 1)[:, :, :, None]
              + ck.transpose(0, 2, 1)[:, :, None, :]
              + c0[None, :, None, None]) / jnp.sqrt(jnp.asarray(
                  D // H, jnp.float32))
    _, attn = modulated_attention_from_scores(
        scores, None, mask, pe=pe, degree=deg, values_needed=False,
        modulation_dtype=jnp.bfloat16)
    return jnp.einsum("bhnm,bhmf->bnf", attn.astype(jnp.bfloat16), vw)


def _variant_fn(variant, block=None):
    from feta_tmlr_tpu.ops.pallas.flash_attention import \
        flash_graphit_attention

    def fwd(args):
        xa, x, cq, ck, c0, vw, pe, deg, mask = args
        if variant == "xla":
            out = _xla_chain(xa, x, cq, ck, c0, vw, pe, deg, mask)
        else:
            out = flash_graphit_attention(
                xa, x, cq, ck, c0, vw, mask, pe=pe, degree=deg,
                block_q=block, block_k=block,
                mod_dtype=(jnp.bfloat16 if variant == "flash_bf16mod"
                           else None))
        return out.astype(jnp.float32)

    def loss(args):
        return jnp.abs(fwd(args)).mean()

    grad = jax.grad(lambda xa, rest: loss((xa,) + rest))

    @jax.jit
    def step(carry, args, rng):
        # thread the carry through xa so chained steps stay data-dependent
        # behind the relay (timed_steps' difference method)
        xa = args[0] + (carry * 0).astype(args[0].dtype)
        g = grad(xa, args[1:])
        return jnp.sum(g.astype(jnp.float32)), g.sum()

    return step


def main():
    from bench import _accelerator_available
    if not _accelerator_available():
        print(json.dumps({"error": "accelerator backend unavailable"}),
              flush=True)
        return
    shapes = SHAPES
    if len(sys.argv) > 1:
        shapes = {int(s): SHAPES.get(int(s), 1)
                  for s in sys.argv[1].split(",")}
    rng = np.random.default_rng(0)
    for n, b in shapes.items():
        args = jax.device_put(_inputs(n, b, rng))
        jax.block_until_ready(args[0])
        blocks = [bs for bs in (128, 256, 512, 1024)
                  if bs <= n and n % bs == 0]
        variants = [("xla", None)]
        variants += [("flash_bf16mod", bs) for bs in blocks]
        variants += [("flash_f32mod", max(blocks))]
        for variant, block in variants:
            row = {"n": n, "b": b, "variant": variant, "block": block}
            try:
                step = _variant_fn(variant, block)
                sec = timed_steps(step, jnp.float32(0.0), args,
                                  lambda i: jax.random.key(i),
                                  n1=5, n2=20, check_finite=False)
                row["ms"] = round(sec * 1e3, 3)
            except Exception as e:
                row["error"] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
