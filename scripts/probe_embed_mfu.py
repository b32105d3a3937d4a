"""Probe: where does the embed path's time go, and do QKV-fusion
variants help? Run on the real chip:

    env -u JAX_PLATFORMS python scripts/probe_embed_mfu.py

Measures TF/s for (a) the full VDR forward, (b) the BERT body alone,
(c) the vocab head alone, then swaps in fused-QKV attention variants.
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from vsearch_tpu.models.bert import BertConfig, BertModel
from vsearch_tpu.models.vdr import VDREncoderConfig, VDRModule

B, L = 256, 128
H, I, LAYERS, V = 768, 3072, 12, 30522


def flops_bert(b, l):
    per_layer = 2 * b * l * (4 * H * H + 2 * H * I) + 2 * 2 * b * l * l * H
    return LAYERS * per_layer


def flops_head(b, l):
    return 2 * b * l * H * (V - 999 + 125)  # padded to 29568


def bench(fn, args, iters=20):
    # force real execution with a scalar fetch: block_until_ready over
    # the dev tunnel returns early, bench.py learned the same lesson
    r = fn(*args)
    float(jnp.sum(r))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    float(jnp.sum(r))
    return (time.perf_counter() - t0) / iters


def main():
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(999, V, size=(B, L)), jnp.int32)
    ttype = jnp.zeros_like(ids)
    mask = jnp.ones_like(ids)

    vcfg = VDREncoderConfig(bert=BertConfig(dtype=jnp.bfloat16),
                            max_len=L, shift_vocab_num=999, topk=768)
    module = VDRModule(vcfg)
    variables = jax.jit(module.init)(jax.random.PRNGKey(0), ids[:1, :8],
                                     ttype[:1, :8], mask[:1, :8])

    full = jax.jit(lambda v, i, t, m: module.apply(v, i, t, m))
    dt = bench(full, (variables, ids, ttype, mask))
    tf = (flops_bert(B, L) + flops_head(B, L)) / dt / 1e12
    print(f"full VDR fwd: {dt*1e3:.1f} ms  {tf:.1f} TF/s  "
          f"{B/dt:.0f} passages/s")

    # (the fused int8 head was probed here in rounds 3-4, measured
    # 1.05-1.08x at 1.1% score error on-chip, and removed — commit
    # 9edf592; docs/ARCHITECTURE.md "int8 fused head")

    bmod = BertModel(vcfg.bert)
    bvars = jax.jit(bmod.init)(jax.random.PRNGKey(0), ids[:1, :8],
                               ttype[:1, :8], mask[:1, :8])
    bert_only = jax.jit(lambda v, i, t, m: bmod.apply(v, i, t, m))
    dtb = bench(bert_only, (bvars, ids, ttype, mask))
    print(f"bert body:    {dtb*1e3:.1f} ms  "
          f"{flops_bert(B, L)/dtb/1e12:.1f} TF/s")

    # head alone: LN + [B,L,H] @ [H, 29568] + chunked maxpool + elu1p
    w = jnp.asarray(rng.normal(size=(29568, H)) * 0.02, jnp.bfloat16)
    h0 = jnp.asarray(rng.normal(size=(B, L, H)), jnp.bfloat16)

    def head(h, w):
        logits = jax.lax.dot_general(
            h, w, (((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jax.nn.elu(logits.max(axis=1)) + 1

    headf = jax.jit(head)
    dth = bench(headf, (h0, w))
    print(f"head (naive): {dth*1e3:.1f} ms  "
          f"{flops_head(B, L)/dth/1e12:.1f} TF/s")

    # chunked-scan head as in VDRModule (chunk=16 -> M=4096)
    def head_chunked(h, w, ch=16):
        b, l, _ = h.shape

        def body(carry, hx):
            logits = jax.lax.dot_general(
                hx.reshape(-1, H), w.T, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.maximum(carry, logits.reshape(b, ch, -1)
                               .max(axis=1)), None

        hs = h.reshape(b, l // ch, ch, H).transpose(1, 0, 2, 3)
        init = jnp.full((b, w.shape[0]), -jnp.inf, jnp.float32)
        out, _ = jax.lax.scan(body, init, hs)
        return jax.nn.elu(out) + 1

    headc = jax.jit(lambda h, w: head_chunked(h, w))
    dthc = bench(headc, (h0, w))
    print(f"head (chunk): {dthc*1e3:.1f} ms  "
          f"{flops_head(B, L)/dthc/1e12:.1f} TF/s")

    # --- attention variants on one isolated layer stack ------------------
    import flax.linen as nn

    class FusedAttn(nn.Module):
        @nn.compact
        def __call__(self, hidden, mask):
            b, l, _ = hidden.shape
            hd = H // 12
            qkv = nn.Dense(3 * H, dtype=jnp.bfloat16, name="qkv")(hidden)
            qkv = qkv.reshape(b, l, 3, 12, hd)
            q, k, v = (qkv[:, :, i] for i in range(3))
            m = mask[:, None, None, :].astype(jnp.bool_)
            ctx = jax.nn.dot_product_attention(q, k, v, mask=m)
            ctx = ctx.reshape(b, l, H)
            out = nn.Dense(H, dtype=jnp.bfloat16, name="out")(ctx)
            return nn.LayerNorm(epsilon=1e-12, dtype=jnp.bfloat16)(
                out + hidden)

    class SplitAttn(nn.Module):
        @nn.compact
        def __call__(self, hidden, mask):
            b, l, _ = hidden.shape
            hd = H // 12
            dense = lambda n: nn.Dense(H, dtype=jnp.bfloat16, name=n)
            q = dense("q")(hidden).reshape(b, l, 12, hd)
            k = dense("k")(hidden).reshape(b, l, 12, hd)
            v = dense("v")(hidden).reshape(b, l, 12, hd)
            m = mask[:, None, None, :].astype(jnp.bool_)
            ctx = jax.nn.dot_product_attention(q, k, v, mask=m)
            ctx = ctx.reshape(b, l, H)
            out = nn.Dense(H, dtype=jnp.bfloat16, name="out")(ctx)
            return nn.LayerNorm(epsilon=1e-12, dtype=jnp.bfloat16)(
                out + hidden)

    for name, cls in (("split (current)", SplitAttn),
                      ("fused qkv", FusedAttn)):
        class Stack(nn.Module):
            @nn.compact
            def __call__(self, h, mask):
                for i in range(LAYERS):
                    h = cls(name=f"a{i}")(h, mask)
                    inter = nn.Dense(I, dtype=jnp.bfloat16,
                                     name=f"i{i}")(h)
                    inter = nn.gelu(inter, approximate=False)
                    o = nn.Dense(H, dtype=jnp.bfloat16, name=f"o{i}")(inter)
                    h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.bfloat16,
                                     name=f"l{i}")(o + h)
                return h

        smod = Stack()
        svars = jax.jit(smod.init)(jax.random.PRNGKey(0), h0[:1, :8],
                                   mask[:1, :8])
        sfn = jax.jit(lambda v, h, m: smod.apply(v, h, m))
        dts = bench(sfn, (svars, h0, mask))
        print(f"12-layer stack [{name}]: {dts*1e3:.1f} ms  "
              f"{flops_bert(B, L)/dts/1e12:.1f} TF/s")


if __name__ == "__main__":
    from vsearch_tpu.utils.claim_guard import register_tpu_process
    register_tpu_process('probe_embed_mfu')
    from vsearch_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402
    enable_compilation_cache()
    main()
