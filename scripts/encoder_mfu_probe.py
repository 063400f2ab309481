"""Encoder MFU experiments on the real TPU (throwaway probe).

Variants over the BERT-base-sized forward at B=256, L=256, bf16:
  v0  current encode_forward (f32 residual stream)
  v1  bf16 residual stream (f32 layernorm stats, bf16 output)
  v2  v1 + additive attention-mask bias (no where) + bf16 probs matmul
Reports ms/batch and achieved TFLOP/s for each.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hipporag_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache("/root/repo/.jax_cache")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from hipporag_tpu.embedding.jax_encoder import encode_forward, params_random

B, L, D, NL = 256, 256, 768, 12


def _ln(x, scale, bias, out_dtype, eps=1e-12):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * scale + bias).astype(out_dtype)


def _dense(x, w, b, dtype, out_dtype):
    return (
        jnp.dot(x.astype(dtype), w.astype(dtype), preferred_element_type=jnp.float32)
        + b
    ).astype(out_dtype)


def make_variant(additive_mask: bool):
    @functools.partial(jax.jit, static_argnames=("num_heads",))
    def fwd(params, input_ids, attention_mask, num_heads):
        dtype = jnp.bfloat16
        mask = attention_mask.astype(bool)
        l = input_ids.shape[1]
        x = (
            params["word_emb"][input_ids]
            + params["pos_emb"][:l][None, :, :]
            + params["type_emb"][0][None, None, :]
        )
        x = _ln(x, params["emb_ln_s"], params["emb_ln_b"], dtype)
        if additive_mask:
            bias = jnp.where(mask[:, None, None, :], 0.0, -1e30).astype(jnp.float32)
        for layer in params["layers"]:
            b_, l_, d_ = x.shape
            hd = d_ // num_heads

            def split(t):
                return t.reshape(b_, l_, num_heads, hd).transpose(0, 2, 1, 3)

            q = split(_dense(x, layer["q_w"], layer["q_b"], dtype, dtype))
            k = split(_dense(x, layer["k_w"], layer["k_b"], dtype, dtype))
            v = split(_dense(x, layer["v_w"], layer["v_b"], dtype, dtype))
            logits = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            ) / np.sqrt(hd)
            if additive_mask:
                logits = logits + bias
            else:
                logits = jnp.where(mask[:, None, None, :], logits, -1e30)
            probs = jax.nn.softmax(logits, axis=-1)
            ctx = jnp.einsum(
                "bhqk,bhkd->bhqd", probs.astype(dtype), v,
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(b_, l_, d_)
            out = _dense(ctx, layer["attn_out_w"], layer["attn_out_b"], dtype, jnp.float32)
            x = _ln(x.astype(jnp.float32) + out, layer["attn_ln_s"], layer["attn_ln_b"], dtype)
            h = jax.nn.gelu(_dense(x, layer["ffn_in_w"], layer["ffn_in_b"], dtype, dtype))
            out = _dense(h, layer["ffn_out_w"], layer["ffn_out_b"], dtype, jnp.float32)
            x = _ln(x.astype(jnp.float32) + out, layer["ffn_ln_s"], layer["ffn_ln_b"], dtype)
        m = mask[..., None].astype(jnp.float32)
        xf = x.astype(jnp.float32)
        pooled = jnp.sum(xf * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )

    return fwd


def make_fused_attn():
    """v3: jax.nn.dot_product_attention (fused XLA attention path) with
    the current f32 residual stream."""

    @functools.partial(jax.jit, static_argnames=("num_heads",))
    def fwd(params, input_ids, attention_mask, num_heads):
        dtype = jnp.bfloat16
        mask = attention_mask.astype(bool)
        l = input_ids.shape[1]
        x = (
            params["word_emb"][input_ids]
            + params["pos_emb"][:l][None, :, :]
            + params["type_emb"][0][None, None, :]
        )
        x = _ln(x, params["emb_ln_s"], params["emb_ln_b"], jnp.float32)
        for layer in params["layers"]:
            b_, l_, d_ = x.shape
            hd = d_ // num_heads

            def split(t):
                return t.reshape(b_, l_, num_heads, hd)  # [B,L,H,hd]

            q = split(_dense(x, layer["q_w"], layer["q_b"], dtype, dtype))
            k = split(_dense(x, layer["k_w"], layer["k_b"], dtype, dtype))
            v = split(_dense(x, layer["v_w"], layer["v_b"], dtype, dtype))
            ctx = jax.nn.dot_product_attention(
                q, k, v, mask=mask[:, None, None, :]
            )
            ctx = ctx.reshape(b_, l_, d_)
            out = _dense(ctx, layer["attn_out_w"], layer["attn_out_b"], dtype, jnp.float32)
            x = _ln(x + out, layer["attn_ln_s"], layer["attn_ln_b"], jnp.float32)
            h = jax.nn.gelu(_dense(x, layer["ffn_in_w"], layer["ffn_in_b"], dtype, dtype))
            out = _dense(h, layer["ffn_out_w"], layer["ffn_out_b"], dtype, jnp.float32)
            x = _ln(x + out, layer["ffn_ln_s"], layer["ffn_ln_b"], jnp.float32)
        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )

    return fwd


def bench(fn, params, ids, mask, heads, label, reps=4, **kw):
    out = fn(params, ids, mask, heads, **kw)
    np.asarray(out[0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(params, ids, mask, heads, **kw)
    np.asarray(out[0, 0])
    dt = (time.perf_counter() - t0) / reps
    flops = 2 * (NL * 12 * D * D) * L * B
    print(f"{label}: {dt*1e3:.1f} ms/batch, {flops/dt/1e12:.1f} TFLOP/s "
          f"({flops/dt/1e12/197:.1%} MFU)", flush=True)
    return np.asarray(out)


def main():
    params, heads = params_random(D, NL)
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(1000, 30000, size=(B, L)).astype(np.int32))
    mask_np = np.ones((B, L), np.int32)
    mask_np[::7, 200:] = 0  # some ragged rows
    mask = jnp.asarray(mask_np)

    o0 = bench(encode_forward, params, ids, mask, heads, "v0 current",
               compute_dtype="bfloat16")
    o3 = bench(make_fused_attn(), params, ids, mask, heads, "v3 fused dpa")
    cos = np.sum(o0 * o3, axis=-1)
    print(f"v3 vs v0: min cosine {cos.min():.6f}", flush=True)

    # v4: attention score/softmax/ctx REMOVED (ctx := v) — the time delta
    # vs v0 bounds what a perfect flash-attention kernel could reclaim
    @functools.partial(jax.jit, static_argnames=("num_heads",))
    def fwd_noattn(params, input_ids, attention_mask, num_heads):
        dtype = jnp.bfloat16
        mask = attention_mask.astype(bool)
        l = input_ids.shape[1]
        x = (
            params["word_emb"][input_ids]
            + params["pos_emb"][:l][None, :, :]
            + params["type_emb"][0][None, None, :]
        )
        x = _ln(x, params["emb_ln_s"], params["emb_ln_b"], jnp.float32)
        for layer in params["layers"]:
            b_, l_, d_ = x.shape
            _q = _dense(x, layer["q_w"], layer["q_b"], dtype, dtype)
            _k = _dense(x, layer["k_w"], layer["k_b"], dtype, dtype)
            v = _dense(x, layer["v_w"], layer["v_b"], dtype, dtype)
            ctx = v + 0 * (_q + _k)  # keep QKV matmuls live
            out = _dense(ctx, layer["attn_out_w"], layer["attn_out_b"], dtype, jnp.float32)
            x = _ln(x + out, layer["attn_ln_s"], layer["attn_ln_b"], jnp.float32)
            h = jax.nn.gelu(_dense(x, layer["ffn_in_w"], layer["ffn_in_b"], dtype, dtype))
            out = _dense(h, layer["ffn_out_w"], layer["ffn_out_b"], dtype, jnp.float32)
            x = _ln(x + out, layer["ffn_ln_s"], layer["ffn_ln_b"], jnp.float32)
        m = mask[..., None].astype(jnp.float32)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(jnp.sum(m, axis=1), 1e-9)
        return pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )

    bench(fwd_noattn, params, ids, mask, heads, "v4 no-attention (bound)")


if __name__ == "__main__":
    main()
