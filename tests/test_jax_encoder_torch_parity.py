"""JAX encoder vs torch BERT: numerical parity of the converted forward.

Builds a tiny randomly-initialized HF BertModel locally (no downloads),
converts its state dict through params_from_hf_bert, and checks the JAX
mean-pooled embeddings match the torch reference within fp tolerance.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from hipporag_tpu.embedding.jax_encoder import encode_forward, params_from_hf_bert  # noqa: E402


def _tiny_bert(tmp_path):
    cfg = transformers.BertConfig(
        vocab_size=200,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=64,
    )
    model = transformers.BertModel(cfg)
    model.eval()
    path = tmp_path / "tiny-bert"
    model.save_pretrained(path)
    return model, str(path)


def test_converted_forward_matches_torch(tmp_path):
    model, path = _tiny_bert(tmp_path)
    params, num_heads = params_from_hf_bert(path)
    assert num_heads == 4

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 200, size=(3, 12)).astype(np.int64)
    mask = np.ones((3, 12), dtype=np.int64)
    mask[1, 8:] = 0  # ragged row

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        ).last_hidden_state.numpy()
    m = mask[..., None].astype(np.float64)
    pooled = (out * m).sum(axis=1) / m.sum(axis=1)
    want = pooled / np.maximum(np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)

    got = np.asarray(
        encode_forward(
            params,
            jnp.asarray(ids.astype(np.int32)),
            jnp.asarray(mask.astype(np.int32)),
            num_heads,
            compute_dtype="float32",
        )
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
