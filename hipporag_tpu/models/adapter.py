"""Trainable embedding adapter (query→fact/passage linking).

A capability extension the reference lacks: a residual MLP adapter over
frozen embeddings, trained contrastively (InfoNCE) on (query, positive
passage/fact) pairs so linking quality can be tuned per-corpus without
re-embedding. This is also the framework's training surface: the train
step runs under a ("dp", "corpus") mesh with the batch sharded over dp and
the hidden dimension tensor-sharded over corpus (megatron-style column/row
parallel linear pair → psum on the row-parallel output).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..parallel.mesh import CORPUS_AXIS, DP_AXIS

Array = jax.Array


class AdapterParams(NamedTuple):
    w_in: Array  # [D, H] column-parallel (H sharded)
    b_in: Array  # [H]
    w_out: Array  # [H, D] row-parallel (H sharded)


def init_adapter(key: Array, dim: int, hidden: int, scale: float = 0.02) -> AdapterParams:
    k1, k2 = jax.random.split(key)
    return AdapterParams(
        w_in=jax.random.normal(k1, (dim, hidden), jnp.float32) * scale,
        b_in=jnp.zeros((hidden,), jnp.float32),
        w_out=jax.random.normal(k2, (hidden, dim), jnp.float32) * scale,
    )


def adapter_apply(params: AdapterParams, x: Array) -> Array:
    """Residual MLP: x + gelu(x @ w_in + b) @ w_out, L2-renormalized."""
    h = jax.nn.gelu(
        jnp.dot(x, params.w_in, preferred_element_type=jnp.float32) + params.b_in
    )
    out = x + jnp.dot(h, params.w_out, preferred_element_type=jnp.float32)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def info_nce_loss(
    params: AdapterParams, queries: Array, positives: Array, temperature: float = 0.05
) -> Array:
    """Symmetric in-batch InfoNCE between adapted queries and positives."""
    q = adapter_apply(params, queries)
    logits = jnp.dot(q, positives.T, preferred_element_type=jnp.float32) / temperature
    labels = jnp.arange(q.shape[0])
    loss_qp = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    loss_pq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels)
    return jnp.mean(loss_qp + loss_pq) * 0.5


def make_train_step(optimizer: optax.GradientTransformation, temperature: float = 0.05):
    @jax.jit
    def train_step(params, opt_state, queries, positives):
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, queries, positives, temperature
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return train_step


def adapter_shardings(mesh) -> Tuple[AdapterParams, NamedSharding]:
    """(param shardings, batch sharding) for the ("dp","corpus") mesh."""
    param_sharding = AdapterParams(
        w_in=NamedSharding(mesh, P(None, CORPUS_AXIS)),
        b_in=NamedSharding(mesh, P(CORPUS_AXIS)),
        w_out=NamedSharding(mesh, P(CORPUS_AXIS, None)),
    )
    batch_sharding = NamedSharding(mesh, P(DP_AXIS, None))
    return param_sharding, batch_sharding


def make_sharded_train_step(
    mesh, optimizer: optax.GradientTransformation, temperature: float = 0.05
):
    """Jitted dp+tp train step: batch dp-sharded, hidden dim corpus-sharded.

    XLA inserts the all-reduce for the row-parallel matmul and the gradient
    psum across dp from the sharding annotations alone.
    """
    param_sh, batch_sh = adapter_shardings(mesh)
    replicated = NamedSharding(mesh, P())

    def _map_state(fn_params, fn_other, state):
        """Apply fn_params to AdapterParams-shaped subtrees (Adam moments
        mirror the param pytree) and fn_other to everything else (step
        counters etc.)."""
        return jax.tree.map(
            lambda sub: (
                fn_params(sub) if isinstance(sub, AdapterParams) else fn_other(sub)
            ),
            state,
            is_leaf=lambda x: isinstance(x, AdapterParams),
        )

    def place(params: AdapterParams, opt_state, queries, positives):
        params = jax.tree.map(jax.device_put, params, param_sh)
        # optimizer moments must shard LIKE the params: for Adam they are
        # 2x the param bytes, and replicating them would cost each chip
        # the full state the tensor-sharded design exists to split
        opt_state = _map_state(
            lambda sub: jax.tree.map(jax.device_put, sub, param_sh),
            lambda leaf: jax.device_put(leaf, replicated),
            opt_state,
        )
        queries = jax.device_put(queries, batch_sh)
        positives = jax.device_put(positives, batch_sh)
        return params, opt_state, queries, positives

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, queries, positives):
        loss, grads = jax.value_and_grad(info_nce_loss)(
            params, queries, positives, temperature
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = jax.lax.with_sharding_constraint(params, param_sh)
        opt_state = _map_state(
            lambda sub: jax.lax.with_sharding_constraint(sub, param_sh),
            lambda leaf: leaf,
            opt_state,
        )
        return params, opt_state, loss

    return train_step, place
