"""Device mesh construction.

The framework's two parallel axes (SURVEY.md §2b "TPU-native equivalent"):

- ``dp``: data parallelism over the *query batch*;
- ``corpus``: sharding of the corpus-sized axes — passage/fact embedding
  rows and graph nodes/edges — the TPU analog of the reference's
  delegated tensor parallelism (the corpus, not the sequence, is the big
  dimension in a RAG framework).

Collectives ride ICI inside a slice; multi-slice layouts should put
``dp`` on DCN (query batches are independent) and ``corpus`` on ICI
(all-gathers each PPR iteration).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
CORPUS_AXIS = "corpus"


def make_mesh(
    mesh_shape: Optional[Sequence[int]] = None, devices=None
) -> Mesh:
    """Build a ("dp", "corpus") mesh over the available devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if mesh_shape is None or tuple(mesh_shape) == (1, 1):
        # default: all devices on the corpus axis
        mesh_shape = (1, n)
    dp, corpus = mesh_shape
    if dp * corpus != n:
        raise ValueError(f"mesh_shape {mesh_shape} does not match {n} devices")
    arr = np.asarray(devices).reshape(dp, corpus)
    return Mesh(arr, (DP_AXIS, CORPUS_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def corpus_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = CORPUS_AXIS
    return NamedSharding(mesh, P(*spec))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))
