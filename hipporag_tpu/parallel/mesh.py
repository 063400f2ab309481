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
    if mesh_shape is None:
        # default: all devices on the corpus axis. An EXPLICIT shape is
        # always honored exactly — (1, 1) means a single-device mesh and
        # gets the same shape-mismatch error as any other wrong shape,
        # never a silent rewrite to (1, n).
        mesh_shape = (1, n)
    dp, corpus = mesh_shape
    if dp * corpus != n:
        raise ValueError(f"mesh_shape {mesh_shape} does not match {n} devices")
    arr = np.asarray(devices).reshape(dp, corpus)
    return Mesh(arr, (DP_AXIS, CORPUS_AXIS))


def make_hybrid_mesh(
    dp_slices: Optional[int] = None, devices=None
) -> Mesh:
    """Multi-slice ("dp", "corpus") mesh: dp over DCN, corpus over ICI.

    Query batches are independent, so the dp axis only communicates at
    batch boundaries and can ride the slower DCN links between slices;
    the corpus axis all-reduces every PPR iteration / top-k merge and
    must stay on ICI within a slice. On single-slice (or CPU) topologies
    this degrades gracefully to a regular mesh with dp as the leading
    axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    slice_ids = {getattr(d, "slice_index", 0) for d in devices}
    num_slices = len(slice_ids)
    if num_slices > 1:
        from jax.experimental import mesh_utils

        if dp_slices is not None and dp_slices != num_slices:
            raise ValueError(
                f"multi-slice topology has {num_slices} slices; dp must ride "
                f"DCN so dp_slices={dp_slices} is not realizable (leave it "
                "unset or pass the slice count)"
            )
        per_slice = n // num_slices
        arr = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(1, per_slice),
            dcn_mesh_shape=(num_slices, 1),
            devices=devices,
        )
        return Mesh(arr, (DP_AXIS, CORPUS_AXIS))
    dp = dp_slices or 1
    if n % dp != 0:
        raise ValueError(f"{n} devices not divisible by dp={dp}")
    return make_mesh((dp, n // dp), devices=devices)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def corpus_sharded(mesh: Mesh, axis: int = 0) -> NamedSharding:
    spec = [None] * (axis + 1)
    spec[axis] = CORPUS_AXIS
    return NamedSharding(mesh, P(*spec))


def batch_sharded(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DP_AXIS))
