"""Multi-chip scaling helpers: data-parallel extraction and
hypothesis-sharded consensus over a ``jax.sharding.Mesh``.

The reference is a single-process CPU pipeline (SURVEY.md §2.9); its two
natural TPU scaling axes are (a) frames — AKAZE extraction is
embarrassingly data-parallel — and (b) RANSAC hypotheses — every minimal
set solves and scores independently, and only the final lexicographic
argmax reduces across devices (an ICI collective XLA inserts on its own).
This module exposes both as library surface; ``__graft_entry__``'s
multichip dryrun and tests/test_parallel.py exercise them on a virtual
CPU mesh, and the same code drives real ICI meshes unchanged.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = [
    "make_mesh",
    "sharded_extract",
    "sharded_consensus",
]


def make_mesh(n_devices: int | None = None, axis: str = "batch") -> Mesh:
    """A 1-D device mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are available"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def sharded_extract(extractor, images, mesh: Mesh, axis: str = "batch"):
    """Run ``DeviceExtractor.extract`` data-parallel over the mesh.

    ``images``: (B, H, W) with B divisible by the mesh size.  Each device
    extracts its shard of frames; no cross-device traffic (the FeatureSet
    comes back sharded the same way).
    """
    n = mesh.shape[axis]
    if images.shape[0] % n:
        raise ValueError(
            f"batch of {images.shape[0]} frames does not divide over the "
            f"{n}-device '{axis}' mesh axis; pad the batch to a multiple"
        )
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    with mesh:
        # Computation follows data: placing the batch sharded is all the
        # jitted extract needs to run SPMD over the mesh.
        return extractor.extract(jax.device_put(images, sharding))


def sharded_consensus(consensus, mesh: Mesh, axis: str = "batch"):
    """A copy of ``consensus`` whose hypothesis batch is sharded over the
    mesh: minimal-set solving and residual scoring run device-local, and
    the best-model reduction rides the ICI.

    The returned instance draws the SAME minimal sets for the same key as
    the unsharded original, so results are identical (asserted by
    tests/test_parallel.py).
    """
    sharding = NamedSharding(mesh, PartitionSpec(axis))
    return dataclasses.replace(consensus, hypothesis_sharding=sharding)
