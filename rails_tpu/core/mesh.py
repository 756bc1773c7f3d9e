"""Device mesh + sharding helpers.

Replaces the reference's NCCL process-group setup and DDP wrapper
(`/root/reference/train.py:83-92,290`) with a single `jax.sharding.Mesh`:
  - `data` axis shards the batch dimension (data parallelism; gradient
    all-reduce comes from XLA's partitioner, riding ICI);
  - `item` axis shards the candidate corpus / item-component tables for
    distributed top-k (new capability beyond the reference, SURVEY.md 2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rails_tpu.core.config import MeshConfig

DATA_AXIS = "data"
ITEM_AXIS = "item"


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    item = max(1, cfg.item_parallel)
    data = cfg.data_parallel if cfg.data_parallel > 0 else n // item
    if data * item != n:
        raise ValueError(
            f"mesh {data}x{item} does not cover {n} devices; set "
            "MeshConfig.data_parallel/item_parallel to factor the device count"
        )
    arr = np.asarray(devices).reshape(data, item)
    return Mesh(arr, (cfg.data_axis, cfg.item_axis))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for arrays whose leading axis is the batch."""
    return NamedSharding(mesh, P(DATA_AXIS))


def item_sharding(mesh: Mesh) -> NamedSharding:
    """Corpus-dim sharding for arrays whose leading axis is the item corpus."""
    return NamedSharding(mesh, P(ITEM_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Place every leaf of a batch pytree with its leading dim on `data`."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
