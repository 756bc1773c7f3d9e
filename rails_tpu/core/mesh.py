"""Device mesh + sharding helpers.

Replaces the reference's NCCL process-group setup and DDP wrapper
(`/root/reference/train.py:83-92,290`) with a single `jax.sharding.Mesh`:
  - `slice` axis (optional, multi-slice pods): pure data parallelism over
    DCN — the only cross-slice traffic is the once-per-step gradient
    all-reduce, the standard DCN recipe (SURVEY.md section 5);
  - `data` axis shards the batch dimension within a slice (gradient
    all-reduce comes from XLA's partitioner, riding ICI);
  - `item` axis shards the candidate corpus / item-component tables for
    distributed top-k (new capability beyond the reference, SURVEY.md 2.4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rails_tpu.core.config import MeshConfig

SLICE_AXIS = "slice"
DATA_AXIS = "data"
ITEM_AXIS = "item"


def make_mesh(
    cfg: Optional[MeshConfig] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    cfg = cfg or MeshConfig()
    # The sharding helpers (batch_axes/data_sharding/item_sharding) and
    # shard_map programs key on the MODULE-constant axis names; a renamed
    # axis would silently mis-shard (e.g. the batch replicated across a
    # renamed slice axis). Refuse renames loudly.
    if (cfg.slice_axis, cfg.data_axis, cfg.item_axis) != (
        SLICE_AXIS, DATA_AXIS, ITEM_AXIS
    ):
        raise ValueError(
            "custom mesh axis names are not supported: every sharding "
            f"helper keys on ({SLICE_AXIS!r}, {DATA_AXIS!r}, {ITEM_AXIS!r})"
        )
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    item = max(1, cfg.item_parallel)
    slices = max(1, cfg.num_slices)
    data = (
        cfg.data_parallel if cfg.data_parallel > 0 else n // (item * slices)
    )
    if data * item * slices != n:
        raise ValueError(
            f"mesh {slices}x{data}x{item} does not cover {n} devices; set "
            "MeshConfig.num_slices/data_parallel/item_parallel to factor the "
            "device count"
        )
    if slices > 1:
        # Slice axis outermost: within-slice neighbors stay contiguous so
        # data/item collectives ride ICI and only the slice axis crosses
        # DCN. On real multi-slice hardware devices carry a slice_index;
        # sort so each mesh row is one physical slice (virtual CPU devices
        # have no slice_index and keep their given order).
        devices = sorted(
            devices,
            key=lambda d: (getattr(d, "slice_index", 0) or 0, d.id),
        )
        arr = np.asarray(devices).reshape(slices, data, item)
        return Mesh(arr, (cfg.slice_axis, cfg.data_axis, cfg.item_axis))
    arr = np.asarray(devices).reshape(data, item)
    return Mesh(arr, (cfg.data_axis, cfg.item_axis))


def batch_axes(mesh: Mesh) -> Tuple[str, ...]:
    """Mesh axes the batch dimension shards over: (slice, data) on a
    multi-slice mesh, (data,) otherwise."""
    if SLICE_AXIS in mesh.axis_names:
        return (SLICE_AXIS, DATA_AXIS)
    return (DATA_AXIS,)


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch-dim sharding for arrays whose leading axis is the batch."""
    return NamedSharding(mesh, P(batch_axes(mesh)))


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
