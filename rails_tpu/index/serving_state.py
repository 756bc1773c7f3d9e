"""Persist / restore the precomputed serving state (Orbax).

The reference re-embeds the ENTIRE corpus and rebuilds its component tables
on every eval-process start (`get_eval_state`, `/root/reference/data/
eval.py:49-73`) — minutes of work at huge corpus sizes (a 10M-item fused
build streams the whole corpus through the item MLPs). A production server
wants a cold start measured in table-load time instead:

    save_serving_state(dir, eval_state)                 # once, offline
    es = load_serving_state(dir, model, params)         # per server start

The payload is the full `MoLTopKState` (standard tables, fused kernel-layout
tables incl. int8 scales, avg table, IVF index) plus the method name and
corpus metadata; `load_serving_state` rebinds the jitted top-k fn against
the given params. The params themselves are NOT stored (they live in the
training checkpoint) — pass the matching params at load; a mismatch is the
caller's responsibility exactly as with the reference's checkpoint + gin
pairing.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import jax
import numpy as np

from rails_tpu.index.factory import get_top_k_fn
from rails_tpu.index.top_k import MoLTopKState
from rails_tpu.similarity.mol import MoLItemTables


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


# ------------------------------------------------------------------ #
# Streamed (chunked-memmap) format for corpus-scale states.
#
# The orbax path `jax.device_get`s every table whole — one host buffer of
# the FULL corpus tables, which cannot scale to a sharded near-HBM state
# (e.g. 100M-item int8 multi-host). The streamed format instead:
#   save: slices each table along its item axis in `chunk_items`-sized
#         pieces (a slice of a sharded jax Array gathers only that slice)
#         and writes them into a preallocated .npy memmap — peak host
#         memory is ONE chunk;
#   load: `np.load(mmap_mode="r")` — zero-copy host staging; the
#         `host=True` path hands the memmaps straight to
#         `pad_and_shard_state`, whose per-shard `device_put` reads shard
#         slices from the mapped file (pages stream through the OS cache).
# bf16 (an ml_dtypes type) does not round-trip the npy descr, so such
# arrays are stored as uint16 bit patterns with the logical dtype in the
# metadata.
# ------------------------------------------------------------------ #

# Item axis per payload key (every other axis is geometry-sized).
_ITEM_AXES = {
    "item_ids": 0,
    "component_embeddings": 0,
    "gating_partial": 0,
    "avg_component": 0,
    "item_embeddings": 0,
    "fused_item_comp_t": 2,
    "fused_item_partial_t": 1,
    "fused_comp_scale": 1,
    "fused_partial_scale": 1,
}


def _streamed_write(path, name, arr, axis, chunk_items):
    """Chunk-copy `arr` (jax or numpy) into `<path>/<name>.npy`.

    Returns the metadata entry (shape, stored dtype, logical dtype)."""
    from numpy.lib.format import open_memmap

    logical = str(arr.dtype)
    try:
        store_dtype = np.dtype(logical)
        store_view = None
    except TypeError:
        # Non-numpy-native dtype (bf16 & friends): store the bit pattern.
        store_view = np.dtype(f"uint{np.dtype(arr.dtype).itemsize * 8}")
        store_dtype = store_view
    shape = tuple(int(d) for d in arr.shape)
    mm = open_memmap(
        os.path.join(path, name + ".npy"), mode="w+",
        dtype=store_dtype, shape=shape,
    )
    n = shape[axis]
    sl = [slice(None)] * arr.ndim
    for s0 in range(0, n, chunk_items):
        sl[axis] = slice(s0, min(s0 + chunk_items, n))
        piece = np.asarray(jax.device_get(arr[tuple(sl)]))
        if store_view is not None:
            piece = piece.view(store_view)
        mm[tuple(sl)] = piece
    mm.flush()
    del mm
    return {
        "shape": list(shape),
        "stored": str(store_dtype),
        "logical": logical,
    }


def _streamed_read(path, name, entry):
    """Memory-map `<path>/<name>.npy` back at its logical dtype (no copy)."""
    mm = np.load(os.path.join(path, name + ".npy"), mmap_mode="r")
    if entry["logical"] != entry["stored"]:
        import ml_dtypes

        mm = mm.view(np.dtype(getattr(ml_dtypes, entry["logical"])))
    return mm


def save_serving_state(
    path: str,
    eval_state,
    streamed: Optional[bool] = None,
    chunk_items: int = 1 << 20,
) -> str:
    """Write an `EvalState`'s corpus tables + metadata under `path`.

    `streamed=None` auto-selects the chunked-memmap format once the corpus
    tables exceed 1 GB — the orbax path host-gathers every table WHOLE
    before writing, which cannot scale to a sharded near-HBM state. Forcing
    `streamed=False` keeps the legacy orbax layout."""
    st = eval_state.topk_state
    arrays = {
        "item_ids": st.item_ids,
        "component_embeddings": st.item_tables.component_embeddings,
        "gating_partial": st.item_tables.gating_partial,
        "avg_component": st.avg_component,
        "item_embeddings": eval_state.item_embeddings,
    }
    meta = {
        "top_k_method": eval_state.top_k_method,
        "num_objects": eval_state.num_objects,
        "has_fused": st.fused_tables is not None,
        "has_ivf": st.ivf is not None,
    }
    if st.fused_tables is not None:
        ft = st.fused_tables
        arrays["fused_item_comp_t"] = ft.item_comp_t
        arrays["fused_item_partial_t"] = ft.item_partial_t
        meta["fused_num_items"] = ft.num_items
        if ft.comp_scale is not None:
            arrays["fused_comp_scale"] = ft.comp_scale
            arrays["fused_partial_scale"] = ft.partial_scale
    ivf_arrays = {}
    if st.ivf is not None:
        # Optional fields (MoL-aware centroids) may be None; restore
        # reconstructs via IVFIndex(**fields) whose defaults fill them.
        ivf_arrays = {
            f: a for f, a in zip(st.ivf._fields, st.ivf) if a is not None
        }

    def _nbytes(a):
        return 0 if a is None else int(np.prod(a.shape)) * np.dtype(
            a.dtype
        ).itemsize

    total = sum(_nbytes(a) for a in arrays.values())
    if streamed is None:
        # Auto-select only single-process: the chunked writes below are not
        # multi-process safe (every process would w+-truncate the same .npy
        # files, and slicing a cross-process-sharded Array is not fully
        # addressable) — ADVICE r4.
        streamed = total > (1 << 30) and jax.process_count() == 1
    if streamed and jax.process_count() > 1:
        raise NotImplementedError(
            "streamed serving-state save is single-process only: every "
            "process would truncate/write the same .npy files, and slicing "
            "a cross-process-sharded jax Array is not fully addressable. "
            "Gather the state to process 0 (orbax format, streamed=False) "
            "or save per-process shard states to distinct paths."
        )
    path = os.path.abspath(path)

    if streamed:
        # Chunked-memmap format: per-table .npy files filled item-chunk by
        # item-chunk; peak host memory is one chunk, never the full tables.
        os.makedirs(path, exist_ok=True)
        meta["format"] = "streamed"
        meta["arrays"] = {}
        for name, a in arrays.items():
            if a is None or int(np.prod(a.shape)) == 0:
                meta["arrays"][name] = (
                    None if a is None
                    else {"empty": [list(map(int, a.shape)), str(a.dtype)]}
                )
                continue
            meta["arrays"][name] = _streamed_write(
                path, name, a, _ITEM_AXES.get(name, 0), chunk_items
            )
        meta["ivf_arrays"] = {}
        for f, a in ivf_arrays.items():
            if int(np.prod(a.shape)) == 0:
                meta["ivf_arrays"][f] = {
                    "empty": [list(map(int, a.shape)), str(a.dtype)]
                }
                continue
            meta["ivf_arrays"][f] = _streamed_write(
                path, "ivf_" + f, a, 0, chunk_items
            )
        if jax.process_index() == 0:
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f, indent=2)
            # Legacy sidecar location so load_serving_state finds either.
            with open(path + ".meta.json", "w") as f:
                json.dump(meta, f, indent=2)
        return path

    payload = {
        k: jax.device_get(v) for k, v in arrays.items() if v is not None
    }
    if "gating_partial" not in payload:
        payload["gating_partial"] = None
    if ivf_arrays:
        # Named-field dict (robust restore) with zero-size leaves carried in
        # metadata — orbax refuses empty arrays (e.g. an empty overflow).
        ivf_dict = {
            f: np.asarray(jax.device_get(a)) for f, a in ivf_arrays.items()
        }
        meta["ivf_empty"] = {
            f: [list(v.shape), str(v.dtype)]
            for f, v in ivf_dict.items() if v.size == 0
        }
        payload["ivf"] = {f: v for f, v in ivf_dict.items() if v.size > 0}
    # Orbax refuses zero-size arrays (e.g. MIPS states carry empty MoL
    # tables); carry every empty leaf's shape/dtype in the metadata instead.
    empty = {}
    for key in list(payload):
        v = payload[key]
        if v is not None and not isinstance(v, dict) and np.asarray(v).size == 0:
            a = np.asarray(v)
            empty[key] = [list(a.shape), str(a.dtype)]
            del payload[key]
    meta["empty_leaves"] = empty
    _ckptr().save(path, payload, force=True)
    if jax.process_index() == 0:
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2)
    return path


def load_serving_state(path: str, model, params, host: bool = False):
    """Restore a saved serving state and rebind the top-k fn to `params`.

    Returns an `EvalState` equivalent to `get_eval_state(...)` on the same
    corpus/method — without re-running the corpus embed or table build.

    `host=True` keeps the tables as host numpy arrays and skips building
    the (single-device) top-k fn — for multi-chip serving, hand the state
    to `pad_and_shard_state`, which performs ONE host->sharded-device
    transfer instead of double-buffering an unsharded copy on device 0
    (the default placement would OOM a chip at near-HBM corpus sizes)."""
    from rails_tpu.ops.pallas.mol_scoring import FusedCorpusTables
    from rails_tpu.train.evaluation import EvalState

    path = os.path.abspath(path)
    meta_file = (
        os.path.join(path, "meta.json")
        if os.path.exists(os.path.join(path, "meta.json"))
        else path + ".meta.json"
    )
    with open(meta_file) as f:
        meta = json.load(f)
    if meta.get("format") == "streamed":
        # Chunked-memmap format: zero-copy host staging. `host=True` keeps
        # the memmaps; `pad_and_shard_state`'s per-shard device_put then
        # streams shard slices straight from the mapped files.
        def _restore_empty(entry):
            shape, dtype = entry["empty"]
            try:
                dt = np.dtype(dtype)
            except TypeError:
                import ml_dtypes

                dt = np.dtype(getattr(ml_dtypes, dtype))
            return np.zeros(shape, dtype=dt)

        raw = {}
        for name, entry in meta["arrays"].items():
            if entry is None:
                raw[name] = None
            elif "empty" in entry:
                raw[name] = _restore_empty(entry)
            else:
                raw[name] = _streamed_read(path, name, entry)
        if meta.get("has_ivf"):
            raw["ivf"] = {
                f: (
                    _restore_empty(e) if "empty" in e
                    else _streamed_read(path, "ivf_" + f, e)
                )
                for f, e in meta["ivf_arrays"].items()
            }
            meta.setdefault("ivf_empty", {})
    else:
        raw = _ckptr().restore(path)
    for key, (shape, dtype) in meta.get("empty_leaves", {}).items():
        raw[key] = np.zeros(shape, dtype=np.dtype(dtype))
    to_dev = np.asarray if host else jax.numpy.asarray

    fused = None
    if meta["has_fused"]:
        fused = FusedCorpusTables(
            item_comp_t=to_dev(raw["fused_item_comp_t"]),
            item_partial_t=to_dev(raw["fused_item_partial_t"]),
            num_items=int(meta["fused_num_items"]),
            comp_scale=(
                to_dev(raw["fused_comp_scale"])
                if "fused_comp_scale" in raw else None
            ),
            partial_scale=(
                to_dev(raw["fused_partial_scale"])
                if "fused_partial_scale" in raw else None
            ),
        )
    ivf = None
    if meta.get("has_ivf"):
        from rails_tpu.index.ivf import IVFIndex

        fields = dict(raw["ivf"])
        for f, (shape, dtype) in meta.get("ivf_empty", {}).items():
            fields[f] = np.zeros(shape, dtype=np.dtype(dtype))
        ivf = IVFIndex(**{f: to_dev(v) for f, v in fields.items()})
    state = MoLTopKState(
        item_ids=to_dev(raw["item_ids"]),
        item_tables=MoLItemTables(
            component_embeddings=to_dev(raw["component_embeddings"]),
            gating_partial=(
                to_dev(raw["gating_partial"])
                if raw.get("gating_partial") is not None else None
            ),
        ),
        avg_component=to_dev(raw["avg_component"]),
        fused_tables=fused,
        ivf=ivf,
    )
    item_emb = to_dev(raw["item_embeddings"])
    top_k_fn = None
    if not host:
        top_k_fn = get_top_k_fn(
            meta["top_k_method"], model, params, state,
            item_embeddings=item_emb,
        )
    return EvalState(
        all_item_ids=state.item_ids,
        item_embeddings=item_emb,
        topk_state=state,
        top_k_fn=top_k_fn,
        num_objects=int(meta["num_objects"]),
        top_k_method=meta["top_k_method"],
    )
