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


def save_serving_state(path: str, eval_state) -> str:
    """Write an `EvalState`'s corpus tables + metadata under `path`."""
    st = eval_state.topk_state
    payload = {
        "item_ids": jax.device_get(st.item_ids),
        "component_embeddings": jax.device_get(
            st.item_tables.component_embeddings
        ),
        "gating_partial": (
            jax.device_get(st.item_tables.gating_partial)
            if st.item_tables.gating_partial is not None else None
        ),
        "avg_component": jax.device_get(st.avg_component),
        "item_embeddings": jax.device_get(eval_state.item_embeddings),
    }
    meta = {
        "top_k_method": eval_state.top_k_method,
        "num_objects": eval_state.num_objects,
        "has_fused": st.fused_tables is not None,
        "has_ivf": st.ivf is not None,
    }
    if st.fused_tables is not None:
        ft = st.fused_tables
        payload["fused_item_comp_t"] = jax.device_get(ft.item_comp_t)
        payload["fused_item_partial_t"] = jax.device_get(ft.item_partial_t)
        meta["fused_num_items"] = ft.num_items
        if ft.comp_scale is not None:
            payload["fused_comp_scale"] = jax.device_get(ft.comp_scale)
            payload["fused_partial_scale"] = jax.device_get(ft.partial_scale)
    if st.ivf is not None:
        # Named-field dict (robust restore) with zero-size leaves carried in
        # metadata — orbax refuses empty arrays (e.g. an empty overflow).
        ivf_dict = {
            f: np.asarray(jax.device_get(getattr(st.ivf, f)))
            for f in st.ivf._fields
        }
        meta["ivf_empty"] = {
            f: [list(v.shape), str(v.dtype)]
            for f, v in ivf_dict.items() if v.size == 0
        }
        payload["ivf"] = {
            f: v for f, v in ivf_dict.items() if v.size > 0
        }
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
    path = os.path.abspath(path)
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
    with open(path + ".meta.json") as f:
        meta = json.load(f)
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
