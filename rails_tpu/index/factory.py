"""Top-k method factory: string name -> configured retrieval callable.

Reference: `get_top_k_module` (`/root/reference/indexing/utils_rails.py:25-233`),
which enumerates MoLNaiveTopK{5,10,25,50,75,100}, MoLAvgTopK{100..4000},
MoLCombTopK{k_per_group}_{avg_top_k}, MIPS/MoL brute force. Here the names are
parsed, so every reference spelling works plus any other setting.
"""

from __future__ import annotations

import functools
import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from rails_tpu.index import top_k as tk

TopKFn = Callable[..., tk.TopKResult]
# signature: fn(query_embeddings, k, user_ids=None) -> TopKResult


def get_top_k_fn(
    top_k_method: str,
    model,
    params,
    state: tk.MoLTopKState,
    item_embeddings: Optional[jnp.ndarray] = None,   # (X, D), MIPS only
    jit: bool = True,
) -> TopKFn:
    def wrap(fn):
        if jit:
            fn = jax.jit(fn, static_argnames=("k",))
        return fn

    if top_k_method == "MoLBruteForceTopK":
        def fn(query_embeddings, k, user_ids=None):
            return tk.mol_brute_force_top_k(
                model, params, state, query_embeddings, k, user_ids=user_ids
            )
        return wrap(fn)

    if top_k_method == "MoLBruteForceTopKFused":
        def fn(query_embeddings, k, user_ids=None):
            return tk.mol_brute_force_top_k_fused(
                model, params, state, query_embeddings, k, user_ids=user_ids
            )
        return wrap(fn)

    if top_k_method == "MIPSBruteForceTopK":
        assert item_embeddings is not None
        def fn(query_embeddings, k, user_ids=None):
            del user_ids
            return tk.mips_brute_force_top_k(
                state.item_ids, item_embeddings, query_embeddings, k
            )
        return wrap(fn)

    m = re.fullmatch(r"MoLNaive(?:Faiss)?TopK(\d+)", top_k_method)
    if m:
        k_per_group = int(m.group(1))
        def fn(query_embeddings, k, user_ids=None):
            return tk.mol_naive_top_k(
                model, params, state, query_embeddings, k,
                k_per_group=k_per_group, user_ids=user_ids,
            )
        return wrap(fn)

    m = re.fullmatch(r"MoLAvgTopK(\d+)", top_k_method)
    if m:
        avg_top_k = int(m.group(1))
        def fn(query_embeddings, k, user_ids=None):
            return tk.mol_avg_top_k(
                model, params, state, query_embeddings, k,
                avg_top_k=avg_top_k, user_ids=user_ids,
            )
        return wrap(fn)

    m = re.fullmatch(r"MoLCombTopK(\d+)_(\d+)", top_k_method)
    if m:
        k_per_group, avg_top_k = int(m.group(1)), int(m.group(2))
        def fn(query_embeddings, k, user_ids=None):
            return tk.mol_comb_top_k(
                model, params, state, query_embeddings, k,
                avg_top_k=avg_top_k, k_per_group=k_per_group, user_ids=user_ids,
            )
        return wrap(fn)

    raise ValueError(f"Unknown top_k_method {top_k_method!r}")
