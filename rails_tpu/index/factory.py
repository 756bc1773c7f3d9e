"""Top-k method factory: string name -> configured retrieval callable.

Reference: `get_top_k_module` (`/root/reference/indexing/utils_rails.py:25-233`),
which enumerates MoLNaiveTopK{5,10,25,50,75,100}, MoLAvgTopK{100..4000},
MoLCombTopK{k_per_group}_{avg_top_k}, MIPS/MoL brute force. Here the names are
parsed, so every reference spelling works plus any other setting.

Two layers:
  - `get_top_k_raw(name)` returns a pure function
    fn(model, params, state, query_embeddings, k, user_ids, item_embeddings)
    with NO captured arrays — safe to call inside other jitted programs and
    to shard_map (captured device arrays would be baked into the compiled
    program as constants, which explodes compile payloads at corpus scale).
  - `get_top_k_fn(...)` binds params/state at the Python level and jits with
    them as runtime arguments.
"""

from __future__ import annotations

import functools
import re
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from rails_tpu.index import top_k as tk

TopKFn = Callable[..., tk.TopKResult]
# bound signature: fn(query_embeddings, k, user_ids=None) -> TopKResult


def get_top_k_raw(top_k_method: str):
    """Pure algorithm dispatch; every budget is baked in statically."""
    if top_k_method == "MoLBruteForceTopK":
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            return tk.mol_brute_force_top_k(
                model, params, state, q, k, user_ids=user_ids
            )
        return raw

    # The Int8 spellings run the same fused algorithms; quantization lives
    # in the STATE (built with quantize_fused=True — `get_eval_state`
    # selects it from the method name).
    if top_k_method in ("MoLBruteForceTopKFused", "MoLBruteForceTopKFusedInt8"):
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            return tk.mol_brute_force_top_k_fused(
                model, params, state, q, k, user_ids=user_ids
            )
        return raw

    if top_k_method in (
        "MoLBruteForceTopKFusedApprox", "MoLBruteForceTopKFusedInt8Approx"
    ):
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            return tk.mol_brute_force_top_k_fused_approx(
                model, params, state, q, k, user_ids=user_ids
            )
        return raw

    if top_k_method == "MIPSBruteForceTopK":
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            assert item_embeddings is not None
            return tk.mips_brute_force_top_k(
                state.item_ids, item_embeddings, q, k
            )
        return raw

    m = re.fullmatch(r"MoLNaive(?:Faiss)?TopK(\d+)", top_k_method)
    if m:
        k_per_group = int(m.group(1))
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            return tk.mol_naive_top_k(
                model, params, state, q, k,
                k_per_group=k_per_group, user_ids=user_ids,
            )
        return raw

    m = re.fullmatch(r"MoLAvgTopK(\d+)", top_k_method)
    if m:
        avg_top_k = int(m.group(1))
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            return tk.mol_avg_top_k(
                model, params, state, q, k,
                avg_top_k=avg_top_k, user_ids=user_ids,
            )
        return raw

    m = re.fullmatch(r"MoLCombTopK(\d+)_(\d+)", top_k_method)
    if m:
        k_per_group, avg_top_k = int(m.group(1)), int(m.group(2))
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            return tk.mol_comb_top_k(
                model, params, state, q, k,
                avg_top_k=avg_top_k, k_per_group=k_per_group, user_ids=user_ids,
            )
        return raw

    m = re.fullmatch(r"MoLIVFTopK(\d+)", top_k_method)
    if m:
        nprobe = int(m.group(1))
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            from rails_tpu.index.ivf import mol_ivf_top_k
            return mol_ivf_top_k(
                model, params, state, q, k, nprobe=nprobe, user_ids=user_ids
            )
        return raw

    # Upper-bound prefilter + exact rerank with per-query certificates
    # (`tk.mol_certified_top_k`). The raw fn returns the TopKResult alone
    # (the uniform factory contract); callers wanting the certificate call
    # mol_certified_top_k directly. Int8 states work unchanged (the UB
    # kernel dequantizes in VMEM).
    m = re.fullmatch(r"MoLCertTopK(\d+)(?:Int8)?", top_k_method)
    if m:
        cand_budget = int(m.group(1))
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            res, _ = tk.mol_certified_top_k(
                model, params, state, q, k,
                cand_budget=cand_budget, user_ids=user_ids,
            )
            return res
        return raw

    # Tile-granular Naive with per-group certificates, batch-shared tile
    # set + prefetched-tile scoring (`tk.mol_tile_top_k_shared`; the
    # per-query-gather variant is `tk.mol_tile_top_k`). Same certificate
    # convention as MoLCertTopK: the raw fn returns the TopKResult alone;
    # callers wanting the TopKCertificate pass certified=True directly.
    m = re.fullmatch(r"MoLTileTopK(\d+)(?:B(\d+))?(?:Int8)?", top_k_method)
    if m:
        tiles_per_group = int(m.group(1))
        # Optional explicit shared-tile budget (in tiles): MoLTileTopK8B2048
        # scores at most 2048*256 candidate columns for the whole batch.
        # Default (no B suffix) keeps every distinct nominated tile, which
        # makes the certificates per-(query, group)-threshold exact.
        tile_budget = int(m.group(2)) if m.group(2) else None
        def raw(model, params, state, q, k, user_ids=None, item_embeddings=None):
            return tk.mol_tile_top_k_shared(
                model, params, state, q, k,
                tiles_per_group=tiles_per_group, tile_budget=tile_budget,
                user_ids=user_ids,
            )
        return raw

    raise ValueError(f"Unknown top_k_method {top_k_method!r}")


def parse_top_k_budgets(top_k_method: str) -> dict:
    """Candidate budgets encoded in a method name (e.g. MoLCombTopK50_500
    -> k_per_group=50, avg_top_k=500). Empty for brute-force methods."""
    m = re.fullmatch(r"MoLNaive(?:Faiss)?TopK(\d+)", top_k_method)
    if m:
        return {"k_per_group": int(m.group(1))}
    m = re.fullmatch(r"MoLAvgTopK(\d+)", top_k_method)
    if m:
        return {"avg_top_k": int(m.group(1))}
    m = re.fullmatch(r"MoLCombTopK(\d+)_(\d+)", top_k_method)
    if m:
        return {"k_per_group": int(m.group(1)), "avg_top_k": int(m.group(2))}
    m = re.fullmatch(r"MoLIVFTopK(\d+)", top_k_method)
    if m:
        return {"nprobe": int(m.group(1))}
    m = re.fullmatch(r"MoLCertTopK(\d+)(?:Int8)?", top_k_method)
    if m:
        return {"cand_budget": int(m.group(1))}
    m = re.fullmatch(r"MoLTileTopK(\d+)(?:B(\d+))?(?:Int8)?", top_k_method)
    if m:
        out = {"tiles_per_group": int(m.group(1))}
        if m.group(2):
            out["tile_budget"] = int(m.group(2))
        return out
    return {}


def get_top_k_fn(
    top_k_method: str,
    model,
    params,
    state: tk.MoLTopKState,
    item_embeddings: Optional[jnp.ndarray] = None,   # (X, D), MIPS only
    jit: bool = True,
) -> TopKFn:
    raw = get_top_k_raw(top_k_method)

    def call(params_, state_, item_emb_, q, k, user_ids):
        return raw(
            model, params_, state_, q, k, user_ids=user_ids,
            item_embeddings=item_emb_,
        )

    if jit:
        call = jax.jit(call, static_argnames=("k",))

    def fn(query_embeddings, k, user_ids=None):
        # params/state passed as runtime args (device buffers), never baked
        # into the compiled program.
        return call(params, state, item_embeddings, query_embeddings, k, user_ids)

    return fn
