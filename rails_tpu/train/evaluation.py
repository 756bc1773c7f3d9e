"""Retrieval evaluation engine: full-corpus eval state, ranking metrics,
recall-vs-exact harness, latency harness.

Reference: `/root/reference/data/eval.py:42-292` and the
`--eval_against_brute_force` protocol
(`/root/reference/eval_from_checkpoint.py:427-449`).

TPU shifts: query encoding, top-k, seen-id filtering, and rank extraction all
run inside jit with static k; latency measurements bracket
`block_until_ready` with explicit compile warmup.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from rails_tpu.data.features import Batch, SequentialFeatures
from rails_tpu.index.candidate_index import (
    k_prime_for,
    select_top_k_with_invalid_filter,
)
from rails_tpu.index.factory import get_top_k_fn
from rails_tpu.index.top_k import MoLTopKState, TopKResult, build_mol_topk_state
from rails_tpu.losses.samplers import maybe_l2_norm
from rails_tpu.similarity.mol import MoLItemTables

NDCG_KS = (1, 5, 10, 50, 100, 200)
HR_KS = (1, 5, 10, 50, 100, 200, 500, 1000)

# Corpus-embedding jit cache keyed by (model identity, norm settings): a
# fresh `jax.jit(lambda ...)` per get_eval_state call would recompile the
# corpus embedding EVERY epoch (the driver rebuilds the eval state per
# epoch; jit caches on function identity). The model reference is kept so
# id() cannot be recycled; small LRU so a long-lived multi-model process
# cannot grow it without bound (VERDICT r4 weak #9).
_EMBED_JIT_CACHE: Dict[tuple, tuple] = {}
_EMBED_JIT_CACHE_MAX = 8


def _cached_embed_fn(model, item_l2_norm: bool, l2_norm_eps: float):
    key = (id(model), item_l2_norm, float(l2_norm_eps))
    entry = _EMBED_JIT_CACHE.pop(key, None)          # pop+reinsert = LRU
    if entry is None:
        fn = jax.jit(
            lambda p, i: maybe_l2_norm(
                model.apply(p, i, method=model.get_item_embeddings),
                item_l2_norm, l2_norm_eps,
            )
        )
        entry = (fn, model)
    _EMBED_JIT_CACHE[key] = entry
    while len(_EMBED_JIT_CACHE) > _EMBED_JIT_CACHE_MAX:
        _EMBED_JIT_CACHE.pop(next(iter(_EMBED_JIT_CACHE)))
    return entry[0]


@dataclass
class EvalState:
    """`EvalState` (`data/eval.py:42-46`): corpus + configured top-k method."""

    all_item_ids: jnp.ndarray           # (X,)
    item_embeddings: jnp.ndarray        # (X, D), post-normalization
    topk_state: MoLTopKState
    top_k_fn: Callable
    num_objects: int
    top_k_method: str = "MoLBruteForceTopK"


def get_eval_state(
    model,
    params,
    all_item_ids: np.ndarray,
    top_k_method: str,
    item_l2_norm: bool = False,
    l2_norm_eps: float = 1e-6,
    table_dtype: jnp.dtype = jnp.bfloat16,
    ivf_nlist: Optional[int] = None,
) -> EvalState:
    """Embed the entire corpus and build the top-k module
    (`get_eval_state`, `data/eval.py:49-73`).

    For `MoLIVFTopK{nprobe}` methods an IVF index (`rails_tpu/index/ivf.py`)
    is trained over the corpus and attached to the state; `ivf_nlist`
    defaults to the 4*sqrt(X) rule of thumb."""
    ids = jnp.asarray(all_item_ids, dtype=jnp.int32)
    item_emb = _cached_embed_fn(model, item_l2_norm, l2_norm_eps)(params, ids)
    if top_k_method == "MIPSBruteForceTopK":
        # Dot-product serving needs no MoL item tables (and DotProduct
        # models have none to build).
        state = MoLTopKState(
            item_ids=ids,
            item_tables=MoLItemTables(
                component_embeddings=jnp.zeros((0, 1, 1), table_dtype),
                gating_partial=None,
            ),
            avg_component=jnp.zeros((0, 1), table_dtype),
        )
    else:
        state = build_mol_topk_state(
            model, params, ids, item_emb, table_dtype=table_dtype,
            # The certified UB / tile block-max prefilters read the fused
            # kernel layout too.
            build_fused=(
                "Fused" in top_k_method
                or top_k_method.startswith("MoLCertTopK")
                or top_k_method.startswith("MoLTileTopK")
            ),
            quantize_fused="Int8" in top_k_method,
        )
    if re.fullmatch(r"MoLIVFTopK\d+", top_k_method):
        from rails_tpu.index.ivf import build_ivf_index

        x_real = int(np.count_nonzero(np.asarray(ids)))
        nlist = ivf_nlist or max(16, int(4 * np.sqrt(x_real)))
        state = state._replace(
            ivf=build_ivf_index(
                state.avg_component, state.item_ids, nlist=nlist,
                mol_state=state,
            )
        )
    top_k_fn = get_top_k_fn(
        top_k_method, model, params, state, item_embeddings=item_emb
    )
    return EvalState(
        all_item_ids=ids,
        item_embeddings=item_emb,
        topk_state=state,
        top_k_fn=top_k_fn,
        num_objects=int(ids.shape[0]),
        top_k_method=top_k_method,
    )


def ranks_from_top_k(top_k_ids: jnp.ndarray, target_ids: jnp.ndarray) -> jnp.ndarray:
    """1-based rank of target in the top-k list; sentinel (large) if absent.

    Reference: `data/eval.py:194-201`. Sentinel is > every metric threshold so
    hr@K never counts misses (fixes the reference's MAX_K=120/hr@500 quirk).
    """
    k = top_k_ids.shape[1]
    hit = top_k_ids == target_ids[:, None]
    found = hit.any(axis=1)
    pos = jnp.argmax(hit, axis=1)
    sentinel = max(k, max(HR_KS)) + 1
    return jnp.where(found, pos + 1, sentinel)


def metrics_from_ranks(ranks: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """NDCG/HR/MRR per-example vectors (`data/eval.py:203-243`).

    MRR deliberately follows the reference's semantics for top-k MISSES:
    `mrr = 1/rank` with the miss sentinel plugged in (`data/eval.py:201,243`
    gives misses 1/(MAX_K+1), not 0), so published numbers stay comparable.
    The tiny positive credit per miss (< 1/1001) shrinks with the sentinel;
    compare MRR only across runs with the same eval k.
    """
    out: Dict[str, jnp.ndarray] = {}
    ranks_f = ranks.astype(jnp.float32)
    dcg = 1.0 / jnp.log2(ranks_f + 1.0)
    for kk in NDCG_KS:
        out[f"ndcg@{kk}"] = jnp.where(ranks <= kk, dcg, 0.0)
    for kk in HR_KS:
        out[f"hr@{kk}"] = (ranks <= kk).astype(jnp.float32)
    out["mrr"] = 1.0 / ranks_f
    return out


def add_rating_filtered_metrics(
    out: Dict[str, np.ndarray],
    ranks: np.ndarray,
    target_ratings: np.ndarray,
    min_positive_rating: int = 4,
) -> None:
    """Rating-filtered variants (`data/eval.py:249-264`)."""
    sel = target_ratings >= min_positive_rating
    r = ranks[sel].astype(np.float64)
    out[f"ndcg@10_>={min_positive_rating}"] = np.where(
        r <= 10, 1.0 / np.log2(r + 1.0), 0.0
    )
    out[f"hr@10_>={min_positive_rating}"] = (r <= 10).astype(np.float64)
    out[f"hr@50_>={min_positive_rating}"] = (r <= 50).astype(np.float64)
    out[f"mrr_>={min_positive_rating}"] = 1.0 / r


def make_eval_step_fn(
    model,
    top_k_method: str,
    k: int,
    num_objects: int,
    filter_invalid_ids: bool = True,
    truncate_k_prime_to: Optional[int] = None,
    max_num_invalid: Optional[int] = None,
):
    """Build the jitted (encode -> top-k -> filter -> rank) step with the
    corpus state as a RUNTIME argument:
    fn(params, topk_state, item_embeddings, features, target_ids).

    Passing the tables per call (instead of closing over them) keeps them out
    of the compiled program AND lets one compiled step serve fresh tables —
    e.g. the per-epoch eval in the train driver re-embeds the corpus without
    recompiling.
    """
    from rails_tpu.index.factory import get_top_k_raw

    raw = get_top_k_raw(top_k_method)

    @jax.jit
    def _step(params, topk_state, item_embeddings,
              features: SequentialFeatures, target_ids: jnp.ndarray):
        queries = model.apply(params, features, method=model.encode)
        n0 = features.ids.shape[1] if filter_invalid_ids else 0
        if max_num_invalid is not None:
            n0 = min(n0, max_num_invalid)
        k_prime = k_prime_for(k, num_objects, n0, truncate_k_prime_to)
        res = raw(
            model, params, topk_state, queries, k_prime,
            user_ids=features.user_ids, item_embeddings=item_embeddings,
        )
        # Approximate algorithms may return fewer than k' candidates when
        # their budget is below the request (e.g. MoLAvgTopK100 with k=120);
        # the reference simply errors there (`mol_top_k.py:383-385`). Cap k
        # to the pool — metric thresholds beyond it just count as misses.
        k_eff = min(k, res.ids.shape[1])
        res = select_top_k_with_invalid_filter(
            res, features.ids if filter_invalid_ids else None, k_eff
        )
        ranks = ranks_from_top_k(res.ids, target_ids)
        return ranks, res.ids, res.scores

    return _step


def make_eval_step(
    model,
    eval_state: EvalState,
    k: int,
    filter_invalid_ids: bool = True,
    truncate_k_prime_to: Optional[int] = None,
    max_num_invalid: Optional[int] = None,
):
    """Bound convenience wrapper: fn(params, features, target_ids)."""
    _step = make_eval_step_fn(
        model, eval_state.top_k_method, k, eval_state.num_objects,
        filter_invalid_ids=filter_invalid_ids,
        truncate_k_prime_to=truncate_k_prime_to,
        max_num_invalid=max_num_invalid,
    )

    def step(params, features, target_ids):
        return _step(
            params, eval_state.topk_state, eval_state.item_embeddings,
            features, target_ids,
        )

    return step


def make_sharded_eval_step(
    model,
    params,
    eval_state: EvalState,
    mesh,
    k: int,
    seq_len: int,
    filter_invalid_ids: bool = True,
    truncate_k_prime_to: Optional[int] = None,
    k_per_group: int = 50,
    avg_top_k: int = 200,
    fused_block_x: int = 256,
):
    """Item-sharded eval step: the corpus shards over the mesh `item` axis and
    the per-shard top-k + all_gather merge (`rails_tpu/index/sharded.py`)
    serves the standard encode -> top-k -> filter -> rank path.

    Returns fn(params, features, target_ids) -> (ranks, ids, scores) with the
    SAME semantics as `make_eval_step` (k' over-fetch for seen-id filtering is
    applied to the merged list). `seq_len` is the padded history length, used
    to budget k' statically.

    Call-time params drive the query encoder AND the MoL scoring inside the
    sharded top-k; the precomputed item-side tables are from the BUILD-time
    params — after item-table-affecting updates, rebuild the eval state
    (exactly like `make_eval_step`, whose topk_state is also prebuilt).
    """
    from rails_tpu.core.mesh import replicate
    from rails_tpu.index.factory import parse_top_k_budgets
    from rails_tpu.index.sharded import make_sharded_top_k_fn, pad_and_shard_state

    n0 = seq_len if filter_invalid_ids else 0
    k_prime = k_prime_for(k, eval_state.num_objects, n0, truncate_k_prime_to)
    sh_state = pad_and_shard_state(
        eval_state.topk_state, mesh, fused_block_x=fused_block_x
    )
    budgets = parse_top_k_budgets(eval_state.top_k_method)
    topk = make_sharded_top_k_fn(
        eval_state.top_k_method, model, replicate(params, mesh), sh_state,
        mesh, k=k_prime,
        k_per_group=budgets.get("k_per_group", k_per_group),
        avg_top_k=budgets.get("avg_top_k", avg_top_k),
        fused_block_x=fused_block_x,
    )
    encode = jax.jit(lambda p, f: model.apply(p, f, method=model.encode))

    @jax.jit
    def _finish(scores, ids, hist_ids, target_ids):
        res = select_top_k_with_invalid_filter(
            TopKResult(scores=scores, ids=ids), hist_ids, min(k, ids.shape[1])
        )
        ranks = ranks_from_top_k(res.ids, target_ids)
        return ranks, res.ids, res.scores

    # Call-time params reach the sharded scorer too (not only the query
    # encoder): replication is cached by pytree identity so the common case
    # (same params every call) pays no re-transfer.
    rep_cache = {"key": id(params), "rep": None}

    def step(params_, features, target_ids):
        q = encode(params_, features)
        if id(params_) == id(params):
            override = None
        else:
            if rep_cache["key"] != id(params_):
                rep_cache["key"] = id(params_)
                rep_cache["rep"] = replicate(params_, mesh)
            override = rep_cache["rep"]
        res = topk(q, user_ids=features.user_ids, params_override=override)
        return _finish(
            res.scores, res.ids,
            features.ids if filter_invalid_ids else None, target_ids,
        )

    return step


@dataclass
class LatencyStats:
    mean_ms: float
    std_ms: float
    num_measurements: int


def make_scanned_latency_fn(
    model,
    top_k_method: str,
    k: int,
    num_objects: int,
    reps: int,
    filter_invalid_ids: bool = True,
    truncate_k_prime_to: Optional[int] = None,
):
    """`reps` repetitions of the retrieval call inside ONE jit (lax.scan).

    The reference's timed region covers retrieval only — queries are encoded
    once outside it ("computes ro- part exactly once", `data/eval.py:118-124`)
    and the top-k call repeats (`data/eval.py:155-170`). On a tunneled TPU
    every separate dispatch costs ~25 ms RTT, so per-call timing of sub-25 ms
    retrieval measures the wire, not the chip; scanning the reps inside one
    jit amortizes the dispatch to RTT/reps. Each rep perturbs the query
    embeddings by rep_index * 1e-30 — numerically inert, but loop-varying so
    XLA cannot hoist the body out of the loop.

    Returns fn(params, topk_state, item_embeddings, features, target_ids)
    -> (reps, B) ranks; wall-time divided by `reps` is the per-call latency.
    """
    from rails_tpu.index.factory import get_top_k_raw

    raw = get_top_k_raw(top_k_method)

    @jax.jit
    def _timed(params, topk_state, item_embeddings,
               features: SequentialFeatures, target_ids: jnp.ndarray):
        queries0 = model.apply(params, features, method=model.encode)
        n0 = features.ids.shape[1] if filter_invalid_ids else 0
        k_prime = k_prime_for(k, num_objects, n0, truncate_k_prime_to)

        def body(carry, i):
            queries = queries0 + i.astype(queries0.dtype) * 1e-30
            res = raw(
                model, params, topk_state, queries, k_prime,
                user_ids=features.user_ids, item_embeddings=item_embeddings,
            )
            k_eff = min(k, res.ids.shape[1])
            res = select_top_k_with_invalid_filter(
                res, features.ids if filter_invalid_ids else None, k_eff
            )
            return carry, ranks_from_top_k(res.ids, target_ids)

        _, ranks = jax.lax.scan(
            body, jnp.int32(0), jnp.arange(reps, dtype=jnp.int32)
        )
        return ranks

    return _timed


def eval_metrics_from_batches(
    model,
    params,
    eval_state: EvalState,
    batches,
    k: int = 200,
    filter_invalid_ids: bool = True,
    include_eval_time: bool = False,
    truncate_k_prime_to: Optional[int] = None,
    warmup_runs: int = 3,
    timed_runs: int = 20,
    timing_fraction: float = 0.1,
    seed: int = 0,
    step_fn=None,
    num_examples: Optional[int] = None,
    step=None,
) -> Tuple[Dict[str, np.ndarray], Optional[LatencyStats]]:
    """Evaluate all batches; optionally time the top-k path.

    Latency protocol mirrors `data/eval.py:128-170`: with timing enabled,
    k is capped at 120 and k' truncated to 200, and ~10% of batches get
    3 warmup + `timed_runs` timed repetitions of the retrieval call.

    `step_fn` (from `make_eval_step_fn`) lets callers reuse one compiled
    step across corpus re-embeddings (e.g. the per-epoch train eval).

    `num_examples`: the true example count when the final batch wraps around
    to keep shapes fixed (`Dataset.batches(drop_last=False)`); the duplicate
    tail rows are trimmed so every user counts exactly once — matching the
    reference, which evaluates every user (`data/eval.py:131-138`).

    `step`: a fully-bound fn(params, features, target_ids) overriding the
    default step construction — e.g. `make_sharded_eval_step` for
    item-sharded retrieval.
    """
    if include_eval_time:
        k = min(k, 120)
        truncate_k_prime_to = 200 if truncate_k_prime_to is None else truncate_k_prime_to
    k = min(k, eval_state.num_objects)
    step_override_for_timing = step
    if step is not None:
        pass
    elif step_fn is not None:
        def step(params_, features, target_ids):
            return step_fn(
                params_, eval_state.topk_state, eval_state.item_embeddings,
                features, target_ids,
            )
    else:
        step = make_eval_step(
            model, eval_state, k,
            filter_invalid_ids=filter_invalid_ids,
            truncate_k_prime_to=truncate_k_prime_to,
        )
    rng = np.random.default_rng(seed)
    all_metrics: Dict[str, List[np.ndarray]] = {}
    times: List[float] = []
    seen = 0
    # Timed reps run inside ONE jit (scan) so dispatch/tunnel RTT amortizes
    # to RTT/reps — a per-call loop of sub-25 ms retrievals would otherwise
    # measure the wire on remote-tunneled backends. Falls back to per-call
    # timing only for custom `step` overrides (no raw method to scan).
    lat_fn = None
    if include_eval_time and step_override_for_timing is None:
        lat_fn = make_scanned_latency_fn(
            model, eval_state.top_k_method, k, eval_state.num_objects,
            reps=timed_runs, filter_invalid_ids=filter_invalid_ids,
            truncate_k_prime_to=truncate_k_prime_to,
        )
    for batch in batches:
        feats, target_ids = batch.features, batch.target_ids
        if include_eval_time and rng.random() < timing_fraction:
            if lat_fn is not None:
                args = (
                    params, eval_state.topk_state, eval_state.item_embeddings,
                    feats, target_ids,
                )
                np.asarray(lat_fn(*args))          # compile + warm
                t0 = time.perf_counter()
                np.asarray(lat_fn(*args))
                times.append((time.perf_counter() - t0) / timed_runs)
            else:
                r = None
                for _ in range(warmup_runs):
                    r, _, _ = step(params, feats, target_ids)
                if r is not None:
                    np.asarray(r)
                t0 = time.perf_counter()
                rs = [
                    step(params, feats, target_ids)[0]
                    for _ in range(timed_runs)
                ]
                for r in rs:
                    np.asarray(r)
                times.append((time.perf_counter() - t0) / timed_runs)
        ranks, _, _ = step(params, feats, target_ids)
        b = int(ranks.shape[0])
        valid = b if num_examples is None else max(0, min(b, num_examples - seen))
        seen += b
        if valid == 0:
            continue
        ranks_np = np.asarray(ranks)[:valid]
        m = metrics_from_ranks(ranks)
        m = {kk: np.asarray(v)[:valid] for kk, v in m.items()}
        add_rating_filtered_metrics(
            m, ranks_np, np.asarray(batch.target_ratings)[:valid]
        )
        for kk, v in m.items():
            all_metrics.setdefault(kk, []).append(v)
    out = {kk: np.concatenate(v) for kk, v in all_metrics.items()}
    lat = None
    if times:
        lat = LatencyStats(
            mean_ms=float(np.mean(times) * 1e3),
            std_ms=float(np.std(times) * 1e3),
            num_measurements=len(times),
        )
    return out, lat


def summarize_metrics(metrics: Dict[str, np.ndarray]) -> Dict[str, float]:
    """Mean over examples; under multi-host execution the [sum, numel] pairs
    all-reduce across processes (`_avg`, `data/eval.py:271-275`)."""
    from rails_tpu.core.distributed import all_reduce_mean_metrics

    return all_reduce_mean_metrics(metrics)


def recall_vs_exact(
    model,
    params,
    exact_state: EvalState,
    approx_state: EvalState,
    batches,
    k: int = 200,
    filter_invalid_ids: bool = True,
    exact_step=None,
    approx_step=None,
    num_examples: Optional[int] = None,
) -> Dict[str, float]:
    """Recall of the approximate algorithm against exact-MoL top-1.

    Reference protocol: brute force runs first and its top-1 id becomes the
    target; the approximate algorithm's HR@k against that target is its
    recall (`eval_from_checkpoint.py:427-449`). `exact_step`/`approx_step`
    override the default (replicated) steps, e.g. with
    `make_sharded_eval_step`; `num_examples` trims wrap-around tail rows.
    """
    if exact_step is None:
        exact_step = make_eval_step(
            model, exact_state, 1, filter_invalid_ids=filter_invalid_ids
        )
    hits: Dict[int, List[np.ndarray]] = {kk: [] for kk in HR_KS if kk <= k}
    if approx_step is None:
        approx_step = make_eval_step(
            model, approx_state, k, filter_invalid_ids=filter_invalid_ids
        )
    seen = 0
    for batch in batches:
        feats = batch.features
        _, exact_ids, _ = exact_step(params, feats, batch.target_ids)
        exact_top1 = exact_ids[:, 0]
        ranks, _, _ = approx_step(params, feats, exact_top1)
        b = int(ranks.shape[0])
        valid = b if num_examples is None else max(0, min(b, num_examples - seen))
        seen += b
        if valid == 0:
            continue
        hit = np.asarray(ranks)[:valid]
        for kk in hits:
            hits[kk].append(hit <= kk)
    return {f"recall@{kk}": float(np.concatenate(v).mean()) for kk, v in hits.items()}
