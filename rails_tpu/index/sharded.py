"""Distributed top-k over an item-sharded corpus (shard_map + ICI collectives).

New capability beyond the reference (which replicates the full corpus per GPU,
SURVEY.md section 2.4): the item-component tables shard along the corpus axis
of the mesh; each shard runs the retrieval algorithm locally and the per-shard
top-k lists merge with one tiled `all_gather` + re-top-k ("top-k of top-k").
For brute force this is exact; for the approximate algorithms each shard
spends the full candidate budget locally, so recall is >= the single-device
algorithm at the same per-shard budget.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from rails_tpu.core.mesh import ITEM_AXIS, item_sharding
from rails_tpu.index.top_k import (
    NEG_PAD,
    MoLTopKState,
    TopKResult,
    mol_avg_top_k,
    mol_brute_force_top_k,
    mol_certified_top_k,
    mol_comb_top_k,
    mol_naive_top_k,
    mol_tile_top_k_shared,
)
from rails_tpu.similarity.mol import MoLItemTables


def pad_and_shard_state(
    state: MoLTopKState, mesh: Mesh, fused_block_x: int = 256
) -> MoLTopKState:
    """Pad the corpus to a shard-divisible size and shard it over `item`.

    Padded rows carry item id 0 and zero embeddings; scoring masks them to
    -inf before the local top-k so they never surface. When the state carries
    fused (Pallas-layout) tables, the pad target is a multiple of
    shards * fused_block_x so each shard's slab is kernel-blockable.
    """
    from rails_tpu.ops.pallas.mol_scoring import FusedCorpusTables

    s = mesh.shape[ITEM_AXIS]
    x = state.item_ids.shape[0]
    unit = s * fused_block_x if state.fused_tables is not None else s
    pad = (-x) % unit

    def pad0(arr, axis=0):
        if arr is None or pad == 0:
            return arr
        if arr.shape[axis] == 0:
            # Zero-length sentinel (fused_only states keep an EMPTY standard
            # component table, `top_k.py`); padding it to a nonzero all-zeros
            # table would flip the layout dispatch inside the shard-local
            # algorithms and silently rerank against zeros.
            return arr
        widths = [(0, 0)] * arr.ndim
        widths[axis] = (0, pad)
        # Host (numpy) tables pad host-side: at near-HBM corpus sizes an
        # intermediate unsharded device copy would double-buffer and OOM.
        pad_fn = np.pad if isinstance(arr, np.ndarray) else jnp.pad
        return pad_fn(arr, widths)

    sh = item_sharding(mesh)
    put = lambda a: None if a is None else jax.device_put(pad0(a), sh)
    fused = None
    if state.fused_tables is not None:
        ft = state.fused_tables
        # Fused tables are pre-padded to a block multiple; re-pad to the
        # shard unit on the trailing (corpus) axis and shard that axis.
        fpad = (x + pad) - ft.item_comp_t.shape[2]
        fpad_fn = np.pad if isinstance(ft.item_comp_t, np.ndarray) else jnp.pad
        comp_t, part_t = ft.item_comp_t, ft.item_partial_t
        cs, ps = ft.comp_scale, ft.partial_scale
        if fpad > 0:
            comp_t = fpad_fn(comp_t, ((0, 0), (0, 0), (0, fpad)))
            part_t = fpad_fn(part_t, ((0, 0), (0, fpad)))
            if cs is not None:
                # Pad scales with 1 (dequantized pad rows stay exactly 0).
                cs = fpad_fn(cs, ((0, 0), (0, fpad)), constant_values=1.0)
                ps = fpad_fn(ps, ((0, 0), (0, fpad)), constant_values=1.0)
        trail = NamedSharding(mesh, P(None, ITEM_AXIS))
        fused = FusedCorpusTables(
            item_comp_t=jax.device_put(
                comp_t, NamedSharding(mesh, P(None, None, ITEM_AXIS))
            ),
            item_partial_t=jax.device_put(part_t, trail),
            num_items=ft.num_items,
            comp_scale=None if cs is None else jax.device_put(cs, trail),
            partial_scale=None if ps is None else jax.device_put(ps, trail),
        )
    ivf = None
    if state.ivf is not None:
        # A stacked per-shard index from `build_sharded_ivf` (leading shard
        # axis) — shard that axis with the item axis so each device carries
        # exactly its own inverted lists.
        assert state.ivf.centroids.ndim == 3, (
            "sharded states need a stacked per-shard IVF index; build it "
            "with rails_tpu.index.ivf.build_sharded_ivf(state, num_shards)"
        )
        sh_lead = NamedSharding(mesh, P(ITEM_AXIS))
        ivf = jax.tree.map(lambda a: jax.device_put(a, sh_lead), state.ivf)
    return MoLTopKState(
        item_ids=put(state.item_ids),
        item_tables=MoLItemTables(
            component_embeddings=put(state.item_tables.component_embeddings),
            gating_partial=put(state.item_tables.gating_partial),
        ),
        avg_component=put(state.avg_component),
        fused_tables=fused,
        ivf=ivf,
    )


def _merge_local_topk(
    local_scores: jnp.ndarray, local_ids: jnp.ndarray, k: int
) -> TopKResult:
    """all_gather per-shard (B, k) lists along the item axis, re-top-k."""
    gs = jax.lax.all_gather(local_scores, ITEM_AXIS, axis=1, tiled=True)  # (B, S*k)
    gi = jax.lax.all_gather(local_ids, ITEM_AXIS, axis=1, tiled=True)
    top_scores, pos = jax.lax.top_k(gs, k)
    return TopKResult(scores=top_scores, ids=jnp.take_along_axis(gi, pos, axis=1))


def make_sharded_top_k_fn(
    top_k_method: str,
    model,
    params,
    state: MoLTopKState,            # already padded + item-sharded
    mesh: Mesh,
    k: int,
    k_per_group: int = 50,
    avg_top_k: int = 200,
    fused_block_x: int = 256,
) -> Callable:
    """Build fn(query_embeddings, user_ids=None) -> TopKResult (replicated).

    `k`, and the per-shard candidate budgets, are static. Queries and params
    are replicated; item tables are sharded along the corpus axis.

    Budgets encoded in the method NAME (MoLNaiveTopK100, MoLAvgTopK800,
    MoLCombTopK50_500) take precedence over the `k_per_group`/`avg_top_k`
    parameters — same parsing as the unsharded factory, so a named method
    benchmarks what it says.
    """
    from rails_tpu.index.factory import parse_top_k_budgets

    budgets = parse_top_k_budgets(top_k_method)
    k_per_group = budgets.get("k_per_group", k_per_group)
    avg_top_k = budgets.get("avg_top_k", avg_top_k)

    def local_algorithm(params_, state_l: MoLTopKState, q, user_ids):
        x_local = state_l.item_ids.shape[0]          # static inside shard_map
        k_local = min(k, x_local)
        if top_k_method in (
            "MoLBruteForceTopKFused", "MoLBruteForceTopKFusedApprox",
            "MoLBruteForceTopKFusedInt8", "MoLBruteForceTopKFusedInt8Approx",
        ):
            # Fused Pallas scoring per shard: the (B, X, L) logits and the
            # gating hidden layer never materialize in HBM — required at
            # multi-million-item shard sizes where the XLA path's
            # (B, X, H) activation alone exceeds HBM.
            from rails_tpu.ops.pallas.mol_scoring import (
                extract_gating_qi_weights,
                fused_mol_scores_t,
            )

            ft = state_l.fused_tables
            assert ft is not None, "pad_and_shard_state needs fused tables"
            q_comp = model.apply(
                params_, q, user_ids, method=model.query_components
            )
            qp = model.apply(params_, q, method=model.query_gating_partial)
            w = extract_gating_qi_weights(params_)
            q_dtype = (
                jnp.bfloat16 if ft.item_comp_t.dtype == jnp.int8
                else ft.item_comp_t.dtype
            )
            scores = fused_mol_scores_t(
                q_comp.astype(q_dtype), qp,
                ft.item_comp_t, ft.item_partial_t, w,
                float(model.cfg.mol.temperature),
                block_x=min(fused_block_x, ft.item_comp_t.shape[2]),
                comp_scale=ft.comp_scale, partial_scale=ft.partial_scale,
            )                                        # (B, X_local)
            scores = jnp.where(state_l.item_ids[None, :] == 0, NEG_PAD, scores)
            if (
                top_k_method.endswith("Approx")
                and jax.default_backend() != "cpu"
            ):
                s_top, idx = jax.lax.approx_max_k(
                    scores, k_local, recall_target=0.99
                )
            else:
                from rails_tpu.index.top_k import chunked_top_k

                s_top, idx = chunked_top_k(scores, k_local)
            res = TopKResult(scores=s_top, ids=state_l.item_ids[idx])
        elif top_k_method == "MoLBruteForceTopK":
            res = mol_brute_force_top_k(
                model, params_, state_l, q, k_local, user_ids=user_ids
            )
        elif top_k_method.startswith("MoLNaive"):
            res = mol_naive_top_k(
                model, params_, state_l, q, k_local,
                k_per_group=min(k_per_group, x_local), user_ids=user_ids,
            )
        elif top_k_method.startswith("MoLAvg"):
            res = mol_avg_top_k(
                model, params_, state_l, q, k_local,
                avg_top_k=min(avg_top_k, x_local), user_ids=user_ids,
            )
        elif top_k_method.startswith("MoLComb"):
            res = mol_comb_top_k(
                model, params_, state_l, q, k_local,
                avg_top_k=min(avg_top_k, x_local),
                k_per_group=min(k_per_group, x_local), user_ids=user_ids,
            )
        elif top_k_method.startswith("MoLCertTopK"):
            # Per-shard UB prefilter + exact rerank; the merge is top-k of
            # certified-per-shard lists (each shard spends the full budget
            # locally — same recall-dominance argument as Naive/Avg).
            res, _ = mol_certified_top_k(
                model, params_, state_l, q, k_local,
                cand_budget=min(budgets["cand_budget"], x_local),
                user_ids=user_ids,
            )
        elif top_k_method.startswith("MoLTileTopK"):
            res = mol_tile_top_k_shared(
                model, params_, state_l, q, k_local,
                tiles_per_group=budgets["tiles_per_group"],
                tile_budget=budgets.get("tile_budget"),
                user_ids=user_ids,
            )
        elif top_k_method.startswith("MoLIVF"):
            import re as _re

            from rails_tpu.index.ivf import mol_ivf_top_k

            m = _re.fullmatch(r"MoLIVFTopK(\d+)", top_k_method)
            assert m, f"bad IVF method spelling {top_k_method!r}"
            assert state_l.ivf is not None, (
                "sharded IVF needs build_sharded_ivf attached to the state"
            )
            # Strip the leading per-shard axis: inside shard_map each
            # device sees its own (1, ...) slice of the stacked index.
            ivf_l = jax.tree.map(lambda a: a[0], state_l.ivf)
            res = mol_ivf_top_k(
                model, params_, state_l._replace(ivf=ivf_l), q, k_local,
                nprobe=int(m.group(1)), user_ids=user_ids,
            )
        else:
            raise ValueError(f"Unknown top_k_method {top_k_method!r}")
        # Mask padded corpus rows (id 0), then pad local lists back to k
        # columns so the cross-shard merge shapes are uniform.
        scores = jnp.where(res.ids == 0, NEG_PAD, res.scores)
        ids = res.ids
        if scores.shape[1] < k:
            pad = k - scores.shape[1]
            scores = jnp.pad(scores, ((0, 0), (0, pad)), constant_values=NEG_PAD)
            ids = jnp.pad(ids, ((0, 0), (0, pad)))
        return _merge_local_topk(scores, ids, k)

    from rails_tpu.ops.pallas.mol_scoring import FusedCorpusTables

    state_specs = MoLTopKState(
        item_ids=P(ITEM_AXIS),
        item_tables=MoLItemTables(
            component_embeddings=P(ITEM_AXIS),
            gating_partial=(
                P(ITEM_AXIS) if state.item_tables.gating_partial is not None else None
            ),
        ),
        avg_component=P(ITEM_AXIS),
        fused_tables=(
            FusedCorpusTables(
                item_comp_t=P(None, None, ITEM_AXIS),
                item_partial_t=P(None, ITEM_AXIS),
                num_items=state.fused_tables.num_items,
                comp_scale=(
                    P(None, ITEM_AXIS)
                    if state.fused_tables.comp_scale is not None else None
                ),
                partial_scale=(
                    P(None, ITEM_AXIS)
                    if state.fused_tables.partial_scale is not None else None
                ),
            )
            if state.fused_tables is not None
            else None
        ),
        ivf=(
            jax.tree.map(lambda _: P(ITEM_AXIS), state.ivf)
            if state.ivf is not None else None
        ),
    )

    sharded = shard_map(
        local_algorithm,
        mesh=mesh,
        in_specs=(P(), state_specs, P(), P()),
        out_specs=TopKResult(scores=P(), ids=P()),
        check_vma=False,
    )

    # params/state are runtime args of the jitted program (passing captured
    # arrays through a closure would bake the sharded corpus into the
    # compiled payload).
    jitted = jax.jit(lambda p, s, q, u: sharded(p, s, q, u))

    def fn(query_embeddings, user_ids=None, params_override=None):
        """`params_override` (already replicated over the mesh) swaps the
        model params at call time — the corpus tables stay as built."""
        p = params if params_override is None else params_override
        return jitted(p, state, query_embeddings, user_ids)

    return fn
