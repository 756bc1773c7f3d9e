"""Exact and approximate top-K retrieval over a MoL / MIPS candidate corpus.

Reference: `/root/reference/rails/indexing/mol_top_k.py` and
`/root/reference/rails/indexing/mips_top_k.py:24-81`.

Algorithms (names preserved):
  - MoLBruteForceTopK  — score all X items with exact MoL, `lax.top_k`.
  - MoLNaiveTopK       — per-(P_Q x P_X) component dot-product top-k_per_group,
                         union, dedup, exact MoL rerank (`mol_top_k.py:133-293`).
  - MoLAvgTopK         — average-component-embedding MIPS prefilter, exact MoL
                         rerank (`mol_top_k.py:296-429`).
  - MoLCombTopK        — union of Naive + Avg candidates, one rerank
                         (`mol_top_k.py:432-551`).
  - MIPSBruteForceTopK — dot-product baseline.

TPU shifts:
  - FAISS IVFFlat (`mol_top_k.py:176-201`) is replaced by brute-force
    component scans: at TPU HBM bandwidth a fused (B,d_P)x(d_P,X) matmul +
    `lax.top_k` is competitive and exact, and it shards over an ICI mesh
    (see `rails_tpu/index/sharded.py`).
  - The reference returns the full candidate union instead of k
    (`mol_top_k.py:260,286` — a known quirk); here every module returns
    exactly `min(k, pool)` candidates, statically shaped.
  - Item-side tables (component embeddings, gating partials) are precomputed
    once per corpus (bf16-able) — the decoupled-inference path.
"""

from __future__ import annotations

import functools
from typing import Any, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from rails_tpu.similarity.mol import MoLItemTables

NEG_DUP = -32767.0
# Item id 0 is the reserved padding id throughout the framework (real corpus
# ids are >= 1). Rows carrying id 0 — e.g. the pad rows `pad_and_shard_state`
# appends to make the corpus shard-divisible — are masked to this before ANY
# selection, so they can never displace real (even negative-scoring) items.
NEG_PAD = -1.0e30

# chunked_top_k falls back to plain lax.top_k beyond this row length: the
# per-chunk-then-merge trade, a ~2x win at serving-corpus scale, inverts at
# multi-million rows (measured, see chunked_top_k docstring).
_CHUNK_MAX_X = 262_144

# The ONE corpus-chunk size shared by the chunked table builders and the
# streamed exact oracle. Per-chunk embedding noise keys on the chunk START
# (`cli/frontier.py` embed_chunk_fn uses PRNGKey(start)), so build and oracle
# must chunk identically to see identical corpus bits — callers pass this
# constant explicitly to both (ADVICE r4: two silently-equal defaults).
BUILD_CHUNK = 262_144


def _mask_pad_rows(scores: jnp.ndarray, item_ids: jnp.ndarray) -> jnp.ndarray:
    """Mask scores of padding rows (item id 0) along the trailing corpus axis."""
    return jnp.where(item_ids == 0, NEG_PAD, scores)


def _mol_cfg(model):
    """The MoLConfig of either a full encoder model (cfg.mol) or a bare
    similarity wrapper whose cfg IS the MoLConfig (tests drive both)."""
    return getattr(model.cfg, "mol", model.cfg)


# Item-table-build jit cache keyed by model identity: get_eval_state runs
# once per epoch in the driver, and a fresh jit(lambda) each call would
# recompile the (corpus-sized) table build every time. The model reference
# is kept so id() cannot be recycled; the cache is a small LRU so a
# long-lived multi-model process (e.g. a sweep server) cannot grow it —
# and the jitted executables it pins — without bound (VERDICT r4 weak #9).
_TABLES_JIT_CACHE: "dict[int, tuple]" = {}
_TABLES_JIT_CACHE_MAX = 8


def _cached_tables_fn(model):
    entry = _TABLES_JIT_CACHE.pop(id(model), None)   # pop+reinsert = LRU
    if entry is None:
        fn = jax.jit(
            lambda p, e: model.apply(p, e, method=model.build_item_tables)
        )
        entry = (fn, model)
    _TABLES_JIT_CACHE[id(model)] = entry
    while len(_TABLES_JIT_CACHE) > _TABLES_JIT_CACHE_MAX:
        _TABLES_JIT_CACHE.pop(next(iter(_TABLES_JIT_CACHE)))
    return entry[0]


_QUANTIZE_JIT = None


def _cached_quantize_fn():
    """One module-level jit of table quantization — a fresh jit(lambda) per
    build would recompile the corpus-sized quantization every epoch."""
    global _QUANTIZE_JIT
    if _QUANTIZE_JIT is None:
        from rails_tpu.ops.pallas.mol_scoring import quantize_fused_tables

        _QUANTIZE_JIT = jax.jit(quantize_fused_tables)
    return _QUANTIZE_JIT


class TopKResult(NamedTuple):
    scores: jnp.ndarray   # (B, K)
    ids: jnp.ndarray      # (B, K)


class MoLTopKState(NamedTuple):
    """Device-resident corpus state shared by all MoL top-k algorithms.

    Mirrors `MoLTopKModule.__init__` (`mol_top_k.py:29-77`): raw item
    embeddings, ids, and the pre-materialized component-level table.
    `fused_tables` additionally holds the Pallas-kernel-layout corpus for the
    fused brute-force path (None when the config is outside kernel support).
    """

    item_ids: jnp.ndarray            # (X,) int32
    item_tables: MoLItemTables       # components (X, P_X, d_P) + gating (X, L)
    avg_component: jnp.ndarray       # (X, d_P): mean over P_X components
    fused_tables: Optional["FusedCorpusTables"] = None
    # Optional inverted-file index (rails_tpu/index/ivf.py) for the
    # MoLIVFTopK ANN path — the FAISS IVFFlat replacement. Attach with
    # `state._replace(ivf=build_ivf_index(state.avg_component, state.item_ids, ...))`.
    ivf: Optional[Any] = None


def build_mol_topk_state(
    model, params, item_ids: jnp.ndarray, item_embeddings: jnp.ndarray,
    table_dtype: jnp.dtype = jnp.bfloat16,
    build_fused: bool = False,
    fused_block_x: int = 256,
    fused_only: bool = False,
    quantize_fused: bool = False,
) -> MoLTopKState:
    """Precompute item-side tables for a corpus (X, D).

    `table_dtype=bfloat16` matches the reference's bf16 component table
    (`mol_top_k.py:61-73`); the rerank itself runs through the model dtype.
    `quantize_fused` stores the FUSED tables int8 with per-item scales
    (half the table bytes, ~2x corpus per chip; scores approximate at
    int8 precision).
    """
    from rails_tpu.ops.pallas.mol_scoring import (
        FusedCorpusTables,
        m_major_perm,
        pad_corpus_tables,
        quantize_fused_tables,
    )

    tables = _cached_tables_fn(model)(params, item_embeddings)
    comp = tables.component_embeddings
    avg = comp.mean(axis=1)
    fused = None
    if build_fused and tables.gating_partial is not None:
        perm = m_major_perm(
            tables.gating_partial.shape[1] // comp.shape[1], comp.shape[1]
        )

        @jax.jit
        def _prep(c, g):
            c2, g2, _ = pad_corpus_tables(c, g, fused_block_x)
            # item_partial_t rows in the kernel's m-major logit order.
            return jnp.transpose(c2, (1, 2, 0)), g2.T[perm]

        item_t, ip_t = _prep(
            comp.astype(table_dtype), tables.gating_partial.astype(table_dtype)
        )
        fused = FusedCorpusTables(
            item_comp_t=item_t, item_partial_t=ip_t, num_items=comp.shape[0]
        )
        if quantize_fused:
            fused = _cached_quantize_fn()(fused)
    if fused_only:
        # Fused-only serving: skip the standard-layout component table (it
        # would double corpus memory). All algorithms still work: the fused
        # brute-force paths read the kernel layout directly, and
        # Naive/Avg/Comb gather candidates from the transposed tables
        # (`_gathered_candidate_tables` / `_component_chunk`).
        # The avg table is kept (d_P per item, cheap) for the Avg prefilter.
        assert fused is not None, "fused_only requires build_fused=True"
        empty = MoLItemTables(
            component_embeddings=jnp.zeros(
                (0,) + tuple(comp.shape[1:]), table_dtype
            ),
            gating_partial=None,
        )
        return MoLTopKState(
            item_ids=item_ids.astype(jnp.int32),
            item_tables=empty,
            avg_component=avg.astype(table_dtype),
            fused_tables=fused,
        )
    return MoLTopKState(
        item_ids=item_ids.astype(jnp.int32),
        item_tables=MoLItemTables(
            component_embeddings=comp.astype(table_dtype),
            gating_partial=(
                tables.gating_partial.astype(table_dtype)
                if tables.gating_partial is not None else None
            ),
        ),
        avg_component=avg.astype(table_dtype),
        fused_tables=fused,
    )


def build_fused_state_chunked(
    model,
    params,
    item_ids: jnp.ndarray,               # (X,) int32
    embed_chunk_fn,                      # fn(start, ids_chunk) -> (C, D) emb
    chunk_size: int = BUILD_CHUNK,
    table_dtype: jnp.dtype = jnp.bfloat16,
    fused_block_x: int = 256,
    keep_on_host: bool = False,
) -> MoLTopKState:
    """Stream a huge corpus through the item MLPs chunk by chunk, assembling
    kernel-layout fused tables host-side (peak device memory = one chunk).

    For 10M+ item corpora the one-shot builder's temporaries (raw embeddings
    + component tables + transpose copies) exceed HBM; this builder keeps
    only (chunk, D) on device at a time.

    `keep_on_host=True` leaves the big tables as numpy arrays so a downstream
    `pad_and_shard_state` performs the single host->device (sharded)
    transfer — at near-HBM-capacity corpus sizes an intermediate unsharded
    device copy would double-buffer and OOM.
    """
    import numpy as np

    assert model.cfg.mol.gating_item_fn, (
        "the fused kernel layout requires the item-side gating partial "
        "(mol.gating_item_fn=True); gating-free configs use the standard "
        "builder (build_mol_topk_state guards the same way)"
    )
    x = int(item_ids.shape[0])
    xp = ((x + fused_block_x - 1) // fused_block_x) * fused_block_x
    p_x = model.cfg.mol.item_dot_product_groups
    d_p = model.cfg.mol.dot_product_dimension
    l = model.cfg.mol.num_logits

    from rails_tpu.ops.pallas.mol_scoring import m_major_perm

    perm = m_major_perm(l // p_x, p_x)

    @jax.jit
    def _chunk_tables(params, emb):
        t = model.apply(params, emb, method=model.build_item_tables)
        comp_t = jnp.transpose(
            t.component_embeddings.astype(table_dtype), (1, 2, 0)
        )                                          # (P_X, d_P, C)
        # Rows in the kernel's m-major logit order.
        gp_t = t.gating_partial.astype(table_dtype).T[perm]    # (L, C)
        avg = t.component_embeddings.mean(axis=1).astype(table_dtype)
        return comp_t, gp_t, avg

    np_dtype = np.dtype(jnp.dtype(table_dtype).name)
    host_comp = np.zeros((p_x, d_p, xp), dtype=np_dtype)
    host_gp = np.zeros((l, xp), dtype=np_dtype)
    host_avg = np.zeros((xp, d_p), dtype=np_dtype)
    for start in range(0, x, chunk_size):
        end = min(start + chunk_size, x)
        emb = embed_chunk_fn(start, item_ids[start:end])
        comp_t, gp_t, avg = _chunk_tables(params, emb)
        host_comp[:, :, start:end] = np.asarray(comp_t)
        host_gp[:, start:end] = np.asarray(gp_t)
        host_avg[start:end] = np.asarray(avg)

    from rails_tpu.ops.pallas.mol_scoring import FusedCorpusTables

    host_ids = np.zeros((xp,), np.int32)
    host_ids[:x] = np.asarray(item_ids, dtype=np.int32)
    conv = (lambda a: a) if keep_on_host else jnp.asarray
    return MoLTopKState(
        item_ids=conv(host_ids),
        item_tables=MoLItemTables(
            component_embeddings=jnp.zeros((0, p_x, d_p), table_dtype),
            gating_partial=None,
        ),
        avg_component=conv(host_avg),
        fused_tables=FusedCorpusTables(
            item_comp_t=conv(host_comp),
            item_partial_t=conv(host_gp),
            num_items=x,
        ),
    )


def build_fused_state_chunked_on_device(
    model,
    params,
    item_ids: jnp.ndarray,               # (X,) int32
    embed_chunk_fn,                      # fn(start, ids_chunk) -> (C, D) emb
    chunk_size: int = BUILD_CHUNK,
    table_dtype: jnp.dtype = jnp.bfloat16,
    fused_block_x: int = 256,
    quantize: bool = False,
) -> MoLTopKState:
    """Device-resident chunked corpus build: no host round trips.

    `build_fused_state_chunked` streams every chunk's tables to host numpy
    (the right layout for a downstream multi-chip sharded upload), but on a
    REMOTE-tunneled single chip that costs a full corpus download + upload
    (~10 GB at 8M items). Here the kernel-layout tables accumulate directly
    in HBM via donated `dynamic_update_slice` — peak device memory is the
    final tables + one chunk, and the tunnel only ever carries item ids.
    Use when the bf16 tables fit a single chip's HBM.

    `quantize=True` quantizes each chunk to int8 IN the build (the
    `quantize_fused_tables` scales are per-item, so per-chunk quantization
    of the bf16-cast chunk equals quantizing the assembled bf16 tables, up
    to ~1-ULP divide-rewrite drift between the two compiled programs) —
    the full-precision tables never exist in HBM, so the int8 corpus
    ceiling (~2x the bf16 one) is reachable on one chip.
    """
    import functools as _ft

    assert model.cfg.mol.gating_item_fn, (
        "the fused kernel layout requires the item-side gating partial "
        "(mol.gating_item_fn=True); gating-free configs use the standard "
        "builder (build_mol_topk_state guards the same way)"
    )
    x = int(item_ids.shape[0])
    xp = ((x + fused_block_x - 1) // fused_block_x) * fused_block_x
    p_x = model.cfg.mol.item_dot_product_groups
    d_p = model.cfg.mol.dot_product_dimension
    l = model.cfg.mol.num_logits

    from rails_tpu.ops.pallas.mol_scoring import (
        FusedCorpusTables, m_major_perm,
    )

    perm = m_major_perm(l // p_x, p_x)

    @_ft.partial(jax.jit, donate_argnums=(1, 2, 3, 4, 5))
    def _insert(params, comp_buf, gp_buf, avg_buf, cs_buf, ps_buf,
                emb, start):
        t = model.apply(params, emb, method=model.build_item_tables)
        comp_t = jnp.transpose(
            t.component_embeddings.astype(table_dtype), (1, 2, 0)
        )
        gp_t = t.gating_partial.astype(table_dtype).T[perm]
        avg = t.component_embeddings.mean(axis=1).astype(table_dtype)
        if quantize:
            # Same math as quantize_fused_tables on the assembled bf16
            # tables: scales are per-item, so chunking the X axis changes
            # no bits.
            comp32 = comp_t.astype(jnp.float32)
            cs = jnp.maximum(jnp.max(jnp.abs(comp32), axis=1), 1e-12) / 127.0
            comp_t = jnp.clip(
                jnp.round(comp32 / cs[:, None, :]), -127, 127
            ).astype(jnp.int8)
            gp32 = gp_t.astype(jnp.float32)
            ps = jnp.maximum(
                jnp.max(jnp.abs(gp32), axis=0, keepdims=True), 1e-12
            ) / 127.0
            gp_t = jnp.clip(jnp.round(gp32 / ps), -127, 127).astype(jnp.int8)
            cs_buf = jax.lax.dynamic_update_slice(cs_buf, cs, (0, start))
            ps_buf = jax.lax.dynamic_update_slice(ps_buf, ps, (0, start))
        return (
            jax.lax.dynamic_update_slice(comp_buf, comp_t, (0, 0, start)),
            jax.lax.dynamic_update_slice(gp_buf, gp_t, (0, start)),
            jax.lax.dynamic_update_slice(avg_buf, avg, (start, 0)),
            cs_buf,
            ps_buf,
        )

    tbl_dtype = jnp.int8 if quantize else table_dtype
    comp_buf = jnp.zeros((p_x, d_p, xp), tbl_dtype)
    gp_buf = jnp.zeros((l, xp), tbl_dtype)
    avg_buf = jnp.zeros((xp, d_p), table_dtype)
    if quantize:
        # Pad columns keep the all-zeros-table scale (1e-12/127), matching
        # quantize_fused_tables on padded assembled tables exactly.
        cs_buf = jnp.full((p_x, xp), 1e-12 / 127.0, jnp.float32)
        ps_buf = jnp.full((1, xp), 1e-12 / 127.0, jnp.float32)
    else:
        # 1x1 placeholders: full-size f32 scale buffers would pin ~5 MB/M
        # items of dead HBM in a builder whose job is squeezing the per-chip
        # corpus ceiling (they are donated args, so they'd live through
        # every _insert call).
        cs_buf = jnp.zeros((1, 1), jnp.float32)
        ps_buf = jnp.zeros((1, 1), jnp.float32)
    for start in range(0, x, chunk_size):
        end = min(start + chunk_size, x)
        emb = embed_chunk_fn(start, item_ids[start:end])
        comp_buf, gp_buf, avg_buf, cs_buf, ps_buf = _insert(
            params, comp_buf, gp_buf, avg_buf, cs_buf, ps_buf,
            emb, jnp.int32(start)
        )

    ids = jnp.zeros((xp,), jnp.int32).at[:x].set(item_ids.astype(jnp.int32))
    return MoLTopKState(
        item_ids=ids,
        item_tables=MoLItemTables(
            component_embeddings=jnp.zeros((0, p_x, d_p), table_dtype),
            gating_partial=None,
        ),
        avg_component=avg_buf,
        fused_tables=FusedCorpusTables(
            item_comp_t=comp_buf,
            item_partial_t=gp_buf,
            num_items=x,
            comp_scale=cs_buf if quantize else None,
            partial_scale=ps_buf if quantize else None,
        ),
    )


def permute_state_items(
    state: MoLTopKState, perm, delete_originals: bool = False
) -> MoLTopKState:
    """Relayout the corpus state so item columns follow `perm` (new position
    -> old position), e.g. the cluster-order permutation from
    `build_ivf_index(..., return_cluster_perm=True)`.

    item_ids travel with the tables, so every TopKResult is unchanged in
    id space; only the PHYSICAL tile composition changes — which is the
    point: tile-granular methods (`mol_tile_top_k*`) see cluster-coherent
    256-item blocks, sharpening their per-group block-max bounds from
    "every tile is a diverse corpus sample" to "a tile is one cluster
    slice" (measured effect: docs/STATUS.md r5 cluster-order study).

    The permutation runs HOST-side: each device array is fetched, permuted
    in numpy, deleted from HBM, then re-put — peak device memory is one
    extra table at a time (a scattered in-jit gather along the item axis
    would materialize a full X-major relayout copy next to the argument
    table, the r4 8M OOM; see `fused_mol_scores_tiles`). Kernel-pad
    columns past len(perm) stay in place. An attached `state.ivf` is
    remapped through the inverse permutation (bucket 0-padding slots remap
    to arbitrary real positions — still masked by candidate dedup, the
    pre-existing semantics of the 0-pad).

    `delete_originals=True` frees each source device array as soon as its
    host copy exists (required at 8M items, where original + permuted
    tables cannot coexist in HBM) — the INPUT state is unusable after.
    """
    from rails_tpu.ops.pallas.mol_scoring import FusedCorpusTables
    perm = np.asarray(perm, np.int64)
    x = int(perm.shape[0])
    inv = np.empty((x,), np.int64)
    inv[perm] = np.arange(x, dtype=np.int64)

    def take(arr, axis):
        if arr is None:
            return None
        a = np.asarray(jax.device_get(arr))
        if delete_originals and hasattr(arr, "delete"):
            try:
                arr.delete()
            except Exception:   # noqa: BLE001 — committed/donated arrays
                pass
        n = a.shape[axis]
        idx = perm if n == x else np.concatenate(
            [perm, np.arange(x, n, dtype=np.int64)]
        )
        return jax.device_put(np.take(a, idx, axis=axis))

    it = state.item_tables
    if it is not None and it.component_embeddings.shape[0] > 0:
        it = MoLItemTables(
            component_embeddings=take(it.component_embeddings, 0),
            gating_partial=take(it.gating_partial, 0),
        )
    avg = state.avg_component
    if avg is not None and avg.shape[0] == x:
        avg = take(avg, 0)
    ft = state.fused_tables
    if ft is not None:
        ft = FusedCorpusTables(
            item_comp_t=take(ft.item_comp_t, 2),
            item_partial_t=take(ft.item_partial_t, 1),
            num_items=ft.num_items,
            comp_scale=take(ft.comp_scale, 1),
            partial_scale=take(ft.partial_scale, 1),
        )
    ivf = state.ivf
    if ivf is not None:
        remap = lambda a: (                                    # noqa: E731
            jax.device_put(inv[np.asarray(jax.device_get(a), np.int64)]
                           .astype(np.int32))
        )
        ivf = ivf._replace(
            buckets=remap(ivf.buckets),
            overflow=(
                remap(ivf.overflow) if ivf.overflow.shape[0] else ivf.overflow
            ),
        )
    return MoLTopKState(
        item_ids=take(state.item_ids, 0),
        item_tables=it,
        avg_component=avg,
        fused_tables=ft,
        ivf=ivf,
    )


# --------------------------------------------------------------------- #
# Exact algorithms.
# --------------------------------------------------------------------- #


def hierarchical_top_k(
    scores: jnp.ndarray,                      # (B, X)
    k: int,
    tile: int = 256,
    tile_max: Optional[jnp.ndarray] = None,   # (B, >=ceil(X/tile)) f32
    extra_tiles: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k at multi-million-row lengths via a tile-max hierarchy.

    `lax.top_k` over a (B, X) row at X=8M costs ~165 ms on a v5e (B=32,
    k=200) — about half the exact-serving step — because XLA's top-k is a
    sort-scale reduction over the full row. This replaces it with three
    tiny selects:

      1. tile maxima: reshape to (B, X/tile, tile), max over the tile axis
         (one streaming pass over the scores);
      2. select the top-k TILES by their maxima (top-k over X/tile cols);
      3. gather those k tiles' scores (k*tile cols) and top-k over them,
         mapping positions back to corpus columns.

    EXACTNESS: let t = k-th largest score. Every tile whose max >= t
    contains an item scoring >= t, and only k items score >= t, so at most
    k tiles have max >= t — hence every item scoring >= t lives inside the
    top-k tiles by max, and step 3 sees all of them. (With score ties the
    returned SCORE multiset is still exact — the k tile maxima themselves
    are in the gathered pool and dominate every non-gathered item — but a
    tie at the k-th value may resolve to a different corpus index than
    plain `lax.top_k`'s lowest-index rule when the tied twin sits in a
    non-selected tile.)

    Measured (v5e, B=32, X=8M, k=200, in-jit same-window): see
    docs/STATUS.md round-4 select table. The extra tile-max pass re-reads
    the (B, X) scores once — measured 5.2 ms per M items at B=32
    (docs/STATUS.md r5 decomposition), which is noise next to the sort it
    removes but NOT next to the rest of the serving step; `tile_max`
    accepts the maxima precomputed for free inside the fused scorer
    (`fused_mol_scores_t(emit_blockmax=True)`), skipping stage 1.

    A caller-provided `tile_max` may be an UPPER BOUND of the true tile
    max on at most `extra_tiles` tiles (e.g. the scorer's final partial
    tile, whose kernel-pad columns score garbage that the caller masks
    AFTER the kernel): stage 2 then selects k+extra_tiles tiles, which
    restores exactness — every tile containing a true top-k item still
    ranks above all but at most (k-1) true-max tiles and `extra_tiles`
    inflated ones.
    """
    b, x = scores.shape
    kk = min(k, x)
    nt = -(-x // tile)
    if nt <= kk or x <= 2 * k:
        # Fewer tiles than k: the hierarchy would gather everything anyway.
        # Plain top_k directly (NOT chunked_top_k — at x > _CHUNK_MAX_X that
        # would dispatch straight back here).
        return jax.lax.top_k(scores, kk)
    pad = nt * tile - x
    if pad:
        # Pad with -inf, strictly below NEG_PAD: real columns (even
        # pad-id-masked ones) always outrank the hierarchy's own pad columns,
        # so returned indices are always < x (a NEG_PAD pad could win on a
        # heavily masked row and its clamped gather would alias the last
        # real item — ADVICE r4). x >= kk real columns always exist.
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    tiles = scores.reshape(b, nt, tile)
    if tile_max is None:
        tile_max = tiles.max(axis=2)                       # (B, nt)
        sel = kk
    else:
        assert tile_max.shape[1] >= nt, (tile_max.shape, nt)
        tile_max = tile_max[:, :nt]
        sel = min(kk + extra_tiles, nt)
    _, tidx = chunked_top_k(tile_max, sel)                 # (B, sel) tile ids
    gathered = jnp.take_along_axis(
        tiles, tidx[:, :, None], axis=1
    ).reshape(b, sel * tile)
    v, pos = chunked_top_k(gathered, kk)
    col = (
        jnp.take_along_axis(tidx, pos // tile, axis=1) * tile + pos % tile
    )
    return v, col


def chunked_top_k(
    scores: jnp.ndarray,                      # (B, X)
    k: int,
    target_chunks: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via per-chunk top-k + merge — ~2x `lax.top_k` on TPU.

    Splitting the corpus axis into C chunks, taking top-min(k, X/C) in
    each, and re-top-k over the C*k candidates is measurably faster at
    serving-corpus scale (27k items, k=200, B=512, v5e: 16.0 -> 9.7
    ms/batch at C=32) and EXACT including tie order: candidates concatenate
    chunk-major with per-chunk stable value order, so equal values still
    resolve to the lowest corpus index. Columns pad with -inf when C
    doesn't divide X; k > X/C simply lowers the per-chunk take.

    At multi-million-row lengths the chunk-then-merge trade inverts (B=32,
    X=8M: plain 165 ms vs chunked 346 ms in-jit same-window); beyond
    _CHUNK_MAX_X this dispatches to `hierarchical_top_k`, which replaces
    the full-row sort with a tile-max hierarchy (exact score multiset; tie
    INDICES may differ from plain top_k's lowest-index rule — see its
    docstring).
    """
    b, x = scores.shape
    if x > _CHUNK_MAX_X:
        return hierarchical_top_k(scores, k)
    if x <= 2 * k or x < 2 * target_chunks:
        return jax.lax.top_k(scores, min(k, x))
    c = min(target_chunks, x // k if x // k > 1 else 2)
    per = -(-x // c)                           # ceil
    pad = c * per - x
    if pad:
        scores = jnp.pad(
            scores, ((0, 0), (0, pad)), constant_values=-jnp.inf
        )
    kk = min(k, per)
    v, i = jax.lax.top_k(scores.reshape(b, c, per), kk)       # (B, C, kk)
    base = (jnp.arange(c, dtype=i.dtype) * per)[None, :, None]
    v2 = v.reshape(b, c * kk)
    i2 = (i + base).reshape(b, c * kk)
    vv, pos = jax.lax.top_k(v2, k)
    return vv, jnp.take_along_axis(i2, pos, axis=1)


def mol_brute_force_top_k(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,            # (B, D)
    k: int,
    user_ids: Optional[jnp.ndarray] = None,
) -> TopKResult:
    """Exact MoL over the whole corpus (`MoLBruteForceTopK`, `mol_top_k.py:84-130`)."""
    assert state.item_tables.component_embeddings.shape[0] > 0, (
        "state was built fused_only; use the MoLBruteForceTopKFused path"
    )
    scores = model.apply(
        params, query_embeddings, state.item_tables, user_ids=user_ids,
        method=model.score_precomputed,
    )                                          # (B, X)
    scores = _mask_pad_rows(scores, state.item_ids)
    top_scores, top_idx = chunked_top_k(scores, k)
    return TopKResult(scores=top_scores, ids=state.item_ids[top_idx])


def _fused_scores(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,
    user_ids: Optional[jnp.ndarray],
    block_x: int,
    emit_blockmax: bool = False,
):
    from rails_tpu.ops.pallas.mol_scoring import (
        extract_gating_qi_weights,
        fused_mol_scores_t,
    )

    assert state.fused_tables is not None, (
        "build_mol_topk_state(..., build_fused=True) required for the fused path"
    )
    ft = state.fused_tables
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )
    qp = model.apply(
        params, query_embeddings, method=model.query_gating_partial
    )
    weights = extract_gating_qi_weights(params)
    # int8 tables: queries stay in the matmul dtype (bf16); the kernel
    # dequantizes the table blocks in VMEM.
    q_dtype = (
        jnp.bfloat16 if ft.item_comp_t.dtype == jnp.int8
        else ft.item_comp_t.dtype
    )
    valid = None
    if emit_blockmax:
        # Nonzero for real corpus columns; the kernel masks pad columns
        # (mid-corpus id-0 rows included) and emits post-mask block maxima.
        valid = (state.item_ids != 0).astype(jnp.float32)
    res = fused_mol_scores_t(
        q_comp.astype(q_dtype), qp,
        ft.item_comp_t, ft.item_partial_t, weights,
        float(_mol_cfg(model).temperature), block_x=block_x,
        comp_scale=ft.comp_scale, partial_scale=ft.partial_scale,
        emit_blockmax=emit_blockmax, valid=valid,
    )
    if emit_blockmax:
        return res[0][:, : ft.num_items], res[1]
    return res[:, : ft.num_items]


def mol_brute_force_top_k_fused(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,            # (B, D)
    k: int,
    user_ids: Optional[jnp.ndarray] = None,
    block_x: int = 256,
) -> TopKResult:
    """Exact MoL over the whole corpus through the fused Pallas kernel
    (`rails_tpu/ops/pallas/mol_scoring.py`). Semantics identical to
    `mol_brute_force_top_k`; the (B, X, L) logits and gating activations
    never touch HBM.

    At hierarchical-select widths the kernel also emits per-block score
    maxima (free while the scores are live in VMEM) with pad columns
    (mid-corpus id-0 rows included) masked IN-kernel, so the select skips
    BOTH its stage-1 streaming pass over the (B, X) row (measured 5.2 ms
    per M items at B=32, docs/STATUS.md r5 decomposition) AND the separate
    `_mask_pad_rows` pass."""
    w = None
    if state.fused_tables is not None:
        w = min(
            state.fused_tables.num_items,
            state.fused_tables.item_comp_t.shape[2],
        )
    use_bmax = w is not None and w > _CHUNK_MAX_X and block_x == 256
    if use_bmax:
        scores, bmax = _fused_scores(
            model, params, state, query_embeddings, user_ids, block_x,
            emit_blockmax=True,
        )
        top_scores, top_idx = hierarchical_top_k(
            scores, k, tile=block_x, tile_max=bmax,
        )
    else:
        scores = _fused_scores(
            model, params, state, query_embeddings, user_ids, block_x
        )
        scores = _mask_pad_rows(scores, state.item_ids[: scores.shape[1]])
        top_scores, top_idx = chunked_top_k(scores, k)
    return TopKResult(scores=top_scores, ids=state.item_ids[top_idx])


def mol_brute_force_top_k_fused_approx(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,            # (B, D)
    k: int,
    user_ids: Optional[jnp.ndarray] = None,
    block_x: int = 256,
    recall_target: float = 0.99,
) -> TopKResult:
    """Fused MoL scoring + TPU-optimized `lax.approx_max_k` selection.

    At multi-million-item corpora the exact `lax.top_k` becomes a large
    fraction of the query cost; approx_max_k (arXiv 2206.14286) trades a
    bounded per-element recall (>= recall_target) for a much cheaper
    partial reduction. Falls back to exact top_k on backends without the
    approx primitive (CPU tests)."""
    scores = _fused_scores(model, params, state, query_embeddings, user_ids, block_x)
    scores = _mask_pad_rows(scores, state.item_ids[: scores.shape[1]])
    if jax.default_backend() == "cpu":
        top_scores, top_idx = jax.lax.top_k(scores, k)
    else:
        top_scores, top_idx = jax.lax.approx_max_k(
            scores, k, recall_target=recall_target
        )
    return TopKResult(scores=top_scores, ids=state.item_ids[top_idx])


class TopKCertificate(NamedTuple):
    """Per-query error bound for an approximate retrieval pass.

    `ub_unexamined` upper-bounds the exact MoL score of EVERY item the
    algorithm did not exact-score (soundness argument in the respective
    algorithm's docstring). If `ub_unexamined <= kth_score` the returned
    top-k is provably the exact top-k (`certified`); otherwise `gap_bound`
    bounds how far the true k-th score can sit above the returned k-th —
    i.e. a per-query certificate for the rank-k score gap.

    Arithmetic caveat: bounds are computed in the serving table dtype
    (bf16 tables -> bf16-input/f32-accumulate matmuls); the prefilter and
    rerank paths contract in different orders, so certificates are sound up
    to that rounding (~1e-3 relative at bf16). `margin` in the producing
    call shifts the test conservatively."""

    certified: jnp.ndarray       # (B,) bool
    ub_unexamined: jnp.ndarray   # (B,) max possible score of unexamined items
    kth_score: jnp.ndarray       # (B,) returned k-th (lowest) score
    gap_bound: jnp.ndarray       # (B,) max(0, ub_unexamined - kth_score)


def _table_dtype(state: MoLTopKState) -> jnp.dtype:
    if state.fused_tables is not None:
        return jnp.dtype(state.fused_tables.item_comp_t.dtype)
    return jnp.dtype(state.item_tables.component_embeddings.dtype)


# Relative certificate margin per table dtype (margin=None default): the UB
# prefilter and the exact rerank contract in different orders, so the test
# `ub <= kth` must absorb a few ULPs of table-dtype rounding or certified=True
# can be a false positive at the boundary (ADVICE r4). bf16 ULP is 2^-8
# relative; int8 symmetric quantization adds up to half a step (~2^-8 of the
# per-item max); f32 tables still differ by contraction order (~2^-20).
_CERT_REL_MARGIN = {
    jnp.dtype(jnp.int8): 2.0 ** -6,
    jnp.dtype(jnp.bfloat16): 2.0 ** -7,
}


def _certificate(
    ub_unexamined: jnp.ndarray, kth: jnp.ndarray,
    margin: Optional[float], table_dtype=None,
) -> TopKCertificate:
    if margin is None:
        rel = _CERT_REL_MARGIN.get(jnp.dtype(table_dtype), 2.0 ** -20)
        margin = rel * jnp.maximum(jnp.abs(ub_unexamined), jnp.abs(kth))
    return TopKCertificate(
        certified=ub_unexamined + margin <= kth,
        ub_unexamined=ub_unexamined,
        kth_score=kth,
        gap_bound=jnp.maximum(0.0, ub_unexamined - kth),
    )


def mol_certified_top_k(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,            # (B, D)
    k: int,
    cand_budget: int,
    user_ids: Optional[jnp.ndarray] = None,
    # Default matches the fused builders' pad multiple (fused_block_x=256):
    # the UB kernel requires block_x | X_padded.
    block_x: int = 256,
    margin: Optional[float] = None,
    cand_chunk: Optional[int] = 8192,
) -> Tuple[TopKResult, TopKCertificate]:
    """Upper-bound prefilter + exact rerank with a per-query certificate.

    The MoL score is a softmax mixture of component logits, so
    score(q, x) <= max_l <q_n, x_m>/T =: UB(q, x) — computable with the
    component matmuls alone (`ops/pallas/mol_scoring.fused_mol_ub_t`, MXU
    work only, none of the gating chain's VPU/transcendental cost). The
    algorithm exact-scores the top-`cand_budget` items by UB and returns
    their top-k; every unexamined item's score is bounded by the
    (cand_budget+1)-th largest UB, giving the certificate: when that bound
    is <= the returned k-th score, the result is PROVABLY the exact top-k.

    This is the TPU-native replacement for scoring all X items when the
    gating chain (not the select) is the bottleneck: the reference has no
    counterpart (`mol_top_k.py` is bound-free); the north star names it
    (BASELINE.json: "top-k union followed by exact MoL rerank with error
    bounds")."""
    from rails_tpu.ops.pallas.mol_scoring import fused_mol_ub_t

    ft = state.fused_tables
    assert ft is not None, (
        "mol_certified_top_k reads the fused kernel-layout tables "
        "(build_mol_topk_state(..., build_fused=True))"
    )
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )
    q_dtype = (
        jnp.bfloat16 if ft.item_comp_t.dtype == jnp.int8
        else ft.item_comp_t.dtype
    )
    ub = fused_mol_ub_t(
        q_comp.astype(q_dtype), ft.item_comp_t,
        float(_mol_cfg(model).temperature), block_x=block_x,
        comp_scale=ft.comp_scale,
    )[:, : ft.num_items]
    ub = _mask_pad_rows(ub, state.item_ids[: ub.shape[1]])
    b, x = ub.shape
    c = min(cand_budget, x)
    if c >= x:
        # Full coverage: nothing unexamined.
        cand = jnp.broadcast_to(jnp.arange(x, dtype=jnp.int32), (b, x))
        spill = jnp.full((b,), NEG_PAD, jnp.float32)
    else:
        ub_top, cand = chunked_top_k(ub, c + 1)
        spill = ub_top[:, c]           # largest UB among unexamined items
        cand = cand[:, :c]
    res = dedup_rerank_top_k(
        model, params, state, query_embeddings, cand, k, user_ids,
        cand_chunk=cand_chunk,
    )
    kth = res.scores[:, -1]
    return res, _certificate(spill, kth, margin, _table_dtype(state))


def mol_tile_top_k(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,            # (B, D)
    k: int,
    tiles_per_group: int,
    user_ids: Optional[jnp.ndarray] = None,
    block_x: int = 256,
    margin: Optional[float] = None,
    cand_chunk: Optional[int] = 8192,
    certified: bool = False,
):
    """Tile-granular Naive: per-group top tiles by block-max logit, exact
    rerank of the tile union, with Naive-grade per-group certificates — at
    fused-kernel (MXU-only) prefilter cost.

    One Pallas pass (`fused_mol_group_block_max`) computes, per component
    group l and per `block_x`-item corpus block, the maximum logit_l/T in
    the block. Per group, the top `tiles_per_group` blocks are selected;
    the candidate set is the union of the selected blocks' items (whole
    tiles — contiguous gathers), exact-MoL reranked.

    SOUNDNESS of the certificate (certified=True): let t_l be the
    tiles_per_group-th largest block max for group l. An item in no
    selected tile of group l sits in a block whose max_l <= t_l, so its
    logit_l <= t_l; an item examined by NO group therefore has
    score <= max_l logit_l <= max_l t_l — per-GROUP thresholds, the bound
    class of the certified Naive path (`_naive_candidates`), not the
    global max-logit spill (which provably equals the scalar-UB bound:
    max_l max_{x unexamined} logit_l(x) = max_{x} max_l — the orders
    commute, so tightening REQUIRES per-group candidate lists).

    vs the exact fused path: the prefilter runs the component matmuls only
    (~1/3 of the fused kernel's MXU FLOPs, none of its gating-chain VPU
    work) and selects over (B*L, X/block_x) instead of (B, X) — the
    gating/combine chain (the binding resource at multi-M corpora,
    docs/STATUS.md r4) is paid only on the ~L*tiles_per_group*block_x
    candidates. Zero-logit corpus pad rows may raise block maxima; that
    only loosens (never unsounds) the bound, and pad candidates are masked
    in the rerank.

    Reference slot: the FAISS per-group ANN union (`mol_top_k.py:176-201`)
    — redesigned block-granular so the "index" is a streaming kernel
    statistic instead of a built structure, and bound-carrying (the
    reference is bound-free; BASELINE.json names the error-bound rerank).
    """
    from rails_tpu.ops.pallas.mol_scoring import fused_mol_group_block_max

    ft = state.fused_tables
    assert ft is not None, (
        "mol_tile_top_k reads the fused kernel-layout tables "
        "(build_mol_topk_state(..., build_fused=True))"
    )
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )
    q_dtype = (
        jnp.bfloat16 if ft.item_comp_t.dtype == jnp.int8
        else ft.item_comp_t.dtype
    )
    gmax = fused_mol_group_block_max(
        q_comp.astype(q_dtype), ft.item_comp_t,
        float(_mol_cfg(model).temperature), block_x=block_x,
        comp_scale=ft.comp_scale,
    )                                          # (B, L, NB)
    b, l, nb = gmax.shape
    kk = min(tiles_per_group, nb)
    with jax.named_scope("tile_selection"):
        tv, tidx = chunked_top_k(gmax.reshape(b * l, nb), kk)
        tidx = tidx.reshape(b, l * kk)
    if kk >= nb:
        # Full tile coverage: nothing unexamined.
        bound = jnp.full((b,), NEG_PAD, jnp.float32)
    else:
        # max over groups of each group's kk-th block max.
        bound = jnp.max(tv.reshape(b, l, kk)[:, :, -1], axis=1)
    with jax.named_scope("tile_expand"):
        # Tile-level dedup (L*kk tile ids per query — a cheap sort), then
        # expand to item columns; duplicate tiles mask whole-tile.
        tiles_sorted = jnp.sort(tidx, axis=1)
        tile_first = jnp.concatenate(
            [
                jnp.ones_like(tiles_sorted[:, :1], dtype=bool),
                tiles_sorted[:, 1:] != tiles_sorted[:, :-1],
            ],
            axis=1,
        )
        cand = (
            tiles_sorted[:, :, None] * block_x
            + jnp.arange(block_x, dtype=tiles_sorted.dtype)[None, None, :]
        ).reshape(b, -1)
        is_first = jnp.broadcast_to(
            tile_first[:, :, None], (b, tile_first.shape[1], block_x)
        ).reshape(b, -1)
        # Kernel-pad columns beyond the id table (standard-layout states
        # keep unpadded item_ids): clamp the gather, mask the candidate.
        x_ids = state.item_ids.shape[0]
        if nb * block_x > x_ids:
            is_first = is_first & (cand < x_ids)
            cand = jnp.minimum(cand, x_ids - 1)
    res = dedup_rerank_top_k(
        model, params, state, query_embeddings, cand, k, user_ids,
        cand_chunk=cand_chunk, is_first=is_first,
    )
    if not certified:
        return res
    return res, _certificate(
        bound, res.scores[:, -1], margin, _table_dtype(state)
    )


def mol_tile_top_k_shared(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,            # (B, D)
    k: int,
    tiles_per_group: int,
    user_ids: Optional[jnp.ndarray] = None,
    block_x: int = 256,
    tile_budget: Optional[int] = None,
    margin: Optional[float] = None,
    certified: bool = False,
):
    """Batch-shared tile retrieval: per-(query, group) top tiles by block-max
    logit, ONE shared tile set for the whole batch, scored in place by the
    prefetched-tile fused kernel — the scale-robust form of `mol_tile_top_k`.

    Pipeline:
      1. `fused_mol_group_block_max` -> gmax (B, L, X/block_x): per-group
         block maxima, component matmuls only (MXU work, no gating chain).
      2. Every (query, group) nominates its top `tiles_per_group` blocks;
         the nominations are deduplicated into one shared tile list of
         static size T = `tile_budget` (default: all B*L*tiles_per_group
         nominations, i.e. guaranteed coverage of every nomination; smaller
         budgets keep the highest-block-max distinct tiles and pad slots
         with duplicates, which are masked).
      3. `fused_mol_scores_tiles` exact-MoL-scores the selected tiles for
         ALL queries, DMA-ing the blocks straight from the native-layout
         tables (nothing is gathered in HBM — a scattered gather would
         force a full X-major layout copy of the table; see that kernel's
         docstring). Scoring the shared superset instead of per-query
         unions only ADDS examined items per query.
      4. Per-query top-k over the (B, T*block_x) tile scores.

    SOUNDNESS of the certificate (certified=True): an item in NO selected
    tile sits, for every group l, in a block whose max_l was not selected,
    so its logit_l <= that block's max_l; its MoL score (a softmax mixture)
    is <= max_l logit_l <= max over UNSELECTED tiles of gmax[b, :, :] —
    computed per query by masking the selected tiles out of gmax. With the
    default full-coverage budget this equals the per-(query, group)
    threshold bound of the per-query variant; any smaller budget only
    loosens (never unsounds) it. Corpus pad columns (zero tables, logit 0)
    can only raise the bound; pad candidates are masked in the scores.

    vs exact fused brute force: the gating/combine chain (the binding
    resource at multi-M corpora, docs/STATUS.md r4) runs on T*block_x
    columns instead of X; the prefilter pays component matmuls over X but
    none of the VPU chain, and selects over (B*L, X/block_x) instead of
    (B, X). Reference slot: the per-group FAISS ANN union
    (`mol_top_k.py:176-201`), redesigned block-granular, batch-shared, and
    bound-carrying."""
    from rails_tpu.ops.pallas.mol_scoring import (
        extract_gating_qi_weights,
        fused_mol_group_block_max,
        fused_mol_scores_tiles,
    )

    ft = state.fused_tables
    assert ft is not None, (
        "mol_tile_top_k_shared reads the fused kernel-layout tables "
        "(build_mol_topk_state(..., build_fused=True))"
    )
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )
    qp = model.apply(
        params, query_embeddings, method=model.query_gating_partial
    )
    weights = extract_gating_qi_weights(params)
    q_dtype = (
        jnp.bfloat16 if ft.item_comp_t.dtype == jnp.int8
        else ft.item_comp_t.dtype
    )
    temperature = float(_mol_cfg(model).temperature)
    gmax = fused_mol_group_block_max(
        q_comp.astype(q_dtype), ft.item_comp_t, temperature,
        block_x=block_x, comp_scale=ft.comp_scale,
    )                                          # (B, L, NB)
    b, l, nb = gmax.shape
    kk = min(tiles_per_group, nb)
    with jax.named_scope("tile_selection"):
        tv, tidx = chunked_top_k(gmax.reshape(b * l, nb), kk)
        all_tiles = tidx.reshape(-1)           # (B*L*kk,)
        all_vals = tv.reshape(-1)
        order = jnp.argsort(all_tiles)
        sorted_tiles = all_tiles[order]
        first = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                sorted_tiles[1:] != sorted_tiles[:-1],
            ]
        )
        n_all = sorted_tiles.shape[0]
        # Never score more slots than DISTINCT corpus tiles: nominations
        # carry duplicates (B*L*kk slots for <= nb distinct tiles), and an
        # uncapped budget scored every duplicate slot — measured 218 ms at
        # 500k items for TileTopK32 (8.4M scored columns, 16.8x the corpus)
        # where <= nb=1954 distinct tiles existed. Keeping t >= #distinct
        # preserves full nomination coverage, so certificates are unchanged.
        t = min(tile_budget or n_all, n_all, nb)
        if t < n_all:
            # Keep the highest-block-max distinct tiles; duplicate slots
            # (first=False) rank below every distinct tile and are masked.
            seg = jax.ops.segment_max(
                all_vals, all_tiles, num_segments=nb
            )
            key = jnp.where(first, seg[sorted_tiles], NEG_PAD)
            _, pos = jax.lax.top_k(key, t)
            sel_tiles = sorted_tiles[pos]
            sel_first = first[pos]
        else:
            sel_tiles = sorted_tiles
            sel_first = first
    if certified:
        covered = (
            jnp.zeros((nb,), bool)
            .at[jnp.where(sel_first, sel_tiles, nb)]
            .set(True, mode="drop")
        )
        bound = jnp.max(
            jnp.where(covered[None, None, :], NEG_PAD, gmax), axis=(1, 2)
        )
    with jax.named_scope("tile_scoring"):
        scores = fused_mol_scores_tiles(
            q_comp.astype(q_dtype), qp, sel_tiles,
            ft.item_comp_t, ft.item_partial_t, weights, temperature,
            block_x=block_x,
            comp_scale=ft.comp_scale, partial_scale=ft.partial_scale,
        )                                      # (B, T*block_x)
    cols = (
        sel_tiles[:, None].astype(jnp.int32) * block_x
        + jnp.arange(block_x, dtype=jnp.int32)[None, :]
    ).reshape(-1)                              # (T*block_x,)
    valid = (
        jnp.broadcast_to(sel_first[:, None], (t, block_x)).reshape(-1)
        & (cols < ft.num_items)
    )
    ids_flat = state.item_ids[jnp.minimum(cols, ft.num_items - 1)]
    scores = jnp.where(valid[None, :], scores, NEG_DUP)
    scores = _mask_pad_rows(scores, ids_flat)
    with jax.named_scope("final_topk"):
        top_scores, pos = chunked_top_k(scores, min(k, scores.shape[1]))
    res = TopKResult(scores=top_scores, ids=ids_flat[pos])
    if not certified:
        return res
    return res, _certificate(
        bound, res.scores[:, -1], margin, _table_dtype(state)
    )


def mips_brute_force_top_k(
    item_ids: jnp.ndarray,                    # (X,)
    item_embeddings: jnp.ndarray,             # (X, D)
    query_embeddings: jnp.ndarray,            # (B, D)
    k: int,
) -> TopKResult:
    """`MIPSBruteForceTopK` (`mips_top_k.py:24-81`)."""
    scores = jnp.einsum(
        "bd,xd->bx", query_embeddings, item_embeddings,
        preferred_element_type=jnp.float32,
    )
    scores = _mask_pad_rows(scores, item_ids)
    top_scores, top_idx = chunked_top_k(scores, k)
    return TopKResult(scores=top_scores, ids=item_ids[top_idx])


# --------------------------------------------------------------------- #
# Approximate algorithms: candidate generation + exact rerank.
# --------------------------------------------------------------------- #

# Streamed Naive candidate generation scans the corpus axis in chunks of this
# size: peak memory is one (B, P_X, chunk) fp32 similarity block per query
# group instead of the reference's (or a one-shot einsum's) full-corpus
# tensor. Below this size the one-shot per-group einsum is used.
_NAIVE_CORPUS_CHUNK = 131_072


def _inv_m_major_perm(p_q: int, p_x: int):
    """Rows of the kernel's m-major `item_partial_t` back in the model's
    n-major logit order (inverse of `m_major_perm`)."""
    import numpy as np

    return np.asarray(
        [m * p_q + n for n in range(p_q) for m in range(p_x)], dtype=np.int32
    )


def _gathered_candidate_tables(
    state: MoLTopKState, idx: jnp.ndarray       # (B, K) corpus positions
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-query candidate tables ((B, K, P_X, d_P), (B, K, L)) gathered from
    whichever layout the state holds — the standard (X, P_X, d_P) component
    table, or the fused kernel layout ((P_X, d_P, Xp) / m-major (L, Xp))
    when the state was built `fused_only`."""
    it = state.item_tables
    if it.component_embeddings.shape[0] > 0:
        comp = jnp.take(it.component_embeddings, idx, axis=0)
        gp = (
            jnp.take(it.gating_partial, idx, axis=0)
            if it.gating_partial is not None else None
        )
        return comp, gp
    ft = state.fused_tables
    assert ft is not None, "state holds neither standard nor fused tables"
    if ft.item_comp_t.shape[2] > _CHUNK_MAX_X:
        raw = _streamed_fused_column_gather(ft, idx)
    else:
        raw = _direct_fused_column_gather(ft, idx)
    return _finalize_gathered(ft, *raw)


def _direct_fused_column_gather(ft, idx: jnp.ndarray):
    """Minor-axis column takes from kernel-layout tables — fine below the
    streaming threshold (XLA's gather relayout copy is table-sized)."""
    comp_g = jnp.take(ft.item_comp_t, idx, axis=2)        # (m, d, B, K)
    gp_g = jnp.take(ft.item_partial_t, idx, axis=1)       # (L, B, K)
    cs_g = ps_g = None
    if ft.comp_scale is not None:
        cs_g = jnp.take(ft.comp_scale, idx, axis=1)       # (m, B, K)
        ps_g = jnp.take(ft.partial_scale[0], idx, axis=0)  # (B, K)
    return comp_g, gp_g, cs_g, ps_g


def _finalize_gathered(ft, comp_g, gp_g, cs_g, ps_g):
    """Kernel-layout gathered columns -> per-query candidate tables
    ((B, K, P_X, d_P), (B, K, L)), dequantized when the tables are int8."""
    comp = jnp.transpose(comp_g, (2, 3, 0, 1))            # (B, K, m, d)
    p_x = ft.item_comp_t.shape[0]
    l = ft.item_partial_t.shape[0]
    inv = _inv_m_major_perm(l // p_x, p_x)
    # Row-permute AFTER the column gather: permuting first
    # (`item_partial_t[inv]`) materializes a full (L, Xp) copy of the
    # table per call — 512 MB at 8M items — where the gathered (L, B*K)
    # block is a few MB.
    gp = jnp.transpose(gp_g[inv], (1, 2, 0))
    if cs_g is not None:
        # int8 tables: dequantize the gathered candidates (tiny — (B, K)).
        cs = jnp.transpose(cs_g, (1, 2, 0))
        comp = comp.astype(jnp.float32) * cs[..., None]        # (B,K,P_X,d_P)
        gp = gp.astype(jnp.float32) * ps_g[..., None]
    return comp, gp


def _streamed_fused_column_gather(ft, idx: jnp.ndarray):
    """Column gather from kernel-layout tables via a corpus-chunk scan.

    A direct `jnp.take(item_comp_t, idx, axis=2)` gathers along the LANE
    (minor-most) dimension, and XLA relayouts the whole operand to make
    those columns contiguous — a loop-invariant full-table copy (7.63 GB
    at 8M items) that it hoists out of any surrounding loop and that
    pushed every candidate-rerank method past the HBM line at 8M
    (compile-time buffer-assignment OOM; r5 AOT repro, /tmp/repro8m.py
    pattern). Streaming the corpus axis keeps each relayout chunk-local:
    peak extra HBM is one (m, d, chunk) slice + the gathered output, and
    total traffic is one full table read — the same order as the rerank
    that follows. Out-of-chunk indices clip and lose the `where`, so every
    candidate is filled from exactly the one chunk that contains it."""
    m, d, xp = ft.item_comp_t.shape
    b, k = idx.shape
    chunk = min(_CHUNK_MAX_X, xp)
    num_chunks = -(-xp // chunk)
    starts = jnp.minimum(
        jnp.arange(num_chunks, dtype=jnp.int32) * chunk, xp - chunk
    )
    flat = idx.reshape(-1)
    quant = ft.comp_scale is not None
    acc = (
        jnp.zeros((m, d, b * k), ft.item_comp_t.dtype),
        jnp.zeros((ft.item_partial_t.shape[0], b * k),
                  ft.item_partial_t.dtype),
        jnp.zeros((m, b * k), jnp.float32) if quant else jnp.int32(0),
        jnp.zeros((b * k,), jnp.float32) if quant else jnp.int32(0),
    )

    def body(carry, start):
        comp_a, gp_a, cs_a, ps_a = carry
        loc = flat - start
        inb = (loc >= 0) & (loc < chunk)
        li = jnp.clip(loc, 0, chunk - 1)
        sl = jax.lax.dynamic_slice_in_dim(ft.item_comp_t, start, chunk, 2)
        # The barrier pins the chunk as a materialized value: without it
        # XLA folds gather(dynamic_slice(T)) back into gather(T) and
        # re-hoists the full-table relayout this scan exists to avoid.
        sl = jax.lax.optimization_barrier(sl)
        comp_a = jnp.where(inb[None, None], jnp.take(sl, li, axis=2), comp_a)
        gsl = jax.lax.optimization_barrier(
            jax.lax.dynamic_slice_in_dim(ft.item_partial_t, start, chunk, 1)
        )
        gp_a = jnp.where(inb[None], jnp.take(gsl, li, axis=1), gp_a)
        if quant:
            csl = jax.lax.optimization_barrier(
                jax.lax.dynamic_slice_in_dim(ft.comp_scale, start, chunk, 1)
            )
            cs_a = jnp.where(inb[None], jnp.take(csl, li, axis=1), cs_a)
            psl = jax.lax.optimization_barrier(
                jax.lax.dynamic_slice_in_dim(
                    ft.partial_scale[0], start, chunk, 0
                )
            )
            ps_a = jnp.where(inb, jnp.take(psl, li, axis=0), ps_a)
        return (comp_a, gp_a, cs_a, ps_a), None

    (comp_a, gp_a, cs_a, ps_a), _ = jax.lax.scan(body, acc, starts)
    comp_g = comp_a.reshape(m, d, b, k)
    gp_g = gp_a.reshape(-1, b, k)
    if quant:
        return comp_g, gp_g, cs_a.reshape(m, b, k), ps_a.reshape(b, k)
    return comp_g, gp_g, None, None


def dedup_rerank_top_k(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,
    candidate_indices: jnp.ndarray,            # (B, C) corpus positions
    k: int,
    user_ids: Optional[jnp.ndarray],
    cand_chunk: Optional[int] = None,
    is_first: Optional[jnp.ndarray] = None,
) -> TopKResult:
    """Sort candidates, mask duplicates, exact-MoL rerank, final top-k.

    Reference: the shared tail of Naive/Comb (`mol_top_k.py:257-293`).

    With `cand_chunk`, candidate pools larger than the chunk rerank
    through a `lax.scan` over candidate chunks (per-chunk top-k + merge —
    exact, same argument as `chunked_top_k`), so the gathered tables peak
    at (B, cand_chunk, P_X, d_P) regardless of the probe budget. The
    duplicate mask is computed once over the globally sorted pool, so
    chunking never double-counts across boundaries.

    `is_first` given: `candidate_indices` is taken as-is (the caller
    already deduplicated — exactly one True per distinct REAL candidate;
    False entries score NEG_DUP). Skips the per-item sort, which at
    tile-expanded pools (mol_tile_top_k: tens of thousands of columns)
    would cost more than the rerank itself.
    """
    if is_first is not None:
        sorted_idx = candidate_indices
    else:
        sorted_idx = jnp.sort(candidate_indices, axis=1)
        is_first = jnp.concatenate(
            [
                jnp.ones_like(sorted_idx[:, :1], dtype=bool),
                sorted_idx[:, 1:] != sorted_idx[:, :-1],
            ],
            axis=1,
        )
    b, c = sorted_idx.shape
    if cand_chunk is None or c <= cand_chunk:
        comp, gp = _gathered_candidate_tables(state, sorted_idx)
        scores = model.apply(
            params, query_embeddings, comp, gp, user_ids=user_ids,
            method=model.score_gathered,
        )                                      # (B, C)
        scores = jnp.where(is_first, scores, NEG_DUP)
        scores = _mask_pad_rows(scores, state.item_ids[sorted_idx])
        kk = min(k, c)
        top_scores, pos = jax.lax.top_k(scores, kk)
        top_idx = jnp.take_along_axis(sorted_idx, pos, axis=1)
        return TopKResult(scores=top_scores, ids=state.item_ids[top_idx])

    # Chunked rerank: pad with duplicates of the last (sorted) candidate,
    # flagged not-first so they are masked like any other duplicate.
    nc = -(-c // cand_chunk)
    pad = nc * cand_chunk - c
    if pad:
        sorted_idx = jnp.concatenate(
            [sorted_idx, jnp.broadcast_to(sorted_idx[:, -1:], (b, pad))], axis=1
        )
        is_first = jnp.concatenate(
            [is_first, jnp.zeros((b, pad), bool)], axis=1
        )
    idx_blocks = jnp.moveaxis(
        sorted_idx.reshape(b, nc, cand_chunk), 1, 0
    )                                          # (nc, B, chunk)
    first_blocks = jnp.moveaxis(is_first.reshape(b, nc, cand_chunk), 1, 0)
    kk = min(k, cand_chunk)

    ft = state.fused_tables
    pregather = (
        state.item_tables.component_embeddings.shape[0] == 0
        and ft is not None
        and ft.item_comp_t.shape[2] > _CHUNK_MAX_X
    )
    raw_blocks = ()
    if pregather:
        # Fused-only huge corpus: gather ALL candidate columns in ONE
        # streamed table pass, then scan the rerank over slices of the
        # gathered (kernel-dtype) arrays. Gathering inside the rerank
        # scan instead re-reads the full table per candidate chunk AND
        # (measured in the r5 AOT repro) lets XLA hoist the full-table
        # lane-relayout copy out of the nested loop — the 8M compile OOM.
        # Dequantization stays per-chunk so int8 pools never materialize
        # a full (B, C, P_X, d_P) f32 tensor.
        comp_g, gp_g, cs_g, ps_g = _streamed_fused_column_gather(
            ft, sorted_idx
        )
        nil = jnp.zeros((nc,), jnp.int32)
        raw_blocks = (
            jnp.moveaxis(comp_g.reshape(*comp_g.shape[:3], nc, cand_chunk),
                         3, 0),                  # (nc, m, d, B, chunk)
            jnp.moveaxis(gp_g.reshape(gp_g.shape[0], b, nc, cand_chunk),
                         2, 0),                  # (nc, L, B, chunk)
            jnp.moveaxis(cs_g.reshape(cs_g.shape[0], b, nc, cand_chunk),
                         2, 0) if cs_g is not None else nil,
            jnp.moveaxis(ps_g.reshape(b, nc, cand_chunk), 1, 0)
            if ps_g is not None else nil,
        )

    def body(carry, inp):
        idx_c, first_c = inp[0], inp[1]
        if pregather:
            comp_c, gp_c, cs_c, ps_c = inp[2:]
            quant = ft.comp_scale is not None
            comp, gp = _finalize_gathered(
                ft, comp_c, gp_c,
                cs_c if quant else None, ps_c if quant else None,
            )
        else:
            comp, gp = _gathered_candidate_tables(state, idx_c)
        scores = model.apply(
            params, query_embeddings, comp, gp, user_ids=user_ids,
            method=model.score_gathered,
        )
        scores = jnp.where(first_c, scores, NEG_DUP)
        scores = _mask_pad_rows(scores, state.item_ids[idx_c])
        v, pos = jax.lax.top_k(scores, kk)
        return carry, (v, jnp.take_along_axis(idx_c, pos, axis=1))

    _, (vs, is_) = jax.lax.scan(
        body, None, (idx_blocks, first_blocks) + raw_blocks
    )
    v_all = jnp.moveaxis(vs, 0, 1).reshape(b, nc * kk)
    i_all = jnp.moveaxis(is_, 0, 1).reshape(b, nc * kk)
    top_scores, pos = jax.lax.top_k(v_all, min(k, nc * kk))
    top_idx = jnp.take_along_axis(i_all, pos, axis=1)
    return TopKResult(scores=top_scores, ids=state.item_ids[top_idx])


# Backwards-compatible internal alias (Naive/Comb tail).
_dedup_rerank_top_k = dedup_rerank_top_k


def _component_chunk(
    state: MoLTopKState, start: jnp.ndarray, size: int
) -> jnp.ndarray:
    """(size, P_X, d_P) component-table slice from either layout
    (int8 fused tables dequantize per chunk)."""
    it = state.item_tables.component_embeddings
    if it.shape[0] > 0:
        return jax.lax.dynamic_slice_in_dim(it, start, size, axis=0)
    ft = state.fused_tables
    sl = jax.lax.dynamic_slice_in_dim(ft.item_comp_t, start, size, axis=2)
    out = jnp.transpose(sl, (2, 0, 1))
    if ft.comp_scale is not None:
        cs = jax.lax.dynamic_slice_in_dim(ft.comp_scale, start, size, axis=1)
        out = out.astype(jnp.float32) * cs.T[:, :, None]
    return out


def _chunk_component_sims(
    state: MoLTopKState, q_comp: jnp.ndarray, start: int, size: int
) -> jnp.ndarray:
    """(B, P_Q, P_X, size) per-component similarities of one corpus chunk
    (STATIC start), computed in the resident table's NATIVE layout.

    `start` must be a Python int: a `lax.scan` over DYNAMIC slice starts
    makes XLA hoist a loop-invariant X-major relayout copy of the whole
    table out of the loop — 7.63 GB at 8M items, a compile-time
    buffer-assignment OOM with the tables resident (r5 on-chip repro;
    neither the `lax.dot` spelling nor avoiding transposes prevents the
    hoist). Static slices leave XLA no loop to hoist out of, and every
    chunk is read ONCE for all P_Q query groups. int8 scales fold into the
    sims afterwards (linear in the contraction, so bit-equivalent)."""
    b, p_q, d = q_comp.shape
    it = state.item_tables.component_embeddings
    if it.shape[0] > 0:
        comp_c = jax.lax.slice_in_dim(it, start, start + size, axis=0)
        return jnp.einsum(
            "bnd,cmd->bnmc", q_comp, comp_c,
            preferred_element_type=jnp.float32,
        )
    ft = state.fused_tables
    sl = jax.lax.slice_in_dim(ft.item_comp_t, start, start + size, axis=2)
    if sl.dtype == jnp.int8:
        sl = sl.astype(jnp.bfloat16)
    # Per-component (B*P_Q, d) @ (d, C) dots: the rhs contracting dim lands
    # on sublanes and the item dim on lanes — the table's NATIVE layout.
    p_x = sl.shape[0]
    q_flat = q_comp.reshape(b * p_q, d).astype(sl.dtype)
    sims = jnp.stack(
        [
            jax.lax.dot(q_flat, sl[m], preferred_element_type=jnp.float32)
            for m in range(p_x)
        ],
        axis=1,
    ).reshape(b, p_q, p_x, size)
    if ft.comp_scale is not None:
        cs = jax.lax.slice_in_dim(ft.comp_scale, start, start + size, axis=1)
        sims = sims * cs[None, None]           # (..., m, C) * (1, 1, m, C)
    return sims


def _naive_candidates(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,
    k_per_group: int,
    user_ids: Optional[jnp.ndarray],
    corpus_chunk: int = _NAIVE_CORPUS_CHUNK,
    return_bound: bool = False,
):
    """Per-(query-group, item-group) dot-product top-k_per_group union.

    Reference: `MoLNaiveTopK.forward` non-FAISS branch (`mol_top_k.py:241-257`)
    — which streams one (B*P_X, X) matmul per query group. Here each query
    group materializes at most a (B, P_X, min(X, corpus_chunk)) block:
    corpora beyond `corpus_chunk` stream through a `lax.scan` over corpus
    chunks with per-chunk top-k + a cross-chunk merge (exact — per-chunk
    winners cover every possible global winner). Works against standard and
    `fused_only` (kernel-layout) states.

    Returns (B, P_Q * P_X * k_per_group) corpus positions. The per-group
    budget is clamped to the corpus size.

    `return_bound=True` additionally returns a (B,) upper bound on the MoL
    score of any item OUTSIDE the union: an unseen item sits below every
    group's k_per_group-th prefilter value t_l, so its logits_l <= t_l/T
    for all l, and (softmax mixture) score <= max_l t_l / T.
    """
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )                                          # (B, P_Q, d_P)
    it = state.item_tables.component_embeddings
    has_std = it.shape[0] > 0
    if not has_std:
        assert state.fused_tables is not None, (
            "state holds neither standard nor fused component tables"
        )
    table_dtype = it.dtype if has_std else state.fused_tables.item_comp_t.dtype
    if table_dtype == jnp.int8:
        table_dtype = jnp.float32    # int8 chunks dequantize to f32
    q_comp = q_comp.astype(table_dtype)
    b, p_q, _ = q_comp.shape
    x = state.item_ids.shape[0]
    full_cover = k_per_group >= x
    k_per_group = min(k_per_group, x)

    def _maybe(cands, thresholds):
        if not return_bound:
            return cands
        if full_cover:
            # Every item is in every group list: nothing is unexamined.
            return cands, jnp.full((b,), NEG_PAD, jnp.float32)
        # Lazy: only bounded (certified) calls need a MoL temperature —
        # uncertified calls also serve cfg-less test models.
        inv_t = 1.0 / float(_mol_cfg(model).temperature)
        return cands, jnp.max(thresholds, axis=1) * inv_t

    if x <= corpus_chunk:
        if has_std:
            comp = it
        else:
            ft = state.fused_tables
            comp = jnp.transpose(ft.item_comp_t, (2, 0, 1))[:x]
            if ft.comp_scale is not None:
                comp = comp.astype(jnp.float32) * ft.comp_scale.T[:x, :, None]
        outs = []
        ts = []
        for n in range(p_q):
            sims = jnp.einsum(
                "bd,xmd->bmx", q_comp[:, n], comp,
                preferred_element_type=jnp.float32,
            )                                  # (B, P_X, X)
            sims = _mask_pad_rows(sims, state.item_ids)
            v, idx = jax.lax.top_k(sims, k_per_group)
            outs.append(idx.reshape(b, -1))
            ts.append(v[:, :, -1])             # per-group k-th value (B, P_X)
        return _maybe(
            jnp.concatenate(outs, axis=1), jnp.concatenate(ts, axis=1)
        )

    # Streamed path: STATIC chunk walk with the FINAL chunk's start clamped
    # back so it stays in bounds (same copy-free tail handling as
    # `ivf.kmeans`) — no padded copy of the multi-GB table is ever
    # materialized (a `jnp.pad` here doubled peak HBM in exactly the
    # huge-corpus regime this path exists for). Rows of the clamped chunk
    # that a previous chunk already covered are masked out, so every corpus
    # row is scored in exactly ONE chunk and the merged per-group top-k
    # stays exact (a duplicated winner would otherwise occupy two merge
    # slots and could crowd out the k-th distinct one). The walk unrolls in
    # Python rather than `lax.scan`: dynamic in-loop slice starts made XLA
    # hoist a full-table relayout copy (see `_chunk_component_sims`).
    num_chunks = -(-x // corpus_chunk)
    kk = min(k_per_group, corpus_chunk)
    per_chunk_v = []
    per_chunk_i = []
    # `q_chain` threads a scheduling dependency from each chunk's top_k back
    # into the NEXT chunk's matmul. Without it XLA batches all unrolled
    # matmuls ahead of the sorts and keeps every chunk's (B, P_Q, P_X, C)
    # f32 sims buffer live at once — 62 x 512 MB = 31.5 GB at 8M items
    # (the measured r5 frontier OOM); the barrier serializes the chunks so
    # the buffers are reused and peak transient HBM is one chunk's worth.
    q_chain = q_comp
    for ci in range(num_chunks):
        start_nom = ci * corpus_chunk
        start = min(start_nom, x - corpus_chunk)
        ids_c = jax.lax.slice_in_dim(
            state.item_ids, start, start + corpus_chunk
        )
        col_ok = ids_c != 0
        if start != start_nom:                 # clamped tail: mask re-covered
            col_ok = col_ok & (
                jnp.arange(corpus_chunk, dtype=jnp.int32)
                >= (start_nom - start)
            )
        sims = _chunk_component_sims(
            state, q_chain, start, corpus_chunk
        )                                      # (B, P_Q, P_X, C)
        sims = jnp.where(col_ok[None, None, None, :], sims, NEG_PAD)
        v, i = jax.lax.top_k(sims, kk)         # (B, P_Q, P_X, kk)
        per_chunk_v.append(v.reshape(b, -1, kk))
        per_chunk_i.append((i + start).reshape(b, -1, kk))
        q_chain = jax.lax.optimization_barrier((q_comp, v))[0]
    v_all = jnp.concatenate(per_chunk_v, axis=2)   # (B, P_Q*P_X, nc*kk)
    i_all = jnp.concatenate(per_chunk_i, axis=2)
    vv, pos = jax.lax.top_k(v_all, k_per_group)
    idx = jnp.take_along_axis(i_all, pos, axis=2)
    return _maybe(
        idx.reshape(b, -1),                    # group-major, as the small path
        vv[:, :, -1],                          # merged per-group k-th value
    )


def mol_naive_top_k(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,
    k: int,
    k_per_group: int,
    user_ids: Optional[jnp.ndarray] = None,
    corpus_chunk: int = _NAIVE_CORPUS_CHUNK,
    certified: bool = False,
    margin: Optional[float] = None,
):
    """`certified=True` additionally returns a `TopKCertificate`: every
    non-candidate item's MoL score is bounded by max_l t_l / T where t_l is
    group l's k_per_group-th prefilter value (see `_naive_candidates`), so
    `ub_unexamined <= kth_score` proves the result exact."""
    out = _naive_candidates(
        model, params, state, query_embeddings, k_per_group, user_ids,
        corpus_chunk=corpus_chunk, return_bound=certified,
    )
    cands, bound = out if certified else (out, None)
    res = _dedup_rerank_top_k(
        model, params, state, query_embeddings, cands, k, user_ids
    )
    if not certified:
        return res
    return res, _certificate(bound, res.scores[:, -1], margin, _table_dtype(state))


def mol_avg_top_k(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,
    k: int,
    avg_top_k: int,
    user_ids: Optional[jnp.ndarray] = None,
) -> TopKResult:
    """Average-embedding MIPS prefilter + exact rerank
    (`MoLAvgTopK.forward`, `mol_top_k.py:328-396`). The four
    `jax.named_scope` phases mirror the reference's torch.profiler
    `record_function` scopes (`mol_top_k.py:350-371`) for trace tooling.
    The prefilter budget is clamped to the corpus size. Works against
    standard and `fused_only` states (the avg table is kept in both; the
    rerank gathers candidates from whichever layout is present).
    """
    avg_top_k = min(avg_top_k, state.item_ids.shape[0])
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )                                          # (B, P_Q, d_P)
    with jax.named_scope("avg_top_k_scoring"):
        q_avg = q_comp.sum(axis=1)             # sum, not mean (`mol_top_k.py:352`)
        avg_scores = jnp.einsum(
            "bd,xd->bx", q_avg.astype(state.avg_component.dtype),
            state.avg_component, preferred_element_type=jnp.float32,
        )
        avg_scores = _mask_pad_rows(avg_scores, state.item_ids)
    with jax.named_scope("avg_topk_selection"):
        # chunked_top_k routes multi-M-row corpora through the hierarchical
        # exact select — the same select the exact fused path uses; a plain
        # lax.top_k here carried an ~80 ms-class full-row sort at X=4M that
        # the exact arm no longer pays (r4 frontier asymmetry).
        _, cand = chunked_top_k(avg_scores, avg_top_k)   # (B, avg_top_k)
    with jax.named_scope("filtered_scoring"):
        comp, gp = _gathered_candidate_tables(state, cand)
        scores = model.apply(
            params, query_embeddings, comp, gp, user_ids=user_ids,
            method=model.score_gathered,
        )
        scores = _mask_pad_rows(scores, state.item_ids[cand])
    with jax.named_scope("final_topk"):
        kk = min(k, avg_top_k)
        top_scores, pos = jax.lax.top_k(scores, kk)
        top_idx = jnp.take_along_axis(cand, pos, axis=1)
    return TopKResult(scores=top_scores, ids=state.item_ids[top_idx])


def mol_comb_top_k(
    model, params, state: MoLTopKState,
    query_embeddings: jnp.ndarray,
    k: int,
    avg_top_k: int,
    k_per_group: int,
    user_ids: Optional[jnp.ndarray] = None,
    corpus_chunk: int = _NAIVE_CORPUS_CHUNK,
    certified: bool = False,
    margin: Optional[float] = None,
):
    """Union of Naive per-group and Avg candidates, one rerank
    (`MoLCombTopK.forward`, `mol_top_k.py:467-551`). Budgets clamp to the
    corpus size. Works against standard and `fused_only` states.

    `certified=True` returns (result, `TopKCertificate`): the Naive bound
    (max_l t_l / T over the per-group thresholds) still dominates every
    item outside the union — the Avg candidates only ADD coverage."""
    avg_top_k = min(avg_top_k, state.item_ids.shape[0])
    out = _naive_candidates(
        model, params, state, query_embeddings, k_per_group, user_ids,
        corpus_chunk=corpus_chunk, return_bound=certified,
    )
    naive, bound = out if certified else (out, None)
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )
    q_avg = q_comp.sum(axis=1)
    avg_scores = jnp.einsum(
        "bd,xd->bx", q_avg.astype(state.avg_component.dtype), state.avg_component,
        preferred_element_type=jnp.float32,
    )
    avg_scores = _mask_pad_rows(avg_scores, state.item_ids)
    _, avg_cand = chunked_top_k(avg_scores, avg_top_k)
    cands = jnp.concatenate([naive, avg_cand], axis=1)
    res = _dedup_rerank_top_k(
        model, params, state, query_embeddings, cands, k, user_ids
    )
    if not certified:
        return res
    return res, _certificate(bound, res.scores[:, -1], margin, _table_dtype(state))
