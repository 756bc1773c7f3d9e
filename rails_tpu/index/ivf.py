"""TPU-native IVF (inverted-file) approximate top-k over a MoL corpus.

This is the framework's replacement for the reference's FAISS IVFFlat GPU
indexes (`/root/reference/rails/indexing/mol_top_k.py:176-201,227-240`:
per-component-group `faiss.GpuIndexIVFFlat`, nlist=100, fp16 storage,
inner-product metric). A CUDA ANN library has no TPU port, and a direct
translation would fight XLA; the TPU-native shape of the same idea is:

  - **k-means on device**: Lloyd's iterations entirely in jit — chunked
    (C, d) x (d, nlist) assignment matmuls on the MXU plus a one-hot
    einsum for the per-cluster sums (the same scatter-free binning trick
    the fused-training kernels use for the time-bucket-table gradient;
    `segment_sum` lowers to a ~30x slower scatter on TPU).
  - **Statically-shaped inverted lists**: FAISS's ragged lists become a
    dense (nlist, cap) bucket matrix so the probe-and-gather is one
    XLA gather with no dynamic shapes. Balance is enforced at build time
    (host-side vectorized spill, items keep their nearest cluster that
    has room among their top-R choices; the rare fully-spilled remainder
    lands in an always-probed overflow list) — so `cap` is ~2x the mean
    occupancy instead of the unbalanced max, bounding per-query work.
  - **Exact MoL rerank**: probed candidates go through the same
    gather + `score_gathered` + dedup tail as Naive/Avg/Comb
    (`top_k.py:_dedup_rerank_top_k`), chunked over the candidate axis so
    large probe budgets never materialize a (B, C, P_X, d_P) tensor.

Quantization matches the corpus state's table dtype (bf16 by default —
the TPU analogue of the reference's fp16 IVFFlat storage); the rerank is
exact MoL, so like the reference's two-pass design the only approximation
is the candidate set itself.

Invariants (tested):
  - every corpus position appears exactly once across buckets + overflow;
  - probing all clusters reproduces brute force exactly (score parity);
  - empty bucket slots point at position 0 — a real, exactly-scored item
    that the dedup mask collapses, so no validity masks are needed on the
    query path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


class IVFIndex(NamedTuple):
    """Device-resident inverted-file index over corpus positions.

    `buckets[c]` holds the corpus positions assigned to cluster c; slots
    beyond the cluster's fill point at position 0 (see module docstring).
    `overflow` holds the (rare) positions that spilled past every one of
    their top-R cluster choices; it is appended to every query's candidate
    set, preserving the exactly-once coverage invariant.
    """

    centroids: jnp.ndarray   # (nlist, d) fp32
    buckets: jnp.ndarray     # (nlist, cap) int32 corpus positions
    overflow: jnp.ndarray    # (O,) int32 corpus positions (O may be 0)
    # MoL-aware probe ranking (optional): per-cluster means of the MEMBER
    # items' component embeddings / gating partials (n-major logit order).
    # When present, `ivf_candidates` ranks probes by the EXACT MoL score of
    # each cluster's centroid tables — gating included — instead of the
    # avg-embedding dot product, which is blind to the trained gating and
    # capped recall at 0.46 on overlapping clusters (docs/STATUS.md r4).
    comp_centroids: Optional[jnp.ndarray] = None    # (nlist, P_X, d_P) f32
    gating_centroids: Optional[jnp.ndarray] = None  # (nlist, L) f32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kmeanspp_init(
    data: jnp.ndarray, nlist: int, key, sample_factor: int = 16,
    valid: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """k-means++ seeding on a subsample, fully in-jit.

    Plain random seeding reliably merges well-separated clusters (two
    seeds land in one mode and Lloyd's never recovers); k-means++ fixes
    that. The classic sequential algorithm runs here as one `fori_loop` —
    each step adds the distance-to-newest-seed column and samples the
    next seed proportional to D^2 via the Gumbel-argmax trick — so the
    whole init is a single compiled program, O(S*d) per step on a
    subsample of S = sample_factor*nlist rows.
    """
    x, d = data.shape
    s = min(x, max(sample_factor * nlist, 1024))
    k0, k1, k2 = jax.random.split(key, 3)
    if valid is not None:
        p = valid.astype(jnp.float32)
        pos = jax.random.choice(
            k0, x, shape=(s,), replace=s >= int(jnp.sum(p)), p=p / jnp.sum(p)
        )
    elif s < x:
        pos = jax.random.choice(k0, x, shape=(s,), replace=False)
    else:
        pos = jnp.arange(x)
    sample = data[pos].astype(jnp.float32)

    @jax.jit
    def init(sample, k1, k2):
        first = sample[jax.random.randint(k1, (), 0, s)]
        seeds = jnp.zeros((nlist, d), jnp.float32).at[0].set(first)
        mind = jnp.sum((sample - first[None, :]) ** 2, axis=1)

        def body(i, carry):
            seeds, mind = carry
            gumbel = jax.random.gumbel(jax.random.fold_in(k2, i), (s,))
            j = jnp.argmax(jnp.log(mind + 1e-30) + gumbel)
            c = sample[j]
            seeds = seeds.at[i].set(c)
            mind = jnp.minimum(mind, jnp.sum((sample - c[None, :]) ** 2, axis=1))
            return seeds, mind

        seeds, _ = jax.lax.fori_loop(1, nlist, body, (seeds, mind))
        return seeds

    return init(sample, k1, k2)


def kmeans(
    data: jnp.ndarray,           # (X, d) any float dtype
    nlist: int,
    num_iters: int = 10,
    seed: int = 0,
    chunk: int = 65_536,
    valid: Optional[jnp.ndarray] = None,   # (X,) bool; None = all valid
) -> jnp.ndarray:
    """L2 Lloyd's k-means, fully on device; returns (nlist, d) fp32 centroids.

    Assignment streams the corpus in `chunk`-row blocks through a
    `lax.scan`: per block one (C, d) x (d, nlist) MXU matmul picks the
    nearest centroid (argmin ||x-c||^2 == argmax x.c - ||c||^2/2) and a
    one-hot einsum accumulates per-cluster sums/counts. Empty clusters
    keep their previous centroid (FAISS does the same). `valid=False`
    rows (e.g. corpus pad rows) are excluded from the statistics; no
    gathered real-rows-only copy is ever made, so huge device- or
    host-resident tables stream through unchanged.
    """
    x, d = data.shape
    nlist = min(nlist, x)
    key = jax.random.PRNGKey(seed)
    centroids = _kmeanspp_init(jnp.asarray(data), nlist, key, valid=valid)

    chunk = min(chunk, x)
    num_chunks = -(-x // chunk)
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    data_dev = jnp.asarray(data)
    use_valid = valid is not None
    # Passed as a jit ARGUMENT, never closed over: a closed-over multi-GB
    # table becomes a captured compile-time constant, which both bloats the
    # executable and (on the axon tunnel) breaks remote compilation outright.
    vvec = (
        valid.astype(jnp.float32) if use_valid
        else jnp.zeros((1,), jnp.float32)
    )

    @jax.jit
    def step(cent, table, vv):
        half_norm = 0.5 * jnp.sum(cent * cent, axis=1)          # (nlist,)

        def body(carry, start):
            sums, counts = carry
            # Clamped slice: the final chunk re-covers the tail; rows whose
            # global index precedes `start` are masked so nothing double
            # counts. No padded copy of the (possibly multi-GB) table.
            blk = jax.lax.dynamic_slice_in_dim(
                table, start, chunk
            ).astype(jnp.float32)
            cs = jnp.minimum(start, x - chunk)
            rows = cs + jnp.arange(chunk)
            vld = (rows >= start).astype(jnp.float32)
            if use_valid:
                vld = vld * jax.lax.dynamic_slice_in_dim(vv, start, chunk)
            sims = blk @ cent.T - half_norm[None, :]             # (C, nlist)
            assign = jnp.argmax(sims, axis=1)
            onehot = (
                (assign[:, None] == jnp.arange(nlist)[None, :])
                .astype(jnp.float32) * vld[:, None]
            )
            sums = sums + jnp.einsum(
                "cn,cd->nd", onehot, blk, preferred_element_type=jnp.float32
            )
            counts = counts + onehot.sum(axis=0)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            body,
            (jnp.zeros((nlist, d), jnp.float32), jnp.zeros((nlist,), jnp.float32)),
            starts,
        )
        new = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts, 1.0)[:, None], cent
        )
        # Empty-cluster handling (FAISS's split heuristic): the i-th empty
        # cluster steals the i-th largest cluster's centroid, with the pair
        # perturbed by (1 +/- eps) so the donor's points split between them
        # on the next iteration.
        empty = counts == 0
        eps = jnp.float32(1.0 / 1024.0)
        donors = jnp.argsort(-counts)
        erank = jnp.cumsum(empty.astype(jnp.int32)) - 1
        # Cycle donors over the NON-EMPTY clusters only (the first
        # `num_nonempty` entries of the count-sorted order): with more empty
        # than non-empty clusters, `erank % nlist` would make empty clusters
        # "steal" other empty clusters' stale centroids — a no-op that
        # stalls recovery to one real re-seed per iteration.
        num_nonempty = jnp.maximum(jnp.sum(~empty).astype(jnp.int32), 1)
        donor_of = donors[erank % num_nonempty]
        stolen = new[donor_of] * (1.0 + eps)
        shrink = jnp.where(empty, 1.0 - eps, 1.0)
        new = new.at[donor_of].multiply(shrink[:, None])
        return jnp.where(empty[:, None], stolen, new)

    for _ in range(num_iters):
        centroids = step(centroids, data_dev, vvec)
    return centroids


def assign_choices(
    data: jnp.ndarray,           # (X, d)
    centroids: jnp.ndarray,      # (nlist, d) fp32
    num_choices: int,
    chunk: int = 65_536,
) -> Tuple[np.ndarray, np.ndarray]:
    """Top-`num_choices` nearest clusters per item (host numpy results).

    Returns (choices (X, R) int32 ranked nearest-first, sims (X, R) fp32
    of the matching -L2/2-shifted inner products, used to give closer
    items priority during the balanced fill).
    """
    x, d = data.shape
    nlist = centroids.shape[0]
    r = min(num_choices, nlist)

    @jax.jit
    def block_choices(blk, cent):
        half_norm = 0.5 * jnp.sum(cent * cent, axis=1)
        sims = blk.astype(jnp.float32) @ cent.T - half_norm[None, :]
        v, i = jax.lax.top_k(sims, r)
        return v, i.astype(jnp.int32)

    out_c = np.empty((x, r), np.int32)
    out_v = np.empty((x, r), np.float32)
    cent_dev = jnp.asarray(centroids)
    for start in range(0, x, chunk):
        end = min(start + chunk, x)
        v, i = block_choices(jnp.asarray(data[start:end]), cent_dev)
        out_v[start:end] = np.asarray(v)
        out_c[start:end] = np.asarray(i)
    return out_c, out_v


def _balanced_fill(
    choices: np.ndarray,         # (X, R) ranked cluster ids
    sims: np.ndarray,            # (X, R) matching similarities
    nlist: int,
    cap: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Assign each item to its best-ranked cluster with remaining space.

    Vectorized rounds over the choice rank: within a round, closer items
    (higher similarity) win contested slots. Returns (bucket_of (X,)
    int32 with -1 for overflow, buckets (nlist, cap) int32 position
    matrix padded with 0, overflow positions (O,) int32).
    """
    x, r = choices.shape
    bucket_of = np.full(x, -1, np.int32)
    space = np.full(nlist, cap, np.int64)
    remaining = np.ones(x, bool)
    for rank in range(r):
        idx = np.nonzero(remaining)[0]
        if idx.size == 0:
            break
        c = choices[idx, rank].astype(np.int64)
        order = np.lexsort((-sims[idx, rank], c))    # cluster-major, closest first
        cs = c[order]
        first = np.searchsorted(cs, np.arange(nlist))
        within = np.arange(cs.size) - first[cs]
        ok = within < space[cs]
        chosen = idx[order[ok]]
        bucket_of[chosen] = cs[ok].astype(np.int32)
        space -= np.bincount(cs[ok], minlength=nlist)
        remaining[chosen] = False

    assigned = np.nonzero(bucket_of >= 0)[0]
    b = bucket_of[assigned].astype(np.int64)
    order = np.argsort(b, kind="stable")
    bs = b[order]
    pos = assigned[order]
    first = np.searchsorted(bs, np.arange(nlist))
    within = np.arange(bs.size) - first[bs]
    buckets = np.zeros((nlist, cap), np.int32)
    buckets[bs, within] = pos
    overflow = np.nonzero(remaining)[0].astype(np.int32)
    return bucket_of, buckets, overflow


def _mol_cluster_means(
    state, assign_full: np.ndarray, nlist: int, chunk: int = 65_536
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Per-cluster means of member items' component / gating tables.

    `assign_full` is (X,) int32 cluster ids with -1 for excluded rows
    (pad rows, overflow items). Streams the corpus in chunks from
    whichever layout the state holds — contiguous `dynamic_slice`s, so
    fused kernel-layout tables are read WITHOUT the X-major relayout copy
    a scattered gather would force (`fused_mol_scores_tiles` docstring) —
    and bins rows with `segment_sum` (a scatter: slow per element but run
    ONCE at build time). int8 tables dequantize per chunk; m-major fused
    gating rows return in the model's n-major order."""
    it = state.item_tables
    ft = state.fused_tables
    standard = it.component_embeddings.shape[0] > 0
    if standard:
        x = it.component_embeddings.shape[0]
        p_x, d_p = it.component_embeddings.shape[1:]
        l = (
            it.gating_partial.shape[1]
            if it.gating_partial is not None else 0
        )
    else:
        assert ft is not None, "state holds neither standard nor fused tables"
        p_x, d_p, x = ft.item_comp_t.shape
        l = ft.item_partial_t.shape[0]
    chunk = min(chunk, x)
    num_chunks = -(-x // chunk)
    starts = jnp.arange(num_chunks, dtype=jnp.int32) * chunk
    assign_dev = jnp.asarray(
        np.pad(assign_full, (0, x - assign_full.shape[0]),
               constant_values=-1).astype(jnp.int32)
    )

    @jax.jit
    def sums(assign, tables):
        def chunk_arrays(start):
            cs = jnp.minimum(start, x - chunk)
            if standard:
                comp = jax.lax.dynamic_slice_in_dim(
                    tables.component_embeddings, cs, chunk
                ).astype(jnp.float32).reshape(chunk, p_x * d_p)
                gp = (
                    jax.lax.dynamic_slice_in_dim(
                        tables.gating_partial, cs, chunk
                    ).astype(jnp.float32)
                    if tables.gating_partial is not None else None
                )
            else:
                comp = jax.lax.dynamic_slice(
                    tables.item_comp_t, (0, 0, cs), (p_x, d_p, chunk)
                ).astype(jnp.float32)
                gp = jax.lax.dynamic_slice(
                    tables.item_partial_t, (0, cs), (l, chunk)
                ).astype(jnp.float32)
                if tables.comp_scale is not None:
                    scale = jax.lax.dynamic_slice(
                        tables.comp_scale, (0, cs), (p_x, chunk)
                    )
                    comp = comp * scale[:, None, :]
                    gp = gp * jax.lax.dynamic_slice(
                        tables.partial_scale, (0, cs), (1, chunk)
                    )
                comp = jnp.transpose(comp, (2, 0, 1)).reshape(
                    chunk, p_x * d_p
                )
                gp = gp.T                                     # (chunk, L)
            return cs, comp, gp

        def body(carry, start):
            c_sum, g_sum, cnt = carry
            cs, comp, gp = chunk_arrays(start)
            rows = cs + jnp.arange(chunk)
            a = jax.lax.dynamic_slice_in_dim(assign, cs, chunk)
            # Tail chunks re-cover rows; first occurrence wins via the
            # rows >= start mask. Excluded rows bin into segment nlist.
            a = jnp.where((rows >= start) & (a >= 0), a, nlist)
            c_sum = c_sum + jax.ops.segment_sum(
                comp, a, num_segments=nlist + 1
            )[:nlist]
            if g_sum is not None:
                g_sum = g_sum + jax.ops.segment_sum(
                    gp, a, num_segments=nlist + 1
                )[:nlist]
            cnt = cnt + jax.ops.segment_sum(
                jnp.ones((chunk,), jnp.float32), a, num_segments=nlist + 1
            )[:nlist]
            return (c_sum, g_sum, cnt), None

        init = (
            jnp.zeros((nlist, p_x * d_p), jnp.float32),
            jnp.zeros((nlist, l), jnp.float32) if l else None,
            jnp.zeros((nlist,), jnp.float32),
        )
        (c_sum, g_sum, cnt), _ = jax.lax.scan(body, init, starts)
        denom = jnp.maximum(cnt, 1.0)[:, None]
        return c_sum / denom, (None if g_sum is None else g_sum / denom)

    comp_cent, gating_cent = sums(assign_dev, it if standard else ft)
    comp_cent = comp_cent.reshape(nlist, p_x, d_p)
    if gating_cent is not None and not standard:
        from rails_tpu.index.top_k import _inv_m_major_perm

        gating_cent = gating_cent[:, _inv_m_major_perm(l // p_x, p_x)]
    return comp_cent, gating_cent


def build_ivf_index(
    avg_component: jnp.ndarray,  # (X, d_P) — MoLTopKState.avg_component
    item_ids: jnp.ndarray,       # (X,) int32 — pad rows (id 0) are excluded
    nlist: int,
    num_iters: int = 10,
    cap_factor: float = 2.0,
    num_choices: int = 4,
    seed: int = 0,
    chunk: int = 65_536,
    mol_state=None,              # MoLTopKState: build MoL-aware centroids
    return_cluster_perm: bool = False,
) -> IVFIndex:
    """Train k-means + build balanced inverted lists for a corpus state.

    The index keys on the summed-component embedding — the same reduction
    `MoLAvgTopK` prefilters with (`mol_top_k.py:352`) — so one index
    serves the whole MoL, rather than the reference's P_Q x P_X per-group
    FAISS indexes (whose per-group probes multiply on TPU for no recall
    benefit at equal total budget; see the recall study in docs/STATUS.md).

    Corpus pad rows (item id 0, appended by `pad_and_shard_state` /
    fused-layout padding) are excluded from clustering and from the
    lists entirely, so probing never surfaces them. The big table is
    never gathered host-side: clustering and assignment stream it in
    chunks with a validity mask; only the (X, R) choice arrays come to
    host for the balanced fill.
    """
    ids_np = np.asarray(item_ids)
    real = np.nonzero(ids_np != 0)[0].astype(np.int64)
    x = int(real.size)
    assert x > 0, "empty corpus"
    nlist = min(nlist, x)
    valid = jnp.asarray(ids_np != 0)

    centroids = kmeans(
        avg_component, nlist, num_iters=num_iters, seed=seed, chunk=chunk,
        valid=valid,
    )
    nlist = int(centroids.shape[0])
    cap = max(1, int(np.ceil(cap_factor * x / nlist)))
    cap = _round_up(cap, 8)
    choices, sims = assign_choices(
        avg_component, centroids, num_choices, chunk=chunk
    )
    bucket_of, buckets, overflow_local = _balanced_fill(
        choices[real], sims[real], nlist, cap
    )

    # Local (real-row) positions back to corpus positions.
    buckets = real[buckets].astype(np.int32)
    overflow = (
        real[overflow_local].astype(np.int32)
        if overflow_local.size else overflow_local
    )
    o_pad = _round_up(max(int(overflow.size), 0), 8) if overflow.size else 0
    overflow_padded = np.zeros((o_pad,), np.int32)
    overflow_padded[: overflow.size] = overflow
    comp_cent = gating_cent = None
    if mol_state is not None:
        assign_full = np.full((ids_np.shape[0],), -1, np.int32)
        assign_full[real] = bucket_of        # overflow rows stay -1
        comp_cent, gating_cent = _mol_cluster_means(
            mol_state, assign_full, nlist, chunk=chunk
        )
    index = IVFIndex(
        centroids=jnp.asarray(centroids),
        buckets=jnp.asarray(buckets),
        overflow=jnp.asarray(overflow_padded),
        comp_centroids=comp_cent,
        gating_centroids=gating_cent,
    )
    if not return_cluster_perm:
        return index
    # Cluster-order permutation: new position -> old position, members of
    # the same cluster contiguous (stable in original order within a
    # cluster), then overflow items, then pad rows. Relaying the corpus
    # state out in this order (`top_k.permute_state_items`) makes the
    # tile-granular methods' fixed 256-item blocks cluster-COHERENT, which
    # is what sharpens their per-group block-max bounds: on an arbitrary
    # item order every tile is a diverse sample of the corpus and every
    # block max is near the global max (measured: TileTopK32 recall 0.88 /
    # cert_rate 0 at 4M on the unordered layout, docs/STATUS.md r5).
    xfull = int(ids_np.shape[0])
    order_key = np.full((xfull,), nlist + 1, np.int64)       # pad rows last
    order_key[real] = np.where(bucket_of >= 0, bucket_of, nlist)
    perm = np.lexsort((np.arange(xfull), order_key)).astype(np.int32)
    return index, perm


def ivf_candidates(
    model, params, ivf: IVFIndex,
    query_embeddings: jnp.ndarray,            # (B, D)
    nprobe: int,
    user_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, nprobe*cap + O) corpus positions from the nprobe nearest lists.

    Probe ranking: with MoL-aware centroids (`comp_centroids`), lists rank
    by the EXACT MoL score of each cluster's mean member tables — the
    trained gating decides which clusters matter for THIS query, which the
    avg-embedding dot product cannot see (it capped recall at 0.46 on the
    4M frontier, docs/STATUS.md r4). nlist is ~4*sqrt(X), so full MoL
    scoring of the centroids costs ~1/2000 of a brute-force pass."""
    nprobe = min(nprobe, ivf.centroids.shape[0])
    if ivf.comp_centroids is not None:
        from rails_tpu.similarity.mol import MoLItemTables

        cscores = model.apply(
            params, query_embeddings,
            MoLItemTables(
                component_embeddings=ivf.comp_centroids,
                gating_partial=ivf.gating_centroids,
            ),
            user_ids=user_ids, method=model.score_precomputed,
        )                                         # (B, nlist)
    else:
        q_comp = model.apply(
            params, query_embeddings, user_ids, method=model.query_components
        )                                          # (B, P_Q, d_P)
        q_avg = q_comp.sum(axis=1).astype(jnp.float32)  # `mol_top_k.py:352`
        cscores = q_avg @ ivf.centroids.T                # (B, nlist)
    _, probe = jax.lax.top_k(cscores, nprobe)         # (B, nprobe)
    cand = jnp.take(ivf.buckets, probe, axis=0)       # (B, nprobe, cap)
    b = cand.shape[0]
    cand = cand.reshape(b, -1)
    if ivf.overflow.shape[0]:
        cand = jnp.concatenate(
            [cand, jnp.broadcast_to(ivf.overflow[None, :], (b, ivf.overflow.shape[0]))],
            axis=1,
        )
    return cand


def mol_ivf_top_k(
    model, params, state,                      # MoLTopKState (with .ivf set)
    query_embeddings: jnp.ndarray,             # (B, D)
    k: int,
    nprobe: int,
    user_ids: Optional[jnp.ndarray] = None,
    cand_chunk: int = 8192,
    pool_budget_bytes: int = 2 << 30,
):
    """IVF probe + exact-MoL rerank (the TPU IVFFlat two-pass).

    Candidate generation probes the `nprobe` nearest inverted lists; the
    rerank is the shared exact-MoL dedup tail, chunked so the gathered
    candidate tables never exceed (B, cand_chunk, P_X, d_P).
    """
    from rails_tpu.index import top_k as tk

    ivf = state.ivf
    assert ivf is not None, (
        "MoLTopKState.ivf is not set; call build_ivf_index(...) and attach "
        "it via state._replace(ivf=...)"
    )
    cand = ivf_candidates(
        model, params, ivf, query_embeddings, nprobe, user_ids=user_ids
    )
    # Large-probe pools next to multi-GB fused tables must not pregather
    # the whole (B, C) candidate pool at once: at 8M items / nprobe=128
    # the gathered columns are ~6 GB beside 8.7 GB of tables (the measured
    # r5 frontier OOM). Split the rerank over query sub-batches, chained
    # with an optimization_barrier so XLA cannot overlap the sub-pools.
    b, c = cand.shape
    ft = state.fused_tables
    splits = 1
    if ft is not None:
        m, d, _ = ft.item_comp_t.shape
        l = ft.item_partial_t.shape[0] if ft.item_partial_t is not None else 0
        per_bc = m * d * ft.item_comp_t.dtype.itemsize + 4 * (l + m + 1)
        pool_bytes = b * c * per_bc
        budget = pool_budget_bytes
        while (
            splits < b and b % (splits * 2) == 0
            and pool_bytes // splits > budget
        ):
            splits *= 2
    if splits == 1:
        return tk.dedup_rerank_top_k(
            model, params, state, query_embeddings, cand, k, user_ids,
            cand_chunk=cand_chunk,
        )
    rows = b // splits
    outs = []
    q_chain = query_embeddings
    for s in range(0, b, rows):
        qe = jax.lax.slice_in_dim(q_chain, s, s + rows, axis=0)
        uid = (
            jax.lax.slice_in_dim(user_ids, s, s + rows, axis=0)
            if user_ids is not None else None
        )
        cand_s = jax.lax.slice_in_dim(cand, s, s + rows, axis=0)
        r = tk.dedup_rerank_top_k(
            model, params, state, qe, cand_s, k, uid, cand_chunk=cand_chunk,
        )
        outs.append(r)
        q_chain = jax.lax.optimization_barrier(
            (query_embeddings, r.scores)
        )[0]
    return tk.TopKResult(
        scores=jnp.concatenate([r.scores for r in outs], axis=0),
        ids=jnp.concatenate([r.ids for r in outs], axis=0),
    )


def build_sharded_ivf(
    state,                        # UNsharded MoLTopKState (host or device)
    num_shards: int,
    fused_block_x: int = 256,
    nlist: int = 1024,
    num_iters: int = 10,
    cap_factor: float = 2.0,
    num_choices: int = 4,
    seed: int = 0,
    chunk: int = 65_536,
) -> IVFIndex:
    """Per-shard IVF indexes, stacked on a leading shard axis.

    Each item shard gets its own index over its LOCAL corpus slice (the
    contiguous block `pad_and_shard_state` will place on that device),
    with bucket entries holding shard-local positions. The stacked
    (S, nlist, cap) / (S, nlist, d) / (S, O) arrays shard along axis 0
    with the item axis, so inside `shard_map` every device sees exactly
    its own index (leading dim 1). Caps and overflow lengths are unified
    to the max across shards (pad slots point at local position 0 — the
    harmless-extra-candidate convention, see `IVFIndex`).

    Sharded recall semantics match the other approximate algorithms
    (`sharded.py` module docstring): each shard probes `nprobe` of its
    own lists, so total probed lists = S * nprobe.
    """
    s = num_shards
    x = state.item_ids.shape[0]
    unit = s * fused_block_x if state.fused_tables is not None else s
    xp = x + ((-x) % unit)
    per = xp // s
    if s == 1:
        # Single shard: index the corpus in place (no host round-trip of
        # the avg table — it may be a multi-GB device array behind a
        # remote tunnel).
        ivf = build_ivf_index(
            state.avg_component, state.item_ids, nlist=nlist,
            num_iters=num_iters, cap_factor=cap_factor,
            num_choices=num_choices, seed=seed, chunk=chunk,
            mol_state=state,
        )
        return IVFIndex(
            centroids=ivf.centroids[None], buckets=ivf.buckets[None],
            overflow=ivf.overflow[None],
            comp_centroids=(
                None if ivf.comp_centroids is None
                else ivf.comp_centroids[None]
            ),
            gating_centroids=(
                None if ivf.gating_centroids is None
                else ivf.gating_centroids[None]
            ),
        )
    ids_np = np.zeros((xp,), np.int32)
    ids_np[:x] = np.asarray(state.item_ids)
    avg = state.avg_component                     # (X_orig, d) host or device

    parts = []
    for si in range(s):
        lo, hi = si * per, (si + 1) * per
        ids_l = ids_np[lo:hi]
        hi_data = min(hi, avg.shape[0])
        avg_l = np.zeros((per, avg.shape[1]), np.asarray(avg[:1]).dtype)
        if hi_data > lo:
            avg_l[: hi_data - lo] = np.asarray(avg[lo:hi_data])
        if (ids_l != 0).any():
            parts.append(
                build_ivf_index(
                    jnp.asarray(avg_l), jnp.asarray(ids_l), nlist=nlist,
                    num_iters=num_iters, cap_factor=cap_factor,
                    num_choices=num_choices, seed=seed + si, chunk=chunk,
                )
            )
        else:
            d = avg.shape[1]
            parts.append(
                IVFIndex(
                    centroids=jnp.zeros((min(nlist, 1), d), jnp.float32),
                    buckets=jnp.zeros((min(nlist, 1), 8), jnp.int32),
                    overflow=jnp.zeros((0,), jnp.int32),
                )
            )

    nl = max(p.centroids.shape[0] for p in parts)
    cap = max(p.buckets.shape[1] for p in parts)
    o = max(p.overflow.shape[0] for p in parts)

    def _pad_part(p: IVFIndex) -> IVFIndex:
        c = np.zeros((nl, parts[0].centroids.shape[1]), np.float32)
        c[: p.centroids.shape[0]] = np.asarray(p.centroids)
        # Pad centroids with +inf-distance sentinels? A zero centroid is a
        # valid probe target whose bucket is all-position-0 — harmless; but
        # keep it far away so real probes win: leave zeros (scores near 0
        # rank below well-aligned real centroids in practice, and a probed
        # empty bucket only adds dedup-masked position-0 candidates).
        b = np.zeros((nl, cap), np.int32)
        b[: p.buckets.shape[0], : p.buckets.shape[1]] = np.asarray(p.buckets)
        ov = np.zeros((o,), np.int32)
        ov[: p.overflow.shape[0]] = np.asarray(p.overflow)
        return IVFIndex(
            centroids=jnp.asarray(c), buckets=jnp.asarray(b),
            overflow=jnp.asarray(ov),
        )

    padded = [_pad_part(p) for p in parts]
    return IVFIndex(
        centroids=jnp.stack([p.centroids for p in padded]),
        buckets=jnp.stack([p.buckets for p in padded]),
        overflow=jnp.stack([p.overflow for p in padded]),
    )
