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


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kmeanspp_init(
    data: jnp.ndarray, nlist: int, key, sample_factor: int = 16
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
    pos = (
        jax.random.choice(k0, x, shape=(s,), replace=False) if s < x
        else jnp.arange(x)
    )
    sample = data[pos].astype(jnp.float32)

    @jax.jit
    def init(sample, k1, k2):
        first = sample[jax.random.randint(k1, (), 0, s)]
        seeds = jnp.zeros((nlist, d), jnp.float32).at[0].set(first)
        mind = jnp.sum((sample - first[None, :]) ** 2, axis=1)
        gumbel = jax.random.gumbel(k2, (nlist, s))

        def body(i, carry):
            seeds, mind = carry
            j = jnp.argmax(jnp.log(mind + 1e-30) + gumbel[i])
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
) -> jnp.ndarray:
    """L2 Lloyd's k-means, fully on device; returns (nlist, d) fp32 centroids.

    Assignment streams the corpus in `chunk`-row blocks through a
    `lax.scan`: per block one (C, d) x (d, nlist) MXU matmul picks the
    nearest centroid (argmin ||x-c||^2 == argmax x.c - ||c||^2/2) and a
    one-hot einsum accumulates per-cluster sums/counts. Empty clusters
    keep their previous centroid (FAISS does the same).
    """
    x, d = data.shape
    nlist = min(nlist, x)
    key = jax.random.PRNGKey(seed)
    centroids = _kmeanspp_init(data, nlist, key)

    xp = _round_up(x, chunk)
    padded = jnp.pad(data.astype(jnp.float32), ((0, xp - x), (0, 0)))
    valid = (jnp.arange(xp) < x).astype(jnp.float32)
    blocks = padded.reshape(xp // chunk, chunk, d)
    vblocks = valid.reshape(xp // chunk, chunk)

    @jax.jit
    def step(cent):
        half_norm = 0.5 * jnp.sum(cent * cent, axis=1)          # (nlist,)

        def body(carry, inp):
            sums, counts = carry
            blk, vld = inp
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
            (blocks, vblocks),
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
        donor_of = donors[erank % nlist]
        stolen = new[donor_of] * (1.0 + eps)
        shrink = jnp.where(empty, 1.0 - eps, 1.0)
        new = new.at[donor_of].multiply(shrink[:, None])
        return jnp.where(empty[:, None], stolen, new)

    for _ in range(num_iters):
        centroids = step(centroids)
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
    def block_choices(blk):
        half_norm = 0.5 * jnp.sum(centroids * centroids, axis=1)
        sims = blk.astype(jnp.float32) @ centroids.T - half_norm[None, :]
        v, i = jax.lax.top_k(sims, r)
        return v, i.astype(jnp.int32)

    out_c = np.empty((x, r), np.int32)
    out_v = np.empty((x, r), np.float32)
    for start in range(0, x, chunk):
        end = min(start + chunk, x)
        v, i = block_choices(data[start:end])
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


def build_ivf_index(
    avg_component: jnp.ndarray,  # (X, d_P) — MoLTopKState.avg_component
    item_ids: jnp.ndarray,       # (X,) int32 — pad rows (id 0) are excluded
    nlist: int,
    num_iters: int = 10,
    cap_factor: float = 2.0,
    num_choices: int = 4,
    seed: int = 0,
    chunk: int = 65_536,
) -> IVFIndex:
    """Train k-means + build balanced inverted lists for a corpus state.

    The index keys on the summed-component embedding — the same reduction
    `MoLAvgTopK` prefilters with (`mol_top_k.py:352`) — so one index
    serves the whole MoL, rather than the reference's P_Q x P_X per-group
    FAISS indexes (whose per-group probes multiply on TPU for no recall
    benefit at equal total budget; see the recall study in docs/STATUS.md).

    Corpus pad rows (item id 0, appended by `pad_and_shard_state` /
    fused-layout padding) are excluded from clustering and from the
    lists entirely, so probing never surfaces them.
    """
    ids_np = np.asarray(item_ids)
    real = np.nonzero(ids_np != 0)[0].astype(np.int32)
    x = int(real.size)
    assert x > 0, "empty corpus"
    data = jnp.asarray(np.asarray(avg_component)[real])
    nlist = min(nlist, x)

    centroids = kmeans(data, nlist, num_iters=num_iters, seed=seed, chunk=chunk)
    nlist = int(centroids.shape[0])
    cap = max(1, int(np.ceil(cap_factor * x / nlist)))
    cap = _round_up(cap, 8)
    choices, sims = assign_choices(data, centroids, num_choices, chunk=chunk)
    _, buckets, overflow_local = _balanced_fill(choices, sims, nlist, cap)

    # Local (real-row) positions back to corpus positions.
    buckets = real[buckets]
    overflow = real[overflow_local] if overflow_local.size else overflow_local
    o_pad = _round_up(max(int(overflow.size), 0), 8) if overflow.size else 0
    overflow_padded = np.zeros((o_pad,), np.int32)
    overflow_padded[: overflow.size] = overflow
    return IVFIndex(
        centroids=jnp.asarray(centroids),
        buckets=jnp.asarray(buckets),
        overflow=jnp.asarray(overflow_padded),
    )


def ivf_candidates(
    model, params, ivf: IVFIndex,
    query_embeddings: jnp.ndarray,            # (B, D)
    nprobe: int,
    user_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """(B, nprobe*cap + O) corpus positions from the nprobe nearest lists."""
    nprobe = min(nprobe, ivf.centroids.shape[0])
    q_comp = model.apply(
        params, query_embeddings, user_ids, method=model.query_components
    )                                          # (B, P_Q, d_P)
    q_avg = q_comp.sum(axis=1).astype(jnp.float32)   # `mol_top_k.py:352` sum
    cscores = q_avg @ ivf.centroids.T                 # (B, nlist)
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
    return tk.dedup_rerank_top_k(
        model, params, state, query_embeddings, cand, k, user_ids,
        cand_chunk=cand_chunk,
    )
