"""Streamed exact-MoL top-k oracle for corpora that exceed HBM-friendly
standard-layout tables.

The exactness reference for every approximate/fused serving path at scale:
scores every corpus item through the plain XLA MoL path (f32 math over the
same bf16 tables the serving path reads) in chunks, merging host-side, so no
full-corpus standard-layout table or (B, X) score row is ever materialized.
Extracted from the shard_bench `--check-against-chunked` verifier so the
recall/frontier studies (`cli/frontier.py`) and the sharded-serving bench
share one oracle. Counterpart of the reference protocol that measures every
approximate algorithm against exact MoL on the same checkpoint
(`/root/reference/eval_from_checkpoint.py:427-449`).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np

from rails_tpu.index.top_k import BUILD_CHUNK


def streamed_exact_top_k(
    model,
    params,
    state_tk,
    q,                                   # (B, D) query embeddings (device)
    user_ids,                            # (B,) or None
    k: int,
    embed_chunk_fn: Optional[Callable] = None,
    item_ids_full=None,                  # (X,) int32 (device or host)
    # MUST equal the build's chunk_size whenever embed_chunk_fn keys noise
    # by chunk start (cli/frontier, cli/shard_bench) — a mismatch silently
    # scores a DIFFERENT corpus than the serving tables (ADVICE r4); callers
    # pass the shared constant explicitly.
    chunk: int = BUILD_CHUNK,
    batch_size: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact top-k (scores, item ids) as host numpy arrays.

    Two table sources:
      - `embed_chunk_fn(start, ids_chunk) -> (C, D)` given: the corpus was
        built chunk-streamed (kernel layout only); each chunk's standard
        tables are REGENERATED from the same per-chunk-keyed embedding
        function the build used — identical bits, streamed.
      - otherwise: the state holds standard-layout tables; slice them
        (same bf16 bits the serving path reads — exact).

    Scoring memory within a chunk is decoupled from the build chunk: the XLA
    MoL path materializes (B, sub, L) logits and (B, sub, H) gating hiddens,
    so scoring sub-chunks to a ~1 GB budget.
    """
    import jax
    import jax.numpy as jnp

    from rails_tpu.similarity.mol import MoLItemTables

    ids_full = state_tk.item_ids if item_ids_full is None else item_ids_full
    x = (
        state_tk.fused_tables.num_items
        if state_tk.fused_tables is not None
        else int(ids_full.shape[0])
    )
    b = int(q.shape[0]) if batch_size is None else batch_size
    m = model.cfg.mol
    bytes_per_item = b * (m.num_logits + max(m.gating_qi_hidden_dim, 0) + 8) * 4 * 2
    sub_chunk = max(4096, min(chunk, (1 << 30) // max(bytes_per_item, 1)))
    sub_chunk = 1 << (sub_chunk.bit_length() - 1)   # divides the 2^18 chunk

    @jax.jit
    def chunk_tables(p, emb):
        t = model.apply(p, emb, method=model.build_item_tables)
        return MoLItemTables(
            component_embeddings=t.component_embeddings.astype(jnp.bfloat16),
            gating_partial=(
                None if t.gating_partial is None
                else t.gating_partial.astype(jnp.bfloat16)
            ),
        )

    @jax.jit
    def score_chunk(p, qq, tables, uids):
        return model.apply(
            p, qq, tables, user_ids=uids, method=model.score_precomputed
        )

    chunked_build = embed_chunk_fn is not None
    best_s = best_i = None
    for s0 in range(0, x, chunk):
        e0 = min(s0 + chunk, x)
        if chunked_build:
            emb_c = embed_chunk_fn(s0, ids_full[s0:e0])
            t_c = chunk_tables(params, emb_c)
        else:
            t_c = MoLItemTables(
                component_embeddings=(
                    state_tk.item_tables.component_embeddings[s0:e0]
                ),
                gating_partial=(
                    None
                    if state_tk.item_tables.gating_partial is None
                    else state_tk.item_tables.gating_partial[s0:e0]
                ),
            )
        for s1 in range(0, e0 - s0, sub_chunk):
            e1 = min(s1 + sub_chunk, e0 - s0)
            t_sub = MoLItemTables(
                component_embeddings=t_c.component_embeddings[s1:e1],
                gating_partial=(
                    None if t_c.gating_partial is None
                    else t_c.gating_partial[s1:e1]
                ),
            )
            sc = np.asarray(score_chunk(params, q, t_sub, user_ids))
            k_loc = min(k, sc.shape[1])
            idx = np.argpartition(-sc, k_loc - 1, axis=1)[:, :k_loc]
            ss = np.take_along_axis(sc, idx, axis=1)
            ii = np.asarray(ids_full[s0 + s1 : s0 + e1])[idx]
            if best_s is None:
                best_s, best_i = ss, ii
            else:
                cs = np.concatenate([best_s, ss], axis=1)
                ci = np.concatenate([best_i, ii], axis=1)
                sel = np.argpartition(-cs, k - 1, axis=1)[:, :k]
                best_s = np.take_along_axis(cs, sel, axis=1)
                best_i = np.take_along_axis(ci, sel, axis=1)
    order = np.argsort(-best_s, axis=1, kind="stable")
    best_s = np.take_along_axis(best_s, order, axis=1)[:, :k]
    best_i = np.take_along_axis(best_i, order, axis=1)[:, :k]
    return best_s, best_i
