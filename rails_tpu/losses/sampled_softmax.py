"""Sampled-softmax autoregressive loss, dense-masked TPU formulation.

Reference: `/root/reference/modeling/sequential/losses/sampled_softmax.py:30-195`.

The reference converts [B, N] supervision to jagged [N'] via fbgemm and scores
positives + R sampled negatives through the model's similarity function. Here
all positions stay dense [B, N-1] and invalid positions carry zero supervision
weight — the weighted mean and the aux losses (which thread the same weights
into the MoL module) are numerically identical to the jagged computation.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from rails_tpu.data.features import SequentialFeatures
from rails_tpu.losses.samplers import (
    InBatchNegativesSampler,
    LocalNegativesSampler,
    maybe_l2_norm,
)
from rails_tpu.models.preprocessors import length_mask

AuxLosses = Dict[str, jnp.ndarray]


def _fused_negative_logits(
    model, q, user_ids_flat, w_flat, sampled_neg_embeddings
):
    """Shared-negative MoL scores through the fused Pallas train kernel.

    The query/item component MLPs, gating partials, and their dropouts run
    in XLA (tiny: M query rows + R item rows); the (M, R, L/H) gating
    pipeline — the training-memory hot spot — runs fwd+bwd in VMEM
    (`rails_tpu/ops/pallas/mol_loss_train.py`). The aux losses of this call
    were already discarded on the XLA path (the reference takes aux from
    the positives pass only, `losses/sampled_softmax.py:66-78`)."""
    from rails_tpu.ops.pallas.mol_loss_train import make_fused_mol_loss
    from rails_tpu.ops.pallas.mol_scoring import MoLKernelWeights

    sim = model.similarity
    c = model.cfg.mol
    q_comp, _ = sim.query_components(
        q, user_ids=user_ids_flat, train=True, weights=w_flat
    )
    qp = sim.query_gating_partial(q)                       # (M, L)
    i_comp = sim.item_components(sampled_neg_embeddings, train=True)
    ip = sim.item_gating_partial(sampled_neg_embeddings, train=True)
    gq = sim.gating_qi.variables["params"]
    weights = MoLKernelWeights(
        w1=gq["hidden"]["kernel"],
        b1=gq["hidden"]["bias"][None, :],
        w2=gq["out"]["kernel"],
        b2=gq["out"]["bias"][None, :],
    )
    if c.softmax_dropout_rate > 0.0 or c.gating_qi_dropout_rate > 0.0:
        seed = jax.random.randint(
            model.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
            dtype=jnp.int32,
        )
    else:
        # No dropout → the hash stream is inert; don't require a "dropout"
        # rng the XLA path wouldn't have consumed either (flax Dropout
        # short-circuits at rate 0).
        seed = jnp.int32(0)
    fused = make_fused_mol_loss(
        p_q=c.query_dot_product_groups,
        p_x=c.item_dot_product_groups,
        temperature=c.temperature,
        softmax_dropout_rate=c.softmax_dropout_rate,
        qi_dropout_rate=c.gating_qi_dropout_rate,
        eps=c.eps,
    )
    dtype = i_comp.dtype
    return fused(
        q_comp.astype(dtype), qp.astype(dtype), i_comp,
        ip.astype(dtype), weights, seed,
    )


def sampled_softmax_loss(
    model,                                   # bound SequentialRecommender
    features: SequentialFeatures,            # target already scattered at [len]
    sampler,                                 # LocalNegativesSampler | InBatchNegativesSampler
    num_negatives: int,
    softmax_temperature: float,
    train: bool = True,
    activation_checkpoint: bool = False,
    checkpoint_chunks: int = 4,
    shared_negatives: bool = False,
) -> Tuple[jnp.ndarray, AuxLosses]:
    """Returns (scalar loss, aux losses).

    Mirrors `SampledSoftmaxLoss.jagged_forward`
    (`losses/sampled_softmax.py:46-89`) with dense masking:
      - queries: encoder outputs at positions [0, N-2]
      - supervision: ids/embeddings at positions [1, N-1]
      - weights: 1 where supervised (position < length and id != 0)
      - accidental negatives (sampled id == positive id) masked to -5e4.

    `shared_negatives=True` draws ONE set of R negatives per batch instead of
    per position (local sampler only). The reference samples per position
    (`jagged_forward`, `:62-66`), which makes the (M, R, D) negative
    embedding gather + item-side MoL MLPs the training-throughput hot spot;
    sharing negatives across the batch reduces that to (R, D) and routes
    MoL through its shared-corpus einsum. Estimator bias is the standard
    sampled-softmax batch-sharing trade-off; A/B quality on your task before
    enabling (see docs/STATUS.md).
    """
    ids = features.ids
    b, n = ids.shape
    d = model.cfg.train.item_embedding_dim

    input_embeddings = model.get_item_embeddings(ids)             # (B, N, D)
    seq_embeddings = model.encode_sequence(features, train=train)  # (B, N, D)

    output_embeddings = seq_embeddings[:, :-1, :]                  # queries
    supervision_ids = ids[:, 1:]                                   # (B, N-1)
    supervision_embeddings = input_embeddings[:, 1:, :]
    # ar_mask (`train.py:422`) AND jagged validity (position < length).
    weights = (
        (supervision_ids != 0) & length_mask(features.lengths, n - 1)
    ).astype(jnp.float32)                                          # (B, N-1)

    m = b * (n - 1)
    q = output_embeddings.reshape(m, d)
    w_flat = weights.reshape(m)
    sup_ids_flat = supervision_ids.reshape(m)
    user_ids_flat = jnp.repeat(features.user_ids, n - 1)           # (M,)

    rng = model.make_rng("sampler")
    if isinstance(sampler, LocalNegativesSampler):
        if shared_negatives:
            sampled_ids = sampler.sample(rng, (num_negatives,))     # (R,)
            sampled_neg_embeddings = maybe_l2_norm(
                model.get_item_embeddings(sampled_ids), sampler.l2_norm,
                sampler.l2_norm_eps,
            )                                                       # (R, D)
        else:
            sampled_ids = sampler.sample(rng, (m, num_negatives))
            sampled_neg_embeddings = maybe_l2_norm(
                model.get_item_embeddings(sampled_ids), sampler.l2_norm,
                sampler.l2_norm_eps,
            )
    elif isinstance(sampler, InBatchNegativesSampler):
        if shared_negatives:
            import logging

            # Trace-time warning (not silent): batch-sharing is implemented
            # for the local sampler only; the in-batch sampler keeps the
            # reference's per-position draw (`autoregressive_losses.py:
            # 123-201`), so this run does NOT get the shared-negatives
            # throughput shape.
            logging.getLogger("rails_tpu").warning(
                "train.shared_negatives=True has no effect with the "
                "in-batch sampler; sampling per position"
            )
        # `process_batch` over the full (target-scattered) sequence ids with
        # the tied item table (`train.py:411-418`), then draw from the
        # deduped pool. The embeddings are the already-gathered
        # input_embeddings (same ids) — no second full (B*N, D) gather.
        flat_ids = ids.reshape(-1)
        state = sampler.process_batch(
            ids=flat_ids,
            presences=flat_ids != 0,
            embeddings=input_embeddings.reshape(b * n, d),
        )
        sampled_ids, sampled_neg_embeddings = sampler.sample(
            state, rng, (m, num_negatives)
        )
    else:
        raise TypeError(f"Unknown sampler {type(sampler)}")
    pos_embeddings = maybe_l2_norm(
        supervision_embeddings.reshape(m, d), sampler.l2_norm,
        sampler.l2_norm_eps,
    )

    positive_logits, aux_losses = model.similarity_fn(
        q,                                   # (M, D)
        pos_embeddings[:, None, :],          # (M, 1, D)
        user_ids=user_ids_flat,
        train=train,
        weights=w_flat,
    )
    positive_logits = positive_logits / softmax_temperature        # (M, 1)

    fused_ok = (
        train
        and shared_negatives
        and getattr(model.cfg.train, "fused_mol_loss", False)
        and model.cfg.similarity_type == "MoL"
        and model.cfg.mol.gating_combination_type == "glu_silu"
        and model.cfg.mol.gating_query_fn
        and model.cfg.mol.gating_item_fn
        and model.cfg.mol.gating_qi_hidden_dim > 0
        and isinstance(sampler, LocalNegativesSampler)
    )
    if fused_ok:
        negative_logits = _fused_negative_logits(
            model, q, user_ids_flat, w_flat, sampled_neg_embeddings
        )
    elif activation_checkpoint and train:
        # Rematerialized, chunked negatives scoring: the (M, R, L) logits and
        # (M, R, H) gating hidden activations are the training-memory hot
        # spot; remat recomputes them per chunk in the backward pass instead
        # of storing them. The aux losses come from the positives call only
        # (as in the reference, `losses/sampled_softmax.py:66-78`), so
        # discarding the negatives' aux here changes nothing.
        # Reference flag: `activation_checkpoint`
        # (`losses/sampled_softmax.py:37,172-177`).
        from flax import linen as nn

        def _score_neg(mdl, q_c, neg_emb_c, uid_c):
            out, _ = mdl.similarity_fn(
                q_c, neg_emb_c, user_ids=uid_c, train=True
            )
            return out

        score_neg = nn.remat(_score_neg)
        chunk = -(-m // checkpoint_chunks)
        parts = []
        for s in range(0, m, chunk):
            e = min(s + chunk, m)
            neg_c = (
                sampled_neg_embeddings[None]
                if sampled_neg_embeddings.ndim == 2
                else sampled_neg_embeddings[s:e]
            )
            parts.append(
                score_neg(model, q[s:e], neg_c, user_ids_flat[s:e])
            )
        negative_logits = jnp.concatenate(parts, axis=0)
    else:
        negative_logits, _ = model.similarity_fn(
            q,
            # (M, R, D) per-position, or (1, R, D) shared (the similarity's
            # shared-corpus einsum path).
            (
                sampled_neg_embeddings[None]
                if sampled_neg_embeddings.ndim == 2
                else sampled_neg_embeddings
            ),
            user_ids=user_ids_flat,
            train=train,
            weights=w_flat,
        )
    negative_logits = jnp.where(
        sup_ids_flat[:, None] == sampled_ids,
        -5e4,
        negative_logits / softmax_temperature,
    )                                                              # (M, R)

    all_logits = jnp.concatenate([positive_logits, negative_logits], axis=1)
    per_position = -jax.nn.log_softmax(all_logits, axis=1)[:, 0]   # (M,)
    loss = jnp.sum(per_position * w_flat) / jnp.maximum(jnp.sum(w_flat), 1e-12)
    return loss, aux_losses


def get_weighted_loss(
    main_loss: jnp.ndarray,
    aux_losses: AuxLosses,
    weights: Dict[str, float],
) -> jnp.ndarray:
    """`get_weighted_loss` (`/root/reference/train.py:95-105`)."""
    total = main_loss
    for key, weight in weights.items():
        total = total + aux_losses[key] * weight
    return total
