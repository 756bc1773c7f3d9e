"""BCE autoregressive losses, dense-masked TPU formulation.

Reference: `BCELoss` / `BCELossWithRatings`
(`/root/reference/modeling/sequential/autoregressive_losses.py:261-480`).
"""

from __future__ import annotations

from typing import Dict, Tuple

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


def _bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Numerically-stable binary cross entropy with logits (optax's
    implementation — one definition to keep correct)."""
    import optax

    return optax.sigmoid_binary_cross_entropy(logits, targets)


def bce_loss(
    model,
    features: SequentialFeatures,
    sampler: LocalNegativesSampler,
    temperature: float = 1.0,
    train: bool = True,
) -> Tuple[jnp.ndarray, AuxLosses]:
    """One positive + one sampled negative per position, BCE on each
    (`autoregressive_losses.py:271-327`). Accidental hits (sampled id ==
    positive id) are removed from the loss weights."""
    ids = features.ids
    b, n = ids.shape
    d = model.cfg.train.item_embedding_dim

    input_embeddings = model.get_item_embeddings(ids)
    seq_embeddings = model.encode_sequence(features, train=train)

    output_embeddings = seq_embeddings[:, :-1, :]
    supervision_ids = ids[:, 1:]
    supervision_embeddings = input_embeddings[:, 1:, :]
    weights = (
        (supervision_ids != 0) & length_mask(features.lengths, n - 1)
    ).astype(jnp.float32)

    m = b * (n - 1)
    q = output_embeddings.reshape(m, d)
    w_flat = weights.reshape(m)
    sup_ids_flat = supervision_ids.reshape(m)
    user_ids_flat = jnp.repeat(features.user_ids, n - 1)

    rng = model.make_rng("sampler")
    if isinstance(sampler, InBatchNegativesSampler):
        flat_ids = ids.reshape(-1)
        state = sampler.process_batch(
            ids=flat_ids,
            presences=flat_ids != 0,
            # The already-gathered input_embeddings cover the same ids — no
            # second full (B*N, D) gather (XLA does not CSE gathers with
            # differently-shaped index operands).
            embeddings=input_embeddings.reshape(b * n, d),
        )
        sampled_ids, sampled_neg_embeddings = sampler.sample(state, rng, (m, 1))
    else:
        sampled_ids = sampler.sample(rng, (m, 1))
        sampled_neg_embeddings = maybe_l2_norm(
            model.get_item_embeddings(sampled_ids), sampler.l2_norm,
            sampler.l2_norm_eps,
        )

    pos_logits, aux = model.similarity_fn(
        q, supervision_embeddings.reshape(m, 1, d),
        user_ids=user_ids_flat, train=train, weights=w_flat,
    )
    pos_logits = pos_logits[:, 0] / temperature
    neg_logits, _ = model.similarity_fn(
        q, sampled_neg_embeddings,
        user_ids=user_ids_flat, train=train, weights=w_flat,
    )
    neg_logits = neg_logits[:, 0] / temperature

    valid_neg = (sup_ids_flat != sampled_ids[:, 0]).astype(jnp.float32)
    loss_weights = w_flat * valid_neg
    per_position = 0.5 * (
        _bce_with_logits(pos_logits, jnp.ones_like(pos_logits))
        + _bce_with_logits(neg_logits, jnp.zeros_like(neg_logits))
    )
    loss = jnp.sum(per_position * loss_weights) / jnp.maximum(
        jnp.sum(loss_weights), 1e-12
    )
    return loss, aux


def bce_loss_with_ratings(
    model,
    features: SequentialFeatures,
    sampler,                              # unused; uniform signature
    temperature: float = 1.0,
    train: bool = True,
) -> Tuple[jnp.ndarray, AuxLosses]:
    """BCE of the positive's logit against its (binarized) rating
    (`autoregressive_losses.py:381-424`)."""
    del sampler
    ids = features.ids
    b, n = ids.shape
    d = model.cfg.train.item_embedding_dim

    input_embeddings = model.get_item_embeddings(ids)
    seq_embeddings = model.encode_sequence(features, train=train)

    output_embeddings = seq_embeddings[:, :-1, :]
    supervision_ids = ids[:, 1:]
    supervision_embeddings = input_embeddings[:, 1:, :]
    supervision_ratings = features.ratings[:, 1:]
    weights = (
        (supervision_ids != 0) & length_mask(features.lengths, n - 1)
    ).astype(jnp.float32)

    m = b * (n - 1)
    q = output_embeddings.reshape(m, d)
    w_flat = weights.reshape(m)
    user_ids_flat = jnp.repeat(features.user_ids, n - 1)

    logits, aux = model.similarity_fn(
        q, supervision_embeddings.reshape(m, 1, d),
        user_ids=user_ids_flat, train=train, weights=w_flat,
    )
    logits = logits[:, 0] / temperature
    targets = supervision_ratings.reshape(m).astype(jnp.float32)
    per_position = _bce_with_logits(logits, targets)
    loss = jnp.sum(per_position * w_flat) / jnp.maximum(jnp.sum(w_flat), 1e-12)
    return loss, aux
