"""Mixture-of-Logits (MoL) learned similarity, TPU-native.

Semantics match the reference implementation:
  - component logits + gating + softmax combine:
    `/root/reference/rails/similarities/mol/similarity_fn.py:204-413`
  - query-side component embeddings (MLP + uid hash embeddings):
    `/root/reference/rails/similarities/mol/query_embeddings_fns.py:129-254`
  - item-side component embeddings:
    `/root/reference/rails/similarities/mol/item_embeddings_fns.py:122-183`
  - load-balancing mutual-information aux loss:
    `/root/reference/rails/similarities/mol/similarity_fn.py:49-63`

Design shifts for TPU:
  - pure-functional flax module; dropout threads through linen RNGs;
  - the (B, X, P_Q*P_X) component-logit einsum maps straight onto the MXU
    (`bnd,xmd->bxnm` when the corpus is shared across the batch);
  - item-side tables (component embeddings + item gating partial) can be
    precomputed once per corpus and reused by every query batch — the
    decoupled-inference path used by the top-k index
    (cf. `/root/reference/rails/similarities/mol/similarity_fn.py:270-339`).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.core.config import MoLConfig
from rails_tpu.similarity.layers import (
    GatingPartialMLP,
    ProjMLP,
    l2_normalize,
    xavier_normal,
)

AuxLosses = Dict[str, jnp.ndarray]


def load_balancing_mi_loss(
    gating_prs: jnp.ndarray,
    eps: float,
    weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """-H(mean_pi) + mean(H_example) over (B, X, L) gating probabilities.

    Reference: `_load_balancing_mi_loss_fn`
    (`/root/reference/rails/similarities/mol/similarity_fn.py:49-63`).

    `weights` (B,) masks/weights rows: the reference computes this loss over
    jagged (valid-only) positions; the dense TPU layout includes padded rows,
    which are excluded via zero weight so the value matches exactly.
    """
    b, x, l = gating_prs.shape
    if weights is None:
        flat = gating_prs.reshape(b * x, l)
        denom = b * x
        util = flat.sum(axis=0) / denom
        per_example_entropy = -jnp.sum(flat * jnp.log(flat + eps)) / denom
    else:
        w = weights.astype(gating_prs.dtype)[:, None, None]     # (B, 1, 1)
        denom = jnp.maximum(jnp.sum(weights) * x, 1e-12)
        util = jnp.sum(gating_prs * w, axis=(0, 1)) / denom
        per_example_entropy = (
            -jnp.sum(gating_prs * jnp.log(gating_prs + eps) * w) / denom
        )
    util_entropy = -jnp.sum(util * jnp.log(util + eps))
    return -util_entropy + per_example_entropy


class MoLItemTables(NamedTuple):
    """Precomputed item-side state for decoupled (indexing-time) scoring."""

    component_embeddings: jnp.ndarray          # (X, P_X, d_P)
    gating_partial: Optional[jnp.ndarray]      # (X, L) or None


class MoLSimilarity(nn.Module):
    """similarity(q, x) = sum_p pi_p(q, x) * <q_{p_q}, x_{p_x}> / temperature."""

    cfg: MoLConfig
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        # The glu_silu* combinations multiply query_partial * item_partial
        # (`similarity_fn.py:175-186`) — both gating partials must exist, or
        # tracing dies on a NoneType deep inside init. Only 'none' tolerates
        # disabled partials.
        if c.gating_combination_type in ("glu_silu", "glu_silu_ln"):
            assert c.gating_query_fn and c.gating_item_fn, (
                f"gating_combination_type={c.gating_combination_type!r} "
                "requires gating_query_fn=True and gating_item_fn=True "
                "(use gating_combination_type='none' to drop a partial)"
            )
        d_p = c.dot_product_dimension
        self.query_proj = ProjMLP(
            out_features=c.query_proj_groups * d_p,
            hidden_dim=c.query_hidden_dim,
            dropout_rate=c.query_dropout_rate,
            nonlinearity=c.query_nonlinearity,
            dtype=self.dtype,
            name="query_proj",
        )
        self.item_proj = ProjMLP(
            out_features=c.item_dot_product_groups * d_p,
            hidden_dim=c.item_hidden_dim,
            dropout_rate=c.item_dropout_rate,
            nonlinearity=c.item_nonlinearity,
            dtype=self.dtype,
            name="item_proj",
        )
        # Hashed per-user embedding components appended to the query side
        # (`query_embeddings_fns.py:162-170`; lookup is (uid % hash) + 1 so
        # index 0 — the torch padding row — is never read). Init matches
        # torch.nn.Embedding's DEFAULT N(0, 1) (the reference's xavier
        # applier touches Linear layers only, `similarity_utils.py:34-38`):
        # with dot_product_l2_norm the init scale sets the ratio of the
        # l2-normalizer (and thus the uid-L2 aux loss and gradient scale)
        # at step 0, so a smaller init would diverge training dynamics.
        self.uid_embeddings = [
            nn.Embed(
                hash_size + 1,
                d_p,
                embedding_init=nn.initializers.normal(stddev=1.0),
                dtype=self.dtype,
                name=f"uid_embeddings_{i}",
            )
            for i, hash_size in enumerate(c.uid_embedding_hash_sizes)
        ]
        if c.gating_query_fn:
            self.gating_query = GatingPartialMLP(
                out_features=c.num_logits,
                hidden_dim=c.gating_query_hidden_dim,
                use_output_bias=False,
                dtype=self.dtype,
                name="gating_query",
            )
        else:
            self.gating_query = None
        if c.gating_item_fn:
            self.gating_item = GatingPartialMLP(
                out_features=c.num_logits,
                hidden_dim=c.gating_item_hidden_dim,
                dropout_rate=c.gating_item_dropout_rate,
                use_output_bias=False,
                dtype=self.dtype,
                name="gating_item",
            )
        else:
            self.gating_item = None
        self.gating_qi = GatingPartialMLP(
            out_features=c.num_logits,
            hidden_dim=c.gating_qi_hidden_dim,
            dropout_rate=c.gating_qi_dropout_rate,
            use_output_bias=True,
            dtype=self.dtype,
            name="gating_qi",
        )

    # ------------------------------------------------------------------ #
    # Component embeddings.
    # ------------------------------------------------------------------ #

    def query_components(
        self,
        query_embeddings: jnp.ndarray,            # (B, D)
        user_ids: Optional[jnp.ndarray] = None,   # (B,) int
        train: bool = False,
        weights: Optional[jnp.ndarray] = None,    # (B,) aux-loss row weights
    ) -> Tuple[jnp.ndarray, AuxLosses]:
        """(B, D) -> (B, P_Q, d_P) with uid components appended.

        Reference: `RecoMoLQueryEmbeddingsFn.forward`
        (`query_embeddings_fns.py:175-254`).
        """
        c = self.cfg
        b = query_embeddings.shape[0]
        d_p = c.dot_product_dimension
        comps = self.query_proj(query_embeddings, train=train).reshape(
            b, c.query_proj_groups, d_p
        )
        aux: AuxLosses = {}
        if self.uid_embeddings:
            if user_ids is None:
                raise ValueError(
                    "MoLConfig.uid_embedding_hash_sizes is set; user_ids required."
                )
            uid_comps = []
            for i, (emb, hash_size) in enumerate(
                zip(self.uid_embeddings, c.uid_embedding_hash_sizes)
            ):
                u = emb((user_ids % hash_size) + 1)    # (B, d_P)
                if train:
                    sq = jnp.sum(u * u, axis=-1)
                    if weights is None:
                        l2 = jnp.mean(sq)
                    else:
                        l2 = jnp.sum(sq * weights) / jnp.maximum(
                            jnp.sum(weights), 1e-12
                        )
                    aux["uid_embedding_l2_norm"] = (
                        aux.get("uid_embedding_l2_norm", 0.0) + l2
                    )
                if c.uid_dropout_rate > 0.0 and train:
                    rng = self.make_rng("dropout")
                    if c.uid_embedding_level_dropout:
                        # Drop the entire uid embedding per example.
                        keep = jax.random.bernoulli(
                            rng, 1.0 - c.uid_dropout_rate, u.shape[:-1]
                        )
                        u = u * keep[..., None] / (1.0 - c.uid_dropout_rate)
                    else:
                        keep = jax.random.bernoulli(
                            rng, 1.0 - c.uid_dropout_rate, u.shape
                        )
                        u = jnp.where(keep, u / (1.0 - c.uid_dropout_rate), 0.0)
                uid_comps.append(u[:, None, :])
            comps = jnp.concatenate([comps] + uid_comps, axis=1)
        if c.dot_product_l2_norm:
            comps = l2_normalize(comps, c.eps)
        return comps, aux

    def item_components(
        self,
        item_embeddings: jnp.ndarray,             # (..., D')
        train: bool = False,
    ) -> jnp.ndarray:
        """(..., D') -> (..., P_X, d_P).

        Reference: `RecoMoLItemEmbeddingsFn.forward`
        (`item_embeddings_fns.py:149-183`).
        """
        c = self.cfg
        comps = self.item_proj(item_embeddings, train=train).reshape(
            item_embeddings.shape[:-1] + (c.item_dot_product_groups, c.dot_product_dimension)
        )
        if c.dot_product_l2_norm:
            comps = l2_normalize(comps, c.eps)
        return comps

    def item_gating_partial(
        self, item_embeddings: jnp.ndarray, train: bool = False
    ) -> Optional[jnp.ndarray]:
        """(..., D') -> (..., L) item-only gating input, or None if disabled."""
        if self.gating_item is None:
            return None
        return self.gating_item(item_embeddings, train=train)

    def query_gating_partial(
        self, query_embeddings: jnp.ndarray
    ) -> Optional[jnp.ndarray]:
        """(B, D) -> (B, L) query-only gating input, or None if disabled."""
        if self.gating_query is None:
            return None
        return self.gating_query(query_embeddings, train=False)

    def build_item_tables(self, item_embeddings: jnp.ndarray) -> MoLItemTables:
        """Precompute per-item state for indexing. item_embeddings: (X, D')."""
        return MoLItemTables(
            component_embeddings=self.item_components(item_embeddings, train=False),
            gating_partial=self.item_gating_partial(item_embeddings, train=False),
        )

    # ------------------------------------------------------------------ #
    # Gating + combination.
    # ------------------------------------------------------------------ #

    def _combine(
        self,
        logits: jnp.ndarray,                       # (B, X, L), pre-scaled by 1/T
        query_partial: Optional[jnp.ndarray],      # (B, 1, L)
        item_partial: Optional[jnp.ndarray],       # (1/B, X, L)
        train: bool,
        weights: Optional[jnp.ndarray] = None,     # (B,) aux-loss row weights
    ) -> Tuple[jnp.ndarray, AuxLosses]:
        """Gating-MLP combination + softmax-dropout combiner.

        Reference: `MoLGatingFn.forward` + `SoftmaxDropoutCombiner`
        (`similarity_fn.py:148-201`, `:31-96`).
        """
        c = self.cfg
        qi_partial = self.gating_qi(logits, train=train)   # (B, X, L)
        if c.gating_combination_type == "glu_silu":
            gating_inputs = query_partial * item_partial + qi_partial
            gating_weights = gating_inputs * jax.nn.sigmoid(gating_inputs)
        elif c.gating_combination_type == "glu_silu_ln":
            gating_inputs = query_partial * item_partial + qi_partial
            # Parameter-free layer norm over the logit axis (the reference's
            # `glu_silu_ln` branch at `similarity_fn.py:180-186`, with its
            # broken `normalized_shapes` kwarg fixed).
            mu = jnp.mean(gating_inputs, axis=-1, keepdims=True)
            var = jnp.var(gating_inputs, axis=-1, keepdims=True)
            normed = (gating_inputs - mu) * jax.lax.rsqrt(var + 1e-5)
            gating_weights = gating_inputs * jax.nn.sigmoid(normed)
        elif c.gating_combination_type == "none":
            gating_weights = qi_partial
            if query_partial is not None:
                gating_weights = gating_weights + query_partial
            if item_partial is not None:
                gating_weights = gating_weights + item_partial
        else:
            raise ValueError(
                f"Unknown gating_combination_type {c.gating_combination_type!r}"
            )

        pi = jax.nn.softmax(gating_weights.astype(jnp.float32), axis=-1)
        if train and c.softmax_dropout_rate > 0.0:
            rng = self.make_rng("dropout")
            keep = jax.random.bernoulli(rng, 1.0 - c.softmax_dropout_rate, pi.shape)
            pi = jnp.where(keep, pi / (1.0 - c.softmax_dropout_rate), 0.0)
            pi = pi / jnp.maximum(pi.sum(axis=-1, keepdims=True), c.eps)

        combined = jnp.sum(pi * logits.astype(jnp.float32), axis=-1)
        aux: AuxLosses = {}
        if train:
            aux["mi_loss"] = load_balancing_mi_loss(pi, eps=c.eps, weights=weights)
        return combined, aux

    # ------------------------------------------------------------------ #
    # Full forward.
    # ------------------------------------------------------------------ #

    def __call__(
        self,
        query_embeddings: jnp.ndarray,             # (B, D)
        item_embeddings: jnp.ndarray,              # (1, X, D') or (B, X, D')
        user_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        weights: Optional[jnp.ndarray] = None,     # (B,) aux-loss row weights
    ) -> Tuple[jnp.ndarray, AuxLosses]:
        """Scores (B, X) + aux losses. Reference: `MoLSimilarity.forward`
        (`similarity_fn.py:341-413`)."""
        c = self.cfg
        b = query_embeddings.shape[0]
        b_prime, x = item_embeddings.shape[0], item_embeddings.shape[1]

        q_comp, q_aux = self.query_components(
            query_embeddings, user_ids=user_ids, train=train, weights=weights
        )
        i_comp = self.item_components(item_embeddings, train=train)

        q_comp = q_comp.astype(self.dtype)
        i_comp = i_comp.astype(self.dtype)
        if b_prime == 1:
            logits = jnp.einsum(
                "bnd,xmd->bxnm", q_comp, i_comp[0], preferred_element_type=self.dtype
            )
        else:
            logits = jnp.einsum(
                "bnd,bxmd->bxnm", q_comp, i_comp, preferred_element_type=self.dtype
            )
        logits = logits.reshape(b, x, c.num_logits) / c.temperature

        query_partial = (
            self.gating_query(query_embeddings, train=train)[:, None, :]
            if self.gating_query is not None
            else None
        )
        item_partial = self.item_gating_partial(item_embeddings, train=train)

        scores, gate_aux = self._combine(
            logits, query_partial, item_partial, train, weights=weights
        )
        return scores, {**gate_aux, **q_aux}

    def score_gathered(
        self,
        query_embeddings: jnp.ndarray,             # (B, D) raw encoder output
        component_embeddings: jnp.ndarray,         # (B, K, P_X, d_P)
        gating_partial: Optional[jnp.ndarray],     # (B, K, L) or None
        user_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """Eval-time scoring of pre-gathered per-query candidate tables.

        Like `score_precomputed(..., item_indices=...)` but the caller has
        already gathered the (B, K, ...) candidate tables — used by the
        top-k rerank against fused-layout corpus states whose tables are
        stored transposed (`index/top_k.py`)."""
        c = self.cfg
        q_comp, _ = self.query_components(
            query_embeddings, user_ids=user_ids, train=False
        )
        q_comp = q_comp.astype(self.dtype)
        logits = jnp.einsum(
            "bnd,bxmd->bxnm", q_comp,
            component_embeddings.astype(self.dtype),
            preferred_element_type=self.dtype,
        )
        b, k = component_embeddings.shape[:2]
        logits = logits.reshape(b, k, c.num_logits) / c.temperature
        query_partial = (
            self.gating_query(query_embeddings, train=False)[:, None, :]
            if self.gating_query is not None
            else None
        )
        scores, _ = self._combine(
            logits, query_partial, gating_partial, train=False
        )
        return scores

    def score_precomputed(
        self,
        query_embeddings: jnp.ndarray,             # (B, D) raw encoder output
        item_tables: MoLItemTables,                # tables over (X, ...) items
        user_ids: Optional[jnp.ndarray] = None,
        item_indices: Optional[jnp.ndarray] = None,  # (B, K) per-query candidates
    ) -> jnp.ndarray:
        """Eval-time scoring against precomputed item tables.

        With `item_indices=None` scores the full shared corpus: (B, X).
        With `item_indices` (B, K), scores per-query gathered candidates: (B, K).
        Avoids re-running the item MLP per query batch — the TPU-native
        equivalent of the reference's decoupled-inference accessors.
        """
        c = self.cfg
        q_comp, _ = self.query_components(query_embeddings, user_ids=user_ids, train=False)
        q_comp = q_comp.astype(self.dtype)
        i_comp = item_tables.component_embeddings.astype(self.dtype)
        i_partial = item_tables.gating_partial

        if item_indices is None:
            logits = jnp.einsum(
                "bnd,xmd->bxnm", q_comp, i_comp, preferred_element_type=self.dtype
            )
            n_items = i_comp.shape[0]
            item_partial = i_partial[None] if i_partial is not None else None
        else:
            gathered = jnp.take(i_comp, item_indices, axis=0)  # (B, K, P_X, d_P)
            logits = jnp.einsum(
                "bnd,bxmd->bxnm", q_comp, gathered, preferred_element_type=self.dtype
            )
            n_items = item_indices.shape[1]
            item_partial = (
                jnp.take(i_partial, item_indices, axis=0) if i_partial is not None else None
            )
        b = query_embeddings.shape[0]
        logits = logits.reshape(b, n_items, c.num_logits) / c.temperature

        query_partial = (
            self.gating_query(query_embeddings, train=False)[:, None, :]
            if self.gating_query is not None
            else None
        )
        scores, _ = self._combine(logits, query_partial, item_partial, train=False)
        return scores
