"""Top-level sequential recommender: embedding -> preproc -> encoder stack ->
postproc, with the similarity module owned by the model.

Reference: `SequentialEncoderWithLearnedSimilarityModule`
(`/root/reference/modeling/similarity_module.py:23-61`) plus the `HSTU` /
`SASRec` top modules. The ownership inversion is preserved: the encoder holds
the similarity module, so training and retrieval share MoL weights with zero
conversion (SURVEY.md section 1).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from rails_tpu.core.config import ExperimentConfig
from rails_tpu.data.features import SequentialFeatures
from rails_tpu.models.hstu import HSTUStack
from rails_tpu.models.preprocessors import (
    LearnablePositionalEmbeddingInputPreprocessor,
    length_mask,
    postprocess_output,
)
from rails_tpu.models.sasrec import SASRecStack
from rails_tpu.similarity.dot_product import DotProductSimilarity
from rails_tpu.similarity.mol import MoLItemTables, MoLSimilarity

AuxLosses = Dict[str, jnp.ndarray]


def _item_emb_init(stddev: float = 0.02):
    """Truncated-normal item table with the padding row (id 0) zeroed.

    Reference: `LocalEmbeddingModule` with `padding_idx=0`
    (`/root/reference/modeling/sequential/embedding_modules.py:40-73`).
    """

    def init(key, shape, dtype=jnp.float32):
        x = jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * stddev
        return x.at[0].set(0.0)

    return init


class SequentialRecommender(nn.Module):
    """HSTU/SASRec encoder + MoL/DotProduct similarity, one flax module."""

    cfg: ExperimentConfig
    num_items: int                  # max item id; table has num_items + 1 rows
    dtype: Any = jnp.float32

    def setup(self):
        c = self.cfg
        d = c.train.item_embedding_dim
        n = c.max_seq_len_padded
        self.item_emb = nn.Embed(
            self.num_items + 1, d, embedding_init=_item_emb_init(), name="item_emb"
        )
        self.preproc = LearnablePositionalEmbeddingInputPreprocessor(
            max_sequence_len=n,
            embedding_dim=d,
            dropout_rate=c.train.dropout_rate,
            dtype=self.dtype,
            name="input_preproc",
        )
        if c.model_type == "HSTU":
            self.encoder_stack = HSTUStack(
                cfg=c.hstu, max_seq_len=n, dtype=self.dtype, name="hstu"
            )
        elif c.model_type == "SASRec":
            self.encoder_stack = SASRecStack(
                cfg=c.sasrec, dtype=self.dtype, name="sasrec"
            )
        else:
            raise ValueError(f"Unknown model_type {c.model_type!r}")
        if c.similarity_type == "MoL":
            self.similarity = MoLSimilarity(c.mol, dtype=self.dtype, name="mol")
        elif c.similarity_type == "DotProduct":
            self.similarity = DotProductSimilarity(dtype=self.dtype, name="dp")
        else:
            raise ValueError(f"Unknown similarity_type {c.similarity_type!r}")

    # --------------------------------------------------------------- #

    def get_item_embeddings(self, item_ids: jnp.ndarray) -> jnp.ndarray:
        return self.item_emb(item_ids)

    def encode_sequence(
        self, features: SequentialFeatures, train: bool = False
    ) -> jnp.ndarray:
        """[B, N] -> [B, N, D] (the reference's `forward` /
        `generate_user_embeddings`, `hstu.py:665-733`)."""
        c = self.cfg
        emb = self.item_emb(features.ids).astype(self.dtype)
        x, _ = self.preproc(features.lengths, emb, train=train)
        # HSTU consumes only positions < length (jagged semantics); SASRec
        # uses the id-validity mask (which includes the scattered target slot).
        if c.model_type == "HSTU":
            valid = length_mask(features.lengths, x.shape[1])
            x = x * valid[..., None].astype(x.dtype)
        else:
            valid = features.ids != 0
        y = self.encoder_stack(x, valid, features.timestamps, train=train)
        return postprocess_output(
            y.astype(jnp.float32), c.train.user_embedding_norm,
            c.train.item_embedding_dim,
        )

    def encode(
        self, features: SequentialFeatures, train: bool = False
    ) -> jnp.ndarray:
        """[B, N] -> [B, D]: state at the last valid position
        (`modeling/sequential/utils.py:74-90`)."""
        seq = self.encode_sequence(features, train=train)
        b = seq.shape[0]
        return seq[jnp.arange(b), features.lengths - 1]

    # --------------------------------------------------------------- #
    # Incremental decode (HSTU KV-cache; the reference's delta_x_offsets
    # path, `hstu.py:141,161-187,301-332`).
    # --------------------------------------------------------------- #

    def encode_prefill(self, features: SequentialFeatures):
        """Full forward that also returns per-layer K/V caches.

        Returns (current_embeddings (B, D), cache)."""
        c = self.cfg
        if c.model_type != "HSTU":
            raise NotImplementedError("incremental decode is HSTU-only")
        emb = self.item_emb(features.ids).astype(self.dtype)
        x, _ = self.preproc(features.lengths, emb, train=False)
        valid = length_mask(features.lengths, x.shape[1])
        x = x * valid[..., None].astype(x.dtype)
        y, cache = self.encoder_stack.prefill(x, valid, features.timestamps)
        seq = postprocess_output(
            y.astype(jnp.float32), c.train.user_embedding_norm,
            c.train.item_embedding_dim,
        )
        b = seq.shape[0]
        return seq[jnp.arange(b), features.lengths - 1], cache

    def decode_step(
        self,
        new_ids: jnp.ndarray,            # (B,) appended item ids
        features: SequentialFeatures,    # timestamps already cover position+1
        cache,
    ):
        """Append one item per row at position `lengths` and return the new
        encoder state. Returns (embeddings (B, D), cache)."""
        c = self.cfg
        position = features.lengths      # new item goes at index `length`
        emb_t = self.item_emb(new_ids).astype(self.dtype)
        x_t = self.preproc.at_position(emb_t, position)
        y_t, cache = self.encoder_stack.decode_step(
            x_t, cache, position, features.timestamps
        )
        out = postprocess_output(
            y_t.astype(jnp.float32), c.train.user_embedding_norm,
            c.train.item_embedding_dim,
        )
        return out, cache

    # --------------------------------------------------------------- #

    def similarity_fn(
        self,
        query_embeddings: jnp.ndarray,     # (B', D)
        item_embeddings: jnp.ndarray,      # (1, X, D) or (B', X, D)
        user_ids: Optional[jnp.ndarray] = None,
        train: bool = False,
        weights: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, AuxLosses]:
        """(B', X) scores + aux losses (`modeling/similarity_module.py:38-61`)."""
        return self.similarity(
            query_embeddings, item_embeddings, user_ids=user_ids, train=train,
            weights=weights,
        )

    def build_item_tables(self, item_embeddings: jnp.ndarray) -> MoLItemTables:
        return self.similarity.build_item_tables(item_embeddings)

    def score_precomputed(
        self,
        query_embeddings: jnp.ndarray,
        item_tables: MoLItemTables,
        user_ids: Optional[jnp.ndarray] = None,
        item_indices: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.similarity.score_precomputed(
            query_embeddings, item_tables, user_ids=user_ids,
            item_indices=item_indices,
        )

    def query_components(
        self,
        query_embeddings: jnp.ndarray,
        user_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        comps, _ = self.similarity.query_components(
            query_embeddings, user_ids=user_ids, train=False
        )
        return comps

    def query_gating_partial(self, query_embeddings: jnp.ndarray):
        return self.similarity.query_gating_partial(query_embeddings)
