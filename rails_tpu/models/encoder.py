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
from rails_tpu.models.embedding import CategoricalEmbeddingModule, LocalEmbeddingModule
from rails_tpu.models.hstu import HSTUStack
from rails_tpu.models.preprocessors import (
    CombinedItemAndRatingInputPreprocessor,
    LearnablePositionalEmbeddingInputPreprocessor,
    LearnablePositionalEmbeddingRatedInputPreprocessor,
    length_mask,
    postprocess_output,
)
from rails_tpu.models.sasrec import SASRecStack
from rails_tpu.similarity.dot_product import DotProductSimilarity
from rails_tpu.similarity.mol import MoLItemTables, MoLSimilarity

AuxLosses = Dict[str, jnp.ndarray]


class SequentialRecommender(nn.Module):
    """HSTU/SASRec encoder + MoL/DotProduct similarity, one flax module."""

    cfg: ExperimentConfig
    num_items: int                  # max item id; table has num_items + 1 rows
    dtype: Any = jnp.float32
    # id -> category remap array, required iff embedding_module_type is
    # "categorical" (`embedding_modules.py:76-112`).
    item_id_to_category_id: Any = None

    def setup(self):
        c = self.cfg
        d = c.train.item_embedding_dim
        n = c.max_seq_len_padded
        # Embedding module (`encoder_utils` wires LocalEmbeddingModule or
        # CategoricalEmbeddingModule via gin; here via embedding_module_type).
        # Param path is item_emb/embedding for both, so checkpoints of the
        # default config are unaffected.
        if c.embedding_module_type == "local":
            self.item_emb = LocalEmbeddingModule(
                num_items=self.num_items, item_embedding_dim=d,
                scatter_grad_kernel=c.train.pallas_scatter_grad,
                name="item_emb",
            )
        elif c.embedding_module_type == "categorical":
            assert self.item_id_to_category_id is not None, (
                "embedding_module_type='categorical' requires an "
                "item_id_to_category_id array on the model"
            )
            assert c.num_item_categories > 0
            self.item_emb = CategoricalEmbeddingModule(
                num_categories=c.num_item_categories,
                item_embedding_dim=d,
                item_id_to_category_id=self.item_id_to_category_id,
                scatter_grad_kernel=c.train.pallas_scatter_grad,
                name="item_emb",
            )
        else:
            raise ValueError(
                f"Unknown embedding_module_type {c.embedding_module_type!r}"
            )
        # Input preprocessor (`input_features_preprocessors.py:26-267`).
        # `d_model` is the encoder width; `n_enc` its sequence length.
        if c.input_preprocessor_type == "positional":
            self.preproc = LearnablePositionalEmbeddingInputPreprocessor(
                max_sequence_len=n,
                embedding_dim=d,
                dropout_rate=c.train.dropout_rate,
                dtype=self.dtype,
                name="input_preproc",
            )
            d_model, n_enc = d, n
        elif c.input_preprocessor_type == "rated":
            self.preproc = LearnablePositionalEmbeddingRatedInputPreprocessor(
                max_sequence_len=n,
                item_embedding_dim=d,
                rating_embedding_dim=c.rating_embedding_dim,
                num_ratings=c.num_ratings,
                dropout_rate=c.train.dropout_rate,
                dtype=self.dtype,
                name="input_preproc",
            )
            d_model, n_enc = d + c.rating_embedding_dim, n
        elif c.input_preprocessor_type == "combined":
            self.preproc = CombinedItemAndRatingInputPreprocessor(
                max_sequence_len=2 * n,
                embedding_dim=d,
                rating_embedding_dim=d,    # interleave requires equal widths
                num_ratings=c.num_ratings,
                dropout_rate=c.train.dropout_rate,
                dtype=self.dtype,
                name="input_preproc",
            )
            d_model, n_enc = d, 2 * n
        else:
            raise ValueError(
                f"Unknown input_preprocessor_type {c.input_preprocessor_type!r}"
            )
        if c.model_type == "HSTU":
            hstu_cfg = (
                c.hstu if c.hstu.embedding_dim == d_model
                else c.hstu.replace(embedding_dim=d_model)
            )
            self.encoder_stack = HSTUStack(
                cfg=hstu_cfg, max_seq_len=n_enc, dtype=self.dtype, name="hstu"
            )
        elif c.model_type == "SASRec":
            sasrec_cfg = (
                c.sasrec if c.sasrec.embedding_dim == d_model
                else c.sasrec.replace(embedding_dim=d_model)
            )
            self.encoder_stack = SASRecStack(
                cfg=sasrec_cfg, dtype=self.dtype, name="sasrec"
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

    def _preprocess(self, features: SequentialFeatures, train: bool):
        """Embedding lookup + configured input preprocessor.

        Returns (x (B, N_enc, D_model), enc_lengths, enc_timestamps, stride)
        where stride is 2 for the interleaved `combined` preprocessor
        (encoder positions per original position) and 1 otherwise.
        """
        c = self.cfg
        emb = self.item_emb(features.ids).astype(self.dtype)
        if c.input_preprocessor_type == "positional":
            x, _ = self.preproc(features.lengths, emb, train=train)
            return x, features.lengths, features.timestamps, 1
        if c.input_preprocessor_type == "rated":
            x, _ = self.preproc(
                features.lengths, emb, features.ratings, train=train
            )
            return x, features.lengths, features.timestamps, 1
        x, _, enc_lengths = self.preproc(
            features.lengths, emb, features.ratings, train=train
        )
        return x, enc_lengths, jnp.repeat(features.timestamps, 2, axis=1), 2

    def encode_sequence(
        self, features: SequentialFeatures, train: bool = False
    ) -> jnp.ndarray:
        """[B, N] -> [B, N, D] (the reference's `forward` /
        `generate_user_embeddings`, `hstu.py:665-733`)."""
        c = self.cfg
        x, enc_lengths, ts, stride = self._preprocess(features, train)
        # HSTU consumes only positions < length (jagged semantics); SASRec
        # uses the id-validity mask (which includes the scattered target slot).
        if c.model_type == "HSTU":
            valid = length_mask(enc_lengths, x.shape[1])
            x = x * valid[..., None].astype(x.dtype)
        else:
            valid = features.ids != 0
            if stride == 2:
                valid = jnp.repeat(valid, 2, axis=1)
        y = self.encoder_stack(x, valid, ts, train=train)
        y = postprocess_output(
            y.astype(jnp.float32), c.train.user_embedding_norm,
            c.train.item_embedding_dim,
        )
        if stride == 2:
            # Interleaved [item_i, rating_i]: keep the post-rating state as
            # THE output for original position i, restoring (B, N, D) so the
            # loss/eval machinery is preprocessor-agnostic.
            y = y[:, 1::2]
        return y

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
        if c.input_preprocessor_type != "positional":
            raise NotImplementedError(
                "incremental decode supports the positional preprocessor only"
            )
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

    def score_gathered(
        self,
        query_embeddings: jnp.ndarray,
        component_embeddings: jnp.ndarray,
        gating_partial: Optional[jnp.ndarray],
        user_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return self.similarity.score_gathered(
            query_embeddings, component_embeddings, gating_partial,
            user_ids=user_ids,
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
