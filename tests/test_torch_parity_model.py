"""Cross-implementation parity at the MODEL level: the reference's own HSTU /
SASRec encoders and SampledSoftmaxLoss run on CPU torch (fbgemm shimmed, see
`tests/torch_ref.py`) and are asserted against this repo with transplanted
weights.

Reference anchors:
  - HSTU encoder: `/root/reference/modeling/sequential/hstu.py:144-433,665-803`
  - SASRec encoder: `/root/reference/modeling/sequential/sasrec.py:42-290`
  - input preprocessor: `input_features_preprocessors.py:43-91`
  - sampled softmax loss: `modeling/sequential/losses/sampled_softmax.py:46-195`
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rails_tpu.core.config import (
    DataConfig,
    ExperimentConfig,
    HSTUConfig,
    MoLConfig,
    SASRecConfig,
    TrainConfig,
)
from rails_tpu.data.features import SequentialFeatures
from rails_tpu.losses.samplers import LocalNegativesSampler
from rails_tpu.losses.sampled_softmax import sampled_softmax_loss
from rails_tpu.models.encoder import SequentialRecommender
from tests.torch_ref import (
    dense_from_linear,
    load_reference_rails,
    make_reference_mol,
    mol_params_from_torch,
    t2j,
)

load_reference_rails()

B, N, D = 3, 16, 24
NUM_ITEMS = 50
H, DQK, DV, BLOCKS = 2, 4, 4, 2

MOL_CFG = MoLConfig(
    query_embedding_dim=D,
    item_embedding_dim=D,
    dot_product_dimension=8,
    query_dot_product_groups=3,        # 2 proj + 1 uid
    item_dot_product_groups=2,
    temperature=0.05,
    dot_product_l2_norm=True,
    query_hidden_dim=32,
    query_dropout_rate=0.0,
    query_nonlinearity="swiglu",
    uid_embedding_hash_sizes=(100,),
    uid_dropout_rate=0.0,
    item_hidden_dim=-1,
    item_dropout_rate=0.0,
    gating_query_hidden_dim=16,
    gating_item_hidden_dim=16,
    gating_qi_hidden_dim=8,
    softmax_dropout_rate=0.0,
)


def _experiment_cfg(model_type: str) -> ExperimentConfig:
    return ExperimentConfig(
        model_type=model_type,
        similarity_type="MoL",
        mol=MOL_CFG,
        hstu=HSTUConfig(
            embedding_dim=D, num_blocks=BLOCKS, num_heads=H, dqk=DQK, dv=DV,
            linear_dropout_rate=0.0, attn_dropout_rate=0.0,
        ),
        sasrec=SASRecConfig(
            embedding_dim=D, num_blocks=BLOCKS, num_heads=H,
            ffn_hidden_dim=32, ffn_activation_fn="relu", ffn_dropout_rate=0.0,
        ),
        data=DataConfig(max_sequence_length=N - 1),
        train=TrainConfig(
            item_embedding_dim=D, gr_output_length=0, dropout_rate=0.0,
            user_embedding_norm="l2_norm", item_l2_norm=False,
        ),
    )


def _features(seed=0, scatter_target=False):
    rng = np.random.default_rng(seed)
    lengths = np.array([4, 9, N - 1], dtype=np.int32)
    ids = np.zeros((B, N), dtype=np.int64)
    ts = np.zeros((B, N), dtype=np.int64)
    for b, ln in enumerate(lengths):
        ids[b, :ln] = rng.integers(1, NUM_ITEMS + 1, ln)
        ts[b, : ln + 1] = np.sort(rng.integers(1, 10_000, ln + 1))
    if scatter_target:
        targets = rng.integers(1, NUM_ITEMS + 1, B)
        ids[np.arange(B), lengths] = targets
    uids = rng.integers(0, 1000, B).astype(np.int64)
    return lengths, ids, ts, uids


def _my_features(lengths, ids, ts, uids) -> SequentialFeatures:
    return SequentialFeatures(
        lengths=jnp.asarray(lengths, jnp.int32),
        ids=jnp.asarray(ids, jnp.int32),
        timestamps=jnp.asarray(ts, jnp.int32),
        ratings=jnp.zeros_like(jnp.asarray(ids, jnp.int32)),
        user_ids=jnp.asarray(uids, jnp.int32),
    )


# ------------------------------------------------------------------ #
# Reference model builders + transplants.
# ------------------------------------------------------------------ #


def _ref_common_modules():
    from modeling.sequential.embedding_modules import LocalEmbeddingModule
    from modeling.sequential.input_features_preprocessors import (
        LearnablePositionalEmbeddingInputFeaturesPreprocessor,
    )
    from modeling.sequential.output_postprocessors import (
        L2NormEmbeddingPostprocessor,
    )

    emb = LocalEmbeddingModule(num_items=NUM_ITEMS, item_embedding_dim=D)
    preproc = LearnablePositionalEmbeddingInputFeaturesPreprocessor(
        max_sequence_len=N, embedding_dim=D, dropout_rate=0.0
    )
    postproc = L2NormEmbeddingPostprocessor(embedding_dim=D, eps=1e-6)
    return emb, preproc, postproc


def _build_ref_hstu():
    from modeling.sequential.hstu import HSTU

    torch.manual_seed(31)
    emb, preproc, postproc = _ref_common_modules()
    mol = make_reference_mol(torch, MOL_CFG, D, D)
    ref = HSTU(
        max_sequence_len=N,
        max_output_len=0,
        embedding_dim=D,
        num_blocks=BLOCKS,
        num_heads=H,
        linear_dim=DV,
        attention_dim=DQK,
        normalization="rel_bias",
        linear_config="uvqk",
        linear_activation="silu",
        linear_dropout_rate=0.0,
        attn_dropout_rate=0.0,
        embedding_module=emb,
        similarity_module=mol,
        input_features_preproc_module=preproc,
        output_postproc_module=postproc,
        enable_relative_attention_bias=True,
        concat_ua=False,
        verbose=False,
    )
    ref.eval()
    return ref


def _hstu_params_from_torch(ref) -> dict:
    """Reference HSTU -> repo SequentialRecommender param tree. (HSTU's
    reset_params re-inits the preproc + MoL weights (`hstu.py:632-650`), so
    the transplant reads final values after construction.)"""
    hstu = {
        "rel_attn_bias": {
            "pos_w": np.stack(
                [t2j(l._rel_attn_bias._pos_w) for l in ref._hstu._attention_layers]
            ),
            "ts_w": np.stack(
                [t2j(l._rel_attn_bias._ts_w) for l in ref._hstu._attention_layers]
            ),
        }
    }
    for i, layer in enumerate(ref._hstu._attention_layers):
        hstu[f"block_{i}"] = {
            "uvqk": t2j(layer._uvqk),
            "o_kernel": t2j(layer._o.weight).T,
            "o_bias": t2j(layer._o.bias),
        }
    return {
        "item_emb": {"embedding": t2j(ref._embedding_module._item_emb.weight)},
        "input_preproc": {"pos_emb": t2j(ref._input_features_preproc._pos_emb.weight)},
        "hstu": hstu,
        "mol": mol_params_from_torch(ref._ndp_module, MOL_CFG),
    }


def _build_ref_sasrec():
    from modeling.sequential.sasrec import SASRec

    torch.manual_seed(41)
    emb, preproc, postproc = _ref_common_modules()
    mol = make_reference_mol(torch, MOL_CFG, D, D)
    ref = SASRec(
        max_sequence_len=N,
        max_output_len=0,
        embedding_dim=D,
        num_blocks=BLOCKS,
        num_heads=H,
        ffn_hidden_dim=32,
        ffn_activation_fn="relu",
        ffn_dropout_rate=0.0,
        embedding_module=emb,
        similarity_module=mol,
        input_features_preproc_module=preproc,
        output_postproc_module=postproc,
        verbose=False,
    )
    ref.eval()
    return ref


def _sasrec_params_from_torch(ref) -> dict:
    sasrec = {}
    for i in range(BLOCKS):
        mha = ref.attention_layers[i]
        w = t2j(mha.in_proj_weight)          # (3D, D)
        bias = t2j(mha.in_proj_bias)         # (3D,)
        ffn = ref.forward_layers[i]._conv1d  # Conv1d(D,H',1), act, Drop, Conv1d, Drop
        sasrec[f"block_{i}"] = {
            "q_proj": {"kernel": w[:D].T, "bias": bias[:D]},
            "k_proj": {"kernel": w[D : 2 * D].T, "bias": bias[D : 2 * D]},
            "v_proj": {"kernel": w[2 * D :].T, "bias": bias[2 * D :]},
            "out_proj": dense_from_linear(mha.out_proj),
            "ffn": {
                "fc1": {
                    "kernel": t2j(ffn[0].weight)[:, :, 0].T,
                    "bias": t2j(ffn[0].bias),
                },
                "fc2": {
                    "kernel": t2j(ffn[3].weight)[:, :, 0].T,
                    "bias": t2j(ffn[3].bias),
                },
            },
        }
    return {
        "item_emb": {"embedding": t2j(ref._embedding_module._item_emb.weight)},
        "input_preproc": {"pos_emb": t2j(ref._input_features_preproc._pos_emb.weight)},
        "sasrec": sasrec,
        "mol": mol_params_from_torch(ref._ndp_module, MOL_CFG),
    }


def _ref_encode(ref, lengths, ids, ts):
    with torch.no_grad():
        emb = ref.get_item_embeddings(torch.from_numpy(ids))
        return ref.encode(
            past_lengths=torch.from_numpy(lengths.astype(np.int64)),
            past_ids=torch.from_numpy(ids),
            past_embeddings=emb,
            past_payloads={"timestamps": torch.from_numpy(ts)},
        )


def _ref_forward(ref, lengths, ids, ts):
    with torch.no_grad():
        emb = ref.get_item_embeddings(torch.from_numpy(ids))
        return ref.forward(
            past_lengths=torch.from_numpy(lengths.astype(np.int64)),
            past_ids=torch.from_numpy(ids),
            past_embeddings=emb,
            past_payloads={"timestamps": torch.from_numpy(ts)},
        )


class TestHSTUParity:
    def test_encode_matches(self):
        ref = _build_ref_hstu()
        cfg = _experiment_cfg("HSTU")
        model = SequentialRecommender(cfg, num_items=NUM_ITEMS)
        params = {"params": _hstu_params_from_torch(ref)}

        lengths, ids, ts, uids = _features(seed=7)
        ref_out = _ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, _my_features(lengths, ids, ts, uids), method=model.encode
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )

    def test_encode_sequence_matches_at_valid_positions(self):
        """Full (B, N, D) outputs agree at positions < length. (Positions
        >= length are dropped by the reference's jagged layout and zeroed
        here — both invisible downstream.)"""
        ref = _build_ref_hstu()
        cfg = _experiment_cfg("HSTU")
        model = SequentialRecommender(cfg, num_items=NUM_ITEMS)
        params = {"params": _hstu_params_from_torch(ref)}

        lengths, ids, ts, uids = _features(seed=8)
        ref_out = t2j(_ref_forward(ref, lengths, ids, ts))
        my_out = np.asarray(
            model.apply(
                params, _my_features(lengths, ids, ts, uids),
                method=model.encode_sequence,
            )
        )
        for b, ln in enumerate(lengths):
            np.testing.assert_allclose(
                my_out[b, :ln], ref_out[b, :ln], rtol=1e-4, atol=2e-5
            )


class TestSoftmaxVariantParity:
    def test_softmax_rel_bias_encode_matches(self):
        """normalization='softmax_rel_bias' with num_heads=2: the reference
        computes ONE attention map over the full h*dqk dim shared by all
        value heads (`hstu.py:388-399`) — NOT per-head softmax; this pins
        that semantic."""
        from modeling.sequential.hstu import HSTU

        torch.manual_seed(51)
        emb, preproc, postproc = _ref_common_modules()
        mol = make_reference_mol(torch, MOL_CFG, D, D)
        ref = HSTU(
            max_sequence_len=N,
            max_output_len=0,
            embedding_dim=D,
            num_blocks=BLOCKS,
            num_heads=H,
            linear_dim=DV,
            attention_dim=DQK,
            normalization="softmax_rel_bias",
            linear_config="uvqk",
            linear_activation="silu",
            linear_dropout_rate=0.0,
            attn_dropout_rate=0.0,
            embedding_module=emb,
            similarity_module=mol,
            input_features_preproc_module=preproc,
            output_postproc_module=postproc,
            enable_relative_attention_bias=True,
            concat_ua=False,
            verbose=False,
        )
        ref.eval()

        cfg = _experiment_cfg("HSTU")
        cfg = cfg.replace(
            hstu=cfg.hstu.replace(normalization="softmax_rel_bias")
        )
        model = SequentialRecommender(cfg, num_items=NUM_ITEMS)
        params = {"params": _hstu_params_from_torch(ref)}

        lengths, ids, ts, uids = _features(seed=12)
        ref_out = _ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, _my_features(lengths, ids, ts, uids), method=model.encode
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )


class TestSASRecParity:
    def test_encode_matches(self):
        ref = _build_ref_sasrec()
        cfg = _experiment_cfg("SASRec")
        model = SequentialRecommender(cfg, num_items=NUM_ITEMS)
        params = {"params": _sasrec_params_from_torch(ref)}

        lengths, ids, ts, uids = _features(seed=9)
        ref_out = _ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, _my_features(lengths, ids, ts, uids), method=model.encode
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )


# ------------------------------------------------------------------ #
# SampledSoftmaxLoss end-to-end (encoder + MoL + loss), fixed negatives.
# ------------------------------------------------------------------ #


class _RefFixedNegSampler(torch.nn.Module):
    """Deterministic stand-in for the reference `LocalNegativesSampler`
    (`modeling/sequential/autoregressive_losses.py:71-120`): returns
    pre-drawn negative ids so both implementations score identical sets."""

    def __init__(self, ids, item_emb):
        super().__init__()
        self._ids = ids                      # (N', R) int64
        self._item_emb = item_emb

    def normalize_embeddings(self, x):
        return x                             # item_l2_norm=False

    def forward(self, positive_ids, num_to_sample):
        assert self._ids.shape[1] == num_to_sample
        return self._ids, self._item_emb(self._ids)


def _make_my_fixed_sampler(flat_ids, all_item_ids):
    """LocalNegativesSampler whose draw is pinned to `flat_ids` (M, R)."""
    fixed = jnp.asarray(flat_ids, jnp.int32)

    class _Fixed(LocalNegativesSampler):
        def sample(self, rng, shape):
            assert tuple(shape) == tuple(fixed.shape)
            return fixed

    return _Fixed(all_item_ids=jnp.asarray(all_item_ids, jnp.int32))


class TestSampledSoftmaxLossParity:
    R = 8

    def test_loss_and_aux_match(self):
        ref = _build_ref_hstu()
        cfg = _experiment_cfg("HSTU")
        model = SequentialRecommender(cfg, num_items=NUM_ITEMS)
        params = {"params": _hstu_params_from_torch(ref)}

        lengths, ids, ts, uids = _features(seed=10, scatter_target=True)
        rng = np.random.default_rng(100)
        # Dense (B, N-1, R) negatives; the reference consumes the jagged
        # (first `length` positions per row) view of the same array.
        dense_negs = rng.integers(1, NUM_ITEMS + 1, (B, N - 1, self.R))
        jagged_negs = np.concatenate(
            [dense_negs[b, : lengths[b]] for b in range(B)], axis=0
        )

        # ---- reference: mirrors the train loop (`train.py:393-432`).
        from modeling.sequential.losses.sampled_softmax import SampledSoftmaxLoss

        ref.train()
        t_lengths = torch.from_numpy(lengths.astype(np.int64))
        t_ids = torch.from_numpy(ids)
        input_embeddings = ref.get_item_embeddings(t_ids)
        seq_embeddings = ref.forward(
            past_lengths=t_lengths,
            past_ids=t_ids,
            past_embeddings=input_embeddings,
            past_payloads={"timestamps": torch.from_numpy(ts)},
        )
        ar_loss = SampledSoftmaxLoss(
            num_to_sample=self.R, softmax_temperature=0.05, model=ref
        )
        sampler = _RefFixedNegSampler(
            torch.from_numpy(jagged_negs), ref.get_item_embeddings
        )
        ref_loss, ref_aux = ar_loss(
            lengths=t_lengths,
            output_embeddings=seq_embeddings[:, :-1, :],
            supervision_ids=t_ids[:, 1:],
            supervision_embeddings=input_embeddings[:, 1:, :],
            supervision_weights=(t_ids[:, 1:] != 0).float(),
            negatives_sampler=sampler,
            user_ids=torch.from_numpy(uids),
        )

        # ---- repo: the dense-masked loss (`losses/sampled_softmax.py:30-177`)
        # with the SAME negatives laid out dense (invalid rows are weighted
        # out, so their negative draws are irrelevant).
        my_sampler = _make_my_fixed_sampler(
            dense_negs.reshape(B * (N - 1), self.R),
            np.arange(1, NUM_ITEMS + 1),
        )
        my_loss, my_aux = model.apply(
            params, _my_features(lengths, ids, ts, uids), my_sampler,
            self.R, 0.05, True,
            method=sampled_softmax_loss,
            rngs={
                "dropout": jax.random.PRNGKey(0),
                "sampler": jax.random.PRNGKey(1),
            },
        )
        np.testing.assert_allclose(
            float(my_loss), float(ref_loss.detach()), rtol=1e-4, atol=1e-5
        )
        assert set(my_aux) == set(ref_aux)
        for key in ref_aux:
            np.testing.assert_allclose(
                float(my_aux[key]), float(ref_aux[key].detach()),
                rtol=1e-4, atol=1e-5, err_msg=key,
            )
