"""Fused MoL scoring kernel vs the XLA reference path (interpret mode, CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import MoLConfig
from rails_tpu.ops.pallas.mol_scoring import (
    extract_gating_qi_weights,
    fused_mol_scores,
    pad_corpus_tables,
)
from rails_tpu.similarity.mol import MoLSimilarity


@pytest.fixture(scope="module")
def mol_setup():
    cfg = MoLConfig(
        query_embedding_dim=24,
        item_embedding_dim=16,
        dot_product_dimension=128,   # kernel-friendly lane width
        query_dot_product_groups=8,
        item_dot_product_groups=4,
        query_hidden_dim=32,
        item_hidden_dim=-1,
        uid_embedding_hash_sizes=(33,),
        gating_query_hidden_dim=16,
        gating_item_hidden_dim=16,
        gating_qi_hidden_dim=128,
        temperature=0.05,
    )
    rng = np.random.default_rng(0)
    B, X = 8, 300
    q = rng.normal(size=(B, cfg.query_embedding_dim)).astype(np.float32)
    items = rng.normal(size=(X, cfg.item_embedding_dim)).astype(np.float32)
    uids = rng.integers(0, 100, size=(B,))
    module = MoLSimilarity(cfg)
    params = module.init(
        jax.random.PRNGKey(0), jnp.asarray(q), jnp.asarray(items)[None],
        user_ids=jnp.asarray(uids),
    )
    return cfg, module, params, q, items, uids


def test_fused_matches_xla(mol_setup):
    cfg, module, params, q, items, uids = mol_setup
    tables = module.apply(
        params, jnp.asarray(items), method=MoLSimilarity.build_item_tables
    )
    expected = module.apply(
        params, jnp.asarray(q), tables, user_ids=jnp.asarray(uids),
        method=MoLSimilarity.score_precomputed,
    )

    q_comp, _ = module.apply(
        params, jnp.asarray(q), method=MoLSimilarity.query_components,
        user_ids=jnp.asarray(uids),
    )
    qp = module.apply(
        params, jnp.asarray(q),
        method=lambda m, e: m.gating_query(e, train=False),
    )
    weights = extract_gating_qi_weights({"params": params["params"]})
    comp_p, gp_p, x = pad_corpus_tables(
        tables.component_embeddings, tables.gating_partial, block_x=128
    )
    scores = fused_mol_scores(
        q_comp, qp, comp_p, gp_p, weights, cfg.temperature,
        block_x=128, interpret=True,
    )[:, :x]
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected), rtol=2e-4, atol=2e-4
    )


def test_fused_topk_factory_matches_brute_force():
    """End-to-end: MoLBruteForceTopKFused vs MoLBruteForceTopK via the
    eval-state factory on a trained tiny model."""
    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.data.datasets import get_reco_dataset
    from rails_tpu.train.evaluation import get_eval_state
    from rails_tpu.train.loop import create_train_state

    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=200),
        train=cfg.train.replace(local_batch_size=8, num_negatives=8),
        mol=cfg.mol.replace(dot_product_dimension=128, gating_qi_hidden_dim=128),
    )
    ds = get_reco_dataset(cfg.data)
    batch = next(
        ds.train_dataset.batches(
            batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
            shuffle=False,
        )
    )
    model, state, _, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, batch
    )
    es_ref = get_eval_state(
        model, state.params, ds.all_item_ids, "MoLBruteForceTopK",
        table_dtype=jnp.float32,
    )
    es_fused = get_eval_state(
        model, state.params, ds.all_item_ids, "MoLBruteForceTopKFused",
        table_dtype=jnp.float32,
    )
    q = model.apply(state.params, batch.features, method=model.encode)
    ref = es_ref.top_k_fn(q, 10, user_ids=batch.features.user_ids)
    fused = es_fused.top_k_fn(q, 10, user_ids=batch.features.user_ids)
    np.testing.assert_array_equal(np.asarray(fused.ids), np.asarray(ref.ids))
    np.testing.assert_allclose(
        np.asarray(fused.scores), np.asarray(ref.scores), rtol=1e-4, atol=1e-4
    )


def test_fused_batch_tiling(mol_setup):
    """block_b smaller than B (and B not a multiple) must give identical
    scores to a single-tile run."""
    cfg, module, params, q, items, uids = mol_setup
    tables = module.apply(
        params, jnp.asarray(items), method=MoLSimilarity.build_item_tables
    )
    q_comp, _ = module.apply(
        params, jnp.asarray(q), method=MoLSimilarity.query_components,
        user_ids=jnp.asarray(uids),
    )
    qp = module.apply(
        params, jnp.asarray(q),
        method=lambda m, e: m.gating_query(e, train=False),
    )
    weights = extract_gating_qi_weights({"params": params["params"]})
    comp_p, gp_p, x = pad_corpus_tables(
        tables.component_embeddings, tables.gating_partial, block_x=128
    )
    from rails_tpu.ops.pallas.mol_scoring import fused_mol_scores_t

    itemT = jnp.transpose(comp_p, (1, 2, 0))
    ipT = gp_p.T
    ref = fused_mol_scores_t(
        q_comp, qp, itemT, ipT, weights, cfg.temperature,
        block_x=128, block_b=8, interpret=True,
    )
    tiled = fused_mol_scores_t(
        q_comp, qp, itemT, ipT, weights, cfg.temperature,
        block_x=128, block_b=3, interpret=True,   # 8 % 3 != 0 -> pad path
    )
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_fused_bf16_tables_close(mol_setup):
    cfg, module, params, q, items, uids = mol_setup
    tables = module.apply(
        params, jnp.asarray(items), method=MoLSimilarity.build_item_tables
    )
    expected = module.apply(
        params, jnp.asarray(q), tables, user_ids=jnp.asarray(uids),
        method=MoLSimilarity.score_precomputed,
    )
    q_comp, _ = module.apply(
        params, jnp.asarray(q), method=MoLSimilarity.query_components,
        user_ids=jnp.asarray(uids),
    )
    qp = module.apply(
        params, jnp.asarray(q),
        method=lambda m, e: m.gating_query(e, train=False),
    )
    weights = extract_gating_qi_weights({"params": params["params"]})
    comp_p, gp_p, x = pad_corpus_tables(
        tables.component_embeddings.astype(jnp.bfloat16),
        tables.gating_partial.astype(jnp.bfloat16),
        block_x=128,
    )
    scores = fused_mol_scores(
        q_comp.astype(jnp.bfloat16), qp, comp_p, gp_p, weights,
        cfg.temperature, block_x=128, interpret=True,
    )[:, :x]
    # bf16 component tables: tolerance driven by ~3 decimal digits at |logit|
    # up to 1/T = 20.
    np.testing.assert_allclose(
        np.asarray(scores), np.asarray(expected), rtol=0.05, atol=0.15
    )
    # Ranking agreement on top-1.
    np.testing.assert_array_equal(
        np.argmax(np.asarray(scores), axis=1),
        np.argmax(np.asarray(expected), axis=1),
    )


def test_emit_blockmax_masks_and_matches(mol_setup):
    """emit_blockmax: scores equal the plain path with pad columns masked
    to -1e30 (mid-corpus id-0 rows included), and the emitted maxima equal
    the per-tile max of those masked scores."""
    cfg, module, params, q, items, uids = mol_setup
    tables = module.apply(
        params, jnp.asarray(items), method=MoLSimilarity.build_item_tables
    )
    q_comp, _ = module.apply(
        params, jnp.asarray(q), method=MoLSimilarity.query_components,
        user_ids=jnp.asarray(uids),
    )
    qp = module.apply(
        params, jnp.asarray(q),
        method=lambda m, e: m.gating_query(e, train=False),
    )
    weights = extract_gating_qi_weights({"params": params["params"]})
    comp_p, gp_p, x = pad_corpus_tables(
        tables.component_embeddings, tables.gating_partial, block_x=128
    )
    from rails_tpu.ops.pallas.mol_scoring import fused_mol_scores_t

    itemT = jnp.transpose(comp_p, (1, 2, 0))
    ipT = gp_p.T
    x_real = items.shape[0]
    # Mid-corpus pads at 5 and 77, plus the kernel-pad tail.
    valid = np.ones((x_real,), np.float32)
    valid[[5, 77]] = 0.0
    plain = np.asarray(fused_mol_scores_t(
        q_comp, qp, itemT, ipT, weights, cfg.temperature,
        block_x=128, block_b=8, interpret=True,
    ))
    scores, bmax = fused_mol_scores_t(
        q_comp, qp, itemT, ipT, weights, cfg.temperature,
        block_x=128, block_b=8, interpret=True,
        emit_blockmax=True, valid=jnp.asarray(valid),
    )
    scores, bmax = np.asarray(scores), np.asarray(bmax)
    expected = plain.copy()
    expected[:, [5, 77]] = -1e30
    expected[:, x_real:] = -1e30          # kernel-pad tail
    np.testing.assert_allclose(scores, expected, rtol=1e-6, atol=1e-6)
    # The maxima output pads the tiles axis to a 128-lane window multiple
    # (Mosaic cannot lower a 1-lane output block); real tiles lead, pad
    # lanes hold the window fill.
    nt = scores.shape[1] // 128
    assert bmax.shape[1] % 128 == 0 and bmax.shape[1] >= nt
    np.testing.assert_allclose(
        bmax[:, :nt],
        expected.reshape(scores.shape[0], nt, 128).max(axis=2),
        rtol=1e-6, atol=1e-6,
    )
    assert (bmax[:, nt:] == -1.0e30).all()
