"""Per-query error bounds / certified retrieval (VERDICT r3 #3).

Covers:
  - the Pallas UB kernel (`fused_mol_ub_t`) against naive component-logit
    math, and its soundness: UB(q, x) >= exact MoL score(q, x) for every item;
  - `mol_certified_top_k`: full-budget == brute force; certified queries
    provably match brute force; gap_bound dominates the true rank-k gap;
  - certified Naive/Comb: the per-group-threshold bound dominates every
    non-candidate item's exact score.

The reference has no counterpart (`mol_top_k.py` is bound-free); the bounds
are required by the rebuild's north star (BASELINE.json: "exact MoL rerank
with error bounds").
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.index import top_k as tk
from rails_tpu.train.evaluation import get_eval_state
from rails_tpu.train.loop import create_train_state


@pytest.fixture(scope="module")
def trained():
    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=128, synthetic_num_items=300),
        train=cfg.train.replace(local_batch_size=16, num_negatives=8),
    )
    ds = get_reco_dataset(cfg.data)
    batches = list(
        ds.train_dataset.batches(
            batch_size=16, max_output_length=cfg.train.gr_output_length + 1,
            shuffle=True, seed=0, drop_last=True,
        )
    )
    model, state, train_step, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, batches[0]
    )
    rng = jax.random.PRNGKey(0)
    for batch in batches[:4]:
        state, _ = train_step(state, batch, rng)
    return cfg, ds, model, state.params, batches


@pytest.fixture(scope="module")
def states(trained):
    cfg, ds, model, params, batches = trained
    es = get_eval_state(
        model, params, ds.all_item_ids, "MoLCertTopK64",
        table_dtype=jnp.float32,
    )
    feats = batches[0].features
    q = model.apply(params, feats, method=model.encode)
    exact_scores = model.apply(
        params, q, es.topk_state.item_tables, user_ids=feats.user_ids,
        method=model.score_precomputed,
    )                                    # (B, X) exact MoL
    return es, q, feats.user_ids, np.asarray(exact_scores)


class TestUBKernel:
    def test_matches_naive_component_max(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, _ = states
        from rails_tpu.ops.pallas.mol_scoring import fused_mol_ub_t

        ft = es.topk_state.fused_tables
        q_comp = model.apply(
            params, q, user_ids, method=model.query_components
        )
        ub = fused_mol_ub_t(
            q_comp.astype(ft.item_comp_t.dtype), ft.item_comp_t,
            float(model.cfg.mol.temperature),
        )[:, : ft.num_items]
        comp = es.topk_state.item_tables.component_embeddings  # (X, P_X, d_P)
        logits = jnp.einsum(
            "bnd,xmd->bxnm", q_comp, comp.astype(q_comp.dtype),
            preferred_element_type=jnp.float32,
        ) / float(model.cfg.mol.temperature)
        expected = np.asarray(logits.reshape(*logits.shape[:2], -1).max(-1))
        np.testing.assert_allclose(
            np.asarray(ub), expected, rtol=1e-5, atol=1e-5
        )

    def test_ub_dominates_exact_scores(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        # The UB must sit above the exact MoL score for EVERY (query, item):
        # score is a softmax mixture of the logits the UB maxes over.
        from rails_tpu.ops.pallas.mol_scoring import fused_mol_ub_t

        ft = es.topk_state.fused_tables
        q_comp = model.apply(
            params, q, user_ids, method=model.query_components
        )
        ub = np.asarray(fused_mol_ub_t(
            q_comp.astype(ft.item_comp_t.dtype), ft.item_comp_t,
            float(model.cfg.mol.temperature),
        )[:, : ft.num_items])
        assert np.all(ub >= exact_scores - 1e-5), (
            (exact_scores - ub).max()
        )

    def test_int8_tables_supported(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, _ = states
        from rails_tpu.ops.pallas.mol_scoring import (
            fused_mol_ub_t, quantize_fused_tables,
        )

        ft = quantize_fused_tables(es.topk_state.fused_tables)
        q_comp = model.apply(
            params, q, user_ids, method=model.query_components
        )
        ub8 = fused_mol_ub_t(
            q_comp.astype(jnp.bfloat16), ft.item_comp_t,
            float(model.cfg.mol.temperature), comp_scale=ft.comp_scale,
        )[:, : ft.num_items]
        ub = fused_mol_ub_t(
            q_comp.astype(es.topk_state.fused_tables.item_comp_t.dtype),
            es.topk_state.fused_tables.item_comp_t,
            float(model.cfg.mol.temperature),
        )[:, : ft.num_items]
        np.testing.assert_allclose(
            np.asarray(ub8), np.asarray(ub), rtol=0.05, atol=0.1
        )


class TestCertifiedTopK:
    def test_full_budget_equals_brute_force_and_certifies(
        self, trained, states
    ):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        x = exact_scores.shape[1]
        res, cert = tk.mol_certified_top_k(
            model, params, es.topk_state, q, 10, cand_budget=x,
            user_ids=user_ids,
        )
        assert bool(np.all(np.asarray(cert.certified)))
        order = np.argsort(-exact_scores, axis=1)[:, :10]
        np.testing.assert_allclose(
            np.asarray(res.scores),
            np.take_along_axis(exact_scores, order, axis=1),
            rtol=1e-4, atol=1e-4,
        )

    def test_certification_fires_and_implies_exactness(self):
        """Certification must IMPLY exactness — and must actually fire.

        With P_Q = P_X = 1 the mixture has a single logit, so the exact MoL
        score EQUALS the upper bound (a softmax over one element is 1) and
        certification fires generically at partial budget: the spill bound
        is the (budget+1)-th largest UB, strictly below the k-th largest
        exact score for any query with distinct scores. A multi-component
        construction cannot guarantee this — the UB is a max over component
        logits while the exact score is a signed softmax mixture, so a
        barely-trained fixture's bound stays loose at any boost (certified
        retrieval pays off on trained models whose per-item component
        logits correlate; the multi-component gap-bound test covers the
        sound-but-loose regime)."""
        cfg = get_experiment_config("synthetic-small")
        cfg = cfg.replace(
            data=cfg.data.replace(
                synthetic_num_users=128, synthetic_num_items=300
            ),
            train=cfg.train.replace(
                local_batch_size=16, num_negatives=8,
                # No uid components -> no uid_embedding_l2_norm aux loss.
                loss_weights=(("mi_loss", 0.001),),
            ),
            mol=cfg.mol.replace(
                query_dot_product_groups=1,
                item_dot_product_groups=1,
                uid_embedding_hash_sizes=(),
            ),
        )
        ds = get_reco_dataset(cfg.data)
        batches = list(
            ds.train_dataset.batches(
                batch_size=16,
                max_output_length=cfg.train.gr_output_length + 1,
                shuffle=True, seed=0, drop_last=True,
            )
        )
        model, state, train_step, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batches[0]
        )
        rng = jax.random.PRNGKey(0)
        for batch in batches[:4]:
            state, _ = train_step(state, batch, rng)
        params = state.params
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLCertTopK64",
            table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        exact = np.asarray(model.apply(
            params, q, es.topk_state.item_tables, user_ids=feats.user_ids,
            method=model.score_precomputed,
        ))
        k = 10
        res, cert = tk.mol_certified_top_k(
            model, params, es.topk_state, q, k, cand_budget=64,
            user_ids=feats.user_ids,
        )
        certified = np.asarray(cert.certified)
        assert certified.all(), certified
        top_exact = -np.sort(-exact, axis=1)[:, :k]
        np.testing.assert_allclose(
            np.asarray(res.scores), top_exact, rtol=1e-4, atol=1e-4,
            err_msg="certified result does not match brute force",
        )

    def test_gap_bound_dominates_true_gap(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        k = 10
        for budget in (16, 64):
            res, cert = tk.mol_certified_top_k(
                model, params, es.topk_state, q, k, cand_budget=budget,
                user_ids=user_ids,
            )
            true_kth = -np.sort(-exact_scores, axis=1)[:, k - 1]
            returned_kth = np.asarray(res.scores[:, -1])
            true_gap = np.maximum(0.0, true_kth - returned_kth)
            gap_bound = np.asarray(cert.gap_bound)
            assert np.all(gap_bound >= true_gap - 1e-4), (
                budget, (gap_bound - true_gap).min(),
            )

    def test_factory_and_eval_state_spellings(self, trained):
        cfg, ds, model, params, batches = trained
        from rails_tpu.index.factory import get_top_k_raw, parse_top_k_budgets

        assert parse_top_k_budgets("MoLCertTopK4096") == {"cand_budget": 4096}
        assert parse_top_k_budgets("MoLCertTopK512Int8") == {"cand_budget": 512}
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLCertTopK300",
            table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        res = es.top_k_fn(q, 10, user_ids=feats.user_ids)
        assert res.ids.shape == (q.shape[0], 10)
        get_top_k_raw("MoLCertTopK100")   # parses


class TestCertifiedNaiveComb:
    def test_naive_bound_dominates_unseen_scores(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        state = es.topk_state
        for kpg in (4, 16):
            cands, bound = tk._naive_candidates(
                model, params, state, q, kpg, user_ids, return_bound=True
            )
            cands, bound = np.asarray(cands), np.asarray(bound)
            for b in range(exact_scores.shape[0]):
                seen = np.zeros(exact_scores.shape[1], bool)
                seen[cands[b]] = True
                unseen_scores = exact_scores[b][~seen]
                if unseen_scores.size:
                    assert unseen_scores.max() <= bound[b] + 1e-4, (
                        kpg, b, unseen_scores.max(), bound[b],
                    )

    @pytest.mark.parametrize("alg", ["naive", "comb"])
    def test_certified_result_matches_brute_force(self, trained, states, alg):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        k = 10
        if alg == "naive":
            res, cert = tk.mol_naive_top_k(
                model, params, es.topk_state, q, k, k_per_group=16,
                user_ids=user_ids, certified=True,
            )
        else:
            res, cert = tk.mol_comb_top_k(
                model, params, es.topk_state, q, k, avg_top_k=32,
                k_per_group=8, user_ids=user_ids, certified=True,
            )
        certified = np.asarray(cert.certified)
        top_exact = -np.sort(-exact_scores, axis=1)[:, :k]
        for b in range(exact_scores.shape[0]):
            if certified[b]:
                np.testing.assert_allclose(
                    np.asarray(res.scores[b]), top_exact[b],
                    rtol=1e-4, atol=1e-4,
                )

    def test_full_budget_certifies_trivially(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, _ = states
        x = len(ds.all_item_ids)
        _, cert = tk.mol_naive_top_k(
            model, params, es.topk_state, q, 10, k_per_group=x,
            user_ids=user_ids, certified=True,
        )
        assert bool(np.all(np.asarray(cert.certified)))
