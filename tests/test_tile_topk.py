"""Tile-granular Naive retrieval (`mol_tile_top_k`) + the per-group
block-max Pallas kernel (`fused_mol_group_block_max`).

Covers:
  - kernel parity against naive per-group block-max math (f32 + int8,
    batch-padding case);
  - full tile coverage == brute force (and certifies trivially);
  - certificate soundness: the per-group threshold bound dominates the
    exact MoL score of every unexamined item;
  - certified queries provably match brute force;
  - factory spellings and the sharded path (recall dominance over the
    single-device algorithm at the same per-shard budget).

The reference's counterpart slot is the per-group FAISS ANN union
(`/root/reference/rails/indexing/mol_top_k.py:176-201`), which is
bound-free; the per-query certificates are the rebuild's north-star
addition (BASELINE.json).
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
        model, params, ds.all_item_ids, "MoLTileTopK2",
        table_dtype=jnp.float32,
    )
    feats = batches[0].features
    q = model.apply(params, feats, method=model.encode)
    exact_scores = model.apply(
        params, q, es.topk_state.item_tables, user_ids=feats.user_ids,
        method=model.score_precomputed,
    )
    return es, q, feats.user_ids, np.asarray(exact_scores)


class TestGroupBlockMaxKernel:
    @pytest.mark.parametrize("block_b", [32, 8])
    def test_matches_naive_math(self, trained, states, block_b):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, _ = states
        from rails_tpu.ops.pallas.mol_scoring import fused_mol_group_block_max

        ft = es.topk_state.fused_tables
        q_comp = model.apply(
            params, q, user_ids, method=model.query_components
        )
        block_x = 128
        gmax = fused_mol_group_block_max(
            q_comp.astype(ft.item_comp_t.dtype), ft.item_comp_t,
            float(model.cfg.mol.temperature), block_x=block_x,
            block_b=block_b,
        )                                      # (B, L, NB), m-major rows
        # Naive: per-(query, group) max over each block of the PADDED
        # kernel-layout corpus (pad rows are zero -> logit 0 participates,
        # exactly as in the kernel).
        comp_pad = jnp.transpose(ft.item_comp_t, (2, 0, 1))   # (Xp, P_X, d_P)
        logits = jnp.einsum(
            "bnd,xmd->bnmx", q_comp, comp_pad.astype(q_comp.dtype),
            preferred_element_type=jnp.float32,
        ) / float(model.cfg.mol.temperature)   # (B, P_Q, P_X, Xp)
        b, p_q, p_x, xp = logits.shape
        nb = xp // block_x
        blk = logits.reshape(b, p_q, p_x, nb, block_x).max(axis=4)
        # m-major row order: l' = m * P_Q + n.
        expected = np.asarray(
            jnp.transpose(blk, (0, 2, 1, 3)).reshape(b, p_q * p_x, nb)
        )
        np.testing.assert_allclose(
            np.asarray(gmax), expected, rtol=1e-5, atol=1e-5
        )

    def test_int8_close_to_f32(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, _ = states
        from rails_tpu.ops.pallas.mol_scoring import (
            fused_mol_group_block_max, quantize_fused_tables,
        )

        ft8 = quantize_fused_tables(es.topk_state.fused_tables)
        q_comp = model.apply(
            params, q, user_ids, method=model.query_components
        )
        g8 = fused_mol_group_block_max(
            q_comp.astype(jnp.bfloat16), ft8.item_comp_t,
            float(model.cfg.mol.temperature), block_x=128,
            comp_scale=ft8.comp_scale,
        )
        g = fused_mol_group_block_max(
            q_comp.astype(es.topk_state.fused_tables.item_comp_t.dtype),
            es.topk_state.fused_tables.item_comp_t,
            float(model.cfg.mol.temperature), block_x=128,
        )
        np.testing.assert_allclose(
            np.asarray(g8), np.asarray(g), rtol=0.05, atol=0.1
        )


class TestTileTopK:
    def test_full_coverage_equals_brute_force_and_certifies(
        self, trained, states
    ):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        nb = es.topk_state.fused_tables.item_comp_t.shape[2] // 128
        res, cert = tk.mol_tile_top_k(
            model, params, es.topk_state, q, 10, tiles_per_group=nb,
            user_ids=user_ids, block_x=128, certified=True,
        )
        assert bool(np.all(np.asarray(cert.certified)))
        order = np.argsort(-exact_scores, axis=1)[:, :10]
        np.testing.assert_allclose(
            np.asarray(res.scores),
            np.take_along_axis(exact_scores, order, axis=1),
            rtol=1e-4, atol=1e-4,
        )

    def test_bound_dominates_unexamined_scores(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        from rails_tpu.ops.pallas.mol_scoring import fused_mol_group_block_max

        state = es.topk_state
        block_x = 128
        for kk in (1, 2):
            res, cert = tk.mol_tile_top_k(
                model, params, state, q, 10, tiles_per_group=kk,
                user_ids=user_ids, block_x=block_x, certified=True,
            )
            # Reconstruct the examined set: per group, top-kk tiles.
            q_comp = model.apply(
                params, q, user_ids, method=model.query_components
            )
            gmax = np.asarray(fused_mol_group_block_max(
                q_comp.astype(state.fused_tables.item_comp_t.dtype),
                state.fused_tables.item_comp_t,
                float(model.cfg.mol.temperature), block_x=block_x,
            ))
            b, l, nb = gmax.shape
            x = exact_scores.shape[1]
            for bi in range(b):
                seen = np.zeros(x, bool)
                for li in range(l):
                    tiles = np.argsort(-gmax[bi, li])[:kk]
                    for t in tiles:
                        seen[t * block_x : min((t + 1) * block_x, x)] = True
                unseen = exact_scores[bi][~seen]
                if unseen.size:
                    assert unseen.max() <= float(cert.ub_unexamined[bi]) + 1e-4

    def test_certified_implies_exactness(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        k = 10
        res, cert = tk.mol_tile_top_k(
            model, params, es.topk_state, q, k, tiles_per_group=2,
            user_ids=user_ids, block_x=128, certified=True,
        )
        certified = np.asarray(cert.certified)
        top_exact = -np.sort(-exact_scores, axis=1)[:, :k]
        for b in range(exact_scores.shape[0]):
            if certified[b]:
                np.testing.assert_allclose(
                    np.asarray(res.scores[b]), top_exact[b],
                    rtol=1e-4, atol=1e-4,
                )

    def test_recall_grows_with_budget(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        k = 20
        order = np.argsort(-exact_scores, axis=1)[:, :k]
        exact_ids = np.asarray(es.topk_state.item_ids)[order]
        recalls = []
        for kk in (1, 4):
            res = tk.mol_tile_top_k(
                model, params, es.topk_state, q, k, tiles_per_group=kk,
                user_ids=user_ids, block_x=128,
            )
            ids = np.asarray(res.ids)
            recalls.append(np.mean([
                len(set(ids[b]) & set(exact_ids[b])) / k
                for b in range(ids.shape[0])
            ]))
        assert recalls[-1] >= recalls[0]
        assert recalls[-1] > 0.95            # 4 tiles x 128 covers 512 >= X

    def test_factory_and_eval_state_spellings(self, trained):
        cfg, ds, model, params, batches = trained
        from rails_tpu.index.factory import get_top_k_raw, parse_top_k_budgets

        assert parse_top_k_budgets("MoLTileTopK8") == {"tiles_per_group": 8}
        assert parse_top_k_budgets("MoLTileTopK4Int8") == {
            "tiles_per_group": 4
        }
        assert parse_top_k_budgets("MoLTileTopK8B2048") == {
            "tiles_per_group": 8, "tile_budget": 2048,
        }
        get_top_k_raw("MoLTileTopK8B2048Int8")    # parses
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLTileTopK2",
            table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        res = es.top_k_fn(q, 10, user_ids=feats.user_ids)
        assert res.ids.shape == (q.shape[0], 10)
        assert np.all(np.asarray(res.ids) >= 1)   # no pad ids surface
        get_top_k_raw("MoLTileTopK16")    # parses


class TestTilesKernel:
    def test_matches_full_scorer_columns(self, trained, states):
        """fused_mol_scores_tiles == the matching columns of the full
        fused scorer (same kernel body, prefetched block index maps)."""
        cfg, ds, model, params, _ = trained
        es, q, user_ids, _ = states
        from rails_tpu.ops.pallas.mol_scoring import (
            extract_gating_qi_weights,
            fused_mol_scores_t,
            fused_mol_scores_tiles,
        )

        ft = es.topk_state.fused_tables
        q_comp = model.apply(
            params, q, user_ids, method=model.query_components
        ).astype(ft.item_comp_t.dtype)
        qp = model.apply(params, q, method=model.query_gating_partial)
        w = extract_gating_qi_weights(params)
        temp = float(model.cfg.mol.temperature)
        block_x = 128
        nb = ft.item_comp_t.shape[2] // block_x
        full = fused_mol_scores_t(
            q_comp, qp, ft.item_comp_t, ft.item_partial_t, w, temp,
            block_x=block_x,
        )
        # Shuffled tile list with a duplicate: output slot s must equal the
        # full scorer's block tile_ids[s] wherever it lands.
        tiles = jnp.asarray([2, 0, 2, nb - 1, 1], dtype=jnp.int32)
        sel = fused_mol_scores_tiles(
            q_comp, qp, tiles, ft.item_comp_t, ft.item_partial_t, w, temp,
            block_x=block_x,
        )
        b = q.shape[0]
        expected = np.concatenate(
            [
                np.asarray(full[:, t * block_x:(t + 1) * block_x])
                for t in [2, 0, 2, nb - 1, 1]
            ],
            axis=1,
        )
        np.testing.assert_allclose(
            np.asarray(sel), expected, rtol=1e-5, atol=1e-5
        )
        assert sel.shape == (b, 5 * block_x)


class TestSharedTileTopK:
    def test_full_coverage_equals_brute_force_and_certifies(
        self, trained, states
    ):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        nb = es.topk_state.fused_tables.item_comp_t.shape[2] // 128
        res, cert = tk.mol_tile_top_k_shared(
            model, params, es.topk_state, q, 10, tiles_per_group=nb,
            user_ids=user_ids, block_x=128, certified=True,
        )
        assert bool(np.all(np.asarray(cert.certified)))
        order = np.argsort(-exact_scores, axis=1)[:, :10]
        np.testing.assert_allclose(
            np.asarray(res.scores),
            np.take_along_axis(exact_scores, order, axis=1),
            rtol=1e-4, atol=1e-4,
        )

    def test_bound_dominates_unexamined_scores(self, trained, states):
        """Shared set: covered = union over ALL (query, group) nominations;
        each query's bound must dominate every score outside it."""
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        from rails_tpu.ops.pallas.mol_scoring import fused_mol_group_block_max

        state = es.topk_state
        block_x = 128
        for kk in (1, 2):
            res, cert = tk.mol_tile_top_k_shared(
                model, params, state, q, 10, tiles_per_group=kk,
                user_ids=user_ids, block_x=block_x, certified=True,
            )
            q_comp = model.apply(
                params, q, user_ids, method=model.query_components
            )
            gmax = np.asarray(fused_mol_group_block_max(
                q_comp.astype(state.fused_tables.item_comp_t.dtype),
                state.fused_tables.item_comp_t,
                float(model.cfg.mol.temperature), block_x=block_x,
            ))
            b, l, nb = gmax.shape
            x = exact_scores.shape[1]
            seen = np.zeros(x, bool)
            for bi in range(b):
                for li in range(l):
                    for t in np.argsort(-gmax[bi, li])[:kk]:
                        seen[t * block_x: min((t + 1) * block_x, x)] = True
            for bi in range(b):
                unseen = exact_scores[bi][~seen]
                if unseen.size:
                    assert unseen.max() <= float(cert.ub_unexamined[bi]) + 1e-4

    def test_certified_implies_exactness(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        k = 10
        res, cert = tk.mol_tile_top_k_shared(
            model, params, es.topk_state, q, k, tiles_per_group=2,
            user_ids=user_ids, block_x=128, certified=True,
        )
        certified = np.asarray(cert.certified)
        top_exact = -np.sort(-exact_scores, axis=1)[:, :k]
        for b in range(exact_scores.shape[0]):
            if certified[b]:
                np.testing.assert_allclose(
                    np.asarray(res.scores[b]), top_exact[b],
                    rtol=1e-4, atol=1e-4,
                )

    def test_shared_recall_dominates_per_query(self, trained, states):
        """The shared tile set is a superset of each query's own union, so
        shared recall >= the per-query variant at the same kk."""
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        k = 20
        order = np.argsort(-exact_scores, axis=1)[:, :k]
        exact_ids = np.asarray(es.topk_state.item_ids)[order]

        def recall(ids):
            ids = np.asarray(ids)
            return np.mean([
                len(set(ids[b]) & set(exact_ids[b])) / k
                for b in range(ids.shape[0])
            ])

        for kk in (1, 2):
            res_sh = tk.mol_tile_top_k_shared(
                model, params, es.topk_state, q, k, tiles_per_group=kk,
                user_ids=user_ids, block_x=128,
            )
            res_pq = tk.mol_tile_top_k(
                model, params, es.topk_state, q, k, tiles_per_group=kk,
                user_ids=user_ids, block_x=128,
            )
            assert recall(res_sh.ids) >= recall(res_pq.ids) - 1e-9
            assert np.all(np.asarray(res_sh.ids) >= 1)

    def test_budget_caps_at_distinct_corpus_tiles(self, trained, states):
        """The shared tile list never exceeds the corpus's distinct tile
        count: an oversized budget (or the default B*L*kk nomination count)
        must give the same result as full coverage, not score duplicate
        slots (the 500k-item measurement behind the cap: TileTopK32 scored
        8.4M columns of a 500k corpus before it)."""
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        nb = es.topk_state.fused_tables.item_comp_t.shape[2] // 128
        res_full, cert_full = tk.mol_tile_top_k_shared(
            model, params, es.topk_state, q, 10, tiles_per_group=nb,
            user_ids=user_ids, block_x=128, certified=True,
        )
        res_big, cert_big = tk.mol_tile_top_k_shared(
            model, params, es.topk_state, q, 10, tiles_per_group=nb,
            user_ids=user_ids, block_x=128, certified=True,
            tile_budget=10 * nb,
        )
        np.testing.assert_array_equal(
            np.asarray(res_full.ids), np.asarray(res_big.ids)
        )
        assert bool(np.all(np.asarray(cert_big.certified)))

    def test_tile_budget_cap_stays_sound(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        k = 10
        res, cert = tk.mol_tile_top_k_shared(
            model, params, es.topk_state, q, k, tiles_per_group=2,
            user_ids=user_ids, block_x=128, certified=True, tile_budget=3,
        )
        # Budgeted run returns valid ids and a (possibly looser) bound that
        # still dominates: rerun the full-coverage variant as the oracle.
        top_exact = -np.sort(-exact_scores, axis=1)[:, :k]
        assert np.all(np.asarray(res.ids) >= 1)
        assert np.all(np.asarray(res.scores) <= top_exact + 1e-4)
        certified = np.asarray(cert.certified)
        for b in range(exact_scores.shape[0]):
            if certified[b]:
                np.testing.assert_allclose(
                    np.asarray(res.scores[b]), top_exact[b],
                    rtol=1e-4, atol=1e-4,
                )

    def test_int8_tables(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        from rails_tpu.ops.pallas.mol_scoring import quantize_fused_tables

        state8 = es.topk_state._replace(
            fused_tables=quantize_fused_tables(es.topk_state.fused_tables)
        )
        nb = state8.fused_tables.item_comp_t.shape[2] // 128
        res = tk.mol_tile_top_k_shared(
            model, params, state8, q, 20, tiles_per_group=nb,
            user_ids=user_ids, block_x=128,
        )
        k = 20
        order = np.argsort(-exact_scores, axis=1)[:, :k]
        exact_ids = np.asarray(es.topk_state.item_ids)[order]
        ids = np.asarray(res.ids)
        overlap = np.mean([
            len(set(ids[b]) & set(exact_ids[b])) / k
            for b in range(ids.shape[0])
        ])
        assert overlap >= 0.9


class TestShardedTile:
    def test_sharded_dominates_single_device_budget(self, trained, states):
        cfg, ds, model, params, _ = trained
        es, q, user_ids, exact_scores = states
        from rails_tpu.core.config import MeshConfig
        from rails_tpu.core.mesh import make_mesh, replicate
        from rails_tpu.index.sharded import (
            make_sharded_top_k_fn, pad_and_shard_state,
        )

        mesh = make_mesh(MeshConfig(item_parallel=4))
        sh_state = pad_and_shard_state(es.topk_state, mesh)
        fn = make_sharded_top_k_fn(
            "MoLTileTopK1", model, replicate(params, mesh), sh_state, mesh,
            k=20,
        )
        res_sh = fn(q, user_ids=user_ids)
        res_1 = tk.mol_tile_top_k(
            model, params, es.topk_state, q, 20, tiles_per_group=1,
            user_ids=user_ids,
        )
        k = 20
        order = np.argsort(-exact_scores, axis=1)[:, :k]
        exact_ids = np.asarray(es.topk_state.item_ids)[order]

        def recall(ids):
            ids = np.asarray(ids)
            return np.mean([
                len(set(ids[b]) & set(exact_ids[b])) / k
                for b in range(ids.shape[0])
            ])

        assert np.all(np.asarray(res_sh.ids) >= 1)
        # Per group, the global top-kk tiles restricted to a shard rank at
        # least as high locally, so the sharded union covers the
        # single-device union: recall must dominate.
        assert recall(res_sh.ids) >= recall(res_1.ids) - 1e-9
