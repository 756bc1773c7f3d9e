"""Tests for the top-k retrieval stack: exact vs approximate algorithms,
seen-id filtering, rank extraction, recall harness."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.index import top_k as tk
from rails_tpu.index.candidate_index import (
    k_prime_for,
    select_top_k_with_invalid_filter,
)
from rails_tpu.index.factory import get_top_k_fn
from rails_tpu.models.encoder import SequentialRecommender
from rails_tpu.train.evaluation import (
    EvalState,
    eval_metrics_from_batches,
    get_eval_state,
    metrics_from_ranks,
    ranks_from_top_k,
    recall_vs_exact,
    summarize_metrics,
)
from rails_tpu.train.loop import create_train_state


@pytest.fixture(scope="module")
def trained():
    """A briefly-trained tiny model + dataset (so MoL scores are non-trivial)."""
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


class TestBruteForce:
    def test_matches_direct_argsort(self, trained):
        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        res = es.top_k_fn(q, 10, user_ids=feats.user_ids)
        # Direct full scoring through the similarity module.
        scores = model.apply(
            params, q, es.topk_state.item_tables, user_ids=feats.user_ids,
            method=model.score_precomputed,
        )
        order = np.argsort(-np.asarray(scores), axis=1)[:, :10]
        expected_ids = np.asarray(es.all_item_ids)[order]
        np.testing.assert_array_equal(np.asarray(res.ids), expected_ids)
        np.testing.assert_allclose(
            np.asarray(res.scores),
            np.take_along_axis(np.asarray(scores), order, axis=1),
            rtol=1e-5,
        )


class TestApproximateAlgorithms:
    @pytest.mark.parametrize(
        "method", ["MoLAvgTopK300", "MoLNaiveTopK300", "MoLCombTopK300_300"]
    )
    def test_full_budget_equals_brute_force(self, trained, method):
        """With the candidate budget >= corpus size (avg_top_k >= X,
        k_per_group >= X so the union covers everything), approx == exact."""
        cfg, ds, model, params, batches = trained
        x = len(ds.all_item_ids)
        assert x == 300 or x <= 300
        es_exact = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        es_apx = get_eval_state(
            model, params, ds.all_item_ids, method, table_dtype=jnp.float32
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        exact = es_exact.top_k_fn(q, 10, user_ids=feats.user_ids)
        apx = es_apx.top_k_fn(q, 10, user_ids=feats.user_ids)
        # Scores must agree to float tolerance; ids may swap only at
        # near-ties (different-but-equivalent fusion orders reorder ties).
        np.testing.assert_allclose(
            np.asarray(apx.scores), np.asarray(exact.scores), rtol=1e-4, atol=1e-4
        )
        ids_a, ids_e = np.asarray(apx.ids), np.asarray(exact.ids)
        mism = ids_a != ids_e
        if mism.any():
            s_e = np.asarray(exact.scores)
            for b, j in zip(*np.nonzero(mism)):
                neighborhood = np.abs(s_e[b] - s_e[b, j]) < 1e-3
                assert neighborhood.sum() > 1, (
                    f"id mismatch at ({b},{j}) without a score tie"
                )

    def test_tight_budget_high_recall(self, trained):
        cfg, ds, model, params, batches = trained
        es_exact = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        es_apx = get_eval_state(
            model, params, ds.all_item_ids, "MoLAvgTopK100",
            table_dtype=jnp.float32,
        )
        rec = recall_vs_exact(
            model, params, es_exact, es_apx, batches[:2], k=50,
        )
        assert rec["recall@50"] >= 0.5  # tight prefilter still mostly right

    @pytest.mark.parametrize(
        "method", ["MoLAvgTopK300", "MoLNaiveTopK300", "MoLCombTopK300_300"]
    )
    def test_fused_only_state_full_budget_equals_brute_force(
        self, trained, method
    ):
        """Naive/Avg/Comb against a `fused_only` (kernel-layout) state: the
        gathered-table rerank (`top_k.py:_gathered_candidate_tables`) must
        reproduce the standard-layout results exactly."""
        cfg, ds, model, params, batches = trained
        es_std = get_eval_state(
            model, params, ds.all_item_ids, method, table_dtype=jnp.float32
        )
        fused_state = tk.build_mol_topk_state(
            model, params, jnp.asarray(np.asarray(ds.all_item_ids)),
            es_std.item_embeddings, table_dtype=jnp.float32,
            build_fused=True, fused_only=True,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        std = es_std.top_k_fn(q, 10, user_ids=feats.user_ids)
        x = len(ds.all_item_ids)
        if method.startswith("MoLAvg"):
            fused = tk.mol_avg_top_k(
                model, params, fused_state, q, 10, avg_top_k=300,
                user_ids=feats.user_ids,
            )
        elif method.startswith("MoLNaive"):
            fused = tk.mol_naive_top_k(
                model, params, fused_state, q, 10, k_per_group=300,
                user_ids=feats.user_ids,
            )
        else:
            fused = tk.mol_comb_top_k(
                model, params, fused_state, q, 10, avg_top_k=300,
                k_per_group=300, user_ids=feats.user_ids,
            )
        np.testing.assert_allclose(
            np.asarray(fused.scores), np.asarray(std.scores),
            rtol=1e-4, atol=1e-4,
        )

    def test_streamed_naive_matches_one_shot(self, trained):
        """Forcing a tiny corpus_chunk exercises the lax.scan streaming path;
        candidates/results must match the one-shot einsum exactly."""
        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        one_shot = tk.mol_naive_top_k(
            model, params, es.topk_state, q, 10, k_per_group=25,
            user_ids=feats.user_ids,
        )
        streamed = tk.mol_naive_top_k(
            model, params, es.topk_state, q, 10, k_per_group=25,
            user_ids=feats.user_ids, corpus_chunk=64,
        )
        np.testing.assert_allclose(
            np.asarray(streamed.scores), np.asarray(one_shot.scores),
            rtol=1e-5, atol=1e-5,
        )
        # Same candidate sets modulo exact ties.
        s, o = np.asarray(streamed.ids), np.asarray(one_shot.ids)
        sc = np.asarray(one_shot.scores)
        for b, j in zip(*np.nonzero(s != o)):
            assert (np.abs(sc[b] - sc[b, j]) < 1e-5).sum() > 1

    def test_streamed_naive_full_budget_exact_at_uneven_tail(self, trained):
        """corpus 300 with chunk 64 leaves a clamped (overlapping) final
        chunk; the fresh-row mask must keep the full-budget union exact —
        every row scored in exactly one chunk."""
        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        ref = es.top_k_fn(q, 10, user_ids=feats.user_ids)
        streamed = tk.mol_naive_top_k(
            model, params, es.topk_state, q, 10, k_per_group=300,
            user_ids=feats.user_ids, corpus_chunk=64,
        )
        np.testing.assert_allclose(
            np.asarray(streamed.scores), np.asarray(ref.scores),
            rtol=1e-5, atol=1e-5,
        )

    def test_fused_brute_force_masks_mid_corpus_pad_rows(self, trained):
        """A corpus row carrying the reserved pad id 0 must never surface
        from the FUSED brute-force paths (parity with the standard path's
        `_mask_pad_rows` — previously only the standard path masked)."""
        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        state = tk.build_mol_topk_state(
            model, params, es.all_item_ids, es.item_embeddings,
            table_dtype=jnp.float32, build_fused=True, fused_block_x=32,
        )
        # Poison two mid-corpus rows with the pad id.
        poisoned = state._replace(
            item_ids=state.item_ids.at[jnp.asarray([5, 77])].set(0)
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        for fn in (tk.mol_brute_force_top_k_fused,
                   tk.mol_brute_force_top_k_fused_approx):
            res = fn(model, params, poisoned, q, 50,
                     user_ids=feats.user_ids, block_x=32)
            assert not np.any(np.asarray(res.ids) == 0), fn.__name__
        # And parity with the standard path on the same poisoned state.
        std = tk.mol_brute_force_top_k(
            model, params, poisoned, q, 50, user_ids=feats.user_ids
        )
        fused = tk.mol_brute_force_top_k_fused(
            model, params, poisoned, q, 50, user_ids=feats.user_ids,
            block_x=32,
        )
        np.testing.assert_array_equal(
            np.asarray(fused.ids), np.asarray(std.ids)
        )

    def test_int8_quantized_tables_high_overlap(self, trained):
        """int8 tables (half the HBM read) keep near-exact retrieval: top-k
        id overlap vs the f32 fused path stays high and scores track within
        quantization tolerance. The state carries the quantization; the
        Int8 method spellings select it."""
        cfg, ds, model, params, batches = trained
        es32 = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopKFused",
            table_dtype=jnp.float32,
        )
        es8 = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopKFusedInt8",
            table_dtype=jnp.float32,
        )
        assert es8.topk_state.fused_tables.item_comp_t.dtype == jnp.int8
        assert es8.topk_state.fused_tables.comp_scale is not None
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        exact = es32.top_k_fn(q, 20, user_ids=feats.user_ids)
        quant = es8.top_k_fn(q, 20, user_ids=feats.user_ids)
        overlap = np.mean([
            np.intersect1d(a, b).size / 20
            for a, b in zip(np.asarray(quant.ids), np.asarray(exact.ids))
        ])
        assert overlap >= 0.9, overlap
        # Scores of the agreed items track closely.
        np.testing.assert_allclose(
            np.asarray(quant.scores[:, 0]), np.asarray(exact.scores[:, 0]),
            rtol=0.05, atol=0.05,
        )

    def test_int8_fused_only_rerank_paths_dequantize(self, trained):
        """fused_only + int8: the gathered-rerank algorithms (Naive) must
        dequantize candidates — full budget stays within quantization
        tolerance of the f32 exact scores."""
        cfg, ds, model, params, batches = trained
        es32 = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        state8 = tk.build_mol_topk_state(
            model, params, es32.all_item_ids, es32.item_embeddings,
            table_dtype=jnp.float32, build_fused=True, fused_block_x=32,
            fused_only=True, quantize_fused=True,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        ref = es32.top_k_fn(q, 10, user_ids=feats.user_ids)
        got = tk.mol_naive_top_k(
            model, params, state8, q, 10, k_per_group=300,
            user_ids=feats.user_ids,
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(ref.scores), rtol=0.05,
            atol=0.05,
        )

    def test_naive_dedup_no_duplicate_ids(self, trained):
        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLNaiveTopK10",
            table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        res = es.top_k_fn(q, 20, user_ids=feats.user_ids)
        ids = np.asarray(res.ids)
        scores = np.asarray(res.scores)
        for b in range(ids.shape[0]):
            kept = ids[b][scores[b] > tk.NEG_DUP]
            assert len(np.unique(kept)) == len(kept)


class TestServingStatePersistence:
    @pytest.mark.parametrize(
        "method", ["MoLBruteForceTopK", "MoLBruteForceTopKFusedInt8",
                   "MoLIVFTopK4", "MIPSBruteForceTopK"],
    )
    def test_save_load_roundtrip_identical_results(self, trained, tmp_path, method):
        """Persisted serving state (standard, int8 fused, IVF) restores to
        identical retrieval results without re-embedding the corpus."""
        from rails_tpu.index.serving_state import (
            load_serving_state,
            save_serving_state,
        )

        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, method, table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        want = es.top_k_fn(q, 15, user_ids=feats.user_ids)

        path = str(tmp_path / "serving_state")
        save_serving_state(path, es)
        es2 = load_serving_state(path, model, params)
        assert es2.top_k_method == method
        assert es2.num_objects == es.num_objects
        got = es2.top_k_fn(q, 15, user_ids=feats.user_ids)
        np.testing.assert_array_equal(np.asarray(got.ids), np.asarray(want.ids))
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6,
        )

    @pytest.mark.parametrize(
        "method", ["MoLBruteForceTopKFusedInt8", "MoLIVFTopK4"],
    )
    def test_streamed_save_load_roundtrip(self, trained, tmp_path, method):
        """The chunked-memmap format (streamed=True) round-trips to
        identical retrieval results — incl. int8 scales (bf16/int8 bit
        patterns stored as uint views) and the IVF index."""
        import dataclasses

        from rails_tpu.index.serving_state import (
            load_serving_state,
            save_serving_state,
        )

        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, method, table_dtype=jnp.float32,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        want = es.top_k_fn(q, 15, user_ids=feats.user_ids)

        path = str(tmp_path / "serving_state_streamed")
        # chunk_items far below the corpus size: many chunks per table.
        save_serving_state(path, es, streamed=True, chunk_items=64)
        es2 = load_serving_state(path, model, params)
        got = es2.top_k_fn(q, 15, user_ids=feats.user_ids)
        np.testing.assert_array_equal(
            np.asarray(got.ids), np.asarray(want.ids)
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6,
        )

    def test_streamed_save_of_sharded_state_roundtrips_on_mesh(
        self, trained, tmp_path
    ):
        """Save a state that LIVES SHARDED on the 8-way mesh (per-chunk
        slices gather chunk-sized pieces — never the full tables), host-load
        the memmaps, re-shard, and retrieve identically."""
        import dataclasses

        import jax
        from rails_tpu.core.config import MeshConfig
        from rails_tpu.core.mesh import make_mesh, replicate
        from rails_tpu.index.serving_state import (
            load_serving_state,
            save_serving_state,
        )
        from rails_tpu.index.sharded import (
            make_sharded_top_k_fn, pad_and_shard_state,
        )

        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopKFused",
            table_dtype=jnp.float32,
        )
        mesh = make_mesh(MeshConfig(item_parallel=8))
        sh_state = pad_and_shard_state(es.topk_state, mesh)
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        params_r = replicate(params, mesh)
        fn = make_sharded_top_k_fn(
            "MoLBruteForceTopKFused", model, params_r, sh_state, mesh, k=15,
        )
        want = fn(q, user_ids=feats.user_ids)

        path = str(tmp_path / "ss_sharded_streamed")
        save_serving_state(
            path, dataclasses.replace(es, topk_state=sh_state),
            streamed=True, chunk_items=64,
        )
        es_h = load_serving_state(path, model, params, host=True)
        assert isinstance(es_h.topk_state.avg_component, np.ndarray)
        sh2 = pad_and_shard_state(es_h.topk_state, mesh)
        fn2 = make_sharded_top_k_fn(
            "MoLBruteForceTopKFused", model, params_r, sh2, mesh, k=15,
        )
        got = fn2(q, user_ids=feats.user_ids)
        np.testing.assert_array_equal(
            np.asarray(got.ids), np.asarray(want.ids)
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(want.scores), rtol=1e-6,
        )

    def test_host_load_feeds_sharded_upload(self, trained, tmp_path):
        """host=True restores numpy tables (no unsharded device copy) that
        pad_and_shard_state uploads directly to the sharded layout."""
        import jax
        from rails_tpu.core.config import MeshConfig
        from rails_tpu.core.mesh import make_mesh
        from rails_tpu.index.serving_state import (
            load_serving_state,
            save_serving_state,
        )
        from rails_tpu.index.sharded import pad_and_shard_state

        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        path = str(tmp_path / "ss_host")
        save_serving_state(path, es)
        es_h = load_serving_state(path, model, params, host=True)
        assert es_h.top_k_fn is None
        assert isinstance(es_h.topk_state.item_ids, np.ndarray)
        mesh = make_mesh(MeshConfig(item_parallel=2))
        sh = pad_and_shard_state(es_h.topk_state, mesh)
        assert jax.devices()[0].platform == "cpu"
        assert sh.item_ids.shape[0] % 2 == 0


class TestLatencyHarness:
    def test_scanned_latency_stats(self, trained):
        """include_eval_time uses the in-jit scanned reps
        (`make_scanned_latency_fn`) — stats must come back finite and the
        metrics must be unaffected by the timing pass."""
        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        m_timed, lat = eval_metrics_from_batches(
            model, params, es, batches[:2], k=50,
            include_eval_time=True, timing_fraction=1.0, timed_runs=4,
        )
        m_plain, no_lat = eval_metrics_from_batches(
            model, params, es, batches[:2], k=50,
        )
        assert no_lat is None
        assert lat is not None and lat.num_measurements == 2
        assert np.isfinite(lat.mean_ms) and lat.mean_ms > 0
        np.testing.assert_allclose(m_timed["hr@50"], m_plain["hr@50"])


class TestInvalidFilter:
    def test_seen_ids_removed_in_order(self):
        ids = jnp.array([[5, 3, 9, 7, 1, 2]])
        scores = jnp.array([[0.9, 0.8, 0.7, 0.6, 0.5, 0.4]])
        res = select_top_k_with_invalid_filter(
            tk.TopKResult(scores=scores, ids=ids),
            invalid_ids=jnp.array([[3, 7]]),
            k=3,
        )
        np.testing.assert_array_equal(np.asarray(res.ids), [[5, 9, 1]])
        np.testing.assert_allclose(np.asarray(res.scores), [[0.9, 0.7, 0.5]])

    def test_backfill_when_not_enough_valid(self):
        ids = jnp.array([[5, 3, 9]])
        scores = jnp.array([[0.9, 0.8, 0.7]])
        res = select_top_k_with_invalid_filter(
            tk.TopKResult(scores=scores, ids=ids),
            invalid_ids=jnp.array([[3, 9]]),
            k=2,
        )
        # Only id 5 is valid; backfill takes the first masked entry (3).
        np.testing.assert_array_equal(np.asarray(res.ids), [[5, 3]])

    def test_zero_padding_in_invalid_never_matches(self):
        ids = jnp.array([[5, 3, 9]])
        scores = jnp.array([[0.9, 0.8, 0.7]])
        res = select_top_k_with_invalid_filter(
            tk.TopKResult(scores=scores, ids=ids),
            invalid_ids=jnp.array([[0, 0]]),
            k=2,
        )
        np.testing.assert_array_equal(np.asarray(res.ids), [[5, 3]])

    def test_k_prime_rule(self):
        assert k_prime_for(10, 1000, 5) == 15
        assert k_prime_for(10, 12, 5) == 12
        assert k_prime_for(120, 100000, 211, truncate_k_prime_to=200) == 200


class TestRanksAndMetrics:
    def test_rank_extraction(self):
        top = jnp.array([[4, 2, 9], [1, 1, 1]])
        tgt = jnp.array([9, 5])
        ranks = np.asarray(ranks_from_top_k(top, tgt))
        assert ranks[0] == 3
        assert ranks[1] > 1000  # sentinel: missing

    def test_metric_values(self):
        ranks = jnp.array([1, 2, 11, 2000])
        m = metrics_from_ranks(ranks)
        np.testing.assert_allclose(np.asarray(m["hr@1"]), [1, 0, 0, 0])
        np.testing.assert_allclose(np.asarray(m["hr@10"]), [1, 1, 0, 0])
        np.testing.assert_allclose(
            np.asarray(m["ndcg@10"])[:2], [1.0, 1.0 / np.log2(3.0)]
        )
        np.testing.assert_allclose(
            np.asarray(m["mrr"]), [1.0, 0.5, 1 / 11.0, 1 / 2000.0]
        )

    def test_end_to_end_eval(self, trained):
        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK"
        )
        metrics, lat = eval_metrics_from_batches(
            model, params, es, batches[:2], k=50
        )
        summary = summarize_metrics(metrics)
        assert 0.0 <= summary["hr@50"] <= 1.0
        assert summary["hr@10"] <= summary["hr@50"] + 1e-9
        assert lat is None


class TestFactoryNameCoverage:
    def test_all_reference_factory_names_parse(self):
        """Every top_k_method name the reference factory supports
        (`indexing/utils_rails.py:25-233`) must resolve here."""
        from rails_tpu.index.factory import get_top_k_raw

        names = (
            ["MIPSBruteForceTopK", "MoLBruteForceTopK", "MoLBruteForceTopKFused"]
            + [f"MoLNaiveTopK{k}" for k in (5, 10, 25, 50, 75, 100)]
            + ["MoLNaiveFaissTopK5"]
            + [f"MoLAvgTopK{k}" for k in
               (100, 200, 300, 400, 500, 800, 1000, 1500, 2000, 4000)]
            + ["MoLCombTopK5_200", "MoLCombTopK10_100", "MoLCombTopK50_500",
               "MoLCombTopK100_1000"]
        )
        for name in names:
            assert callable(get_top_k_raw(name)), name

    def test_unknown_name_raises(self):
        from rails_tpu.index.factory import get_top_k_raw
        import pytest as _pytest

        with _pytest.raises(ValueError):
            get_top_k_raw("MoLMagicTopK")


class TestChunkedFusedBuilder:
    def test_chunked_matches_oneshot(self, trained):
        from rails_tpu.index.top_k import (
            build_fused_state_chunked,
            build_mol_topk_state,
        )

        cfg, ds, model, params, batches = trained
        ids = jnp.asarray(ds.all_item_ids, dtype=jnp.int32)
        item_emb = model.apply(params, ids, method=model.get_item_embeddings)
        ref = build_mol_topk_state(
            model, params, ids, item_emb, table_dtype=jnp.float32,
            build_fused=True, fused_block_x=64,
        )
        chunked = build_fused_state_chunked(
            model, params, ids,
            embed_chunk_fn=lambda s, cids: model.apply(
                params, cids, method=model.get_item_embeddings
            ),
            chunk_size=77,             # deliberately not divisible
            table_dtype=jnp.float32,
            fused_block_x=64,
        )
        np.testing.assert_allclose(
            np.asarray(chunked.fused_tables.item_comp_t),
            np.asarray(ref.fused_tables.item_comp_t),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(chunked.fused_tables.item_partial_t),
            np.asarray(ref.fused_tables.item_partial_t),
            rtol=1e-6, atol=1e-6,
        )
        x = len(ds.all_item_ids)
        np.testing.assert_array_equal(
            np.asarray(chunked.item_ids[:x]), np.asarray(ids)
        )
        assert (np.asarray(chunked.item_ids[x:]) == 0).all()
        np.testing.assert_allclose(
            np.asarray(chunked.avg_component[:x]),
            np.asarray(ref.avg_component), rtol=1e-6, atol=1e-6,
        )

    def test_on_device_builder_matches_host_builder(self, trained):
        from rails_tpu.index.top_k import (
            build_fused_state_chunked,
            build_fused_state_chunked_on_device,
        )

        cfg, ds, model, params, batches = trained
        ids = jnp.asarray(ds.all_item_ids, dtype=jnp.int32)
        embed_fn = lambda s, cids: model.apply(  # noqa: E731
            params, cids, method=model.get_item_embeddings
        )
        host = build_fused_state_chunked(
            model, params, ids, embed_fn, chunk_size=77,
            table_dtype=jnp.float32, fused_block_x=64,
        )
        dev = build_fused_state_chunked_on_device(
            model, params, ids, embed_fn, chunk_size=77,
            table_dtype=jnp.float32, fused_block_x=64,
        )
        for a, b in (
            (host.fused_tables.item_comp_t, dev.fused_tables.item_comp_t),
            (host.fused_tables.item_partial_t, dev.fused_tables.item_partial_t),
            (host.avg_component, dev.avg_component),
            (host.item_ids, dev.item_ids),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=0
            )


    def test_on_device_builder_in_build_int8_matches_post_hoc(self, trained):
        """quantize=True quantizes per chunk inside the build; scales are
        per-item, so the result is equivalent to assembling bf16 tables and
        quantizing after (the path 16M+ corpora cannot take — the bf16
        tables would not fit HBM). "Equivalent" up to XLA's
        divide-by-constant rewrites differing between the two programs:
        scales agree to ~1 ULP and int8 codes by at most one step at exact
        rounding boundaries."""
        from rails_tpu.index.top_k import build_fused_state_chunked_on_device
        from rails_tpu.ops.pallas.mol_scoring import quantize_fused_tables

        cfg, ds, model, params, batches = trained
        ids = jnp.asarray(ds.all_item_ids, dtype=jnp.int32)
        embed_fn = lambda s, cids: model.apply(  # noqa: E731
            params, cids, method=model.get_item_embeddings
        )
        kw = dict(chunk_size=77, table_dtype=jnp.bfloat16, fused_block_x=64)
        post = quantize_fused_tables(
            build_fused_state_chunked_on_device(
                model, params, ids, embed_fn, **kw
            ).fused_tables
        )
        inb = build_fused_state_chunked_on_device(
            model, params, ids, embed_fn, quantize=True, **kw
        ).fused_tables
        for a, b in (
            (post.comp_scale, inb.comp_scale),
            (post.partial_scale, inb.partial_scale),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=0
            )
        for a, b in (
            (post.item_comp_t, inb.item_comp_t),
            (post.item_partial_t, inb.item_partial_t),
        ):
            d = np.abs(
                np.asarray(a, np.int32) - np.asarray(b, np.int32)
            )
            assert d.max() <= 1, d.max()
            # Boundary flips are rare — a systematic offset would light
            # this up.
            assert d.mean() < 1e-2, d.mean()


class TestChunkedTopK:
    def test_matches_lax_top_k_with_ties(self):
        from rails_tpu.index.top_k import chunked_top_k

        rng = np.random.default_rng(7)
        # Quantized scores force many exact ties across chunk boundaries.
        s = jnp.asarray(
            np.round(rng.standard_normal((16, 3001)) * 4) / 4, jnp.float32
        )
        for k, c in ((1, 32), (7, 32), (200, 32), (200, 7), (1500, 16)):
            ve, ie = jax.lax.top_k(s, k)
            vg, ig = chunked_top_k(s, k, target_chunks=c)
            np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
            np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))

    def test_small_x_falls_through(self):
        from rails_tpu.index.top_k import chunked_top_k

        rng = np.random.default_rng(8)
        s = jnp.asarray(rng.standard_normal((4, 50)), jnp.float32)
        ve, ie = jax.lax.top_k(s, 30)
        vg, ig = chunked_top_k(s, 30)
        np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))


class TestHierarchicalTopK:
    def test_matches_lax_top_k_random(self):
        from rails_tpu.index.top_k import hierarchical_top_k

        rng = np.random.default_rng(11)
        # Distinct scores: ids must match plain top_k exactly.
        s = jnp.asarray(rng.standard_normal((8, 40_000)), jnp.float32)
        for k, tile in ((1, 256), (13, 256), (200, 256), (200, 64)):
            ve, ie = jax.lax.top_k(s, k)
            vg, ig = hierarchical_top_k(s, k, tile=tile)
            np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
            np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))

    def test_concentrated_in_one_tile(self):
        from rails_tpu.index.top_k import hierarchical_top_k

        # Adversarial: ALL top-k items inside a single tile — the union
        # argument must still cover them (that tile is gathered whole).
        rng = np.random.default_rng(12)
        s = rng.standard_normal((4, 10_000)).astype(np.float32)
        s[:, 3000:3200] += 100.0
        s = jnp.asarray(s)
        ve, ie = jax.lax.top_k(s, 150)
        vg, ig = hierarchical_top_k(s, 150, tile=256)
        np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))

    def test_ties_exact_score_multiset(self):
        from rails_tpu.index.top_k import hierarchical_top_k

        rng = np.random.default_rng(13)
        # Quantized scores: massive tie plateaus spanning tiles. The score
        # MULTISET must match plain top_k (tie ids may legitimately differ).
        s = jnp.asarray(
            np.round(rng.standard_normal((8, 20_000)) * 2) / 2, jnp.float32
        )
        for k in (7, 200):
            ve, _ = jax.lax.top_k(s, k)
            vg, ig = hierarchical_top_k(s, k, tile=256)
            np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
            # Returned ids must actually carry the returned scores.
            picked = np.take_along_axis(
                np.asarray(s), np.asarray(ig), axis=1
            )
            np.testing.assert_array_equal(picked, np.asarray(vg))

    def test_uneven_tail_and_pad_rows(self):
        from rails_tpu.index.top_k import NEG_PAD, hierarchical_top_k

        rng = np.random.default_rng(14)
        # X not a multiple of tile + trailing pad rows masked to NEG_PAD
        # (the fused-serving layout).
        s = rng.standard_normal((4, 9_991)).astype(np.float32)
        s[:, 9_800:] = NEG_PAD
        s = jnp.asarray(s)
        ve, ie = jax.lax.top_k(s, 64)
        vg, ig = hierarchical_top_k(s, 64, tile=256)
        np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))

    def test_few_tiles_falls_through(self):
        from rails_tpu.index.top_k import hierarchical_top_k

        rng = np.random.default_rng(15)
        s = jnp.asarray(rng.standard_normal((4, 2_000)), jnp.float32)
        ve, ie = jax.lax.top_k(s, 500)      # k > X/tile -> fallback branch
        vg, ig = hierarchical_top_k(s, 500, tile=256)
        np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))

    def test_large_x_dispatch_via_chunked(self):
        from rails_tpu.index.top_k import _CHUNK_MAX_X, chunked_top_k

        rng = np.random.default_rng(16)
        x = _CHUNK_MAX_X + 4_096
        s = jnp.asarray(rng.standard_normal((2, x)), jnp.float32)
        ve, ie = jax.lax.top_k(s, 50)
        vg, ig = chunked_top_k(s, 50)       # dispatches to hierarchical
        np.testing.assert_array_equal(np.asarray(vg), np.asarray(ve))
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))


class TestBlockmaxSelect:
    def test_hierarchical_accepts_precomputed_tile_max(self):
        from rails_tpu.index.top_k import hierarchical_top_k

        rng = np.random.default_rng(7)
        s = jnp.asarray(rng.normal(size=(4, 4096)).astype(np.float32))
        tm = jnp.asarray(
            np.asarray(s).reshape(4, -1, 256).max(axis=2)
        )
        ve, ie = jax.lax.top_k(s, 7)
        vg, ig = hierarchical_top_k(s, 7, tile=256, tile_max=tm)
        np.testing.assert_allclose(np.asarray(vg), np.asarray(ve))
        np.testing.assert_array_equal(np.asarray(ig), np.asarray(ie))

    def test_hierarchical_inflated_tile_max_with_extra_tiles(self):
        """An upper-bound tile_max (inflated on a few tiles) plus
        extra_tiles >= #inflated stays exact."""
        from rails_tpu.index.top_k import hierarchical_top_k

        rng = np.random.default_rng(8)
        s = jnp.asarray(rng.normal(size=(3, 8192)).astype(np.float32))
        tm = np.asarray(s).reshape(3, -1, 256).max(axis=2)
        tm[:, 3] += 100.0     # two tiles inflated far above the truth
        tm[:, 17] += 50.0
        ve, _ = jax.lax.top_k(s, 9)
        vg, ig = hierarchical_top_k(
            s, 9, tile=256, tile_max=jnp.asarray(tm), extra_tiles=2
        )
        np.testing.assert_allclose(np.asarray(vg), np.asarray(ve))

    def test_fused_blockmax_path_matches_plain_at_scale_threshold(
        self, trained, monkeypatch
    ):
        """Force the blockmax-select path at test scale by shrinking
        _CHUNK_MAX_X; results (with mid-corpus pad rows poisoned) must
        match the plain fused path id-for-id."""
        import rails_tpu.index.top_k as tkm

        cfg, ds, model, params, batches = trained
        es = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        state = tk.build_mol_topk_state(
            model, params, es.all_item_ids, es.item_embeddings,
            table_dtype=jnp.float32, build_fused=True, fused_block_x=256,
        )
        poisoned = state._replace(
            item_ids=state.item_ids.at[jnp.asarray([5, 77])].set(0)
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        k = 7
        ref = tk.mol_brute_force_top_k_fused(
            model, params, poisoned, q, k, user_ids=feats.user_ids
        )
        monkeypatch.setattr(tkm, "_CHUNK_MAX_X", 64)
        got = tk.mol_brute_force_top_k_fused(
            model, params, poisoned, q, k, user_ids=feats.user_ids
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(ref.scores),
            rtol=1e-5, atol=1e-5,
        )
        assert np.all(np.asarray(got.ids) >= 1)


class TestStreamedColumnGather:
    def _tables(self, quantize, xp=512, m=3, d=16, l=6):
        from rails_tpu.ops.pallas.mol_scoring import FusedCorpusTables

        rng = np.random.default_rng(11)
        comp = jnp.asarray(
            rng.normal(size=(m, d, xp)).astype(np.float32)
        ).astype(jnp.bfloat16)
        gp = jnp.asarray(
            rng.normal(size=(l, xp)).astype(np.float32)
        ).astype(jnp.bfloat16)
        cs = ps = None
        if quantize:
            comp = jnp.asarray(
                rng.integers(-127, 128, size=(m, d, xp)), jnp.int8
            )
            gp = jnp.asarray(rng.integers(-127, 128, size=(l, xp)), jnp.int8)
            cs = jnp.asarray(rng.uniform(0.01, 1, (m, xp)).astype(np.float32))
            ps = jnp.asarray(rng.uniform(0.01, 1, (1, xp)).astype(np.float32))
        return FusedCorpusTables(
            item_comp_t=comp, item_partial_t=gp, num_items=xp,
            comp_scale=cs, partial_scale=ps,
        )

    @pytest.mark.parametrize("quantize", [False, True])
    def test_matches_direct_take(self, quantize, monkeypatch):
        """The corpus-chunk-scan gather (the >_CHUNK_MAX_X path that avoids
        XLA's full-table lane relayout) is elementwise identical to the
        direct minor-axis take, including the clamped overlapping final
        chunk and int8 scales."""
        import rails_tpu.index.top_k as tkm

        ft = self._tables(quantize, xp=500)   # non-multiple: clamped tail
        rng = np.random.default_rng(12)
        idx = jnp.asarray(rng.integers(0, 500, size=(4, 9)), jnp.int32)
        monkeypatch.setattr(tkm, "_CHUNK_MAX_X", 128)
        comp_g, gp_g, cs_g, ps_g = tkm._streamed_fused_column_gather(ft, idx)
        np.testing.assert_array_equal(
            np.asarray(comp_g),
            np.asarray(jnp.take(ft.item_comp_t, idx, axis=2)),
        )
        np.testing.assert_array_equal(
            np.asarray(gp_g),
            np.asarray(jnp.take(ft.item_partial_t, idx, axis=1)),
        )
        if quantize:
            np.testing.assert_array_equal(
                np.asarray(cs_g),
                np.asarray(jnp.take(ft.comp_scale, idx, axis=1)),
            )
            np.testing.assert_array_equal(
                np.asarray(ps_g),
                np.asarray(jnp.take(ft.partial_scale[0], idx, axis=0)),
            )
        else:
            assert cs_g is None and ps_g is None

    def test_pregathered_chunked_rerank_matches_oneshot(
        self, trained, monkeypatch
    ):
        """The huge-corpus rerank branch (streamed pre-gather of ALL
        candidate columns + scan over gathered slices — the r5 fix for the
        8M nested-gather relayout OOM) must match the one-shot rerank
        id-for-id. Thresholds shrunk so the branch activates at test
        scale."""
        import rails_tpu.index.top_k as tkm

        cfg, ds, model, params, batches = trained
        es_std = get_eval_state(
            model, params, ds.all_item_ids, "MoLBruteForceTopK",
            table_dtype=jnp.float32,
        )
        fused_state = tk.build_mol_topk_state(
            model, params, jnp.asarray(np.asarray(ds.all_item_ids)),
            es_std.item_embeddings, table_dtype=jnp.float32,
            build_fused=True, fused_only=True,
        )
        feats = batches[0].features
        q = model.apply(params, feats, method=model.encode)
        rng = np.random.default_rng(5)
        x = len(ds.all_item_ids)
        cand = jnp.asarray(
            rng.integers(0, x, size=(q.shape[0], 96)), jnp.int32
        )
        ref = tk.dedup_rerank_top_k(
            model, params, fused_state, q, cand, 9, feats.user_ids,
            cand_chunk=None,
        )
        monkeypatch.setattr(tkm, "_CHUNK_MAX_X", 32)
        got = tk.dedup_rerank_top_k(
            model, params, fused_state, q, cand, 9, feats.user_ids,
            cand_chunk=16,
        )
        np.testing.assert_allclose(
            np.asarray(got.scores), np.asarray(ref.scores),
            rtol=1e-5, atol=1e-5,
        )
        np.testing.assert_array_equal(
            np.asarray(got.ids), np.asarray(ref.ids)
        )
