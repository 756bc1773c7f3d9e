"""Checkpoint-importer tests: a reference torch checkpoint (saved exactly as
`/root/reference/train.py:538-547` does, DDP `module.` prefix included) is
converted by `rails_tpu/compat/torch_import.py` and must reproduce the
reference model's outputs — the migration path for users bringing trained
reference weights over without retraining."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from rails_tpu.compat.torch_import import (
    import_torch_checkpoint,
    params_from_reference_state_dict,
)
from rails_tpu.models.encoder import SequentialRecommender
from tests import test_torch_parity_model as pm
from tests.torch_ref import t2j


def _save_reference_ckpt(ref, path, epoch=7, batch_id=13, legacy=False):
    sd = {f"module.{k}": v for k, v in ref.state_dict().items()}
    if legacy:
        sd = {
            k.replace(
                "_ndp_module._item_embeddings_fn._item_emb_proj_module",
                "_ndp_module._item_proj_module",
            ): v
            for k, v in sd.items()
        }
    torch.save(
        {
            "epoch": epoch,
            "batch_id": batch_id,
            "model_state_dict": sd,
            "optimizer_state_dict": {},
        },
        path,
    )


class TestHSTUImport:
    def test_imported_params_reproduce_reference_encode(self, tmp_path):
        ref = pm._build_ref_hstu()
        path = str(tmp_path / "ref_ep7")
        _save_reference_ckpt(ref, path)

        cfg = pm._experiment_cfg("HSTU")
        params, epoch, batch_id = import_torch_checkpoint(path, cfg)
        assert (epoch, batch_id) == (7, 13)

        model = SequentialRecommender(cfg, num_items=pm.NUM_ITEMS)
        lengths, ids, ts, uids = pm._features(seed=3)
        ref_out = pm._ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, pm._my_features(lengths, ids, ts, uids), method=model.encode
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )

    def test_legacy_item_proj_layout(self, tmp_path):
        """Pre-rename checkpoints (`eval_from_checkpoint.py:366-374`) import
        identically."""
        ref = pm._build_ref_hstu()
        path = str(tmp_path / "ref_legacy")
        _save_reference_ckpt(ref, path, legacy=True)
        cfg = pm._experiment_cfg("HSTU")
        params, _, _ = import_torch_checkpoint(path, cfg)
        want = pm._hstu_params_from_torch(ref)
        got = params["params"]
        np.testing.assert_allclose(
            got["mol"]["item_proj"]["out"]["kernel"],
            want["mol"]["item_proj"]["out"]["kernel"],
        )

    def test_importer_matches_live_module_transplant(self, tmp_path):
        """The state-dict-driven conversion equals the live-module transplant
        used by the parity tests, leaf for leaf."""
        import jax

        ref = pm._build_ref_hstu()
        cfg = pm._experiment_cfg("HSTU")
        got = params_from_reference_state_dict(ref.state_dict(), cfg)["params"]
        want = pm._hstu_params_from_torch(ref)
        g_flat = jax.tree_util.tree_flatten_with_path(got)[0]
        w_flat = jax.tree_util.tree_flatten_with_path(want)[0]
        assert [k for k, _ in g_flat] == [k for k, _ in w_flat]
        for (kp, g), (_, w) in zip(g_flat, w_flat):
            np.testing.assert_array_equal(g, np.asarray(w), err_msg=str(kp))

    def test_geometry_mismatch_raises_with_paths(self, tmp_path):
        ref = pm._build_ref_hstu()
        bad_cfg = pm._experiment_cfg("HSTU")
        bad_cfg = bad_cfg.replace(hstu=bad_cfg.hstu.replace(dqk=8))
        with pytest.raises(ValueError, match="shape mismatch"):
            params_from_reference_state_dict(ref.state_dict(), bad_cfg)

    def test_unconsumed_keys_raise_unless_no_strict(self):
        ref = pm._build_ref_hstu()
        sd = dict(ref.state_dict())
        sd["_some_new_module.weight"] = torch.zeros(3)
        cfg = pm._experiment_cfg("HSTU")
        with pytest.raises(ValueError, match="not consumed"):
            params_from_reference_state_dict(sd, cfg)
        params_from_reference_state_dict(sd, cfg, strict=False)


class TestRatedPreprocessorImport:
    RD = 8          # rating embedding dim
    NUM_RATINGS = 6

    def _build_ref_rated_hstu(self):
        """Reference HSTU assembled with the RATED input preprocessor
        (`input_features_preprocessors.py:94-155`, library surface — the
        reference's train.py hardcodes positional, but a library user can
        wire this exactly as here: encoder width d + rating_dim, output
        postproc slices back to d)."""
        from modeling.sequential.embedding_modules import LocalEmbeddingModule
        from modeling.sequential.hstu import HSTU
        from modeling.sequential.input_features_preprocessors import (
            LearnablePositionalEmbeddingRatedInputFeaturesPreprocessor,
        )
        from modeling.sequential.output_postprocessors import (
            L2NormEmbeddingPostprocessor,
        )
        from tests.torch_ref import make_reference_mol

        torch.manual_seed(77)
        d = pm.D
        d_model = d + self.RD
        emb = LocalEmbeddingModule(num_items=pm.NUM_ITEMS, item_embedding_dim=d)
        preproc = LearnablePositionalEmbeddingRatedInputFeaturesPreprocessor(
            max_sequence_len=pm.N,
            item_embedding_dim=d,
            dropout_rate=0.0,
            rating_embedding_dim=self.RD,
            num_ratings=self.NUM_RATINGS,
        )
        postproc = L2NormEmbeddingPostprocessor(embedding_dim=d, eps=1e-6)
        ref = HSTU(
            max_sequence_len=pm.N,
            max_output_len=0,
            embedding_dim=d_model,
            num_blocks=pm.BLOCKS,
            num_heads=pm.H,
            linear_dim=pm.DV,
            attention_dim=pm.DQK,
            normalization="rel_bias",
            linear_config="uvqk",
            linear_activation="silu",
            linear_dropout_rate=0.0,
            attn_dropout_rate=0.0,
            embedding_module=emb,
            similarity_module=make_reference_mol(torch, pm.MOL_CFG, pm.D, pm.D),
            input_features_preproc_module=preproc,
            output_postproc_module=postproc,
            enable_relative_attention_bias=True,
            concat_ua=False,
            verbose=False,
        )
        ref.eval()
        return ref

    def test_rated_import_reproduces_reference_encode(self, tmp_path):
        ref = self._build_ref_rated_hstu()
        path = str(tmp_path / "rated_ckpt")
        _save_reference_ckpt(ref, path)

        cfg = pm._experiment_cfg("HSTU").replace(
            input_preprocessor_type="rated",
            rating_embedding_dim=self.RD,
            num_ratings=self.NUM_RATINGS,
        )
        params, _, _ = import_torch_checkpoint(path, cfg)

        model = SequentialRecommender(cfg, num_items=pm.NUM_ITEMS)
        lengths, ids, ts, uids = pm._features(seed=31)
        rng = np.random.default_rng(40)
        ratings = np.zeros_like(ids)
        for b, ln in enumerate(lengths):
            ratings[b, :ln] = rng.integers(1, self.NUM_RATINGS, ln)

        with torch.no_grad():
            emb = ref.get_item_embeddings(torch.from_numpy(ids))
            ref_out = ref.encode(
                past_lengths=torch.from_numpy(lengths.astype(np.int64)),
                past_ids=torch.from_numpy(ids),
                past_embeddings=emb,
                past_payloads={
                    "timestamps": torch.from_numpy(ts),
                    "ratings": torch.from_numpy(ratings),
                },
            )
        from rails_tpu.data.features import SequentialFeatures
        import jax.numpy as jnp

        feats = SequentialFeatures(
            lengths=jnp.asarray(lengths, jnp.int32),
            ids=jnp.asarray(ids, jnp.int32),
            timestamps=jnp.asarray(ts, jnp.int32),
            ratings=jnp.asarray(ratings, jnp.int32),
            user_ids=jnp.asarray(uids, jnp.int32),
        )
        my_out = model.apply(params, feats, method=model.encode)
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )


class TestCombinedPreprocessorImport:
    """The interleaved [item_0, rating_0, item_1, rating_1, ...] preprocessor
    (`input_features_preprocessors.py:158-267`): encoder runs at 2N with the
    per-position output taken from the post-rating state."""

    NUM_RATINGS = 6

    def test_combined_import_reproduces_reference_encode(self, tmp_path):
        from modeling.sequential.embedding_modules import LocalEmbeddingModule
        from modeling.sequential.hstu import HSTU
        from modeling.sequential.input_features_preprocessors import (
            CombinedItemAndRatingInputFeaturesPreprocessor,
        )
        from modeling.sequential.output_postprocessors import (
            L2NormEmbeddingPostprocessor,
        )
        from tests.torch_ref import make_reference_mol

        torch.manual_seed(78)
        d = pm.D
        emb = LocalEmbeddingModule(num_items=pm.NUM_ITEMS, item_embedding_dim=d)
        preproc = CombinedItemAndRatingInputFeaturesPreprocessor(
            max_sequence_len=pm.N,
            item_embedding_dim=d,
            dropout_rate=0.0,
            rating_embedding_dim=d,       # interleave requires equal widths
            num_ratings=self.NUM_RATINGS,
        )
        ref = HSTU(
            max_sequence_len=2 * pm.N,
            max_output_len=0,
            embedding_dim=d,
            num_blocks=pm.BLOCKS,
            num_heads=pm.H,
            linear_dim=pm.DV,
            attention_dim=pm.DQK,
            normalization="rel_bias",
            linear_config="uvqk",
            linear_activation="silu",
            linear_dropout_rate=0.0,
            attn_dropout_rate=0.0,
            embedding_module=emb,
            similarity_module=make_reference_mol(torch, pm.MOL_CFG, d, d),
            input_features_preproc_module=preproc,
            output_postproc_module=L2NormEmbeddingPostprocessor(
                embedding_dim=d, eps=1e-6
            ),
            enable_relative_attention_bias=True,
            concat_ua=False,
            verbose=False,
        )
        ref.eval()
        path = str(tmp_path / "combined_ckpt")
        _save_reference_ckpt(ref, path)

        cfg = pm._experiment_cfg("HSTU").replace(
            input_preprocessor_type="combined",
            num_ratings=self.NUM_RATINGS,
        )
        params, _, _ = import_torch_checkpoint(path, cfg)

        model = SequentialRecommender(cfg, num_items=pm.NUM_ITEMS)
        lengths, ids, ts, uids = pm._features(seed=33)
        rng = np.random.default_rng(44)
        ratings = np.zeros_like(ids)
        for b, ln in enumerate(lengths):
            ratings[b, :ln] = rng.integers(1, self.NUM_RATINGS, ln)

        with torch.no_grad():
            item_emb = ref.get_item_embeddings(torch.from_numpy(ids))
            # The interleaved layout doubles timestamp positions too
            # (HSTU consumes (B, 2N) timestamps with this preprocessor).
            ts2 = np.repeat(ts, 2, axis=1)
            ref_out = ref.encode(
                past_lengths=torch.from_numpy(lengths.astype(np.int64)),
                past_ids=torch.from_numpy(ids),
                past_embeddings=item_emb,
                past_payloads={
                    "timestamps": torch.from_numpy(ts2),
                    "ratings": torch.from_numpy(ratings),
                },
            )
        from rails_tpu.data.features import SequentialFeatures
        import jax.numpy as jnp

        feats = SequentialFeatures(
            lengths=jnp.asarray(lengths, jnp.int32),
            ids=jnp.asarray(ids, jnp.int32),
            timestamps=jnp.asarray(ts, jnp.int32),
            ratings=jnp.asarray(ratings, jnp.int32),
            user_ids=jnp.asarray(uids, jnp.int32),
        )
        my_seq = model.apply(params, feats, method=model.encode_sequence)
        # Compare the per-position (post-rating) states at valid positions:
        # reference (B, 2N, D) odd positions == our strided (B, N, D).
        ref_seq = None
        with torch.no_grad():
            ref_seq = ref.forward(
                past_lengths=torch.from_numpy(lengths.astype(np.int64)),
                past_ids=torch.from_numpy(ids),
                past_embeddings=item_emb,
                past_payloads={
                    "timestamps": torch.from_numpy(ts2),
                    "ratings": torch.from_numpy(ratings),
                },
            )
        ref_np = t2j(ref_seq)
        my_np = np.asarray(my_seq)
        for b, ln in enumerate(lengths):
            np.testing.assert_allclose(
                my_np[b, :ln], ref_np[b, 1 : 2 * ln : 2], rtol=1e-4,
                atol=2e-5, err_msg=f"row {b}",
            )
        # Current-state encode: OUR encode returns the post-rating state of
        # the LAST item = interleaved position 2*len - 1. The reference's
        # own `encode` composed with this preprocessor instead gathers at
        # the un-doubled position len - 1 (`hstu.py:765` passes the original
        # lengths into get_current_embeddings) — a mid-sequence state; the
        # combination is never exercised by the reference pipeline
        # (`train.py:216` hardcodes the positional preprocessor), so this
        # repo implements the evident intent (documented in MIGRATION.md).
        my_out = np.asarray(model.apply(params, feats, method=model.encode))
        for b, ln in enumerate(lengths):
            np.testing.assert_allclose(
                my_out[b], ref_np[b, 2 * ln - 1], rtol=1e-4, atol=2e-5,
                err_msg=f"row {b}",
            )
        # And pin the quirk itself so a reference change would surface: the
        # reference encode() output equals its own sequence state at the
        # un-doubled position.
        np.testing.assert_allclose(
            t2j(ref_out),
            np.stack([ref_np[b, ln - 1] for b, ln in enumerate(lengths)]),
            rtol=1e-4, atol=2e-5,
        )


class TestCategoricalEmbeddingImport:
    NUM_CATEGORIES = 12

    def test_categorical_import_reproduces_reference_encode(self, tmp_path):
        """Categorical (id->category remapped) embedding module
        (`embedding_modules.py:76-112`): its `_item_id_to_category_id`
        buffer is config data, the (num_categories+1, D) table transplants;
        num_items must be given explicitly."""
        from modeling.sequential.embedding_modules import (
            CategoricalEmbeddingModule,
        )
        from modeling.sequential.hstu import HSTU
        from modeling.sequential.input_features_preprocessors import (
            LearnablePositionalEmbeddingInputFeaturesPreprocessor,
        )
        from modeling.sequential.output_postprocessors import (
            L2NormEmbeddingPostprocessor,
        )
        from tests.torch_ref import make_reference_mol

        torch.manual_seed(91)
        d = pm.D
        rng = np.random.default_rng(9)
        remap = rng.integers(0, self.NUM_CATEGORIES, pm.NUM_ITEMS)
        emb = CategoricalEmbeddingModule(
            num_items=self.NUM_CATEGORIES,      # table rows = categories
            item_embedding_dim=d,
            item_id_to_category_id=torch.from_numpy(remap),
        )
        ref = HSTU(
            max_sequence_len=pm.N, max_output_len=0, embedding_dim=d,
            num_blocks=pm.BLOCKS, num_heads=pm.H, linear_dim=pm.DV,
            attention_dim=pm.DQK, normalization="rel_bias",
            linear_config="uvqk", linear_activation="silu",
            linear_dropout_rate=0.0, attn_dropout_rate=0.0,
            embedding_module=emb,
            similarity_module=make_reference_mol(torch, pm.MOL_CFG, d, d),
            input_features_preproc_module=(
                LearnablePositionalEmbeddingInputFeaturesPreprocessor(
                    max_sequence_len=pm.N, embedding_dim=d, dropout_rate=0.0
                )
            ),
            output_postproc_module=L2NormEmbeddingPostprocessor(
                embedding_dim=d, eps=1e-6
            ),
            enable_relative_attention_bias=True, concat_ua=False,
            verbose=False,
        )
        ref.eval()
        path = str(tmp_path / "cat_ckpt")
        _save_reference_ckpt(ref, path)

        cfg = pm._experiment_cfg("HSTU").replace(
            embedding_module_type="categorical",
            num_item_categories=self.NUM_CATEGORIES,
        )
        with pytest.raises(ValueError, match="num_items"):
            import_torch_checkpoint(path, cfg)
        params, _, _ = import_torch_checkpoint(
            path, cfg, num_items=pm.NUM_ITEMS
        )

        model = SequentialRecommender(
            cfg, num_items=pm.NUM_ITEMS, item_id_to_category_id=remap
        )
        lengths, ids, ts, uids = pm._features(seed=35)
        ref_out = pm._ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, pm._my_features(lengths, ids, ts, uids),
            method=model.encode,
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )


class TestSASRecImport:
    def test_imported_params_reproduce_reference_encode(self, tmp_path):
        ref = pm._build_ref_sasrec()
        path = str(tmp_path / "ref_sasrec")
        _save_reference_ckpt(ref, path, epoch=2, batch_id=0)
        cfg = pm._experiment_cfg("SASRec")
        params, epoch, _ = import_torch_checkpoint(path, cfg)
        assert epoch == 2

        model = SequentialRecommender(cfg, num_items=pm.NUM_ITEMS)
        lengths, ids, ts, uids = pm._features(seed=5)
        ref_out = pm._ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, pm._my_features(lengths, ids, ts, uids), method=model.encode
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )


class TestDotProductImport:
    def test_dot_product_checkpoint_imports_and_encode_matches(self, tmp_path):
        """DotProduct similarity is parameter-free on both sides
        (`dot_product_similarity_fn.py:24-68`); the encoder weights carry."""
        from modeling.sequential.embedding_modules import LocalEmbeddingModule
        from modeling.sequential.hstu import HSTU
        from modeling.sequential.input_features_preprocessors import (
            LearnablePositionalEmbeddingInputFeaturesPreprocessor,
        )
        from modeling.sequential.output_postprocessors import (
            L2NormEmbeddingPostprocessor,
        )
        from rails.similarities.dot_product_similarity_fn import (
            DotProductSimilarity,
        )

        torch.manual_seed(101)
        d = pm.D
        ref = HSTU(
            max_sequence_len=pm.N, max_output_len=0, embedding_dim=d,
            num_blocks=pm.BLOCKS, num_heads=pm.H, linear_dim=pm.DV,
            attention_dim=pm.DQK, normalization="rel_bias",
            linear_config="uvqk", linear_activation="silu",
            linear_dropout_rate=0.0, attn_dropout_rate=0.0,
            embedding_module=LocalEmbeddingModule(
                num_items=pm.NUM_ITEMS, item_embedding_dim=d
            ),
            similarity_module=DotProductSimilarity(),
            input_features_preproc_module=(
                LearnablePositionalEmbeddingInputFeaturesPreprocessor(
                    max_sequence_len=pm.N, embedding_dim=d, dropout_rate=0.0
                )
            ),
            output_postproc_module=L2NormEmbeddingPostprocessor(
                embedding_dim=d, eps=1e-6
            ),
            enable_relative_attention_bias=True, concat_ua=False,
            verbose=False,
        )
        ref.eval()
        path = str(tmp_path / "dot_ckpt")
        _save_reference_ckpt(ref, path)

        cfg = pm._experiment_cfg("HSTU").replace(similarity_type="DotProduct")
        params, _, _ = import_torch_checkpoint(path, cfg)
        model = SequentialRecommender(cfg, num_items=pm.NUM_ITEMS)
        lengths, ids, ts, uids = pm._features(seed=37)
        ref_out = pm._ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, pm._my_features(lengths, ids, ts, uids),
            method=model.encode,
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )


class TestOptimizerImport:
    """AdamW moments import: after converting a mid-training reference
    checkpoint (model + optimizer state), one further step on IDENTICAL
    gradients must produce identical parameters in both frameworks — this
    pins the moment mapping, the step/bias-correction count, and the
    decoupled weight-decay formula all at once."""

    def _torch_ckpt_after_k_steps(self, ref, k=3, lr=1e-3, wd=1e-3):
        opt = torch.optim.AdamW(
            ref.parameters(), lr=lr, betas=(0.9, 0.98), weight_decay=wd
        )
        g = torch.Generator().manual_seed(123)
        for _ in range(k):
            for p in ref.parameters():
                p.grad = torch.randn(p.shape, generator=g, dtype=p.dtype)
            opt.step()
            opt.zero_grad()
        return {
            "epoch": 1,
            "batch_id": 0,
            "model_state_dict": {
                f"module.{k_}": v for k_, v in ref.state_dict().items()
            },
            "optimizer_state_dict": opt.state_dict(),
        }, opt

    @pytest.mark.parametrize("fused", [False, True])
    def test_one_step_after_import_matches_torch(self, tmp_path, fused):
        import jax
        import jax.numpy as jnp
        import optax

        from rails_tpu.compat.torch_import import import_torch_checkpoint_full
        from rails_tpu.train.loop import make_optimizer

        ref = pm._build_ref_hstu()
        payload, opt = self._torch_ckpt_after_k_steps(ref)
        path = str(tmp_path / "mid_training")
        torch.save(payload, path)

        cfg = pm._experiment_cfg("HSTU")
        cfg = cfg.replace(train=cfg.train.replace(fused_optimizer=fused))
        optimizer = make_optimizer(cfg)
        params, opt_state, step, _, _ = import_torch_checkpoint_full(
            path, cfg, optimizer
        )
        assert step == 3
        params = jax.tree_util.tree_map(jnp.asarray, params)

        # One more step, gradients = ones on BOTH sides (ones are invariant
        # under the transpose/stack/slice conversions, so the two frameworks
        # see the same per-element gradient).
        for p in ref.parameters():
            p.grad = torch.ones_like(p)
        opt.step()

        ones = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, _ = optimizer.update(ones, opt_state, params)
        my_params2 = optax.apply_updates(params, updates)

        want = params_from_reference_state_dict(ref.state_dict(), cfg)
        got_flat = jax.tree_util.tree_flatten_with_path(my_params2)[0]
        want_map = {
            jax.tree_util.keystr(kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(want)[0]
        }
        for kp, v in got_flat:
            np.testing.assert_allclose(
                np.asarray(v), want_map[jax.tree_util.keystr(kp)],
                rtol=2e-5, atol=1e-7, err_msg=jax.tree_util.keystr(kp),
            )

    def test_old_torch_int_step_entries_convert(self, tmp_path):
        """torch<2.0 stores AdamW `step` as a plain Python number; the
        import must accept it (checkpoints from the reference's 2023-era
        torch are the primary migration target)."""
        from rails_tpu.compat.torch_import import optimizer_state_from_reference
        from rails_tpu.train.loop import make_optimizer

        ref = pm._build_ref_hstu()
        payload, _ = self._torch_ckpt_after_k_steps(ref, k=1)
        opt_sd = payload["optimizer_state_dict"]
        for entry in opt_sd["state"].values():
            entry["step"] = int(entry["step"])        # old-torch layout
        cfg = pm._experiment_cfg("HSTU")
        optimizer = make_optimizer(cfg)
        params = params_from_reference_state_dict(ref.state_dict(), cfg)
        _, step = optimizer_state_from_reference(
            opt_sd, payload["model_state_dict"], cfg, params, optimizer
        )
        assert step == 1

    def test_lazy_or_divergent_per_param_steps_refuse_loudly(self):
        """torch inits AdamW state lazily per param; a checkpoint where some
        param was never stepped (or params disagree on step) cannot map onto
        a single-count optax state — the import must refuse with guidance
        instead of silently breaking that param's bias correction."""
        from rails_tpu.compat.torch_import import optimizer_state_from_reference
        from rails_tpu.train.loop import make_optimizer

        ref = pm._build_ref_hstu()
        payload, _ = self._torch_ckpt_after_k_steps(ref, k=2)
        opt_sd = payload["optimizer_state_dict"]
        cfg = pm._experiment_cfg("HSTU")
        optimizer = make_optimizer(cfg)
        params = params_from_reference_state_dict(ref.state_dict(), cfg)

        lazy = {k: v for k, v in opt_sd["state"].items()}
        first = sorted(lazy)[0]
        del lazy[first]                                # never-stepped param
        with pytest.raises(ValueError, match="skip-optimizer"):
            optimizer_state_from_reference(
                {"state": lazy, "param_groups": opt_sd["param_groups"]},
                payload["model_state_dict"], cfg, params, optimizer,
            )

        divergent = {k: dict(v) for k, v in opt_sd["state"].items()}
        divergent[first]["step"] = divergent[first]["step"] + 5
        with pytest.raises(ValueError, match="distinct steps"):
            optimizer_state_from_reference(
                {"state": divergent, "param_groups": opt_sd["param_groups"]},
                payload["model_state_dict"], cfg, params, optimizer,
            )

    def test_missing_optimizer_state_initializes_fresh(self, tmp_path):
        import jax

        from rails_tpu.compat.torch_import import import_torch_checkpoint_full
        from rails_tpu.train.loop import make_optimizer

        ref = pm._build_ref_hstu()
        path = str(tmp_path / "no_opt")
        _save_reference_ckpt(ref, path)
        cfg = pm._experiment_cfg("HSTU")
        optimizer = make_optimizer(cfg)
        params, opt_state, step, _, _ = import_torch_checkpoint_full(
            path, cfg, optimizer
        )
        assert step == 0
        assert jax.tree_util.tree_structure(opt_state) is not None


class TestImportCLI:
    def test_cli_writes_restorable_orbax_checkpoint(self, tmp_path):
        """End to end: reference torch ckpt -> import CLI -> Orbax ckpt ->
        `restore_checkpoint` into a fresh train state; restored params equal
        the direct conversion."""
        import jax

        from rails_tpu.cli.import_checkpoint import main as import_main
        from rails_tpu.core.config import get_experiment_config
        from rails_tpu.models.encoder import SequentialRecommender as SR

        cfg = get_experiment_config("synthetic-small")
        num_items = cfg.data.synthetic_num_items

        # Build a reference model at the synthetic-small geometry.
        from modeling.sequential.hstu import HSTU
        from tests.torch_ref import make_reference_mol

        torch.manual_seed(11)
        import modeling.sequential.embedding_modules as em
        import modeling.sequential.input_features_preprocessors as ip
        import modeling.sequential.output_postprocessors as op

        n = cfg.max_seq_len_padded
        d = cfg.train.item_embedding_dim
        ref = HSTU(
            max_sequence_len=cfg.data.max_sequence_length + 1,
            max_output_len=cfg.train.gr_output_length,
            embedding_dim=d,
            num_blocks=cfg.hstu.num_blocks,
            num_heads=cfg.hstu.num_heads,
            linear_dim=cfg.hstu.dv,
            attention_dim=cfg.hstu.dqk,
            normalization="rel_bias",
            linear_config="uvqk",
            linear_activation="silu",
            linear_dropout_rate=0.0,
            attn_dropout_rate=0.0,
            embedding_module=em.LocalEmbeddingModule(
                num_items=num_items, item_embedding_dim=d
            ),
            similarity_module=make_reference_mol(torch, cfg.mol, d, d),
            input_features_preproc_module=(
                ip.LearnablePositionalEmbeddingInputFeaturesPreprocessor(
                    max_sequence_len=n, embedding_dim=d, dropout_rate=0.0
                )
            ),
            output_postproc_module=op.L2NormEmbeddingPostprocessor(
                embedding_dim=d, eps=1e-6
            ),
            enable_relative_attention_bias=True,
            concat_ua=False,
            verbose=False,
        )
        ref.eval()
        torch_path = str(tmp_path / "torch_ep4")
        _save_reference_ckpt(ref, torch_path, epoch=4, batch_id=0)

        out_dir = str(tmp_path / "imported")
        import_main(["--config", "synthetic-small", "--ckpt", torch_path,
                     "--out", out_dir])

        # Restore through the standard path used by cli/eval.py.
        from rails_tpu.data.datasets import get_reco_dataset
        from rails_tpu.train.checkpoint import restore_checkpoint
        from rails_tpu.train.loop import create_train_state

        ds = get_reco_dataset(cfg.data, str(tmp_path))
        batch = next(
            ds.train_dataset.batches(
                batch_size=cfg.train.local_batch_size,
                max_output_length=cfg.train.gr_output_length + 1,
            )
        )
        _, state, _, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        state, epoch, _ = restore_checkpoint(out_dir + "/ckpts/ep4", state)
        assert epoch == 4

        direct = params_from_reference_state_dict(
            ref.state_dict(), cfg, num_items=num_items
        )
        restored_leaves = jax.tree_util.tree_flatten_with_path(state.params)[0]
        direct_map = {
            jax.tree_util.keystr(kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(direct)[0]
        }
        assert len(restored_leaves) == len(direct_map)
        for kp, v in restored_leaves:
            np.testing.assert_allclose(
                np.asarray(v), np.asarray(direct_map[jax.tree_util.keystr(kp)]),
                rtol=1e-6, err_msg=jax.tree_util.keystr(kp),
            )
