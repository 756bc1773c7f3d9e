"""Checkpoint save/restore roundtrip and LM MoL embedding functions."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.similarity.lm_embeddings import LMMoLEmbeddingsFn, mask_mixing_weights
from rails_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from rails_tpu.train.loop import create_train_state


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        cfg = get_experiment_config("synthetic-small")
        cfg = cfg.replace(
            data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=100),
            train=cfg.train.replace(local_batch_size=8, num_negatives=8),
        )
        ds = get_reco_dataset(cfg.data)
        batch = next(
            ds.train_dataset.batches(
                batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False,
            )
        )
        model, state, train_step, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        state, _ = train_step(state, batch, jax.random.PRNGKey(0))
        path = save_checkpoint(
            str(tmp_path), state, epoch=3, batch_id=17,
            config_json=cfg.to_json(), debug_str=cfg.model_debug_str(),
        )
        assert os.path.exists(path)

        model2, fresh, _, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch, seed=999
        )
        restored, epoch, batch_id = restore_checkpoint(path, fresh)
        assert epoch == 3 and batch_id == 17
        assert int(restored.step) == int(state.step)
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_restore_across_optimizer_layout_change(self, tmp_path):
        """A checkpoint saved under one `train.fused_optimizer` setting must
        still restore params (fresh optimizer moments) under the other —
        old checkpoints stay evaluable after the default flip."""
        cfg = get_experiment_config("synthetic-small")
        cfg = cfg.replace(
            data=cfg.data.replace(synthetic_num_users=32, synthetic_num_items=60),
            train=cfg.train.replace(
                local_batch_size=8, num_negatives=8, fused_optimizer=False,
            ),
        )
        ds = get_reco_dataset(cfg.data)
        batch = next(
            ds.train_dataset.batches(
                batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False,
            )
        )
        model, state, train_step, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        state, _ = train_step(state, batch, jax.random.PRNGKey(0))
        path = save_checkpoint(str(tmp_path), state, epoch=1, batch_id=2)

        cfg2 = cfg.replace(train=cfg.train.replace(fused_optimizer=True))
        _, fresh, _, _ = create_train_state(
            cfg2, ds.max_item_id, ds.all_item_ids, batch, seed=999
        )
        restored, epoch, batch_id = restore_checkpoint(path, fresh)
        assert epoch == 1 and batch_id == 2
        for a, b in zip(
            jax.tree_util.tree_leaves(restored.params),
            jax.tree_util.tree_leaves(state.params),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))
        # optimizer state is the fresh layout (count present and zero)
        assert int(restored.opt_state.count) == 0

    def test_restored_model_same_outputs(self, tmp_path):
        cfg = get_experiment_config("synthetic-small")
        cfg = cfg.replace(
            data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=100),
            train=cfg.train.replace(local_batch_size=8, num_negatives=8),
        )
        ds = get_reco_dataset(cfg.data)
        batch = next(
            ds.train_dataset.batches(
                batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
                shuffle=False,
            )
        )
        model, state, train_step, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch
        )
        state, _ = train_step(state, batch, jax.random.PRNGKey(0))
        q_ref = model.apply(state.params, batch.features, method=model.encode)
        path = save_checkpoint(str(tmp_path), state, epoch=0, batch_id=0)
        _, fresh, _, _ = create_train_state(
            cfg, ds.max_item_id, ds.all_item_ids, batch, seed=123
        )
        restored, _, _ = restore_checkpoint(path, fresh)
        q = model.apply(restored.params, batch.features, method=model.encode)
        np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=1e-6)


class TestLMEmbeddings:
    def test_mask_mixing_weights(self):
        logits = jnp.zeros((2, 4, 3))
        ids = jnp.array([[1, 2, 0, 0], [1, 1, 1, 1]])
        w = np.asarray(mask_mixing_weights(logits, ids, 4))
        # Masked positions get ~0 weight; valid positions uniform.
        np.testing.assert_allclose(w[0, :2], 0.5, atol=1e-3)
        np.testing.assert_allclose(w[0, 2:], 0.0, atol=1e-3)
        np.testing.assert_allclose(w[1], 0.25, atol=1e-3)
        np.testing.assert_allclose(w.sum(axis=1), 1.0, atol=1e-5)

    def test_first_p_mode(self):
        mod = LMMoLEmbeddingsFn(
            input_max_length=8, input_embedding_dim=6, dot_product_groups=3,
            dot_product_l2_norm=False,
        )
        x = jnp.arange(2 * 8 * 6, dtype=jnp.float32).reshape(2, 8, 6)
        params = mod.init(jax.random.PRNGKey(0), x)
        comps, aux = mod.apply(params, x)
        np.testing.assert_allclose(np.asarray(comps), np.asarray(x[:, :3, :]))

    @pytest.mark.parametrize("version", ["v2", "v4"])
    def test_mixing_modes(self, version):
        mod = LMMoLEmbeddingsFn(
            input_max_length=8, input_embedding_dim=6, dot_product_groups=3,
            apply_mixing_weights_v2=version == "v2",
            apply_mixing_weights_v4=version == "v4",
        )
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 8, 6)).astype(np.float32))
        ids = jnp.asarray(rng.integers(1, 50, size=(2, 8)))
        params = mod.init(jax.random.PRNGKey(0), x, input_ids=ids)
        comps, _ = mod.apply(params, x, input_ids=ids)
        assert comps.shape == (2, 3, 6)
        # l2-normed components.
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(comps), axis=-1), 1.0, rtol=1e-4
        )

    @pytest.mark.parametrize("version", ["v2", "v4", "first_p"])
    def test_torch_cross_parity(self, version):
        """Run the reference's own `LMMoLQueryEmbeddingsFn`
        (`/root/reference/rails/similarities/mol/query_embeddings_fns.py:35-126`)
        on CPU torch with transplanted weights and assert identical
        components — the LM (QA) side of the rails library surface."""
        torch = pytest.importorskip("torch")
        from tests.torch_ref import dense_from_linear, load_reference_rails, t2j

        load_reference_rails()
        from rails.similarities.mol.query_embeddings_fns import (
            LMMoLQueryEmbeddingsFn,
        )

        n_max, d, p = 8, 6, 3
        torch.manual_seed(17)
        ref = LMMoLQueryEmbeddingsFn(
            input_max_length=n_max,
            input_embedding_dim=d,
            dot_product_groups=p,
            dot_product_l2_norm=True,
            eps=1e-6,
            apply_mixing_weights_v2=version == "v2",
            apply_mixing_weights_v4=version == "v4",
            mixing_weights_hidden_dim=16,
        )
        ref.eval()

        mod = LMMoLEmbeddingsFn(
            input_max_length=n_max, input_embedding_dim=d,
            dot_product_groups=p, dot_product_l2_norm=True,
            apply_mixing_weights_v2=version == "v2",
            apply_mixing_weights_v4=version == "v4",
            mixing_weights_hidden_dim=16,
        )
        rng = np.random.default_rng(5)
        # Short (N' < input_max_length) sequence exercises the pad path;
        # trailing zeros in ids exercise the masked softmax.
        x = rng.normal(size=(2, 6, d)).astype(np.float32)
        ids = rng.integers(1, 50, size=(2, 6))
        ids[0, 4:] = 0

        if version == "first_p":
            params = {"params": {}}
        else:
            seq = ref._mixing_weights
            params = {"params": {
                "mix_fc1": dense_from_linear(seq[0]),
                "mix_ln": {"scale": t2j(seq[1].weight),
                           "bias": t2j(seq[1].bias)},
                "mix_fc2": dense_from_linear(seq[3]),
            }}

        with torch.no_grad():
            ref_out, ref_aux = ref(
                torch.from_numpy(x), input_ids=torch.from_numpy(ids)
            )
        my_out, my_aux = mod.apply(
            params, jnp.asarray(x), input_ids=jnp.asarray(ids)
        )
        assert ref_aux == {} and my_aux == {}
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-5, atol=2e-6
        )
