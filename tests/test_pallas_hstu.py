"""Fused HSTU block kernel vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.train.loop import create_train_state


@pytest.fixture(scope="module")
def setup():
    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=150),
        train=cfg.train.replace(local_batch_size=8, num_negatives=8),
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
    return cfg, ds, model, state.params, batch


def _fused_model(cfg, ds, enable_bias=True):
    from rails_tpu.models.encoder import SequentialRecommender

    cfg2 = cfg.replace(
        hstu=cfg.hstu.replace(
            fused_inference=True, enable_relative_attention_bias=enable_bias
        )
    )
    return cfg2, SequentialRecommender(cfg=cfg2, num_items=ds.max_item_id)


def test_fused_block_matches_xla_encode(setup):
    cfg, ds, model, params, batch = setup
    ref = model.apply(params, batch.features, method=model.encode_sequence)
    _, fused_model = _fused_model(cfg, ds)
    got = fused_model.apply(params, batch.features, method=fused_model.encode_sequence)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )


def test_fused_block_no_bias(setup):
    cfg, ds, model, params, batch = setup
    from rails_tpu.models.encoder import SequentialRecommender

    cfg_nb = cfg.replace(
        hstu=cfg.hstu.replace(enable_relative_attention_bias=False)
    )
    model_nb = SequentialRecommender(cfg=cfg_nb, num_items=ds.max_item_id)
    # Re-init params for the no-bias architecture.
    from rails_tpu.train.loop import create_train_state

    _, state_nb, _, _ = create_train_state(
        cfg_nb, ds.max_item_id, ds.all_item_ids, batch
    )
    ref = model_nb.apply(
        state_nb.params, batch.features, method=model_nb.encode_sequence
    )
    cfg_f = cfg_nb.replace(hstu=cfg_nb.hstu.replace(fused_inference=True))
    model_f = SequentialRecommender(cfg=cfg_f, num_items=ds.max_item_id)
    got = model_f.apply(
        state_nb.params, batch.features, method=model_f.encode_sequence
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5
    )
