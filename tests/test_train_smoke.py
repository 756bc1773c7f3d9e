"""End-to-end training smoke test on the synthetic dataset (CPU)."""

import numpy as np
import jax
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.data.datasets import get_reco_dataset
from rails_tpu.train.loop import create_train_state


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=256, synthetic_num_items=200),
        train=cfg.train.replace(local_batch_size=16, num_negatives=16),
    )
    ds = get_reco_dataset(cfg.data)
    return cfg, ds


def test_loss_decreases(tiny_setup):
    cfg, ds = tiny_setup
    batches = list(
        ds.train_dataset.batches(
            batch_size=cfg.train.local_batch_size,
            max_output_length=cfg.train.gr_output_length + 1,
            shuffle=True,
            seed=0,
            drop_last=True,
        )
    )
    assert len(batches) >= 4
    model, state, train_step, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, batches[0]
    )
    rng = jax.random.PRNGKey(123)
    losses = []
    for epoch in range(6):
        for batch in batches:
            state, metrics = train_step(state, batch, rng)
            losses.append(float(metrics["loss"]))
    assert all(np.isfinite(losses))
    first = np.mean(losses[: len(batches)])
    last = np.mean(losses[-len(batches):])
    assert last < first - 0.1, f"loss did not decrease: {first:.4f} -> {last:.4f}"


def test_batch_shapes(tiny_setup):
    cfg, ds = tiny_setup
    batch = next(
        ds.train_dataset.batches(
            batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
            shuffle=False,
        )
    )
    n = cfg.data.max_sequence_length + cfg.train.gr_output_length + 1
    assert batch.features.ids.shape == (8, n)
    assert batch.features.lengths.shape == (8,)
    assert int(batch.features.lengths.min()) >= 1
    assert int(batch.target_ids.min()) >= 1
    # Target timestamp is scattered at position `length`.
    b0_len = int(batch.features.lengths[0])
    assert int(batch.features.timestamps[0, b0_len]) > 0


def test_eval_dataset_is_superset(tiny_setup):
    """Eval target is the true last item; train target the second-to-last."""
    cfg, ds = tiny_setup
    tr = ds.train_dataset
    ev = ds.eval_dataset
    rows_tr = tr.rows(np.array([0]))
    rows_ev = ev.rows(np.array([0]))
    # Eval history should contain the train target as its last element.
    tr_target = rows_tr[4][0]
    ev_hist, ev_len = rows_ev[1][0], rows_ev[0][0]
    assert ev_hist[ev_len - 1] == tr_target
