"""Training loop: a single jitted train step + host epoch driver.

Reference: `train_fn` (`/root/reference/train.py:109-571`).

TPU shifts:
  - DDP/NCCL (`train.py:83-92,290`) is replaced by a single `jit` with the
    batch sharded over the mesh's data axis and parameters replicated; XLA
    inserts the gradient all-reduce collectives automatically;
  - the optimizer is optax AdamW (betas 0.9/0.98, matching `train.py:293-298`)
    with the same optional linear warmup (`train.py:439-446`);
  - the target-id scatter into the sequence (`train.py:394-398`) happens
    inside the jitted step.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from rails_tpu.core.config import ExperimentConfig
from rails_tpu.data.features import Batch, SequentialFeatures
from rails_tpu.losses.samplers import InBatchNegativesSampler, LocalNegativesSampler
from rails_tpu.losses.sampled_softmax import get_weighted_loss, sampled_softmax_loss
from rails_tpu.models.encoder import SequentialRecommender


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(cfg: ExperimentConfig) -> optax.GradientTransformation:
    t = cfg.train
    if t.num_warmup_steps > 0:
        schedule = optax.linear_schedule(
            init_value=t.learning_rate / t.num_warmup_steps,
            end_value=t.learning_rate,
            transition_steps=t.num_warmup_steps,
        )
    else:
        schedule = t.learning_rate
    if getattr(t, "fused_optimizer", False):
        from rails_tpu.train.fused_adamw import fused_adamw

        return fused_adamw(
            schedule, b1=t.beta1, b2=t.beta2, eps=1e-8,
            weight_decay=t.weight_decay,
        )
    return optax.adamw(
        learning_rate=schedule,
        b1=t.beta1,
        b2=t.beta2,
        eps=1e-8,
        weight_decay=t.weight_decay,
    )


def scatter_target(features: SequentialFeatures, target_ids: jnp.ndarray) -> SequentialFeatures:
    """Place the target id at position `length` (`train.py:394-398`)."""
    b = features.ids.shape[0]
    ids = features.ids.at[jnp.arange(b), features.lengths].set(target_ids)
    return features._replace(ids=ids)


def model_dtype(cfg: ExperimentConfig):
    """Compute dtype policy: bf16 compute with fp32 params when the config
    enables bf16 (`main_module_bf16` / MoL `bf16_training`,
    `train.py:286,320`); fp32 otherwise."""
    if cfg.train.main_module_bf16 or cfg.mol.bf16_training:
        return jnp.bfloat16
    return jnp.float32


def init_model(
    cfg: ExperimentConfig, num_items: int, rng: jax.Array, sample_batch: Batch,
    item_id_to_category_id: Optional[np.ndarray] = None,
    all_item_ids: Optional[np.ndarray] = None,
) -> Tuple[SequentialRecommender, Any]:
    model = SequentialRecommender(
        cfg=cfg, num_items=num_items, dtype=model_dtype(cfg),
        item_id_to_category_id=item_id_to_category_id,
    )
    feats = scatter_target(sample_batch.features, sample_batch.target_ids)
    # Init traces with the SAME sampler structure the train step runs with
    # (a contiguous-arange stand-in could differ in table length from the
    # dataset's actual unique-id list).
    if all_item_ids is None:
        all_item_ids = np.arange(1, num_items + 1, dtype=np.int32)
    sampler = _make_sampler(cfg, num_items, all_item_ids)

    # jit the init: eager linen init dispatches op-by-op, which is very slow
    # on remote TPU backends.
    @jax.jit
    def _init(rng):
        return model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1),
             "sampler": jax.random.fold_in(rng, 2)},
            feats,
            sampler,
            cfg.train.num_negatives,
            cfg.train.temperature,
            True,
            method=sampled_softmax_loss,
        )

    return model, _init(rng)


def _make_sampler(cfg: ExperimentConfig, num_items: int, all_item_ids: np.ndarray):
    t = cfg.train
    if t.sampling_strategy == "local":
        return LocalNegativesSampler(
            all_item_ids=jnp.asarray(all_item_ids, dtype=jnp.int32),
            l2_norm=t.item_l2_norm,
            l2_norm_eps=t.l2_norm_eps,
        )
    if t.sampling_strategy == "in-batch":
        return InBatchNegativesSampler(
            l2_norm=t.item_l2_norm,
            l2_norm_eps=t.l2_norm_eps,
            dedup_embeddings=True,
        )
    raise ValueError(f"Unknown sampling_strategy {t.sampling_strategy!r}")


def make_train_step(
    cfg: ExperimentConfig,
    model: SequentialRecommender,
    optimizer: optax.GradientTransformation,
    sampler,
) -> Callable:
    loss_weights = dict(cfg.train.loss_weights)

    # Loss dispatch (`train.py:236-254`): SampledSoftmaxLoss | BCELoss |
    # BCELossWithRatings.
    if cfg.train.loss_module == "SampledSoftmaxLoss":
        def apply_loss(params, features, sampler, rngs):
            return model.apply(
                params, features, sampler,
                cfg.train.num_negatives, cfg.train.temperature, True,
                cfg.train.loss_activation_checkpoint,
                shared_negatives=cfg.train.shared_negatives,
                method=sampled_softmax_loss, rngs=rngs,
            )
    elif cfg.train.loss_module == "BCELoss":
        from rails_tpu.losses.bce import bce_loss

        def apply_loss(params, features, sampler, rngs):
            return model.apply(
                params, features, sampler, cfg.train.temperature, True,
                method=bce_loss, rngs=rngs,
            )
    elif cfg.train.loss_module == "BCELossWithRatings":
        from rails_tpu.losses.bce import bce_loss_with_ratings

        def apply_loss(params, features, sampler, rngs):
            return model.apply(
                params, features, sampler, cfg.train.temperature, True,
                method=bce_loss_with_ratings, rngs=rngs,
            )
    else:
        raise ValueError(f"Unknown loss_module {cfg.train.loss_module!r}")

    def train_step(
        state: TrainState, batch: Batch, rng: jax.Array, sampler=sampler
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        features = scatter_target(batch.features, batch.target_ids)
        dropout_rng, sampler_rng = jax.random.split(jax.random.fold_in(rng, state.step))

        def loss_fn(params):
            main_loss, aux = apply_loss(
                params, features, sampler,
                {"dropout": dropout_rng, "sampler": sampler_rng},
            )
            total = get_weighted_loss(main_loss, aux, loss_weights)
            return total, (main_loss, aux)

        (total, (main_loss, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": main_loss, "loss_incl_aux": total}
        metrics.update({f"aux/{k}": v for k, v in aux.items()})
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def create_train_state(
    cfg: ExperimentConfig,
    num_items: int,
    all_item_ids: np.ndarray,
    sample_batch: Batch,
    seed: Optional[int] = None,
    item_id_to_category_id: Optional[np.ndarray] = None,
):
    """Returns (model, state, train_step, sampler)."""
    seed = cfg.train.random_seed if seed is None else seed
    rng = jax.random.PRNGKey(seed)
    model, params = init_model(
        cfg, num_items, rng, sample_batch,
        item_id_to_category_id=item_id_to_category_id,
        all_item_ids=all_item_ids,
    )
    optimizer = make_optimizer(cfg)
    opt_state = optimizer.init(params)
    state = TrainState(params=params, opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    sampler = _make_sampler(cfg, num_items, all_item_ids)
    # The sampler (holding the corpus id list) is a runtime argument of the
    # jitted step, not a captured constant.
    jitted = jax.jit(
        make_train_step(cfg, model, optimizer, sampler), donate_argnums=(0,)
    )

    def train_step(state, batch, rng):
        return jitted(state, batch, rng, sampler)

    return model, state, train_step, sampler
