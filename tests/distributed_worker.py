"""Subprocess worker for the 2-process multi-host CPU tests.

Usage: python tests/distributed_worker.py <coordinator_port> <process_id> [mode]
Each process gets 2 virtual CPU devices (XLA_FLAGS set by the parent test),
so the global mesh spans 4 devices across 2 processes — the TPU-native
equivalent of the reference's 2-process DDP (`train.py:589-603`).

Modes:
  train (default) — data-parallel training + cross-process metric reduce.
  serve           — item-sharded distributed top-k across the 2 processes,
                    checked for exact id equality against the single-device
                    brute force each process computes locally.
"""

import json
import sys


def _setup(port: str, rank: int):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rails_tpu.core import distributed as dist

    assert dist.initialize(f"localhost:{port}", num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2
    return dist


def _train(dist) -> None:
    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.train.driver import run_training

    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=80),
        train=cfg.train.replace(
            local_batch_size=8, num_negatives=8, num_epochs=1,
            eval_batch_size=8, eval_interval=2, partial_eval_num_iters=1,
            full_eval_every_n=1,
        ),
    )
    res = run_training(cfg, workdir=None)
    out = {k: res.final_metrics[k] for k in ("hr@10", "hr@50", "mrr")}
    out["process_index"] = dist.process_index()
    print("FINAL_METRICS " + json.dumps(out), flush=True)


def _serve(dist) -> None:
    """Item-sharded serving over the 2-process global mesh (VERDICT r3 #7:
    the true multi-process test previously covered training+metrics only).

    Every process builds the identical model + corpus deterministically;
    the corpus shards 4-way across both processes' devices; the sharded
    top-k's merged ids must equal the single-device brute force exactly."""
    import jax
    import numpy as np
    import jax.numpy as jnp

    from rails_tpu.core.config import MeshConfig, get_experiment_config
    from rails_tpu.core.mesh import make_mesh, replicate
    from rails_tpu.data.datasets import get_reco_dataset
    from rails_tpu.index.sharded import (
        make_sharded_top_k_fn, pad_and_shard_state,
    )
    from rails_tpu.index.top_k import build_mol_topk_state, mol_brute_force_top_k
    from rails_tpu.train.loop import create_train_state

    cfg = get_experiment_config("synthetic-small")
    cfg = cfg.replace(
        data=cfg.data.replace(synthetic_num_users=64, synthetic_num_items=80),
        train=cfg.train.replace(local_batch_size=8, num_negatives=8),
    )
    ds = get_reco_dataset(cfg.data)
    batch = next(ds.train_dataset.batches(
        batch_size=8, max_output_length=cfg.train.gr_output_length + 1,
        shuffle=False,
    ))
    model, tstate, train_step, _ = create_train_state(
        cfg, ds.max_item_id, ds.all_item_ids, batch
    )
    # Two steps so tables aren't at init; fixed rng -> identical on both
    # processes (every op here is process-deterministic).
    rng = jax.random.PRNGKey(0)
    for _ in range(2):
        tstate, _ = train_step(tstate, batch, rng)
    params = jax.device_get(tstate.params)

    item_emb = model.apply(
        params, jnp.asarray(ds.all_item_ids), method=model.get_item_embeddings
    )
    state = build_mol_topk_state(
        model, params, jnp.asarray(ds.all_item_ids), item_emb,
        table_dtype=jnp.float32,
    )
    q = np.asarray(model.apply(params, batch.features, method=model.encode))
    uids = np.asarray(batch.features.user_ids)

    # Local single-device oracle (identical on both processes).
    want = mol_brute_force_top_k(model, params, state, jnp.asarray(q), 15,
                                 user_ids=jnp.asarray(uids))
    want_ids = np.asarray(want.ids)

    # Global 4-device mesh spanning both processes; host-staged state so
    # pad_and_shard_state's device_put performs the global sharded upload.
    host_state = jax.tree.map(
        lambda a: None if a is None else np.asarray(jax.device_get(a)), state
    )
    mesh = make_mesh(MeshConfig(item_parallel=4))
    sh_state = pad_and_shard_state(host_state, mesh)
    fn = make_sharded_top_k_fn(
        "MoLBruteForceTopK", model, replicate(params, mesh), sh_state, mesh,
        k=15,
    )
    got = fn(q, user_ids=uids)
    got_ids = np.asarray(jax.device_get(got.ids))
    match = bool((got_ids == want_ids).all())
    out = {
        "ids_match": match,
        "process_index": dist.process_index(),
        "first_row": got_ids[0][:5].tolist(),
    }
    print("FINAL_SERVING " + json.dumps(out), flush=True)


def main() -> None:
    port, rank = sys.argv[1], int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "train"
    dist = _setup(port, rank)
    if mode == "serve":
        _serve(dist)
    else:
        _train(dist)


if __name__ == "__main__":
    main()
