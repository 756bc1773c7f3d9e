"""Training-throughput benchmark: jitted train-step users/sec on one chip.

The reference trains ML-20M at local_batch_size=128 per GPU with DDP
(`configs/ml-20m/...gin`); its training throughput is not published, so this
reports absolute users/sec/chip for the same model geometry + loss (128
sampled negatives), measured over distinct batches with every loss fetched.

Usage: python -m rails_tpu.cli.train_bench [--batch-size 128] [--runs 10]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

V5E_BF16_PEAK = 197e12            # bf16 TFLOP/s, one v5e chip


def train_flops_per_user(cfg, n: int, r: int, shared: bool) -> float:
    """Analytic matmul FLOPs for one training-step user at padded length n
    with r sampled negatives (backward counted as 2x forward — the standard
    matmul accounting; elementwise, gathers and norms excluded)."""
    h_cfg = cfg.hstu
    d = h_cfg.embedding_dim
    h, dqk, dv = h_cfg.num_heads, h_cfg.dqk, h_cfg.dv
    f_uvqk = 2 * h * dv + 2 * h * dqk
    o_in = h * dv * (3 if h_cfg.concat_ua else 1)
    enc_block = (
        2 * n * d * f_uvqk
        + 2 * n * n * h * dqk
        + 2 * n * n * h * dv
        + 2 * n * o_in * d
    )
    enc = h_cfg.num_blocks * enc_block

    m = cfg.mol
    l = m.num_logits
    d_p = m.dot_product_dimension
    p_q, p_x = m.query_dot_product_groups, m.item_dot_product_groups
    qh = max(m.query_hidden_dim, 0)
    q_side = (
        (2 * m.query_embedding_dim * 2 * qh + 2 * qh * p_q * d_p)
        if qh > 0
        else 2 * m.query_embedding_dim * p_q * d_p
    )
    if m.gating_query_fn:
        q_side += 2 * m.query_embedding_dim * m.gating_query_hidden_dim
        q_side += 2 * m.gating_query_hidden_dim * l
    ih = max(m.item_hidden_dim, 0)
    i_side = (
        (2 * m.item_embedding_dim * 2 * ih + 2 * ih * p_x * d_p)
        if ih > 0
        else 2 * m.item_embedding_dim * p_x * d_p
    )
    if m.gating_item_fn:
        i_side += 2 * m.item_embedding_dim * m.gating_item_hidden_dim
        i_side += 2 * m.gating_item_hidden_dim * l
    gqih = max(m.gating_qi_hidden_dim, 0)
    per_pair = 2 * p_q * p_x * d_p
    per_pair += (2 * l * gqih + 2 * gqih * l) if gqih > 0 else 2 * l * l

    # Every padded position is a query; each scores its positive and the
    # sampled negatives (one set per position, or one shared set per user
    # with train.shared_negatives).
    pairs = n * (1 + r)
    items_built = n + (r if shared else n * r)
    fwd = enc + n * q_side + items_built * i_side + pairs * per_pair
    return 3.0 * float(fwd)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="ml-20m-hstu-mol")
    p.add_argument("--batch-size", type=int, default=128)
    p.add_argument("--num-items", type=int, default=26744)
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--remat", action="store_true",
                   help="activation-checkpoint the negatives scoring")
    p.add_argument("--shared-negatives", action="store_true",
                   help="one negative set per batch instead of per position")
    p.add_argument("--fused-train", action="store_true",
                   help="fused forward+backward HSTU block kernels")
    p.add_argument("--fused-mol-loss", action="store_true",
                   help="fused MoL negatives scoring (needs --shared-negatives)")
    p.add_argument("--pallas-scatter", action="store_true",
                   help="binned Pallas scatter-add for the item-table grad")
    args = p.parse_args(argv)

    import jax

    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.data.datasets import SequenceDataset, generate_synthetic_sequences
    from rails_tpu.train.loop import create_train_state

    cfg = get_experiment_config(args.config)
    cfg = cfg.replace(
        data=cfg.data.replace(
            dataset_name="synthetic",
            synthetic_num_users=max(args.batch_size * (args.runs + 2), 1024),
            synthetic_num_items=args.num_items,
        ),
        train=cfg.train.replace(
            local_batch_size=args.batch_size,
            main_module_bf16=args.bf16 or cfg.train.main_module_bf16,
            loss_activation_checkpoint=args.remat,
            shared_negatives=args.shared_negatives
            or cfg.train.shared_negatives,
            fused_mol_loss=args.fused_mol_loss or cfg.train.fused_mol_loss,
            pallas_scatter_grad=args.pallas_scatter
            or cfg.train.pallas_scatter_grad,
        ),
    )
    if args.fused_train:
        cfg = cfg.replace(hstu=cfg.hstu.replace(fused_train=True))
    if cfg.train.fused_mol_loss and not cfg.train.shared_negatives:
        raise SystemExit(
            "--fused-mol-loss requires --shared-negatives (the fused kernel "
            "scores one shared negative set); without it the XLA path would "
            "run and its numbers would be misattributed to the fused kernel"
        )
    seqs = generate_synthetic_sequences(
        num_users=cfg.data.synthetic_num_users, num_items=args.num_items,
        max_len=cfg.data.synthetic_max_len or cfg.data.max_sequence_length + 2,
        seed=0,
        length_distribution=cfg.data.synthetic_length_distribution,
    )
    ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
    batches = []
    for i, b in enumerate(
        ds.batches(
            batch_size=args.batch_size,
            max_output_length=cfg.train.gr_output_length + 1,
            shuffle=True, seed=1, drop_last=True,
        )
    ):
        batches.append(b)
        if len(batches) >= args.runs:
            break
    all_ids = np.arange(1, args.num_items + 1, dtype=np.int32)
    model, state, train_step, _ = create_train_state(
        cfg, args.num_items, all_ids, batches[0]
    )
    rng = jax.random.PRNGKey(0)

    state, m = train_step(state, batches[0], rng)
    np.asarray(m["loss"])                        # compile + fetch
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        losses = []
        for b in batches:
            state, m = train_step(state, b, rng)
            losses.append(m["loss"])
        for l in losses:
            np.asarray(l)
        best = min(best, (time.perf_counter() - t0) / len(batches))
    n_padded = int(batches[0].features.ids.shape[1])
    fpu = train_flops_per_user(
        cfg, n_padded, cfg.train.num_negatives, cfg.train.shared_negatives
    )
    achieved = fpu * args.batch_size / best
    print(json.dumps({
        "metric": "train_step_users_per_sec",
        "config": args.config,
        "batch_size": args.batch_size,
        "value": round(args.batch_size / best, 2),
        "unit": "users/sec/chip",
        "ms_per_step": round(best * 1e3, 3),
        "achieved_tflops": round(achieved / 1e12, 2),
        "mfu_pct": round(100.0 * achieved / V5E_BF16_PEAK, 2),
        "final_loss": float(np.asarray(m["loss"])),
    }))


if __name__ == "__main__":
    main()
