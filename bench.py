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

Sequence lengths are drawn from an ML-20M-shaped capped lognormal
(`rails_tpu/data/datasets.py:ml20m_like_lengths`: median 68 / uncapped mean
144.4 per the GroupLens ML-20M README, clamped to the 200 cap -> capped mean
~92, ~19% at cap). Both the length-bucketed serving number (headline) and an
unbucketed number (every batch padded to the full 211 slots — the
conservative floor, what a no-bucketing deployment pays) are reported, plus
achieved TFLOP/s and model FLOPs utilization against the v5e bf16 peak
(197 TFLOP/s).

Baseline anchor: the reference's verified exact-MoL ML-20M eval processes
138496 users in 120 s on one CUDA GPU (`eval_from_checkpoint.py:33-36`),
i.e. ~1154 queries/sec/GPU for the same composite path. `vs_baseline` is the
ratio against that number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_QPS = 138496.0 / 120.0   # reference exact-MoL eval throughput
V5E_BF16_PEAK = 197e12            # TFLOP/s, one v5e chip


def serving_flops_per_user(cfg, n: int, x: int) -> float:
    """Analytic matmul FLOPs for one served user at padded length n against
    an x-item corpus (encode + fused exact-MoL scoring; top-k selection and
    elementwise work excluded — they are bandwidth-, not FLOP-, bound)."""
    h_cfg = cfg.hstu
    d = h_cfg.embedding_dim
    h, dqk, dv = h_cfg.num_heads, h_cfg.dqk, h_cfg.dv
    f_uvqk = 2 * h * dv + 2 * h * dqk
    o_in = h * dv * (3 if h_cfg.concat_ua else 1)
    enc_block = (
        2 * n * d * f_uvqk                    # uvqk projection
        + 2 * n * n * h * dqk                 # q @ k^T
        + 2 * n * n * h * dv                  # attn @ v
        + 2 * n * o_in * d                    # output projection
    )
    enc = h_cfg.num_blocks * enc_block

    m = cfg.mol
    l = m.num_logits
    d_p = m.dot_product_dimension
    # Query-side MLPs (per user, corpus-independent).
    qh = max(m.query_hidden_dim, 0)
    q_side = (
        (2 * m.query_embedding_dim * 2 * qh + 2 * qh * m.query_proj_groups * d_p)
        if qh > 0
        else 2 * m.query_embedding_dim * m.query_proj_groups * d_p
    )
    q_side += 2 * m.query_embedding_dim * m.gating_query_hidden_dim
    q_side += 2 * m.gating_query_hidden_dim * l
    # Per-item scoring: component logits + the qi gating MLP.
    gqih = max(m.gating_qi_hidden_dim, 0)
    per_item = 2 * m.query_dot_product_groups * m.item_dot_product_groups * d_p
    per_item += (2 * l * gqih + 2 * gqih * l) if gqih > 0 else 2 * l * l
    return float(enc + q_side + x * per_item)


def run(batch_size: int, bucket_multiple: int = 64) -> dict:
    import jax
    import jax.numpy as jnp

    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.data.datasets import generate_synthetic_sequences, SequenceDataset
    from rails_tpu.train.evaluation import get_eval_state
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
        max_len=200,
        seed=0,
        length_distribution="ml20m",
    )
    train_ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
    # ALL 12 epoch batches: with length-sorted batching, a prefix would
    # silently drop the longest (most expensive) users.
    batches = list(
        train_ds.batches(
            batch_size=batch_size,
            max_output_length=cfg.train.gr_output_length + 1,
            shuffle=False,
            sort_by_length=True,
            drop_last=True,
        )
    )
    batch = batches[0]
    all_item_ids = np.arange(1, num_items + 1, dtype=np.int32)
    model, state, _, _ = create_train_state(cfg, num_items, all_item_ids, batch)
    params = state.params

    es = get_eval_state(
        model, params, all_item_ids, "MoLBruteForceTopKFused",
        table_dtype=jnp.bfloat16,
    )
    from rails_tpu.train.evaluation import make_eval_step_fn

    step_fn = make_eval_step_fn(
        model, es.top_k_method, k=120, num_objects=es.num_objects,
        filter_invalid_ids=True, truncate_k_prime_to=200,
    )

    # Length-bucketed serving: batches are length-sorted, each truncated to
    # its own max length rounded to 64 (`truncate_features` — the dense
    # counterpart of the reference's jagged skipping of padding; the
    # reference never pays padding cost either, so this is parity of
    # method, not an advantage). Batches sharing a padded length stack and
    # run inside ONE jit via lax.scan: this environment dispatches each jit
    # call through a remote tunnel at ~25 ms/call (a trivial 8x8 op costs
    # the same as a full eval step), a harness artifact no real deployment
    # pays — scanning amortizes it so the number measures the chip. Results
    # are still host-fetched every sweep (dedup-safe; block_until_ready
    # alone has proven unreliable through remote tunnels). Best of 3 sweeps
    # (the tunnel is shared; contention only ever inflates times).
    from rails_tpu.data.features import serving_pad_length, truncate_features

    n_full = batch.features.ids.shape[1]

    def group_batches(bucketed: bool):
        groups = {}
        for b in batches:
            n = (
                min(
                    n_full,
                    serving_pad_length(
                        int(b.features.lengths.max()), bucket_multiple
                    ),
                )
                if bucketed
                else n_full
            )
            groups.setdefault(n, []).append(
                (truncate_features(b.features, n), b.target_ids)
            )
        out = []
        for n, items in sorted(groups.items()):
            out.append((
                jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *[f for f, _ in items]
                ),
                jnp.stack([t for _, t in items]),
            ))
        return out

    @jax.jit
    def sweep_all(params, topk_state, item_emb, grouped, seed):
        out = []
        for feats, tgts in grouped:
            def body(carry, xs):
                f, t = xs
                ranks, _, _ = step_fn(params, topk_state, item_emb, f, t)
                return carry + jnp.max(ranks), ranks
            seed, ranks = jax.lax.scan(body, seed, (feats, tgts))
            out.append(ranks)
        # A scalar that depends on EVERY group: fetching it forces the whole
        # executable to completion even if the remote runtime resolved
        # output buffers per definition event (fetching only out[0] — the
        # cheapest group — would leave that unverified).
        total = sum(jnp.sum(r) for r in out)
        return out, total

    runs = len(batches)

    def time_sweep(grouped) -> float:
        """Best-of-3 per-batch seconds for one full sweep over `grouped`."""
        args = (params, es.topk_state, es.item_embeddings, grouped)
        np.asarray(sweep_all(*args, jnp.int32(0))[1])  # compile + warm
        best = float("inf")
        for i in range(3):
            # Distinct seed arg per sweep: defeats any (executable, args)
            # result caching in the remote runtime.
            t0 = time.perf_counter()
            np.asarray(sweep_all(*args, jnp.int32(i + 1))[1])
            best = min(best, (time.perf_counter() - t0) / runs)
        return best

    grouped_bucketed = group_batches(bucketed=True)
    grouped_full = group_batches(bucketed=False)
    dt_bucketed = time_sweep(grouped_bucketed)
    dt_full = time_sweep(grouped_full)

    # FLOPs accounting over the bucketed sweep (each group at its own padded
    # length), for achieved TFLOP/s + MFU vs the v5e bf16 peak.
    total_flops = 0.0
    for feats, _ in grouped_bucketed:
        n = int(feats.ids.shape[2])
        n_batches_in_group = int(feats.ids.shape[0])
        total_flops += (
            n_batches_in_group * batch_size * serving_flops_per_user(cfg, n, num_items)
        )
    achieved = total_flops / (dt_bucketed * runs)

    return {
        "bucketed_qps": batch_size / dt_bucketed,
        "unbucketed_qps": batch_size / dt_full,
        "achieved_tflops": achieved / 1e12,
        "mfu_pct": 100.0 * achieved / V5E_BF16_PEAK,
    }


def _require_live_backend(timeout_s: float = 300.0) -> None:
    """Fail loudly instead of hanging when the TPU tunnel is half-open.

    Backend init (`jax.devices()`) blocks indefinitely when the remote-TPU
    relay accepts connections but never answers (observed in this
    environment). Probe it on a daemon thread; if it doesn't come up in
    `timeout_s`, emit an explicit error JSON line and exit — an honest
    machine-readable failure beats a silent hang."""
    import os
    import threading

    ok = threading.Event()

    def probe():
        import jax

        jax.devices()
        ok.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout=timeout_s)
    if not ok.is_set():
        print(
            f"# device backend init did not complete in {timeout_s:.0f}s "
            "(TPU tunnel unreachable/half-open)", flush=True,
        )
        print(
            json.dumps({
                "metric": "exact_mol_top120_serving_qps_ml20m_scale",
                "value": 0.0,
                "unit": "queries/sec/chip",
                "vs_baseline": 0.0,
                "error": "device backend init timed out "
                         "(TPU tunnel unreachable); no measurement taken",
            }),
            flush=True,
        )
        os._exit(2)


def main() -> None:
    import sys

    bucket = 64
    for a in sys.argv[1:]:
        if a.startswith("--bucket="):
            bucket = int(a.split("=", 1)[1])
    _require_live_backend()
    # The TPU is shared in this environment; fall back to smaller batches if
    # a run hits transient resource exhaustion.
    res = None
    used_bs = None
    for bs in (512, 512, 128, 32):    # the tunnel throws transient errors —
        try:                          # retry the full size once before
            res = run(bs, bucket)     # shrinking
            used_bs = bs
            break
        except Exception as e:                        # noqa: BLE001
            print(
                f"# bench at batch={bs} failed ({type(e).__name__}): "
                f"{str(e)[:300].replace(chr(10), ' ')}; retrying",
                flush=True,
            )
    if res is None:
        raise SystemExit("bench failed at every batch size")
    qps = res["bucketed_qps"]
    out = {
        "metric": "exact_mol_top120_serving_qps_ml20m_scale",
        "value": round(qps, 2),
        "unit": "queries/sec/chip",
        "vs_baseline": round(qps / BASELINE_QPS, 3),
        "unbucketed_qps": round(res["unbucketed_qps"], 2),
        "achieved_tflops": round(res["achieved_tflops"], 2),
        "mfu_pct": round(res["mfu_pct"], 2),
        "length_distribution": "ml20m-lognormal(median68,mean144.4,cap200)",
        # The protocol batch size is 512; smaller means the tunnel forced a
        # degraded (RTT-bound) run — never silently comparable.
        "batch_size": used_bs,
    }
    if used_bs != 512:
        out["degraded"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
