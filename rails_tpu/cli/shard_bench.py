"""Sharded-corpus serving benchmark (distributed top-k over the item axis).

The scale-out path beyond the reference's replicated-corpus design
(SURVEY.md section 2.4): item-component tables shard across the mesh's item
axis, each shard scores + top-ks locally, and one tiled all_gather merges.

On a v5e-8, a 100M-item corpus with ML-20M MoL geometry (P_X=4, d_P=128,
bf16) is 100M x 512 x 2B = ~102 GB of component tables -> ~13 GB/chip across
8 ways, which fits; single-chip runs cap the corpus accordingly.

Usage (virtual 8-device CPU mesh):
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python -m rails_tpu.cli.shard_bench --num-items 100000 --item-parallel 8
"""

from __future__ import annotations

import argparse
import json
import logging
import sys
import time

import numpy as np


def main(argv=None) -> None:
    logging.basicConfig(stream=sys.stdout, level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="ml-20m-hstu-mol",
                   help="experiment config supplying encoder + MoL geometry")
    p.add_argument("--num-items", type=int, default=1_000_000)
    p.add_argument("--item-parallel", type=int, default=None,
                   help="item-axis size (default: all devices)")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--method", default="MoLBruteForceTopKFused")
    p.add_argument("--runs", type=int, default=10)
    p.add_argument("--ivf-nlist", type=int, default=None,
                   help="IVF cluster count (default 4*sqrt(X)); MoLIVF* only")
    p.add_argument("--ivf-iters", type=int, default=10,
                   help="k-means iterations for the IVF build")
    p.add_argument("--ivf-recall-floor", type=float, default=0.0,
                   help="assert IVF recall vs the exact oracle above this "
                   "(recall depends on model training quality — the bench "
                   "model is untrained, so the default only reports)")
    p.add_argument("--replicated", action="store_true",
                   help="skip the shard_map wrapper: run the plain single-"
                   "device algorithm on the unsharded state (requires "
                   "item_parallel=1). A/B against the default sharded run "
                   "bounds the distributed-merge overhead on one chip")
    p.add_argument("--train-steps", type=int, default=0,
                   help="take N gradient steps on the synthetic data before "
                   "building the corpus, so overlap/recall checks measure a "
                   "TRAINED table distribution (int8 fidelity depends on it)")
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE",
                   help="dotted config override (e.g. mol.dot_product_dimension=8)")
    p.add_argument(
        "--check-against-chunked", action="store_true",
        help="verify the sharded merged top-k against a single-device "
        "chunked exact scan (brute-force methods: exact id equality up to "
        "score ties)",
    )
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rails_tpu.core.config import MeshConfig, get_experiment_config
    from rails_tpu.core.mesh import make_mesh, replicate
    from rails_tpu.data.datasets import SequenceDataset, generate_synthetic_sequences
    from rails_tpu.index.sharded import make_sharded_top_k_fn, pad_and_shard_state
    from rails_tpu.index.top_k import build_mol_topk_state
    from rails_tpu.train.loop import create_train_state

    n_dev = jax.device_count()
    item_parallel = args.item_parallel or n_dev
    mesh = make_mesh(MeshConfig(item_parallel=item_parallel, data_parallel=1),
                     devices=jax.devices()[:item_parallel])

    x = args.num_items
    cfg = get_experiment_config(args.config)
    cfg = cfg.replace(
        data=cfg.data.replace(
            dataset_name="synthetic", synthetic_num_users=256,
            synthetic_num_items=min(x, 100_000),
        ),
        train=cfg.train.replace(
            local_batch_size=args.batch_size, num_negatives=8,
            main_module_bf16=True,
        ),
    )
    from rails_tpu.cli.train import apply_override

    for ov in args.set:
        key, _, val = ov.partition("=")
        cfg = apply_override(cfg, key, val)
    seqs = generate_synthetic_sequences(
        num_users=256, num_items=min(x, 100_000),
        max_len=cfg.data.synthetic_max_len or cfg.data.max_sequence_length + 2,
        seed=0,
        length_distribution=cfg.data.synthetic_length_distribution,
    )
    ds = SequenceDataset(seqs, cfg.data.max_sequence_length, ignore_last_n=1)
    batch = next(
        ds.batches(batch_size=args.batch_size,
                   max_output_length=cfg.train.gr_output_length + 1,
                   shuffle=False)
    )
    # Model's item table covers the training vocab; the *serving corpus* is a
    # synthetic X-item component table (items beyond the vocab hash onto it),
    # which is what the sharded index actually stores.
    model, state, train_step, _ = create_train_state(
        cfg, min(x, 100_000), np.arange(1, min(x, 100_000) + 1, dtype=np.int32),
        batch,
    )
    if args.train_steps > 0:
        # Trained tables have heavier-tailed per-item value distributions
        # than a fresh init — the regime that stresses int8 scales.
        rng = jax.random.PRNGKey(1)
        step_i = 0
        while step_i < args.train_steps:
            before = step_i
            for b in ds.batches(
                batch_size=args.batch_size,
                max_output_length=cfg.train.gr_output_length + 1,
                shuffle=True, seed=step_i,
            ):
                rng, sub = jax.random.split(rng)
                state, _ = train_step(state, b, sub)
                step_i += 1
                if step_i >= args.train_steps:
                    break
            if step_i == before:
                raise RuntimeError(
                    "--train-steps: the dataset yielded zero batches "
                    "(empty synthetic config?) — cannot make progress"
                )
        jax.block_until_ready(state.params)
        logging.info("pre-trained %d steps before corpus build", step_i)
    params = state.params

    # Build the big corpus directly at the component level: embed vocab items
    # and tile/perturb up to X (the index only ever sees component tables).
    ids = jnp.arange(1, x + 1, dtype=jnp.int32)
    vocab = min(x, 100_000)

    @jax.jit
    def embed_chunk(key, chunk_ids):
        base = model.apply(
            params, (chunk_ids - 1) % vocab + 1,
            method=model.get_item_embeddings,
        )
        noise = 0.05 * jax.random.normal(key, base.shape, base.dtype)
        return base + noise

    # IVF reranks gather from whichever layout the state holds, so at big
    # corpus sizes it rides the same chunked kernel-layout build as the
    # fused brute force (the standard-layout table would not fit).
    kernel_layout_build = (
        "Fused" in args.method or args.method.startswith("MoLIVF")
    ) and x > 1_000_000
    if kernel_layout_build:
        embed_fn = lambda start, cids: embed_chunk(  # noqa: E731
            jax.random.PRNGKey(start), cids
        )
        if item_parallel == 1:
            # Single chip: accumulate the tables in HBM directly — the
            # host-staged build costs a full corpus download+upload over
            # the tunnel for nothing.
            from rails_tpu.index.top_k import (
                BUILD_CHUNK,
                build_fused_state_chunked_on_device,
            )

            state_tk = build_fused_state_chunked_on_device(
                model, params, ids, embed_chunk_fn=embed_fn,
                chunk_size=BUILD_CHUNK,
                table_dtype=jnp.bfloat16,
                # int8: quantize per chunk IN the build (per-item scales
                # make it equivalent to post-hoc quantization) so the bf16
                # tables never exist in HBM — corpora up to ~2x the bf16
                # ceiling build on one chip.
                quantize="Int8" in args.method,
            )
        else:
            # Chunked streaming build: only (chunk, D) temporaries on
            # device; host staging feeds the sharded upload.
            from rails_tpu.index.top_k import (
                BUILD_CHUNK, build_fused_state_chunked,
            )

            state_tk = build_fused_state_chunked(
                model, params, ids, embed_chunk_fn=embed_fn,
                chunk_size=BUILD_CHUNK,
                table_dtype=jnp.bfloat16, keep_on_host=True,
            )
    else:
        item_emb = embed_chunk(jax.random.PRNGKey(0), ids)
        state_tk = build_mol_topk_state(
            model, params, ids, item_emb, table_dtype=jnp.bfloat16,
            build_fused="Fused" in args.method,
            quantize_fused="Int8" in args.method,
        )
    if "Int8" in args.method and state_tk.fused_tables is not None and (
        state_tk.fused_tables.comp_scale is None
    ):
        # Chunked builders emit bf16; quantize after the fact (host-side
        # when the tables are host-staged — no unsharded device round trip).
        import numpy as _np

        from rails_tpu.ops.pallas.mol_scoring import (
            quantize_fused_tables, quantize_fused_tables_np,
        )

        quant = (
            quantize_fused_tables_np
            if isinstance(state_tk.fused_tables.item_comp_t, _np.ndarray)
            else jax.jit(quantize_fused_tables)
        )
        state_tk = state_tk._replace(
            fused_tables=quant(state_tk.fused_tables)
        )
    if state_tk.fused_tables is not None:
        ft = state_tk.fused_tables
        itemsize = ft.item_comp_t.dtype.itemsize
        bytes_tables = (
            ft.item_comp_t.size * itemsize
            + ft.item_partial_t.size * itemsize
        )
        if ft.comp_scale is not None:    # int8: f32 scales ride along
            bytes_tables += (ft.comp_scale.size + ft.partial_scale.size) * 4
    else:
        bytes_tables = (
            state_tk.item_tables.component_embeddings.size * 2
            + state_tk.item_tables.gating_partial.size * 2
        )
    logging.info(
        "corpus: %d items, component tables %.2f GB, %d-way item sharding",
        x, bytes_tables / 1e9, item_parallel,
    )
    if args.method.startswith("MoLIVF"):
        from rails_tpu.index.ivf import build_sharded_ivf

        nlist = args.ivf_nlist or max(64, int(4 * np.sqrt(x)))
        tb = time.perf_counter()
        ivf = build_sharded_ivf(
            state_tk, item_parallel, nlist=nlist, num_iters=args.ivf_iters,
            chunk=16_384,
        )
        logging.info(
            "ivf build: nlist=%d cap=%d overflow=%d (%d shards) in %.1f s",
            ivf.centroids.shape[1], ivf.buckets.shape[2],
            ivf.overflow.shape[1], item_parallel, time.perf_counter() - tb,
        )
        state_tk = state_tk._replace(ivf=ivf)
    if args.replicated and item_parallel != 1:
        # Not an assert: `python -O` strips those, and proceeding would hand
        # host-staged numpy tables to the plain top-k fn with an obscure error.
        p.error("--replicated is a single-device A/B arm (use --item-parallel 1)")
    if args.replicated:
        from rails_tpu.index.factory import get_top_k_fn

        plain = get_top_k_fn(args.method, model, params, state_tk)

        def topk(q_, user_ids=None):
            return plain(q_, args.k, user_ids=user_ids)
    else:
        sh_state = pad_and_shard_state(state_tk, mesh)
        topk = make_sharded_top_k_fn(
            args.method, model, replicate(params, mesh), sh_state, mesh,
            k=args.k, avg_top_k=min(4000, x), k_per_group=50,
        )
    q = jax.jit(lambda p, f: model.apply(p, f, method=model.encode))(
        params, batch.features
    )
    res = topk(q, user_ids=batch.features.user_ids)
    jax.block_until_ready(res)

    if args.check_against_chunked:
        # Exactness oracle: a single-device chunked scan, merged host-side —
        # the distributed merge must reproduce it (up to score ties) at any
        # corpus size. The oracle STREAMS (shared with `cli/frontier.py`,
        # see `rails_tpu/index/oracle.py`): no full-corpus standard-layout
        # table is ever materialized, so the check runs at the full d_P=128
        # geometry where that table would not fit host RAM (VERDICT r2 #7).
        from rails_tpu.index.oracle import streamed_exact_top_k
        from rails_tpu.index.top_k import BUILD_CHUNK

        best_s, best_i = streamed_exact_top_k(
            model, params, state_tk, q, batch.features.user_ids, args.k,
            # Kernel-layout-only builds regenerate each chunk's tables from
            # the same per-chunk-keyed embedding fn the build used — same
            # chunking as the build, passed explicitly (ADVICE r4).
            embed_chunk_fn=(
                (lambda s0, cids: embed_chunk(jax.random.PRNGKey(s0), cids))
                if kernel_layout_build else None
            ),
            item_ids_full=ids if kernel_layout_build else None,
            chunk=BUILD_CHUNK,
        )
        # The fused kernel runs its gating MLP in bf16 (the chunked oracle
        # scores in f32 math over the same bf16 tables): ~1.5% score jitter
        # and near-tie reorderings are expected there; the non-fused paths
        # must match the oracle exactly.
        fused = "Fused" in args.method
        is_ivf = args.method.startswith("MoLIVF")
        overlap = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / args.k
            for a, b in zip(np.asarray(res.ids), best_i)
        ]))
        if is_ivf:
            # IVF is approximate by design: report recall vs the exact
            # oracle and hold the configured floor (recall here reflects
            # the UNTRAINED bench model's weak avg-embedding correlation —
            # see the trained-model IVF recall study in docs/STATUS.md).
            logging.info(
                "check vs chunked exact scan: IVF recall@%d = %.4f",
                args.k, overlap,
            )
            assert overlap >= args.ivf_recall_floor, overlap
        else:
            int8 = "Int8" in args.method
            # int8's documented floor is overlap >= 0.9 (quantized scores);
            # bf16-fused and exact tiers keep their tighter thresholds.
            tol = 1e-1 if int8 else (5e-2 if fused else 2e-3)
            min_overlap = 0.85 if int8 else (0.95 if fused else 0.99)
            np.testing.assert_allclose(
                np.asarray(res.scores), best_s, rtol=tol, atol=tol
            )
            logging.info(
                "check vs chunked exact scan: scores match, id overlap %.4f",
                overlap,
            )
            assert overlap > min_overlap, overlap

    t0 = time.perf_counter()
    for i in range(args.runs):
        # Perturb queries per run so remote backends cannot dedupe the call.
        # (i + 1): i == 0 would repeat the warmup call's exact inputs, which
        # a caching remote backend could serve without touching the chip.
        res = topk(q + 1e-6 * (i + 1), user_ids=batch.features.user_ids)
    jax.block_until_ready(res)
    dt = (time.perf_counter() - t0) / args.runs
    print(json.dumps({
        # Metric key is stable across modes (downstream parsers grep the
        # `sharded_` prefix); the A/B arm is distinguished by `mode`.
        "metric": f"sharded_{args.method}_top{args.k}_qps",
        "mode": "replicated" if args.replicated else "sharded",
        "num_items": x,
        "item_parallel": item_parallel,
        "value": round(args.batch_size / dt, 2),
        "unit": "queries/sec",
        "ms_per_batch": round(dt * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
