"""Recall-vs-latency frontier study at multi-million-item corpus scale.

Builds ONE clustered synthetic corpus with a pre-trained model, computes the
streamed exact-MoL oracle once, then sweeps retrieval methods measuring
per-method qps (in-jit scanned — tunnel RTT excluded), recall@k vs the exact
oracle, and (for certified methods) the per-query certification rate.

This is the at-scale counterpart of the reference's accuracy-vs-latency
protocol (`/root/reference/eval_batch.py:20-71` driving
`eval_from_checkpoint.py --eval_against_brute_force`), redesigned for a
corpus that only exists as kernel-layout device tables.

Corpus model: CLUSTERED, not near-duplicate. Item raw embeddings are
  emb(i) = table[(i-1) % vocab] + sigma * rms(table) * eps(i)
with sigma defaulting to 0.5 — cluster spread comparable to the centroid
scale, so prefilters face genuine intra-cluster ranking work instead of the
degenerate near-duplicate regime of the r3 study (docs/STATUS.md, 1M-row
study postmortem).

Usage (real chip, 8M items — takes tens of minutes):
  python -m rails_tpu.cli.frontier --num-items 8000000 --train-steps 150
Virtual CPU smoke:
  JAX_PLATFORMS=cpu python -m rails_tpu.cli.frontier --num-items 20000 \
      --train-steps 2 --runs 2 --methods MoLBruteForceTopKFused,MoLCertTopK512
"""

from __future__ import annotations

import argparse
import functools
import json
import logging
import sys
import time

import numpy as np

DEFAULT_METHODS = (
    "MoLBruteForceTopKFused",
    "MoLBruteForceTopKFusedApprox",
    "MoLTileTopK4",
    "MoLTileTopK8",
    "MoLTileTopK16",
    "MoLTileTopK32",
    "MoLCertTopK1024",
    "MoLCertTopK4096",
    "MoLCertTopK16384",
    "MoLCertTopK65536",
    "MoLAvgTopK1024",
    "MoLAvgTopK4096",
    "MoLAvgTopK16384",
    "MoLCombTopK50_4096",
    "MoLNaiveTopK50",
    "MoLIVFTopK8",
    "MoLIVFTopK32",
    "MoLIVFTopK128",
)


def main(argv=None) -> None:
    logging.basicConfig(stream=sys.stdout, level=logging.INFO)
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="ml-20m-hstu-mol")
    p.add_argument("--num-items", type=int, default=8_000_000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--k", type=int, default=200)
    p.add_argument("--train-steps", type=int, default=150)
    p.add_argument("--cluster-sigma", type=float, default=0.5,
                   help="cluster spread relative to the centroid rms scale")
    p.add_argument("--runs", type=int, default=8,
                   help="scanned in-jit iterations per timing call")
    p.add_argument("--methods", default=",".join(DEFAULT_METHODS))
    p.add_argument("--int8", action="store_true",
                   help="quantize the corpus tables to int8 after the bf16 "
                   "build and run the sweep against them")
    p.add_argument("--ivf-nlist", type=int, default=None)
    p.add_argument("--ivf-iters", type=int, default=10)
    p.add_argument("--cluster-order", action="store_true",
                   help="relayout the corpus state in IVF-cluster order "
                   "before the sweep (tile-granular methods then see "
                   "cluster-coherent blocks; exact methods are invariant)")
    p.add_argument("--skip-oracle", action="store_true",
                   help="debug: skip the streamed exact oracle (recall "
                   "columns report -1); for fast compile-error repros")
    p.add_argument("--output-json", default=None)
    p.add_argument("--set", action="append", default=[], metavar="KEY=VALUE")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rails_tpu.core.config import get_experiment_config
    from rails_tpu.cli.train import apply_override
    from rails_tpu.data.datasets import (
        SequenceDataset, generate_synthetic_sequences,
    )
    from rails_tpu.index import top_k as tk
    from rails_tpu.index.factory import get_top_k_raw
    from rails_tpu.index.oracle import streamed_exact_top_k
    from rails_tpu.train.loop import create_train_state

    x = args.num_items
    vocab = min(x, 100_000)
    cfg = get_experiment_config(args.config)
    cfg = cfg.replace(
        data=cfg.data.replace(
            dataset_name="synthetic", synthetic_num_users=256,
            synthetic_num_items=vocab,
        ),
        train=cfg.train.replace(
            local_batch_size=args.batch_size, num_negatives=8,
            main_module_bf16=True,
        ),
    )
    for ov in args.set:
        key, _, val = ov.partition("=")
        cfg = apply_override(cfg, key, val)
    seqs = generate_synthetic_sequences(
        num_users=256, num_items=vocab,
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
    model, state, train_step, _ = create_train_state(
        cfg, vocab, np.arange(1, vocab + 1, dtype=np.int32), batch,
    )
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
            break
    jax.block_until_ready(state.params)
    logging.info("pre-trained %d steps", step_i)
    params = state.params
    del state, train_step   # free the AdamW moments before the big build

    sigma = args.cluster_sigma

    @jax.jit
    def embed_chunk(key, chunk_ids):
        base = model.apply(
            params, (chunk_ids - 1) % vocab + 1,
            method=model.get_item_embeddings,
        )
        # Clustered: spread proportional to the centroid rms so clusters
        # genuinely overlap (sigma=0.05 would reproduce the near-duplicate
        # regime; sigma>=1 would wash the clusters out entirely).
        scale = jnp.sqrt(jnp.mean(base.astype(jnp.float32) ** 2))
        noise = sigma * scale * jax.random.normal(
            key, base.shape, jnp.float32
        )
        return (base.astype(jnp.float32) + noise).astype(base.dtype)

    embed_fn = lambda start, cids: embed_chunk(  # noqa: E731
        jax.random.PRNGKey(start), cids
    )
    ids = jnp.arange(1, x + 1, dtype=jnp.int32)
    t0 = time.perf_counter()
    # Chunked on-device build at every size: the oracle regenerates each
    # chunk's tables with the same per-chunk keys, so build and oracle see
    # identical bits regardless of corpus size — both chunk at the shared
    # tk.BUILD_CHUNK, passed explicitly (ADVICE r4).
    state_tk = tk.build_fused_state_chunked_on_device(
        model, params, ids, embed_chunk_fn=embed_fn,
        chunk_size=tk.BUILD_CHUNK,
        table_dtype=jnp.bfloat16, quantize=args.int8,
    )
    jax.block_until_ready(state_tk.fused_tables.item_comp_t)
    logging.info(
        "corpus built: %d items (%s tables) in %.1f s",
        x, state_tk.fused_tables.item_comp_t.dtype,
        time.perf_counter() - t0,
    )
    if state_tk.avg_component is not None:
        # The fp32 avg table is 2.05 GB at 8M items; alongside the resident
        # fused tables it pushed several method sweeps over the 15.75 GB HBM
        # line (measured: Cert1024 missed by 30 MB). bf16 halves it; every
        # consumer (kmeans chunks, Avg/IVF prefilter matmuls) upcasts to
        # fp32 at the point of use.
        state_tk = state_tk._replace(
            avg_component=state_tk.avg_component.astype(jnp.bfloat16)
        )

    q = jax.jit(lambda p, f: model.apply(p, f, method=model.encode))(
        params, batch.features
    )
    user_ids = batch.features.user_ids

    methods = [m for m in args.methods.split(",") if m]
    rows = []

    if args.skip_oracle:
        oracle_sets = [set() for _ in range(args.batch_size)]
        oracle_scores = None
    else:
        t0 = time.perf_counter()
        oracle_s, oracle_i = streamed_exact_top_k(
            model, params, state_tk, q, user_ids, args.k,
            embed_chunk_fn=embed_fn, item_ids_full=ids,
            chunk=tk.BUILD_CHUNK,
        )
        oracle_sets = [set(r.tolist()) for r in oracle_i]
        # Descending score rows for the tie-aware exactness check below.
        oracle_scores = -np.sort(-np.asarray(oracle_s, np.float32), axis=1)
        logging.info(
            "exact oracle computed in %.1f s", time.perf_counter() - t0
        )

    if args.cluster_order:
        # Build the IVF index up front and relayout the corpus in cluster
        # order: tile-granular methods then select over cluster-COHERENT
        # blocks (the block-max bound is sharp only when a tile's items
        # are similar). The oracle above is id-keyed and position-
        # independent, so recall comparisons are unaffected; exact methods
        # are permutation-invariant in id space.
        #
        # The relayout REBUILDS the tables device-side instead of
        # permuting the built state (`tk.permute_state_items`, the general
        # API for externally-built states, round-trips every table through
        # the host — measured 35+ min at 4M through the axon tunnel): the
        # raw (X, D) item embeddings stay resident in bf16 (4.1 GB at 8M)
        # and each permuted chunk is a row gather — contiguous rows, so no
        # X-major relayout copy — feeding the same chunked table builder.
        # Peak HBM = raw + ONE set of tables (the unordered tables are
        # freed first); bf16 raw means permuted tables can differ from the
        # unordered build by ~1 bf16 ULP through the item tower —
        # sub-tie-noise (docs/STATUS.md r4 exactness-resolution note).
        from rails_tpu.index.ivf import build_ivf_index

        nlist = args.ivf_nlist or max(64, int(4 * np.sqrt(x)))
        t0 = time.perf_counter()
        ivf, perm = build_ivf_index(
            state_tk.avg_component, state_tk.item_ids, nlist=nlist,
            num_iters=args.ivf_iters, chunk=16_384,
            mol_state=state_tk, return_cluster_perm=True,
        )
        jax.block_until_ready(ivf.buckets)
        ivf_build_s = time.perf_counter() - t0
        rows.append({
            "method": "ivf_build", "seconds": round(ivf_build_s, 1),
            "nlist": int(ivf.centroids.shape[0]), "cluster_order": True,
        })
        logging.info("%s", json.dumps(rows[-1]))
        t0 = time.perf_counter()
        ids_host = np.asarray(ids)
        # perm spans the state's PADDED id vector; pad rows (id 0) sort
        # last, so its first len(ids) entries are exactly the real rows.
        perm = np.asarray(perm)[: ids_host.shape[0]]
        assert perm.max() < ids_host.shape[0], "pad rows leaked into perm"
        # Free the unordered tables BEFORE the rebuild: original + permuted
        # cannot coexist in HBM at 8M.
        for leaf in jax.tree.leaves(state_tk):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                except Exception:    # noqa: BLE001
                    pass
        raw_parts = []
        for start in range(0, x, tk.BUILD_CHUNK):
            cids = jnp.asarray(
                ids_host[start:start + tk.BUILD_CHUNK], jnp.int32
            )
            raw_parts.append(embed_fn(start, cids).astype(jnp.bfloat16))
        raw_all = jnp.concatenate(raw_parts)            # (X, D) bf16
        del raw_parts
        perm_dev = jnp.asarray(perm, jnp.int32)
        gather_rows_fn = jax.jit(lambda r, p: jnp.take(r, p, axis=0))

        def permuted_embed(start, cids):
            return gather_rows_fn(
                raw_all, perm_dev[start:start + cids.shape[0]]
            ).astype(jnp.float32)

        ids_perm = jnp.asarray(ids_host[np.asarray(perm)], jnp.int32)
        state_tk = tk.build_fused_state_chunked_on_device(
            model, params, ids_perm, embed_chunk_fn=permuted_embed,
            chunk_size=tk.BUILD_CHUNK,
            table_dtype=jnp.bfloat16, quantize=args.int8,
        )
        jax.block_until_ready(state_tk.fused_tables.item_comp_t)
        raw_all.delete()
        if state_tk.avg_component is not None:
            state_tk = state_tk._replace(
                avg_component=state_tk.avg_component.astype(jnp.bfloat16)
            )
        # Remap the index's positions into the new layout and attach it.
        inv = np.empty((x,), np.int64)
        inv[np.asarray(perm, np.int64)] = np.arange(x, dtype=np.int64)
        remap = lambda a: jnp.asarray(                         # noqa: E731
            inv[np.asarray(jax.device_get(a), np.int64)].astype(np.int32)
        )
        state_tk = state_tk._replace(ivf=ivf._replace(
            buckets=remap(ivf.buckets),
            overflow=(
                remap(ivf.overflow) if ivf.overflow.shape[0]
                else ivf.overflow
            ),
        ))
        logging.info(
            "corpus rebuilt in cluster order in %.1f s",
            time.perf_counter() - t0,
        )

    # HBM phasing: the avg table (X, d_P) bf16 is 2.15 GB at 8M items but
    # only the Avg/Comb prefilters (and the IVF BUILD — not its queries)
    # read it. Resident next to the 8.7 GB fused tables it cost the Cert
    # methods their (B, X) working set (r4/r5 8M sweeps: Cert1024 missed
    # the 15.75 GB line by ~30 MB). Host-stage it, run the avg-free methods
    # first, then restore it for the Avg/Comb/IVF phase.
    avg_host = np.asarray(jax.device_get(state_tk.avg_component))
    d_avg = state_tk.avg_component.dtype
    needs_avg = lambda m: m.startswith(("MoLAvg", "MoLComb"))  # noqa: E731
    is_ivf_m = lambda m: m.startswith("MoLIVF")                # noqa: E731
    phase1 = [m for m in methods if not (needs_avg(m) or is_ivf_m(m))]
    phase2 = [m for m in methods if needs_avg(m)]
    phase3 = [m for m in methods if is_ivf_m(m)]
    state_tk = state_tk._replace(
        avg_component=jnp.zeros((0, avg_host.shape[1]), d_avg)
    )

    def run_method(method):
        name = method + ("Int8" if args.int8 and "Int8" not in method else "")
        raw = get_top_k_raw(method)
        is_cert = method.startswith("MoLCertTopK")
        is_tile = method.startswith("MoLTileTopK")

        @functools.partial(jax.jit, static_argnames=())
        def once(params_, state_, q_, uids_, raw=raw):
            return raw(model, params_, state_, q_, args.k, user_ids=uids_)

        try:
            res = once(params, state_tk, q, user_ids)
            res_ids = np.asarray(res.ids)
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            logging.warning("%s failed: %s", name, e)
            rows.append({"method": name, "error": str(e)[:200]})
            return
        recall = float(np.mean([
            len(set(r.tolist()) & oracle_sets[i]) / args.k
            for i, r in enumerate(res_ids)
        ]))
        # Tie-aware exactness for the exact-class methods: id overlap
        # cannot distinguish a genuine sub-1e-2 scoring bug from bf16 ties
        # at the k-th boundary (VERDICT r4 weak #8) — the sorted score
        # MULTISETS can. Reports the max relative deviation of the
        # descending top-k score rows vs the streamed oracle; bf16 tie
        # noise is ~1e-3-class, a real bug is orders above it.
        score_dev = None
        if (
            oracle_scores is not None
            and method.startswith("MoLBruteForce")
            and "Approx" not in method
        ):
            got = -np.sort(-np.asarray(res.scores, np.float32), axis=1)
            # Per-row max-|score| scale: a per-entry scale blows the ratio
            # up on near-zero boundary scores without any actual bug.
            scale = np.maximum(
                np.abs(oracle_scores).max(axis=1, keepdims=True), 1e-6
            )
            score_dev = float(np.max(np.abs(got - oracle_scores) / scale))

        cert_rate = gap_p50 = gap_max = None
        if is_cert or is_tile:
            from rails_tpu.index.factory import parse_top_k_budgets

            budgets = parse_top_k_budgets(method)

            @jax.jit
            def cert_once(params_, state_, q_, uids_, budgets=budgets):
                if is_tile:
                    _, cert = tk.mol_tile_top_k_shared(
                        model, params_, state_, q_, args.k,
                        tiles_per_group=budgets["tiles_per_group"],
                        tile_budget=budgets.get("tile_budget"),
                        user_ids=uids_, certified=True,
                    )
                else:
                    _, cert = tk.mol_certified_top_k(
                        model, params_, state_, q_, args.k,
                        cand_budget=budgets["cand_budget"], user_ids=uids_,
                    )
                return cert
            cert = cert_once(params, state_tk, q, user_ids)
            cert_rate = float(np.mean(np.asarray(cert.certified)))
            gaps = np.asarray(cert.gap_bound)
            gap_p50 = float(np.median(gaps))
            gap_max = float(gaps.max())

        # In-jit scanned timing: tunnel RTT is ~25 ms/dispatch, so the scan
        # amortizes it across `runs` distinct (perturbed) query batches; a
        # result-carried dependency stops the backend deduping iterations.
        @jax.jit
        def timed(params_, state_, q_, uids_, seed, raw=raw):
            def body(c, i):
                r = raw(
                    model, params_, state_,
                    q_ + (seed + i + 1).astype(q_.dtype) * 1e-6,
                    args.k, user_ids=uids_,
                )
                return c + r.ids[:, 0].astype(jnp.int32).sum(), None
            tot, _ = jax.lax.scan(
                body, jnp.int32(0), jnp.arange(args.runs)
            )
            return tot

        timing_mode = "scan"
        try:
            np.asarray(timed(params, state_tk, q, user_ids, jnp.int32(0)))
            t0 = time.perf_counter()
            np.asarray(
                timed(params, state_tk, q, user_ids, jnp.int32(args.runs))
            )
            dt = (time.perf_counter() - t0) / args.runs
        except Exception as e:  # noqa: BLE001 — the scanned loop can OOM
            # where the single-shot call fit (XLA keeps extra working-set
            # copies live across scan iterations: at 8M items the streamed
            # Naive/Comb gather program compiles to ~2x the single-shot HBM
            # peak, 31.5 G vs 15.75 G). Fall back to per-dispatch timing
            # with the tunnel's dispatch+fetch overhead measured on a tiny
            # jitted op and subtracted — noisier (~ms-class residual) but
            # honest for the 100 ms-class methods that hit this path.
            logging.warning(
                "%s scanned timing failed (%s); per-dispatch fallback",
                name, str(e)[:120],
            )
            timing_mode = "dispatch"
            tiny = jax.jit(lambda s: s + 1)
            np.asarray(tiny(jnp.int32(0)))                     # compile
            t0 = time.perf_counter()
            for i in range(args.runs):
                np.asarray(tiny(jnp.int32(i)))
            overhead = (time.perf_counter() - t0) / args.runs
            qs = [
                jax.block_until_ready(
                    q + jnp.asarray((i + 1) * 1e-6, q.dtype)
                )
                for i in range(args.runs)
            ]
            np.asarray(once(params, state_tk, q, user_ids).ids)  # warm
            t0 = time.perf_counter()
            for i in range(args.runs):
                np.asarray(once(params, state_tk, qs[i], user_ids).ids)
            dt = max(
                (time.perf_counter() - t0) / args.runs - overhead, 1e-9
            )
        row = {
            "method": name,
            "ms_per_batch": round(dt * 1e3, 2),
            "qps": round(args.batch_size / dt, 1),
            f"recall@{args.k}": round(recall, 4),
        }
        if timing_mode != "scan":
            row["timing"] = timing_mode
        if score_dev is not None:
            row["score_rel_dev_max"] = round(score_dev, 6)
        if cert_rate is not None:
            row["cert_rate"] = round(cert_rate, 4)
            row["gap_bound_p50"] = round(gap_p50, 4)
            row["gap_bound_max"] = round(gap_max, 4)
        rows.append(row)
        logging.info("%s", json.dumps(row))

    for method in phase1:
        run_method(method)

    if phase2 or phase3:
        state_tk = state_tk._replace(avg_component=jax.device_put(avg_host))
    for method in phase2:
        run_method(method)

    if phase3 and state_tk.ivf is not None:
        pass                      # --cluster-order already built + attached
    elif phase3:
        from rails_tpu.index.ivf import build_ivf_index

        nlist = args.ivf_nlist or max(64, int(4 * np.sqrt(x)))
        t0 = time.perf_counter()
        # Single-device study: the plain (unsharded) index — the sharded
        # wrapper layout is only consumable through make_sharded_top_k_fn.
        ivf = build_ivf_index(
            state_tk.avg_component, state_tk.item_ids, nlist=nlist,
            num_iters=args.ivf_iters, chunk=16_384,
            mol_state=state_tk,
        )
        jax.block_until_ready(ivf.buckets)
        ivf_build_s = time.perf_counter() - t0
        logging.info(
            "ivf build: nlist=%d cap=%d overflow=%d in %.1f s",
            ivf.centroids.shape[0], ivf.buckets.shape[1],
            int(ivf.overflow.shape[0]), ivf_build_s,
        )
        # IVF queries read only the index + rerank tables — drop the avg
        # table again before the timed sweep (same HBM-phasing argument).
        state_tk = state_tk._replace(
            ivf=ivf,
            avg_component=jnp.zeros((0, avg_host.shape[1]), d_avg),
        )
        rows.append({"method": "ivf_build", "seconds": round(ivf_build_s, 1),
                     "nlist": int(ivf.centroids.shape[0])})
    for method in phase3:
        run_method(method)

    summary = {
        "metric": "frontier",
        "num_items": x,
        "batch_size": args.batch_size,
        "k": args.k,
        "cluster_sigma": sigma,
        "train_steps": step_i,
        "int8": args.int8,
        "rows": rows,
    }
    print(json.dumps(summary))
    if args.output_json:
        with open(args.output_json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
