"""Fused-HSTU serving-encode cost decomposition probe (measurement harness).

VERDICT r4 #3: encode is ~64% of the serving step (28.3 ms at B=512,
N=211, ML-20M geometry) at 18% MFU, flat for two rounds — either move it
or publish the instruction-level accounting that justifies it as
structural. This harness times the REAL serving kernel
(`ops/pallas/hstu_block.fused_hstu_block`) with individual cost terms
removed via its measurement-only `probe_skip` knob, attributing ms to
each stage by difference:

  full        the production serving encode (16 chained blocks)
  bias        drop the in-VMEM time-bucket bias build (delta -> bucket ->
              128-lane gather -> relpos add), keep the penalty mask
  proj_silu   drop the (N, F) projection silu (tanh-form)
  attn_silu   per-head (N, N) gating silu -> linear 0.25 scale
  attn        drop the qk/av matmuls entirely (attn := v)
  attn_bias_add  skip the per-head (N, N) f32 bias ADD (bias build kept)
  attn_bf16   run the whole per-head gate pipeline (qk accumulate, bias
              add, silu, av input) in bf16 — isolates the f32 VPU + the
              per-head (N, N) f32->bf16 convert; also the candidate
              production dtype

Geometry mirrors bench.py's serving path: 16 blocks, d=256, F=1024, h=8,
dqk=dv=32, internal time bias, pointwise-silu attention. Timing: R
iterations scanned inside ONE jit with the input perturbed by a carry
from the previous iteration's output (tunnel RTT cannot resolve per-call
device times; see docs/STATUS.md measurement notes).

Usage (real chip):  python -m rails_tpu.cli.hstu_probe --batch-size 512
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch-size", type=int, default=512)
    p.add_argument("--seq-len", type=int, default=211)
    p.add_argument("--num-blocks", type=int, default=16)
    p.add_argument("--runs", type=int, default=8)
    p.add_argument(
        "--modes",
        default=(
            "full,bias,proj_silu,attn_silu,attn,attn_bias_add,attn_bf16"
        ),
    )
    p.add_argument("--output-json", default=None)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from rails_tpu.ops.pallas.hstu_block import fused_hstu_block

    # ML-20M HSTU geometry (core/config.py [hstu]).
    d, h, dqk, dv = 256, 8, 32, 32
    f = h * (2 * dv + 2 * dqk)                     # 1024
    b, n, blocks = args.batch_size, args.seq_len, args.num_blocks

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, n, d)) * 0.1, jnp.bfloat16)
    colmask = jnp.ones((b, n), jnp.float32)
    uvqk = jnp.asarray(rng.standard_normal((d, f)) * 0.05, jnp.bfloat16)
    ow = jnp.asarray(rng.standard_normal((h * dv, d)) * 0.05, jnp.bfloat16)
    ob = jnp.zeros((d,), jnp.float32)
    rel_pos = jnp.asarray(rng.standard_normal((n, n)) * 0.01, jnp.float32)
    ts = jnp.cumsum(
        jnp.asarray(rng.integers(1, 5000, size=(b, n)), jnp.int32), axis=1
    )
    ext = jnp.concatenate([ts, ts[:, n - 1 : n]], axis=1)   # (B, N+1)
    tsw = jnp.asarray(rng.standard_normal((128,)) * 0.01, jnp.float32)

    def encode(x, skip):
        for _ in range(blocks):
            x = fused_hstu_block(
                x, None, colmask, uvqk, ow, ob,
                num_heads=h, dqk=dqk, dv=dv, inv_n=1.0 / 200,
                time_bias=(rel_pos, ext, tsw), num_buckets=128,
                activation="silu", normalization="rel_bias",
                probe_skip=skip,
            )
        return x

    def timed(fn, *fargs):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        np.asarray(jfn(*fargs, jnp.int32(0)))
        print(f"  compiled+warm in {time.perf_counter() - t0:.1f} s",
              flush=True)
        best = float("inf")
        for i in range(3):
            t0 = time.perf_counter()
            np.asarray(jfn(*fargs, jnp.int32(i + 1)))
            best = min(best, time.perf_counter() - t0)
        return best / args.runs * 1e3

    results = {}
    for mode in args.modes.split(","):
        skip = () if mode == "full" else tuple(mode.split("+"))
        print(f"mode={mode}: compiling...", flush=True)

        def chain(x, seed, skip=skip):
            def body(carry, _):
                xx = x * (1.0 + carry * 1e-12).astype(x.dtype)
                out = encode(xx, skip)
                return jnp.sum(out[:, 0, 0]).astype(jnp.float32), ()
            c, _ = jax.lax.scan(
                body, seed.astype(jnp.float32), (), length=args.runs
            )
            return c

        ms = timed(chain, x0)
        results[mode] = round(ms, 2)
        extra = ""
        if mode != "full" and "full" in results:
            extra = f"  (term: {results['full'] - ms:.2f} ms)"
        print(f"mode={mode}: {ms:.2f} ms/batch{extra}", flush=True)

    out = {
        "geometry": dict(d=d, f=f, h=h, dqk=dqk, dv=dv, batch=b, n=n,
                         blocks=blocks),
        "ms_per_batch": results,
    }
    print(json.dumps(out))
    if args.output_json:
        with open(args.output_json, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
