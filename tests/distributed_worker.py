"""Subprocess worker for the 2-process multi-host CPU test.

Usage: python tests/distributed_worker.py <coordinator_port> <process_id>
Each process gets 2 virtual CPU devices (XLA_FLAGS set by the parent test),
so the global mesh spans 4 devices across 2 processes — the TPU-native
equivalent of the reference's 2-process DDP (`train.py:589-603`).
"""

import json
import sys


def main() -> None:
    port, rank = sys.argv[1], int(sys.argv[2])
    import jax

    jax.config.update("jax_platforms", "cpu")
    from rails_tpu.core import distributed as dist

    assert dist.initialize(f"localhost:{port}", num_processes=2, process_id=rank)
    assert jax.process_count() == 2, jax.process_count()
    assert jax.device_count() == 4, jax.device_count()
    assert jax.local_device_count() == 2

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


if __name__ == "__main__":
    main()
