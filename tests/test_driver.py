"""End-to-end training-driver test: epochs, eval cadence, artifacts, resume."""

import glob
import json
import os

import numpy as np
import pytest

from rails_tpu.core.config import get_experiment_config
from rails_tpu.train.driver import run_training


@pytest.fixture(scope="module")
def cfg():
    c = get_experiment_config("synthetic-small")
    return c.replace(
        data=c.data.replace(synthetic_num_users=192, synthetic_num_items=150),
        train=c.train.replace(
            local_batch_size=16, eval_batch_size=16, num_negatives=16,
            num_epochs=2, eval_interval=5, save_ckpt_every_n=1,
            partial_eval_num_iters=2, full_eval_every_n=1,
        ),
    )


def test_run_training_artifacts_and_resume(cfg, tmp_path):
    workdir = str(tmp_path)
    result = run_training(cfg, workdir=workdir, use_mesh=False)
    assert np.isfinite(result.final_metrics["hr@10"])
    assert 0.0 <= result.final_metrics["hr@10"] <= 1.0

    run_dirs = glob.glob(os.path.join(workdir, "*"))
    assert len(run_dirs) == 1
    run_dir = run_dirs[0]
    # Metrics JSONL written with train + eval records.
    lines = [
        json.loads(l)
        for l in open(os.path.join(run_dir, "metrics.jsonl"))
    ]
    assert any(any(k.startswith("train/") for k in rec) for rec in lines)
    assert any(any(k.startswith("eval_epoch/") for k in rec) for rec in lines)
    # Checkpoints exist (epoch 1 + final).
    ckpts = sorted(glob.glob(os.path.join(run_dir, "ckpts", "ep*")))
    ckpts = [c for c in ckpts if not c.endswith(".json")]
    assert len(ckpts) >= 1
    assert os.path.exists(os.path.join(run_dir, "ckpts", "config.json"))

    # Resume from the saved checkpoint for one more epoch.
    result2 = run_training(
        cfg, workdir=str(tmp_path / "resumed"), use_mesh=False,
        restore_from=ckpts[-1], num_epochs=3,
    )
    assert np.isfinite(result2.final_metrics["hr@10"])


def test_training_learns_synthetic_structure(cfg):
    """After a few epochs on clustered synthetic data, retrieval quality must
    be far above random (random hr@50 ~= 50/150 = 0.33; the clustered
    generator concentrates each user on ~1/16 of the corpus)."""
    c = cfg.replace(train=cfg.train.replace(num_epochs=4))
    result = run_training(c, workdir=None, use_mesh=False)
    assert result.final_metrics["hr@50"] > 0.45, result.final_metrics
