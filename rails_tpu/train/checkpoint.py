"""Checkpoint save/restore (Orbax).

Reference: plain `torch.save` of {epoch, batch_id, model, optimizer} every
`save_ckpt_every_n` epochs (`/root/reference/train.py:538-547,561-569`) with
resume restoring model+optimizer+epoch (`train.py:325-334`). Here the same
payload is an Orbax PyTree checkpoint keyed by a config hash, with the
human-readable debug string saved alongside (the reference encodes it in the
checkpoint *filename*, `train.py:304-313`).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from rails_tpu.train.loop import TrainState


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    ckpt_dir: str,
    state: TrainState,
    epoch: int,
    batch_id: int,
    config_json: Optional[str] = None,
    debug_str: Optional[str] = None,
) -> str:
    path = os.path.abspath(os.path.join(ckpt_dir, f"ep{epoch}"))
    payload = {
        "params": jax.device_get(state.params),
        "opt_state": jax.device_get(state.opt_state),
        "step": np.asarray(jax.device_get(state.step)),
        "epoch": np.asarray(epoch),
        "batch_id": np.asarray(batch_id),
    }
    # Orbax saves are a COLLECTIVE under multi-host execution (internal
    # process barriers); every process must call this, orbax writes from the
    # primary. The sidecar metadata files are primary-only.
    _ckptr().save(path, payload, force=True)
    if jax.process_index() == 0:
        meta = {"epoch": epoch, "batch_id": batch_id, "debug_str": debug_str}
        with open(path + ".meta.json", "w") as f:
            json.dump(meta, f, indent=2)
        if config_json is not None:
            with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
                f.write(config_json)
    return path


def restore_checkpoint(
    path: str, reference_state: TrainState
) -> Tuple[TrainState, int, int]:
    """Restore into the structure of a freshly-initialized state.

    Returns (state, epoch, batch_id); training resumes at epoch + 1
    (`train.py:329` — "do not overwrite checkpoint").
    """
    reference = {
        "params": jax.device_get(reference_state.params),
        "opt_state": jax.device_get(reference_state.opt_state),
        "step": np.asarray(jax.device_get(reference_state.step)),
        "epoch": np.asarray(0),
        "batch_id": np.asarray(0),
    }
    import logging

    try:
        restored = _ckptr().restore(os.path.abspath(path), item=reference)
        opt_state = restored["opt_state"]
    except Exception as structured_err:
        # Re-restore WITHOUT a reference structure; this raises for the real
        # failure modes (missing/corrupt checkpoint, filesystem errors)
        # instead of masking them as a layout mismatch.
        raw = _ckptr().restore(os.path.abspath(path))
        try:
            restored = {
                k: raw[k] for k in ("params", "step", "epoch", "batch_id")
            }
            # Params must still FIT the model; only the optimizer layout may
            # legitimately differ (a checkpoint written across the
            # `train.fused_optimizer` flag: optax.adamw chain state vs
            # FusedAdamWState). A params-structure mismatch means the wrong
            # checkpoint for this config — fail loudly.
            ref_tree = jax.tree_util.tree_structure(reference["params"])
            got_tree = jax.tree_util.tree_structure(restored["params"])
            if ref_tree != got_tree:
                raise ValueError(
                    f"checkpoint {path}: params tree does not match the "
                    "model for this config"
                )
        except Exception:
            raise structured_err
        opt_state = reference_state.opt_state
        logging.warning(
            "checkpoint %s: optimizer state layout does not match the "
            "current `train.fused_optimizer` setting; restored params only "
            "(fresh optimizer moments). Set the flag to match the run that "
            "wrote the checkpoint for an exact resume.", path,
        )
    state = TrainState(
        params=restored["params"],
        opt_state=opt_state,
        step=jax.numpy.asarray(restored["step"]),
    )
    return state, int(restored["epoch"]), int(restored["batch_id"])
