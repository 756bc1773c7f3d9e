"""Reverse-migration tests: rails_tpu params export as a reference-format
torch checkpoint that the reference model loads with `strict=True` and that
reproduces this repo's outputs — plus export->import round-trip identity."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from rails_tpu.compat.torch_export import (
    export_torch_checkpoint,
    reference_state_dict_from_params,
)
from rails_tpu.compat.torch_import import params_from_reference_state_dict
from rails_tpu.data.features import SequentialFeatures
from rails_tpu.losses.sampled_softmax import sampled_softmax_loss
from rails_tpu.losses.samplers import LocalNegativesSampler
from rails_tpu.models.encoder import SequentialRecommender
from tests import test_torch_parity_model as pm
from tests.torch_ref import t2j


def _init_my_model(model_type: str, seed: int = 0):
    cfg = pm._experiment_cfg(model_type)
    model = SequentialRecommender(cfg, num_items=pm.NUM_ITEMS)
    n = cfg.max_seq_len_padded
    feats = SequentialFeatures(
        lengths=jnp.full((2,), 4, jnp.int32),
        ids=jnp.ones((2, n), jnp.int32),
        timestamps=jnp.ones((2, n), jnp.int32),
        ratings=jnp.ones((2, n), jnp.int32),
        user_ids=jnp.zeros((2,), jnp.int32),
    )
    sampler = LocalNegativesSampler(
        all_item_ids=jnp.arange(1, pm.NUM_ITEMS + 1, dtype=jnp.int32)
    )
    rng = jax.random.PRNGKey(seed)
    params = model.init(
        {"params": rng, "dropout": jax.random.fold_in(rng, 1),
         "sampler": jax.random.fold_in(rng, 2)},
        feats, sampler, 4, 0.05, True, method=sampled_softmax_loss,
    )
    return cfg, model, params


class TestExportHSTU:
    def test_reference_loads_strict_and_outputs_match(self, tmp_path):
        cfg, model, params = _init_my_model("HSTU")
        path = str(tmp_path / "exported")
        export_torch_checkpoint(params, cfg, path, epoch=9)

        ref = pm._build_ref_hstu()        # fresh weights, right architecture
        payload = torch.load(path, weights_only=True)
        assert payload["epoch"] == 9
        sd = {
            k[len("module."):]: v
            for k, v in payload["model_state_dict"].items()
        }
        ref.load_state_dict(sd, strict=True)
        ref.eval()

        lengths, ids, ts, uids = pm._features(seed=21)
        ref_out = pm._ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, pm._my_features(lengths, ids, ts, uids),
            method=model.encode,
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )

    def test_roundtrip_is_identity(self):
        cfg, _, params = _init_my_model("HSTU", seed=3)
        sd = reference_state_dict_from_params(params, cfg, ddp_prefix=False)
        back = params_from_reference_state_dict(sd, cfg)
        a = jax.tree_util.tree_flatten_with_path(params)[0]
        b_map = {
            jax.tree_util.keystr(kp): v
            for kp, v in jax.tree_util.tree_flatten_with_path(back)[0]
        }
        assert len(a) == len(b_map)
        for kp, v in a:
            np.testing.assert_allclose(
                np.asarray(v, np.float32), b_map[jax.tree_util.keystr(kp)],
                rtol=1e-6, err_msg=jax.tree_util.keystr(kp),
            )


class TestExportCLI:
    def test_roundtrip_through_both_clis(self, tmp_path):
        """torch ckpt -> import CLI -> Orbax -> export CLI -> torch ckpt:
        the final state dict equals the original (full circle through both
        command-line surfaces)."""
        from rails_tpu.cli.export_checkpoint import main as export_main
        from rails_tpu.cli.import_checkpoint import main as import_main

        ref = pm._build_ref_hstu()
        cfg = pm._experiment_cfg("HSTU")
        src = str(tmp_path / "src_ckpt")
        torch.save(
            {
                "epoch": 5,
                "batch_id": 2,
                "model_state_dict": {
                    f"module.{k}": v for k, v in ref.state_dict().items()
                },
                "optimizer_state_dict": {},
            },
            src,
        )
        # The test config is not in the registry; drive both CLIs through a
        # temporary registry entry.
        from rails_tpu.core import config as config_mod

        config_mod._REGISTRY["_test_export"] = lambda: cfg
        try:
            out_dir = str(tmp_path / "imported")
            import_main(["--config", "_test_export", "--ckpt", src,
                         "--out", out_dir])
            back = str(tmp_path / "back_ckpt")
            export_main(["--config", "_test_export",
                         "--ckpt", out_dir + "/ckpts/ep5", "--out", back])
        finally:
            del config_mod._REGISTRY["_test_export"]

        orig = torch.load(src, weights_only=True)["model_state_dict"]
        round_ = torch.load(back, weights_only=True)
        assert round_["epoch"] == 5 and round_["batch_id"] == 2
        sd = round_["model_state_dict"]
        assert set(sd) == set(orig)
        for k in orig:
            np.testing.assert_allclose(
                sd[k].float().numpy(), orig[k].float().numpy(), rtol=1e-6,
                err_msg=k,
            )


class TestExportSASRec:
    def test_reference_loads_strict_and_outputs_match(self, tmp_path):
        cfg, model, params = _init_my_model("SASRec")
        path = str(tmp_path / "exported_sasrec")
        export_torch_checkpoint(params, cfg, path)

        ref = pm._build_ref_sasrec()
        payload = torch.load(path, weights_only=True)
        sd = {
            k[len("module."):]: v
            for k, v in payload["model_state_dict"].items()
        }
        ref.load_state_dict(sd, strict=True)
        ref.eval()

        lengths, ids, ts, uids = pm._features(seed=22)
        ref_out = pm._ref_encode(ref, lengths, ids, ts)
        my_out = model.apply(
            params, pm._my_features(lengths, ids, ts, uids),
            method=model.encode,
        )
        np.testing.assert_allclose(
            np.asarray(my_out), t2j(ref_out), rtol=1e-4, atol=2e-5
        )
