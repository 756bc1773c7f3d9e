"""The gin importer must reproduce every hand-registered config from the
reference's shipped `.gin` file, field for field — pinning the two config
surfaces together (any registry transcription error or importer bug shows up
as a diff here)."""

import os

import pytest

from rails_tpu.compat.gin_import import (
    experiment_config_from_gin,
    parse_gin_bindings,
)
from rails_tpu.core.config import get_experiment_config

REF = "/root/reference/configs"

GIN_TO_REGISTRY = {
    f"{REF}/ml-1m/hstu-mol-sampled-softmax-n128-8x4x64-rails-final.gin": "ml-1m-hstu-mol",
    f"{REF}/ml-1m/hstu-sampled-softmax-n128-rails-final.gin": "ml-1m-hstu-dot",
    f"{REF}/ml-1m/sasrec-mol-sampled-softmax-n128-8x4x64-rails-final.gin": "ml-1m-sasrec-mol",
    f"{REF}/ml-1m/sasrec-sampled-softmax-n128-final.gin": "ml-1m-sasrec-dot",
    f"{REF}/ml-20m/hstu-mol-sampled-softmax-n128-8x4x128-rails-final.gin": "ml-20m-hstu-mol",
    f"{REF}/ml-20m/hstu-sampled-softmax-n128-rails-final.gin": "ml-20m-hstu-dot",
    f"{REF}/ml-20m/sasrec-mol-sampled-softmax-n128-8x4x128-rails-final.gin": "ml-20m-sasrec-mol",
    f"{REF}/ml-20m/sasrec-sampled-softmax-n128-final.gin": "ml-20m-sasrec-dot",
    f"{REF}/amzn-books/hstu-mol-sampled-softmax-n512-8x8x32-rails-final.gin": "amzn-books-hstu-mol",
    f"{REF}/amzn-books/hstu-sampled-softmax-n512-rails-final.gin": "amzn-books-hstu-dot",
    f"{REF}/amzn-books/sasrec-mol-sampled-softmax-n512-8x8x32-rails-final.gin": "amzn-books-sasrec-mol",
    f"{REF}/amzn-books/sasrec-sampled-softmax-n512-final.gin": "amzn-books-sasrec-dot",
}

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference configs not mounted"
)


def _normalize(cfg):
    """Mask only the name: gin imports adopt the registry's TPU performance
    toggles (`_adopt_tpu_performance_fields`), so the comparison covers the
    fused-kernel fields too — a gin import must behave EXACTLY like its
    named registry twin, fused paths included."""
    return cfg.replace(name="x")


@pytest.mark.parametrize("gin_path,registry_name", sorted(GIN_TO_REGISTRY.items()))
def test_gin_file_matches_registry(gin_path, registry_name):
    result = experiment_config_from_gin(gin_path)
    expected = get_experiment_config(registry_name)
    got, want = _normalize(result.config), _normalize(expected)
    # Compare only the sections the config consumes: a registry SASRec/dot
    # variant inherits the base's (unused) hstu/mol substructure, while a gin
    # file simply never binds it.
    sections = ["data", "train"]
    sections.append("hstu" if want.model_type == "HSTU" else "sasrec")
    if want.similarity_type == "MoL":
        sections.append("mol")
    diffs = []
    for section in ("model_type", "similarity_type"):
        g, w = getattr(got, section), getattr(want, section)
        if g != w:
            diffs.append(f"{section}: gin={g!r} registry={w!r}")
    for section in sections:
        g, w = getattr(got, section).to_dict(), getattr(want, section).to_dict()
        for f in g:
            if g[f] != w[f]:
                diffs.append(f"{section}.{f}: gin={g[f]!r} registry={w[f]!r}")
    if diffs:
        raise AssertionError(
            f"{gin_path} vs {registry_name}:\n  " + "\n  ".join(diffs)
        )


def test_ignored_bindings_are_recorded():
    result = experiment_config_from_gin(
        f"{REF}/ml-20m/sasrec-mol-sampled-softmax-n128-8x4x128-rails-final.gin"
    )
    assert any("uid_embedding_l2_weight_decay" in s for s in result.ignored)
    assert any("enable_tf32" in s for s in result.ignored)


def test_unknown_binding_raises():
    with pytest.raises(ValueError, match="unknown gin binding"):
        experiment_config_from_gin("train_fn.not_a_real_param = 3\n")


def test_parse_rejects_non_literal():
    with pytest.raises(ValueError, match="not a python literal"):
        parse_gin_bindings("train_fn.learning_rate = @some_macro\n")


def test_train_cli_runs_from_gin_file(tmp_path):
    """`--gin-config-file` drives the full train CLI end to end (tiny
    synthetic geometry so it runs on CPU in seconds)."""
    gin = tmp_path / "tiny.gin"
    gin.write_text(
        'train_fn.dataset_name = "synthetic"\n'
        "train_fn.max_sequence_length = 16\n"
        "train_fn.local_batch_size = 16\n"
        "train_fn.eval_batch_size = 16\n"
        'train_fn.main_module = "HSTU"\n'
        "train_fn.dropout_rate = 0.1\n"
        'train_fn.user_embedding_norm = "l2_norm"\n'
        "train_fn.num_epochs = 1\n"
        "train_fn.item_embedding_dim = 16\n"
        "hstu_encoder.num_blocks = 1\n"
        "hstu_encoder.num_heads = 1\n"
        "hstu_encoder.dqk = 8\n"
        "hstu_encoder.dv = 8\n"
        "hstu_encoder.linear_dropout_rate = 0.1\n"
        "train_fn.learning_rate = 1e-3\n"
        'train_fn.interaction_module_type = "MoL"\n'
        'train_fn.top_k_method = "MoLBruteForceTopK"\n'
        "create_mol_interaction_module.query_dot_product_groups = 2\n"
        "create_mol_interaction_module.item_dot_product_groups = 2\n"
        "create_mol_interaction_module.dot_product_dimension = 8\n"
        "create_mol_interaction_module.query_hidden_dim = 16\n"
        "create_mol_interaction_module.uid_embedding_hash_sizes = []\n"
        "create_mol_interaction_module.gating_qi_hidden_dim = 8\n"
        "create_mol_interaction_module.gating_query_hidden_dim = 8\n"
        "create_mol_interaction_module.gating_item_hidden_dim = 8\n"
        "train_fn.num_negatives = 8\n"
        "train_fn.eval_interval = 100\n"
        "train_fn.partial_eval_num_iters = 1\n"
        "train_fn.enable_tf32 = True\n"        # ignored with a log line
        "create_data_loader.num_workers = 8\n"  # ignored
    )
    from rails_tpu.cli.train import main

    main([
        "--gin-config-file", str(gin), "--workdir", str(tmp_path / "runs"),
        "--set", "data.synthetic_num_users=64",
        "--set", "data.synthetic_num_items=100",
        "--set", "train.gr_output_length=0",
    ])
    assert len(list((tmp_path / "runs").iterdir())) == 1


def test_text_input_and_loss_weights_dict():
    text = (
        'train_fn.dataset_name = "ml-1m"\n'
        'train_fn.loss_weights = {"mi_loss": 0.001}\n'
    )
    cfg = experiment_config_from_gin(text).config
    assert cfg.data.dataset_name == "ml-1m"
    assert cfg.train.loss_weights == (("mi_loss", 0.001),)


def test_single_line_text_without_newline_parses_as_text():
    cfg = experiment_config_from_gin("train_fn.learning_rate = 3e-4").config
    assert cfg.train.learning_rate == 3e-4


def test_gin_import_adopts_registry_fused_defaults():
    """A gin-imported ml-20m HSTU config must run the same fused-kernel
    stack as `--config ml-20m-hstu-mol` (fused_train is a registry default
    after the convergence A/B, not a gin binding)."""
    cfg = experiment_config_from_gin(
        f"{REF}/ml-20m/hstu-mol-sampled-softmax-n128-8x4x128-rails-final.gin"
    ).config
    reg = get_experiment_config("ml-20m-hstu-mol")
    assert cfg.hstu.fused_train == reg.hstu.fused_train
    assert cfg.train.fused_optimizer == reg.train.fused_optimizer
