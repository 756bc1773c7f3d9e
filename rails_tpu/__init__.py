"""rails_tpu: TPU-native Retrieval with Learned Similarities.

A from-scratch JAX/XLA/Pallas framework with the capabilities of
bailuding/rails (arXiv 2407.15462). See README.md for the full map.
"""

__version__ = "0.1.0"

from rails_tpu.core.config import (  # noqa: F401
    ExperimentConfig,
    MoLConfig,
    HSTUConfig,
    SASRecConfig,
    get_experiment_config,
    list_experiment_configs,
)

__all__ = [
    "ExperimentConfig",
    "MoLConfig",
    "HSTUConfig",
    "SASRecConfig",
    "get_experiment_config",
    "list_experiment_configs",
]
