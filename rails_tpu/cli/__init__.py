"""CLI entry points.

This environment's JAX install force-selects its TPU ('axon') platform even
when JAX_PLATFORMS is set in the environment; honor the user's explicit env
choice by applying it at the config level before any backend initializes.
"""

import os

_plat = os.environ.get("JAX_PLATFORMS")
if _plat:
    import jax

    try:
        jax.config.update("jax_platforms", _plat)
    except Exception:
        pass
