"""Platform selection helpers.

Some site configurations (e.g. the axon TPU tunnel's sitecustomize hook)
programmatically set ``jax_platforms`` at interpreter start, overriding
the ``JAX_PLATFORMS`` environment variable the user set.
:func:`respect_jax_platforms` re-applies the env var so user intent wins;
call it from entry points BEFORE any JAX backend initializes.
"""

from __future__ import annotations

import os


def respect_jax_platforms() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if not want:
        return
    import jax
    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass  # backends already initialized; leave as-is
