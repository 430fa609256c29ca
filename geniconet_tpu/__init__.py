"""GenIcoNet-TPU: TPU-native generative icosahedral mesh networks."""

import os


def enable_compilation_cache(path: str | None = None):
    """Enable JAX's persistent compilation cache (works for the tunneled TPU
    backend too — measured 76s -> 14s for the s=5 train-step compile)."""
    import jax

    path = path or os.environ.get("GENICONET_JAX_CACHE") or os.path.expanduser(
        "~/.cache/geniconet_jax"
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
