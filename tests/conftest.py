"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require TPU hardware; multi-chip sharding is validated on
virtual CPU devices (`xla_force_host_platform_device_count`), the same
mechanism the driver uses for `dryrun_multichip`.

This environment pre-registers a TPU backend at interpreter startup (a
sitecustomize sets ``jax.config.jax_platforms = "axon,cpu"``, which takes
precedence over the JAX_PLATFORMS env var), so we must override the *config*
and clear any already-initialized backends, not just set env vars.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():
    from jax.extend.backend import clear_backends

    clear_backends()

# this container exposes ONE CPU core; the suite is XLA-compile-bound, so
# skip most optimization passes (numerics unaffected at test tolerances)
jax.config.update("jax_disable_most_optimizations", True)

# persistent compilation cache: repeated suite runs skip recompiles
jax.config.update("jax_compilation_cache_dir", "/tmp/geniconet_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert len(jax.devices()) == 8, jax.devices()

import pytest  # noqa: E402

# Quick tier: `pytest -m "not slow" -q` finishes in ~6 min; the full run
# (CI gate) takes ~30-50 min. Modules listed here are dominated by
# interpret-mode kernel sweeps and multi-epoch integration runs; a named
# test can opt OUT of the module default with @pytest.mark.quick.
_SLOW_MODULES = {
    "test_cli",                  # end-to-end CLI train/test/encode runs
    "test_model_pallas_parity",  # whole-model interpret-mode parity
    "test_pallas_dp",            # 8-virtual-device shard_map steps
    "test_parallel",             # GSPMD sharding equivalence + s=6
    "test_round3",               # fused-MSE / encoding-logging integration
    "test_round4",               # split-step / DP-scan integration
    "test_train",                # multi-epoch trainer integration
    "test_phase_kernel",         # interpret-mode kernel grids
    "test_kernel_fusion",        # interpret-mode fused-block grads
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        if mod in _SLOW_MODULES and "quick" not in item.keywords:
            item.add_marker(pytest.mark.slow)
