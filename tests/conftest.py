"""Test configuration: CPU backend with a virtual 8-device mesh.

Multi-chip hardware is not available in CI; sharding tests run against
XLA's host-platform device partitioning (8 virtual CPU devices), which
exercises the same NamedSharding/pjit code paths.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: the tier-cond programs and the emulated-f64
# exact-trig graphs take minutes to compile on 2 shared cores; cache hits
# make suite reruns cheap (same cache dir bench.py/eval.py use)
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest

from .oracle.build import reference_available


def pytest_collection_modifyitems(config, items):
    if reference_available():
        try:
            from .oracle.build import build_oracle

            build_oracle()
            return
        except Exception:
            pass
    skip = pytest.mark.skip(reason="reference oracle unavailable (no /root/reference or build failed)")
    for item in items:
        if "oracle" in item.keywords:
            item.add_marker(skip)


def pytest_configure(config):
    config.addinivalue_line("markers", "oracle: needs the reference C++ oracle library")
    config.addinivalue_line("markers", "slow: long-running differential rollouts")
