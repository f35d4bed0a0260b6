"""Test configuration.

Tests run on the JAX CPU backend with 8 virtual devices so multi-chip
sharding logic is exercised without TPU hardware (the driver separately
dry-runs the multi-chip path; see __graft_entry__.py).
"""
import os

# Force CPU: the sandbox's axon TPU plugin registers itself as platform
# "tpu" and ignores the JAX_PLATFORMS env var, so pin via jax.config too.
# Tests run on an 8-virtual-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def tiny_llama_dir(tmp_path_factory):
    """A tiny random-weight HF Llama checkpoint saved locally, used as the
    golden-comparison target (the reference compares against HF transformers
    the same way; tests/conftest.py HfRunner)."""
    from tests.utils import create_tiny_llama_checkpoint
    path = tmp_path_factory.mktemp("models") / "tiny-llama"
    create_tiny_llama_checkpoint(str(path))
    return str(path)
