"""Test harness: force CPU with 8 virtual devices so multi-chip sharding
paths (mesh, pjit, collectives) are exercised without TPU hardware — the
multi-device coverage the reference never had (SURVEY.md §4).

NOTE: this environment's sitecustomize force-registers a remote 'axon' TPU
backend and sets jax_platforms='axon,cpu'; the first jax op would then claim
the (single-holder, possibly busy) TPU over a tunnel. Tests must run on CPU,
and the env var JAX_PLATFORMS is overridden by that registration, so we use
the config-level override below BEFORE any backend initialization.
"""

import os

# Zero-egress container: make HF fail fast instead of retrying over HTTP.
os.environ.setdefault("HF_HUB_OFFLINE", "1")
os.environ.setdefault("TRANSFORMERS_OFFLINE", "1")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return jax.random.PRNGKey(0)
