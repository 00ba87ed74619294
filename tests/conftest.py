"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
sharding/pjit paths are exercised without TPU hardware (SURVEY.md §4)."""

import os

# FORCE the CPU backend.  The environment pre-sets JAX_PLATFORMS=axon AND a
# sitecustomize registers the axon TPU backend in every process in a way
# that overrides the env var — so round 1's `setdefault` never worked and
# the whole suite silently ran over the TPU tunnel (slow, stateful, and the
# likely source of the round-1 flaky full-suite runs).  The only override
# that sticks is jax.config.update BEFORE backend init, below.  Set
# TH_TEST_TPU=1 to keep the ambient platform and run the hardware-gated
# parity suites (test_wavefront TPU cases, test_msa_device).
_USE_TPU = os.environ.get("TH_TEST_TPU", "") == "1"
# Never share a persistent XLA compile cache with concurrent bench/TPU
# processes.
os.environ["TH_NO_COMPILE_CACHE"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

if not _USE_TPU:
    import jax

    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu"
    assert len(jax.devices()) == 8

import pathlib

import pytest

REFERENCE = pathlib.Path("/root/reference")

# Slow tier (VERDICT r4 weak #8): the handful of multi-minute
# interpret-mode engine-vs-oracle sweeps run only under TH_RUN_SLOW=1
# (CI's full job and the per-round judging pass set it); the default
# `pytest tests/` stays fast while test_fuzz / test_offload /
# test_e2e_golden keep engine-oracle and golden coverage in-tier.
_SLOW_NODES = {
    "tests/test_engine.py::test_engine_matches_oracle_1000x10",
    "tests/test_engine.py::test_engine_matches_oracle_full_length",
    "tests/test_chaining_jax.py::test_engine_device_chain_matches_oracle",
    "tests/test_msa_banded_interpret.py::test_banded_msa_interpret_parity",
}


def pytest_collection_modifyitems(config, items):
    if os.environ.get("TH_RUN_SLOW"):
        return
    skip = pytest.mark.skip(
        reason="slow tier: set TH_RUN_SLOW=1 (run before every round end)")
    for item in items:
        nid = item.nodeid.replace("\\", "/")
        if not nid.startswith("tests/"):
            idx = nid.find("tests/")
            nid = nid[idx:] if idx >= 0 else "tests/" + nid
        if nid in _SLOW_NODES:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def test_data():
    return REFERENCE / "test_data"
