"""Test environment: run everything on CPU with 8 virtual devices and x64
enabled, so numerical parity tests against the reference's float64 logs are
exact and multi-chip sharding tests run without TPU hardware (SURVEY §4)."""

import os

# XLA:CPU compiles the big unrolled Pallas-interpret programs with deeply
# recursive passes; with the default 8 MB stack the suite intermittently
# segfaults inside backend_compile (observed at different tests across
# runs — whichever big kernel compile lands on a tight stack).  Raise the
# soft limit BEFORE jax starts its compile threads: pthread stacks inherit
# RLIMIT_STACK at creation, and the main stack grows up to the limit at
# fault time.
import resource

_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
_want = 512 * 1024 * 1024
if _soft != resource.RLIM_INFINITY and _soft < _want:
    new = _want if _hard == resource.RLIM_INFINITY else min(_want, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (new, _hard))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# The container's sitecustomize force-registers the axon TPU backend and
# overrides JAX_PLATFORMS via jax.config — pin CPU *after* import, before any
# backend is initialised.  The TPU tunnel is single-client; tests must never
# touch it.
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib

import numpy as np
import pytest

REFERENCE_DATA = pathlib.Path("/root/reference/outputs")


# Modules that compile the big interpret-mode Pallas programs (fused /
# hybrid / riccati kernels at B >= 128, shard_map-wrapped variants) — the
# compiles that segfault when XLA:CPU's in-memory executable accumulation
# from a long session gets large enough.
_HEAVY_COMPILE_MODULES = {
    "test_pipeline_equivalence", "test_parallel", "test_multiprocess",
    "test_pallas_qp", "test_riccati_kernel", "test_hetero_batch",
    "test_bench_suite", "test_warm_start",
}


@pytest.fixture(autouse=True)
def _bound_xla_cpu_accumulation(request):
    """XLA:CPU keeps every compiled executable of the session in memory;
    after ~130 compiles the NEXT big compile (e.g. the interpret-mode fused
    kernel at B=256) segfaults inside backend_compile — reproducibly at
    test_pipeline_equivalence in full-suite runs while the same test passes
    standalone or in any subset.  Clearing the compiled-program caches
    BEFORE each heavy-compile TEST caps the accumulation those compiles
    see, without paying cross-module recompiles at every light module
    boundary (an unconditional per-module clear measured +25 min on the
    full suite).  Per-test (not per-module) because a module-scope clear
    was observed insufficient: a full-suite run still crashed at the 4th
    test INSIDE test_warm_start — the module's own earlier tests rebuilt
    enough accumulation to tip the next big compile over."""
    name = request.module.__name__.rsplit(".", 1)[-1]
    if name in _HEAVY_COMPILE_MODULES:
        jax.clear_caches()
    yield


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="run the slow tier too (full CI-style pass; default tier "
             "skips tests marked slow to stay under ~20 min — VERDICT r4 "
             "next #7)")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight interpret-mode kernel / multi-process tests, "
        "skipped unless --runslow (the default tier keeps at least one "
        "fast correctness pin per subsystem)")


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow tier: run with --runslow")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def golden_gazebo_log():
    """A reference-recorded closed-loop run (current log format): used as the
    parity oracle for nominal dynamics (x_pred_odom == RK4(x_odom, w_odom))."""
    import pickle

    p = REFERENCE_DATA / "gazebo_simulation/data/traj2_v10_a10_gp0.pkl"
    if not p.exists():
        pytest.skip("reference golden data not available")
    with open(p, "rb") as f:
        d = pickle.load(f)
    return {k: np.asarray(v) for k, v in d.items() if k in ("x_odom", "x_pred_odom", "w_odom", "t_odom")}
