"""Test harness configuration.

The suite is designed for a virtual 8-device CPU mesh.  A plain

    python -m pytest tests/ -q

**just works**: when the ambient environment preloads a TPU backend (the
axon sitecustomize registers it at interpreter startup via PYTHONPATH,
before this file can act — and jax is already imported by then), this
conftest RE-EXECS the pytest process with the CPU mesh environment instead
of silently running a degraded suite (the old behavior skipped ~2/3 of the
tests — every host-loop and multidevice module — while looking green).

Escape hatches:
  * ``MRE_TPU_TESTS=1`` — run the full suite against the real TPU backend
    (slow: host-driven loop tests pay ~100ms RPC per step).
  * ``JAX_PLATFORMS=cpu`` explicitly (with PYTHONPATH free of the axon
    site hook) — the historical invocation, still fine.

A ``quick`` marker tier (``-m quick``, <60s) covers one differential slice
per env plus the RNG/core contracts for tight edit-test loops.
"""

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _backend_is_preloaded_tpu() -> bool:
    """True when jax was already initialized onto a TPU-ish backend by the
    interpreter-startup site hook (so env vars set here are too late)."""
    if os.environ.get("JAX_PLATFORMS", "").lower() in ("axon", "tpu"):
        return True
    jx = sys.modules.get("jax")
    if jx is None:
        return False
    try:
        return jx.default_backend() != "cpu"
    except Exception:
        return False


def _reexec_onto_cpu_mesh(config):
    """Replace this pytest process with one configured for the CPU mesh.
    Runs from pytest_configure so the capture manager can hand back the
    real stdout/stderr fds first (an execve under active fd-capture would
    send the whole child run into pytest's orphaned capture tempfiles)."""
    if os.environ.get("MRE_BACKEND_REEXEC") == "1":
        raise SystemExit(
            "tests/conftest.py: re-exec onto the CPU mesh failed to shed the "
            "TPU backend. Run the suite as\n"
            "  PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -m pytest tests/\n"
            "or set MRE_TPU_TESTS=1 to intentionally test against the TPU."
        )
    env = dict(os.environ)
    env["MRE_BACKEND_REEXEC"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = _REPO_ROOT  # drop the axon site hook
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=8"])
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.stop_global_capturing()
    sys.stderr.write(
        "tests/conftest.py: ambient TPU backend detected — re-exec onto the "
        "virtual 8-device CPU mesh (set MRE_TPU_TESTS=1 to test on TPU)\n"
    )
    sys.stderr.flush()
    os.execve(sys.executable,
              [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import pytest  # noqa: E402  (after the backend env setup above)

# Persistent compilation cache — axon-tunnel backend ONLY (remote compiles
# are 20-90s there; the analog of the reference's MADRONA_MWGPU_KERNEL_CACHE).
# A plain local TPU (JAX_PLATFORMS=tpu) intentionally gets no cache too:
# only the tunnel's remote-compile latency justifies the risk below.
# On the CPU backend the cache is a net LOSS and, worse, jax's CPU
# executable deserialization aborts the process on cache HITS for the
# sharded+donated selfplay train_step (reproduced deterministically:
# fresh-cache run passes, warm-cache rerun SIGABRTs in
# test_multidevice.py::test_selfplay_train_step_sharded_equals_single),
# so CPU runs stay cache-free.
if os.environ.get("JAX_PLATFORMS", "") == "axon":
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO_ROOT, ".cache/jax")
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")


def pytest_configure(config):
    if _backend_is_preloaded_tpu() and os.environ.get("MRE_TPU_TESTS") != "1":
        _reexec_onto_cpu_mesh(config)
    config.addinivalue_line(
        "markers",
        "quick: <60s smoke tier — one differential slice per env plus the "
        "RNG/core contracts (run with -m quick)",
    )
    # Fail loudly (never silently degrade) if the backend that materialized
    # is not the one the suite was configured for.
    import jax

    backend = jax.default_backend()
    if backend != "cpu" and os.environ.get("MRE_TPU_TESTS") != "1":
        raise pytest.UsageError(
            f"tests expected the CPU mesh but jax initialized '{backend}'. "
            "Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python -m pytest "
            "tests/  (or set MRE_TPU_TESTS=1 to test on TPU)"
        )


def pytest_collection_modifyitems(config, items):
    """On the tunneled TPU backend, host-driven training/API loop tests run
    ~100x slower (per-step RPC latency) and push the suite past common CI
    timeouts; skip them there.  The differential simulator suites still run.
    Full coverage: CPU invocation per the module docstring, or force with
    MRE_TPU_TESTS=1."""
    import jax
    import pytest

    if jax.default_backend() != "tpu" or os.environ.get("MRE_TPU_TESTS") == "1":
        return
    heavy = {"test_mappo", "test_cleanrl_ppo", "test_api", "test_baseline_envs"}
    skip = pytest.mark.skip(
        reason="host-driven loop test; ~100x slower through the TPU tunnel — "
        "run on CPU (see conftest docstring) or set MRE_TPU_TESTS=1"
    )
    for item in items:
        if item.module.__name__.split(".")[-1] in heavy:
            item.add_marker(skip)
