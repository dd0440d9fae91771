import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path).  Must be set before jax is imported.
# force CPU even when the shell exports JAX_PLATFORMS (e.g. axon): the
# suite must not contend for -- or depend on -- the one real TPU chip.
# Opt in to TPU runs explicitly with E264T_TEST_TPU=1.
if not os.environ.get("E264T_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "parallel_codegen" not in flags:
    # long suite runs segfault inside XLA:CPU's backend_compile_and_load
    # (LLVM parallel codegen + hundreds of prior compiles); serializing
    # codegen avoids the crash at a small compile-time cost
    flags = (flags + " --xla_cpu_parallel_codegen_split_count=1").strip()
os.environ["XLA_FLAGS"] = flags

if not os.environ.get("E264T_TEST_TPU"):
    # the axon sitecustomize registers its TPU backend via a programmatic
    # config update, which outranks the JAX_PLATFORMS env var -- override
    # it the same way
    import jax
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402

REF_DIR = "/root/reference"


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Long suite runs crash (SIGSEGV/SIGABRT) inside XLA:CPU
    backend_compile_and_load after a few hundred compilations — state
    accumulated in jit caches (every module-level jit keeps per-layout
    executables alive for the whole session).  Dropping them per module
    keeps the process within what jaxlib tolerates."""
    yield
    import jax

    jax.clear_caches()


@pytest.fixture(scope="session")
def ref_oracle():
    """The reference decoder built out-of-tree, as a golden oracle."""
    from tools.ref_oracle import RefOracle

    return RefOracle.build()
