import os

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver separately dry-runs the
# multi-chip path).  Must be set before jax is imported.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pytest  # noqa: E402

REF_DIR = "/root/reference"


@pytest.fixture(scope="session")
def ref_oracle():
    """The reference decoder built out-of-tree, as a golden oracle."""
    from tools.ref_oracle import RefOracle

    return RefOracle.build()
