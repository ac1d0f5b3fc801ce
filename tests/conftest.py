import os
import sys
from pathlib import Path

# Tests run the JAX pipeline on a virtual 8-device CPU mesh so sharding tests
# work without TPU hardware; set env before jax is imported anywhere.  This
# must *override* the host environment (which may point JAX_PLATFORMS at a
# tunneled TPU platform like "axon") — set DUMP1090_TEST_TPU=1 to run the
# suite against the real device instead.
if not os.environ.get("DUMP1090_TEST_TPU"):
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize registers the TPU plugin programmatically and
    # wins over the env var — override through jax.config as well
    import jax

    jax.config.update("jax_platforms", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import pytest  # noqa: E402

REFERENCE_FIXTURE = Path(
    os.environ.get("DUMP1090_FIXTURE", "/root/reference/testfiles/modes1.bin")
)
GOLDEN_DIR = REPO_ROOT / "tests" / "golden"


@pytest.fixture(scope="session")
def modes1_path() -> Path:
    if not REFERENCE_FIXTURE.exists():
        pytest.skip(f"IQ fixture not available at {REFERENCE_FIXTURE}")
    return REFERENCE_FIXTURE


@pytest.fixture(scope="session")
def golden_dir() -> Path:
    return GOLDEN_DIR
