"""Test config: force an 8-device CPU mesh so sharding tests run anywhere,
and keep fp64 available for the concordance path."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def ref_binary():
    """Build (once) and return the reference oracle binary path, or skip."""
    import subprocess, pathlib
    script = pathlib.Path(__file__).parent / "refshim" / "build_reference.sh"
    try:
        out = subprocess.run(["bash", str(script)], capture_output=True, text=True, check=True)
        return out.stdout.strip().splitlines()[-1]
    except subprocess.CalledProcessError as e:
        pytest.skip(f"reference oracle build failed: {e.stderr}")
