"""Test configuration: force CPU with a virtual 8-device mesh.

Multi-chip hardware is not available in CI; sharding/pjit paths are
exercised on 8 virtual CPU devices via XLA's host platform override. Must
run before the first jax import.
"""

import os
import subprocess
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon site hook (sitecustomize) force-registers the TPU backend and
# overwrites jax_platforms; override it back before any backend init.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

# Build the native metric cores once per session (best-effort).
_native_lib = os.path.join(REPO_ROOT, "native", "libwipa_native.so")
if not os.path.isfile(_native_lib):
    try:
        subprocess.run(
            ["make", "-C", os.path.join(REPO_ROOT, "native")],
            check=False,
            capture_output=True,
            timeout=120,
        )
    except Exception:
        pass
