"""Test configuration: force a virtual 8-device CPU platform BEFORE any jax
backend is created, so sharding/collective tests run hermetically (the
capability the reference lacks — SURVEY.md §4 takeaway).

Note: this environment registers a TPU PJRT plugin via sitecustomize and
pins JAX_PLATFORMS in the shell env, so the env var alone is not enough —
jax.config.update wins as long as no backend has been touched yet.
"""

import os
import sys

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    "tests require the virtual 8-device CPU platform; got " + repr(jax.devices())
)

# Build the native ingest lib when absent so tests/test_native.py always
# runs in a fresh checkout (a silent skip would hide regressions in the C++
# wav/jpeg path). An exclusive file lock serializes concurrent pytest runs
# (build.sh writes the .so in place), and a failed build marks only the
# native tests as failed via the _NATIVE_BUILD_ERROR fixture hook rather
# than killing collection for the whole suite.
_NATIVE_BUILD_ERROR = None
if not os.path.exists(os.path.join(_REPO, "native", "libwavio.so")):
    import fcntl
    import subprocess

    _lock_path = os.path.join(_REPO, "native", ".build.lock")
    with open(_lock_path, "w") as _lock:
        fcntl.flock(_lock, fcntl.LOCK_EX)
        try:
            if not os.path.exists(os.path.join(_REPO, "native", "libwavio.so")):
                _proc = subprocess.run(
                    ["bash", os.path.join(_REPO, "native", "build.sh")],
                    capture_output=True,
                    text=True,
                )
                if _proc.returncode != 0:
                    _NATIVE_BUILD_ERROR = (
                        f"native build failed (exit {_proc.returncode}):\n"
                        f"{_proc.stdout}\n{_proc.stderr}"
                    )
        finally:
            fcntl.flock(_lock, fcntl.LOCK_UN)


import pytest


@pytest.fixture(autouse=True)
def _require_native_build(request):
    """Fail (not skip) native-path tests when the native lib is missing,
    without taking down collection of the rest of the suite. tests/
    test_native.py carries no skip mark — after the conftest build step,
    an absent lib means the build FAILED and must be loud."""
    if "test_native" in request.node.nodeid:
        if _NATIVE_BUILD_ERROR:
            pytest.fail(_NATIVE_BUILD_ERROR)
        if not os.path.exists(os.path.join(_REPO, "native", "libwavio.so")):
            pytest.fail(
                "native/libwavio.so is absent after the conftest build step"
            )
