"""Test configuration.

Force JAX onto a virtual 8-device CPU mesh so sharding/collective tests
run hermetically and fast (the real TPU chip is reserved for bench.py).
Must run before jax is imported anywhere.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force the
# platform through the config API before any test imports jax.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pathlib  # noqa: E402

import pytest  # noqa: E402

REFERENCE_DIR = pathlib.Path("/root/reference")
REFERENCE_BIN = pathlib.Path("/tmp/refbuild/lbzip2")


@pytest.fixture(scope="session")
def reference_corpus():
    """Paths of the reference's adversarial .bz2 corpus (read-only)."""
    d = REFERENCE_DIR / "tests"
    if not d.is_dir():
        pytest.skip("reference corpus not available")
    return sorted(d.glob("*.bz2"))


def pytest_sessionfinish(session, exitstatus):
    """Engine threads (lbz2-device / lbz2-fetch*) may still sit inside
    an XLA call when the last test finishes — by design they are
    abandonable daemons (wedged-tunnel tolerance).  A daemon inside
    jax native code during interpreter teardown aborts the C++ runtime
    ("FATAL: exception not rethrown"), so give them a bounded join and
    hard-exit with the session status if any remain (same rationale as
    bench.py's os._exit)."""
    import os
    import sys
    import threading
    import time

    deadline = time.time() + 20
    for t in threading.enumerate():
        if t.name.startswith("lbz2-") and t is not threading.main_thread():
            t.join(timeout=max(0.0, deadline - time.time()))
    if any(t.name.startswith("lbz2-") and t.is_alive()
           for t in threading.enumerate()):
        sys.stdout.flush()
        sys.stderr.flush()
        os._exit(int(exitstatus))
