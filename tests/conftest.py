"""Test-suite environment setup.

The suite runs on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware (SURVEY.md §4).  In environments where a
TPU plugin is force-registered via sitecustomize (PYTHONPATH), setting
JAX_PLATFORMS after interpreter start is too late — the plugin hook makes
any later backend init hang — so we re-exec pytest once with a cleaned
environment before any test imports jax.  Pytest's fd-level capture is
suspended first so the re-exec'd child inherits the real stdout.

Set MCPT_TEST_TPU=1 to run the suite on the real chip instead.
"""

import os
import sys

_WANT_XLA = "--xla_force_host_platform_device_count=8"


def _needs_reexec() -> bool:
    if os.environ.get("MCPT_TEST_TPU") or os.environ.get("_MCPT_REEXECED"):
        return False
    # NOTE: jax may already be in sys.modules (sitecustomize pre-imports
    # it); that's fine — execve replaces the whole process.
    tainted = os.environ.get("JAX_PLATFORMS", "cpu") != "cpu"
    missing_flag = _WANT_XLA.split("=")[0] not in os.environ.get("XLA_FLAGS", "")
    # the axon sitecustomize force-registers the TPU plugin and WINS over
    # JAX_PLATFORMS=cpu set in the environment (it re-exports the var at
    # interpreter start) — a caller presetting cpu+flags still ends up on
    # the chip unless the hook is stripped from PYTHONPATH
    plugin = any(
        p and "axon" in p
        for p in os.environ.get("PYTHONPATH", "").split(os.pathsep)
    )
    return tainted or missing_flag or plugin


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        capman.suspend_global_capture(in_=True)

    env = dict(os.environ)
    env["_MCPT_REEXECED"] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + _WANT_XLA).strip()
    # drop sitecustomize hooks that force-register accelerator plugins
    pythonpath = [
        p
        for p in env.get("PYTHONPATH", "").split(os.pathsep)
        if p and "axon" not in p
    ]
    env["PYTHONPATH"] = os.pathsep.join(pythonpath)
    os.execve(
        sys.executable,
        [sys.executable, "-m", "pytest", *config.invocation_params.args],
        env,
    )
