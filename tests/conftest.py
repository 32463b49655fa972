import os

# Test on a virtual 8-device CPU mesh so sharding paths are exercised
# without TPU hardware (SURVEY.md §4).  Set MCPT_TEST_TPU=1 to run the
# suite on the real chip instead.
if not os.environ.get("MCPT_TEST_TPU"):
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
