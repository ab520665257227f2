import os

# Run the test-suite on a virtual 8-device CPU mesh: sharding/multi-chip tests
# need multiple devices, and CPU keeps numerics reproducible for parity tests.
os.environ["JAX_PLATFORMS"] = "cpu"  # override harness default (axon TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
