"""Test configuration: run the suite on a simulated 8-device CPU mesh.

This mirrors the reference's dual-backend test strategy (SURVEY.md §4): the
sequential CI job runs full distributed semantics on a fake backend
(DebugArray); we run the same sharded code paths on XLA's host-platform
device simulation. Real-TPU execution is exercised by bench.py and the
driver's entry-point checks.

The session environment boots every interpreter with the axon remote-TPU
backend pre-registered (sitecustomize), which routes each op/compile through
a network relay — minutes per test. We therefore force a fresh local CPU
backend with 8 simulated devices before any test imports jax arrays.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

from jax.extend.backend import clear_backends  # noqa: E402

clear_backends()
assert jax.devices()[0].platform == "cpu"
