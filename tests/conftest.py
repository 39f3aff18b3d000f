"""Test configuration: run on CPU with 8 virtual devices.

Multi-chip sharding logic is tested on a virtual 8-device CPU mesh
(SURVEY.md section 4.2: the TPU equivalent of LAMMPS's
``mpirun -np N`` on localhost). Must run before any jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
# The axon plugin routes ALL compiles (even CPU) through the remote TPU
# compile helper by default — minutes per graph, plus cross-machine CPU
# feature mismatches. Compile locally for tests.
os.environ["PALLAS_AXON_REMOTE_COMPILE"] = "0"
# The persistent compilation cache is DISABLED for the suite: the XLA
# executable (de)serializer is flaky for several shard_map programs on
# this jaxlib (0.9.0) — cache reads AND writes of the weighted-balance
# and sharded-restart programs segfaulted three full-suite runs.
# Compile times dominate the suite either way; correctness wins.
os.environ["SPHERHARM_JAX_CACHE"] = "0"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin force-prepends itself to jax_platforms at import,
# overriding the env var — pin CPU explicitly after import.
jax.config.update("jax_platforms", "cpu")

# x64 available for float64 oracles; engine code pins f32 explicitly.
jax.config.update("jax_enable_x64", True)

assert jax.devices()[0].platform == "cpu", jax.devices()
assert len(jax.devices()) == 8, "virtual 8-device CPU mesh expected"


def pytest_report_header(config):
    # Sign-post the one-process trap: the XLA:CPU compiler on jaxlib
    # 0.9.0 intermittently SEGFAULTS compiling large shard_map programs
    # late in a long-lived process (~46+ tests in). Full-suite runs must
    # use the per-file isolated runner.
    return (
        "NOTE: full-suite runs in ONE process can die in an XLA:CPU "
        "compiler segfault (jaxlib 0.9.0, late-process shard_map "
        "compiles). Use `python scripts/run_suite.py` for full runs; "
        "minimal repro: scripts/xla_cpu_segfault_repro.py"
    )
