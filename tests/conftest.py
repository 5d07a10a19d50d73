"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-world answer to the reference's total absence of automated
tests (SURVEY.md §4): kernels and sharded collectives are exercised on CPU
in CI; the same code paths run unmodified on real TPU slices.
"""

import os

# Must be set before jax initializes its backends. Force-set (not
# setdefault): the container env pins JAX_PLATFORMS=axon for the real-TPU
# tunnel, and the axon sitecustomize re-registers it at interpreter start —
# tests always run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)


def pytest_collection_modifyitems(config, items):
    """Run the e2e stereo tests BEFORE the stereo-KITTI CLI test.

    The CLI test spawns a fresh python subprocess; its jitted programs are
    identical (by construction — same SlamConfig) to the ones the e2e
    stereo tests compile, so running e2e first warms the persistent
    compile cache and the subprocess starts at full speed instead of
    paying a ~6 min cold compile against its 560 s timeout.
    """
    cli = [i for i in items if "test_stereo_kitti_cli_runs" in i.nodeid]
    if not cli:
        return
    rest = [i for i in items if "test_stereo_kitti_cli_runs" not in i.nodeid]
    items[:] = rest + cli
