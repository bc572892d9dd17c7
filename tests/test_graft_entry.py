"""Driver-environment coverage for __graft_entry__.dryrun_multichip.

The driver invokes dryrun_multichip(8) with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` ALREADY set in the
environment (MULTICHIP_r04.json regression: the entry used to skip raising
the virtual-device pool when the flag was pre-set, so the ring=14 mesh saw
only 8 devices and crashed). This test reproduces the driver's exact
environment in a subprocess, so the entry — not just the library — is
covered.

Subprocess is required: XLA_FLAGS is read once at backend init, and the
main pytest process already initialized a 14-device CPU backend.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_with_preset_device_count_flag():
    env = dict(os.environ)
    # the driver's environment: pool pinned to 8 BEFORE the entry runs
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("S360_TPU_SMOKE", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)",
        ],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, (
        f"dryrun_multichip(8) failed under the driver's pre-set "
        f"device-count flag:\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dryrun_multichip OK" in proc.stdout
    # both meshes must have been exercised: the (data, ring) mesh the driver
    # asks for AND the camera-width ring=14 mesh
    assert "camera-width ring mesh" in proc.stdout
