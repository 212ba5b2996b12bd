"""Multichip dryrun must be free of SPMD involuntary-rematerialization
(VERDICT r2 item 2).

``MULTICHIP_r02.json`` passed but logged ``spmd_partitioner.cc`` warnings:
the backward's ``%slice``/``%pad`` ops (splice-features and logits
cotangents) could not be resharded from batch-sharded ``[4,1,1]`` to the TP
weight layout ``[1,1,2,2]`` and were replicated every step — wasted HBM+ICI
on a real slice. The fix pins those cotangents batch-sharded via
``with_sharding_constraint`` at the model seams (``vlm.train_forward
act_constraint``). This test runs the real driver dryrun on the virtual
8-device mesh and asserts the warning never comes back, and that the loss is
still finite/identical-shape behavior (the dryrun's own asserts).
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]


def test_dryrun_multichip_no_involuntary_remat():
    env = dict(os.environ)
    flags = re.sub(
        r"--xla_force_host_platform_device_count=\d+", "", env.get("XLA_FLAGS", "")
    )
    env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("_VQT_DRYRUN_CHILD", None)
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import jax; jax.config.update('jax_platforms', 'cpu'); "
            "import sys; sys.path.insert(0, %r); "
            "import __graft_entry__ as g; g.dryrun_multichip(8)" % str(REPO),
        ],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    out = proc.stdout + proc.stderr
    assert proc.returncode == 0, out[-4000:]
    assert "dryrun_multichip OK" in out, out[-4000:]
    assert "Involuntary full rematerialization" not in out, (
        "SPMD fell back to replicating a tensor — a forward activation lost "
        "its batch sharding constraint:\n"
        + "\n".join(l for l in out.splitlines() if "rematerialization" in l)[:2000]
    )
