"""Test harness: run everything on a virtual 8-device CPU mesh.

Real-TPU behavior is covered by ``bench.py`` and the driver's compile checks;
unit/parity tests use the host platform so they are hermetic and can exercise
multi-device sharding without hardware (SURVEY.md §4 implication).

Note: this environment's TPU plugin ignores the ``JAX_PLATFORMS`` env var, so
we force the CPU backend via ``jax.config`` before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# data/toy/ is generated (gitignored); a fresh clone lacks it. Regenerate once
# per session so fixture-driven tests are hermetic.
import pathlib  # noqa: E402
import subprocess  # noqa: E402
import sys  # noqa: E402

_REPO = pathlib.Path(__file__).resolve().parents[1]
if not (_REPO / "data" / "toy" / "train.jsonl").exists():
    subprocess.run(
        [sys.executable, str(_REPO / "scripts" / "make_toy_dataset.py")],
        check=True, cwd=_REPO,
    )
