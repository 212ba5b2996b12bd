"""Environment preflight — reference ``scripts/test_setup.sh`` rebuilt for TPU.

Checks (TPU-idiomatic; no GPU probing or NCCL env — SURVEY.md §2.9 design
translation): devices visible, package imports, configs parse, dataset globs
resolve with sample counts, data validation, then a 1-step tiny training
dry-run with a timeout.

    python scripts/preflight.py [--config configs/toy.yaml] [--skip-train]
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, ".")

import vggt_qwen3_tpu  # noqa: F401,E402 — honors JAX_PLATFORMS before backend init (axon quirk)

CHECKS = []


def check(name):
    def deco(fn):
        CHECKS.append((name, fn))
        return fn
    return deco


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/toy.yaml")
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--train-timeout", type=int, default=600)
    args = ap.parse_args()

    @check("1. JAX devices")
    def _devices():
        # Probe in a BOUNDED subprocess: a wedged backend relay blocks
        # inside backend init uninterruptibly (the axon failure mode), and
        # an in-process jax.devices() would hang the whole preflight. The
        # child also runs one tiny matmul — "device listed" is weaker than
        # "device accepts work".
        import subprocess
        import sys as _sys

        # a deliberate CPU run must not touch the accelerator plugin at all
        # (the axon plugin ignores the env var — only the config call works)
        force_cpu = os.environ.get("JAX_PLATFORMS", "").startswith("cpu")
        src = (
            "import jax\n"
            + ("jax.config.update('jax_platforms', 'cpu')\n" if force_cpu else "")
            + "import jax.numpy as jnp, numpy as np\n"
            "d = jax.devices()\n"
            "x = jnp.ones((64, 64), jnp.float32)\n"
            "float(np.asarray((x @ x).sum()))\n"
            "print(f'{len(d)} x {d[0].platform} ({jax.default_backend()})')\n"
        )
        try:
            r = subprocess.run(
                [_sys.executable, "-c", src],
                capture_output=True, text=True, timeout=120,
            )
        except subprocess.TimeoutExpired:
            raise RuntimeError(
                "backend init did not complete in 120s — wedged device "
                "relay / dead accelerator runtime (a real chip answers in "
                "seconds); fix the backend before launching training"
            )
        if r.returncode != 0:
            tail = (r.stderr or "").strip().splitlines()[-1:] or ["(no stderr)"]
            raise RuntimeError(f"device probe failed: {tail[0][:200]}")
        return r.stdout.strip()

    @check("2. package imports")
    def _imports():
        import flax, optax, orbax.checkpoint, transformers  # noqa: F401

        from vggt_qwen3_tpu import models, ops, parallel, train  # noqa: F401

        return "jax/flax/optax/orbax/transformers + vggt_qwen3_tpu"

    @check("3. stage config parses")
    def _config():
        from vggt_qwen3_tpu.config import load_stage_config

        stage = load_stage_config(args.config)
        return f"{args.config}: {len(stage.data.datasets)} dataset(s), max_steps {stage.train.max_steps}"

    @check("4. dataset globs resolve")
    def _datasets():
        import glob as globlib

        from vggt_qwen3_tpu.config import load_stage_config

        stage = load_stage_config(args.config)
        parts = []
        for name, pattern in stage.data.datasets.items():
            files = globlib.glob(pattern)
            if not files:
                raise FileNotFoundError(f"'{name}' glob {pattern} matches nothing")
            count = 0
            for f in files:
                text = Path(f).read_text()
                count += text.count("\n") if f.endswith(".jsonl") else 1
            parts.append(f"{name}={count}")
        return ", ".join(parts)

    @check("5. data validation")
    def _validate():
        r = subprocess.run(
            [sys.executable, "scripts/validate_data.py", "--config", args.config],
            capture_output=True, text=True,
        )
        if r.returncode != 0:
            raise RuntimeError(r.stdout.strip().splitlines()[-1] if r.stdout else "failed")
        return "ok"

    @check("6. model init sanity")
    def _init():
        r = subprocess.run(
            [sys.executable, "scripts/check_init.py"], capture_output=True, text=True
        )
        if r.returncode != 0:
            raise RuntimeError("NaN/Inf in init")
        return "projector/geom finite"

    if not args.skip_train:
        @check("7. 1-step training dry-run")
        def _train():
            t0 = time.time()
            r = subprocess.run(
                [
                    sys.executable, "-m", "vggt_qwen3_tpu.train.sft",
                    "--config", args.config, "--output_dir", "/tmp/preflight_run",
                    "--tiny", "--mock_vision", "--max_steps", "1",
                ],
                capture_output=True, text=True, timeout=args.train_timeout,
            )
            if r.returncode != 0:
                raise RuntimeError((r.stderr or r.stdout).strip().splitlines()[-1])
            return f"1 step in {time.time()-t0:.0f}s"

    failures = 0
    for name, fn in CHECKS:
        try:
            detail = fn()
            print(f"✅ {name}: {detail}")
        except Exception as e:
            print(f"❌ {name}: {e}")
            failures += 1
    print("\n" + ("✅ preflight passed" if failures == 0 else f"❌ {failures} check(s) failed"))
    sys.exit(0 if failures == 0 else 1)


if __name__ == "__main__":
    main()
