"""Multi-host training wiring: 2 CPU processes × 4 virtual devices == one
8-device process (VERDICT r1 item 5).

Each rank runs the real sft CLI with ``--multihost`` (jax.distributed over a
localhost coordinator); rank 0's logged losses must match a single-process
8-device run — proving per-host batch assembly
(jax.make_array_from_process_local_data + the loader's shard contract)
reproduces the exact global batch stream.
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(n_devices: int) -> dict:
    env = dict(os.environ)
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_devices}"
    env["JAX_PLATFORMS"] = "cpu"
    return env


def _cmd(out_dir, extra):
    return [
        sys.executable, "-m", "vggt_qwen3_tpu.train.sft",
        "--config", "configs/toy.yaml", "--output_dir", str(out_dir),
        "--tiny", "--mock_vision", "--max_steps", "4", "--log_every_steps", "1",
        "--save_every_steps", "100",
    ] + extra


def _losses(out_dir):
    out = {}
    for line in (Path(out_dir) / "metrics.jsonl").read_text().splitlines():
        rec = json.loads(line)
        out[rec["step"]] = rec["loss"]
    return out


def test_two_process_training_matches_single_process(tmp_path):
    single = tmp_path / "single"
    r = subprocess.run(
        _cmd(single, []), cwd=REPO, env=_env(8),
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])

    # Gloo's rendezvous times out when the machine is heavily loaded (two
    # fresh processes must connect within its window) — retry once before
    # declaring failure; a real wiring bug fails both attempts.
    multi = tmp_path / "multi"
    for attempt in range(2):
        port = _free_port()
        procs = []
        for rank in range(2):
            procs.append(subprocess.Popen(
                _cmd(multi, [
                    "--multihost",
                    "--coordinator_address", f"127.0.0.1:{port}",
                    "--num_processes", "2", "--process_id", str(rank),
                ]),
                cwd=REPO, env=_env(4),
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            ))
        outs = [p.communicate(timeout=900) for p in procs]
        if all(p.returncode == 0 for p in procs):
            break
        transient = any("Connect timeout" in se or "initialization failed" in se
                        for _, se in outs)
        if attempt == 1 or not transient:
            for p, (so, se) in zip(procs, outs):
                assert p.returncode == 0, (so[-2000:], se[-2000:])

    ls, lm = _losses(single), _losses(multi)
    assert set(ls) == set(lm) and len(ls) >= 4
    for step in sorted(ls):
        np.testing.assert_allclose(
            lm[step], ls[step], rtol=2e-5, err_msg=f"step {step}"
        )
