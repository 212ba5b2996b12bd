"""Serving daemon CI (VERDICT r2 items 3+6): spawn the real HTTP server on
the toy config and drive it over localhost — healthz, concurrent requests,
coalescing/continuous-batching stats, and the error paths — for BOTH engines.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys
import time
import urllib.error
import urllib.request
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _get(port: int, path: str, timeout: float = 10):
    with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}", timeout=timeout) as r:
        return json.loads(r.read())


def _post(port: int, path: str, payload: dict, timeout: float = 120):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module", params=["slots", "batch", "slots-spec"])
def server(request):
    engine = "slots" if request.param.startswith("slots") else "batch"
    extra = ["--speculative", "--draft_k", "3"] if request.param == "slots-spec" else []
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "")
    proc = subprocess.Popen(
        [
            sys.executable, "-m", "vggt_qwen3_tpu.inference.server",
            "--config", "configs/toy.yaml", "--tiny", "--mock_vision",
            "--port", str(port), "--engine", engine,
            "--max_batch", "4", "--max_new_tokens", "8",
            "--prompt_bucket", "32", "--max_wait_ms", "200",
            "--decode_chunk", "2",
        ] + extra,
        cwd=REPO, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    # wait for readiness (first compile included)
    deadline = time.time() + 180
    last_err = None
    while time.time() < deadline:
        if proc.poll() is not None:
            out = proc.stdout.read()
            raise RuntimeError(f"server died rc={proc.returncode}:\n{out[-3000:]}")
        try:
            if _get(port, "/healthz", timeout=2).get("status") == "ok":
                break
        except Exception as e:  # noqa: BLE001
            last_err = e
            time.sleep(0.5)
    else:
        proc.kill()
        raise RuntimeError(f"server never became healthy: {last_err}")
    yield request.param, port, proc
    proc.terminate()
    try:
        proc.wait(timeout=10)
    except subprocess.TimeoutExpired:
        proc.kill()


def _toy_image() -> str:
    imgs = sorted((REPO / "data" / "toy" / "images").glob("*.jpg"))
    assert imgs, "toy dataset missing (conftest generates it)"
    return str(imgs[0])


def test_healthz(server):
    _, port, _ = server
    h = _get(port, "/healthz")
    assert h["status"] == "ok"
    assert "requests" in h


def test_concurrent_requests_coalesce(server):
    engine, port, _ = server
    img = _toy_image()
    before = _get(port, "/healthz")

    def ask(i):
        return _post(port, "/v1/qa", {"question": f"What color is room {i}?",
                                      "images": [img]})

    with ThreadPoolExecutor(max_workers=4) as ex:
        results = list(ex.map(ask, range(4)))
    for r in results:
        assert "prediction" in r, r
        assert isinstance(r["prediction"], str)

    after = _get(port, "/healthz")
    assert after["requests"] - before["requests"] == 4
    if engine == "batch":  # noqa: SIM108 — param name, see fixture
        # 4 concurrent requests must coalesce into fewer than 4 batches
        assert after["batches"] - before["batches"] < 4
    else:
        # slots engine reports chunk-level stats
        assert after["chunks"] > before.get("chunks", 0)
        assert after["tokens"] > before.get("tokens", 0)


def test_missing_fields_is_400(server):
    _, port, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/qa", {"question": "no images"})
    assert e.value.code == 400


def test_bad_image_path_is_error(server):
    _, port, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(port, "/v1/qa", {"question": "q", "images": ["/nonexistent/x.jpg"]})
    assert e.value.code in (400, 500)


def test_unknown_path_is_404(server):
    _, port, _ = server
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(port, "/nope")
    assert e.value.code == 404
