"""Weights-day audit tool tests (VERDICT r2 item 1).

Two guarantees, both provable without the real weights:

1. **Manifest ⇔ converter closure** — the ``expected_*_keys`` manifests in
   ``tools/audit_checkpoint.py`` are exactly the keys the real converters
   consume: a synthetic state dict built from the manifest converts without
   error AND every manifest key is actually read (access tracking), AND the
   converted tree matches ``init_params`` leaf-for-leaf in shape. If a
   converter ever grows/loses a key, this test fails before weights day does.
2. **The audit itself works** — clean manifests pass; a missing key, a wrong
   shape, and an unknown key each produce exactly the right report; known
   bypassed families (VGGT depth/point/camera/track heads, the reference
   loads them strict=False and never calls them) do not fail the audit.

The checked-in full-size fixtures ``tests/fixtures/manifests/*.json`` record
what we expect ``Qwen3-4B-Instruct-2507`` safetensors / ``vggt_1B_commercial
.pt`` to contain; on weights day the same CLI runs against the real files and
any diff (missing / mismatched / unknown keys) is the complete risk list.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO / "tools"))

import audit_checkpoint as audit  # noqa: E402

from vggt_qwen3_tpu.config import (  # noqa: E402
    PerceiverConfig,
    QWEN3_TINY,
    VGGT_TINY,
)


class TrackingDict(dict):
    """State dict that records every key actually read by a converter."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.read = set()

    def __getitem__(self, key):
        self.read.add(key)
        return super().__getitem__(key)


def synth_state_dict(manifest, seed=0):
    rng = np.random.default_rng(seed)
    return TrackingDict(
        {k: rng.standard_normal(shape).astype(np.float32) for k, shape in manifest.items()}
    )


def tree_shapes(tree):
    return {
        "/".join(str(getattr(p, "key", p)) for p in path): tuple(leaf.shape)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
    }


# ---------------------------------------------------------------------------
# 1. Manifest ⇔ converter closure (tiny configs, real converters)
# ---------------------------------------------------------------------------


def test_qwen3_manifest_matches_converter():
    from vggt_qwen3_tpu.models import qwen3
    from vggt_qwen3_tpu.models.convert_qwen3 import convert_state_dict

    cfg = QWEN3_TINY
    manifest = audit.expected_qwen3_keys(cfg)
    sd = synth_state_dict(manifest)
    params = convert_state_dict(sd, cfg, dtype="float32")
    assert sd.read == set(manifest), (
        f"converter/manifest drift: unread={set(manifest) - sd.read} "
        f"extra={sd.read - set(manifest)}"
    )
    ref = tree_shapes(qwen3.init_params(jax.random.PRNGKey(0), cfg, dtype="float32"))
    assert tree_shapes(params) == ref


def test_qwen3_untied_manifest_has_lm_head():
    import dataclasses

    cfg = dataclasses.replace(QWEN3_TINY, tie_word_embeddings=False)
    manifest = audit.expected_qwen3_keys(cfg)
    assert "lm_head.weight" in manifest
    from vggt_qwen3_tpu.models.convert_qwen3 import convert_state_dict

    sd = synth_state_dict(manifest)
    params = convert_state_dict(sd, cfg, dtype="float32")
    assert sd.read == set(manifest)
    assert "lm_head" in params


def test_vggt_manifest_matches_converter():
    from vggt_qwen3_tpu.models import vggt

    cfg = VGGT_TINY
    manifest = audit.expected_vggt_keys(cfg)
    sd = synth_state_dict(manifest)
    params = vggt.convert_torch_state_dict(sd, cfg, dtype="float32")
    assert sd.read == set(manifest)
    ref = tree_shapes(vggt.init_params(jax.random.PRNGKey(0), cfg, dtype="float32"))
    assert tree_shapes(params) == ref


def test_perceiver_manifest_matches_converter():
    from vggt_qwen3_tpu.models import perceiver

    cfg = PerceiverConfig(latent_dim=16, num_latents=4, num_heads=2, num_layers=2, ffn_dim=32)
    in_dim, out_dim = 2 * VGGT_TINY.embed_dim, QWEN3_TINY.hidden_size
    manifest = audit.expected_perceiver_keys(cfg, in_dim, out_dim)
    sd = synth_state_dict(manifest)
    params = perceiver.convert_torch_state_dict(sd, cfg, dtype="float32")
    assert sd.read == set(manifest)
    ref = tree_shapes(
        perceiver.init_params(jax.random.PRNGKey(0), cfg, in_dim, out_dim, dtype="float32")
    )
    assert tree_shapes(params) == ref


def test_geom_manifest_matches_converter():
    from vggt_qwen3_tpu.models import geom

    manifest = audit.expected_geom_keys(QWEN3_TINY.hidden_size)
    sd = synth_state_dict(manifest)
    params = geom.convert_torch_state_dict(sd, dtype="float32")
    assert sd.read == set(manifest)
    ref = tree_shapes(
        geom.init_params(jax.random.PRNGKey(0), QWEN3_TINY.hidden_size, dtype="float32")
    )
    assert tree_shapes(params) == ref


# ---------------------------------------------------------------------------
# 2. Audit mechanics
# ---------------------------------------------------------------------------


def _as_actual(manifest, dtype="F32"):
    return {k: {"shape": tuple(v), "dtype": dtype} for k, v in manifest.items()}


def test_audit_clean_pass():
    manifest = audit.expected_qwen3_keys(QWEN3_TINY)
    rep = audit.audit_component("text", manifest, _as_actual(manifest))
    assert rep["ok"] and rep["matched"] == len(manifest)
    assert not rep["missing"] and not rep["shape_mismatch"] and not rep["unknown_remainder"]


def test_audit_reports_missing_and_mismatch_and_unknown():
    manifest = audit.expected_qwen3_keys(QWEN3_TINY)
    actual = _as_actual(manifest)
    del actual["model.norm.weight"]
    actual["model.embed_tokens.weight"]["shape"] = (7, 7)
    actual["model.mystery.weight"] = {"shape": (3,), "dtype": "F32"}
    rep = audit.audit_component("text", manifest, actual)
    assert not rep["ok"]
    assert rep["missing"] == ["model.norm.weight"]
    assert [m["key"] for m in rep["shape_mismatch"]] == ["model.embed_tokens.weight"]
    assert rep["unknown_remainder"] == ["model.mystery.weight"]


def test_audit_vggt_bypassed_heads_and_reshape_tolerance():
    manifest = audit.expected_vggt_keys(VGGT_TINY)
    actual = _as_actual(manifest)
    # real checkpoints prefix aggregator. and carry bypassed heads
    actual = {f"aggregator.{k}": v for k, v in actual.items()}
    actual["depth_head.proj.weight"] = {"shape": (8, 8), "dtype": "F32"}
    actual["aggregator.patch_embed.mask_token"] = {"shape": (1, 32), "dtype": "F32"}
    # reshape keys: same element count, different rank, must still match
    E, R = VGGT_TINY.embed_dim, VGGT_TINY.num_register_tokens
    actual["aggregator.camera_token"]["shape"] = (2, 1, E)
    actual["aggregator.register_token"]["shape"] = (1, 2, R, E)
    rep = audit.audit_component(
        "vision", manifest, actual, reshape_ok=audit.VGGT_RESHAPE_KEYS
    )
    assert rep["ok"], rep
    assert len(rep["bypassed_remainder"]) == 2


def test_audit_vlm_routing():
    text = audit.expected_qwen3_keys(QWEN3_TINY)
    geom = audit.expected_geom_keys(QWEN3_TINY.hidden_size)
    merged = {}
    for k, v in _as_actual(text).items():
        merged[f"text_model.{k}"] = v
    for k, v in _as_actual(geom).items():
        merged[f"geom_head.{k}"] = v
    groups = audit._route_vlm(merged)
    assert set(groups["text"]) == set(text)
    assert set(groups["geom"]) == set(geom)
    assert not groups["vision"] and not groups["projector"]


# ---------------------------------------------------------------------------
# 3. Recorded full-size fixtures + CLI end-to-end
# ---------------------------------------------------------------------------

FIXTURES = REPO / "tests" / "fixtures" / "manifests"


@pytest.mark.parametrize(
    "fixture, component",
    [("qwen3_4b.json", "text"), ("vggt_1b.json", "vision")],
)
def test_recorded_fixture_audits_clean(fixture, component):
    """The checked-in expected manifests for the production checkpoints audit
    clean through the real CLI — the exact command weights day runs."""
    path = FIXTURES / fixture
    assert path.exists(), f"fixture {path} missing — regenerate per its header"
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "audit_checkpoint.py"),
            "--src", str(path),
            "--component", component,
            "--config", str(REPO / "configs" / "stage1_3d.yaml"),
            "--json",
        ],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    rep = json.loads(proc.stdout)
    assert rep["ok"]
    # sanity: the 4B text manifest should count ~4.0B params, VGGT-1B ~1.1B
    params = rep["reports"][0]["params_matched"]
    lo, hi = (3.5e9, 4.5e9) if component == "text" else (0.9e9, 1.5e9)
    assert lo < params < hi, params


def test_cli_write_manifest_roundtrip(tmp_path):
    """--write_manifest output re-audits identically (record on the weights
    machine, audit anywhere)."""
    manifest = audit.expected_qwen3_keys(QWEN3_TINY)
    src = tmp_path / "m.json"
    src.write_text(json.dumps({"tensors": {k: {"shape": list(v), "dtype": "BF16"} for k, v in manifest.items()}}))
    out = tmp_path / "recorded.json"
    proc = subprocess.run(
        [sys.executable, str(REPO / "tools" / "audit_checkpoint.py"),
         "--src", str(src), "--write_manifest", str(out)],
        capture_output=True, text=True, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert json.loads(out.read_text())["tensors"].keys() == manifest.keys()


def test_cli_audits_real_safetensors_header(tmp_path):
    """End-to-end on a real safetensors file: tiny synthetic Qwen3 weights →
    header-only read → clean audit; then corrupt a shape → rc 1."""
    from safetensors.numpy import save_file

    cfg = QWEN3_TINY
    manifest = audit.expected_qwen3_keys(cfg)
    rng = np.random.default_rng(0)
    sd = {k: rng.standard_normal(v).astype(np.float32) for k, v in manifest.items()}
    f = tmp_path / "model.safetensors"
    save_file(sd, str(f))

    cmd = [sys.executable, str(REPO / "tools" / "audit_checkpoint.py"),
           "--src", str(f), "--component", "text", "--tiny",
           "--config", str(REPO / "configs" / "stage1_3d.yaml"), "--json"]
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 0, proc.stdout + proc.stderr

    sd["model.norm.weight"] = np.zeros((3, 3), np.float32)
    save_file(sd, str(f))
    proc = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO)
    assert proc.returncode == 1
    rep = json.loads(proc.stdout)
    assert rep["reports"][0]["shape_mismatch"]
