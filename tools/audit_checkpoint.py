"""Checkpoint key/shape-manifest audit — the weights-day de-risking tool.

The #1 weights-day risk (SURVEY.md §7.3 item 1) is converter key archaeology:
does every tensor in ``vggt_1B_commercial.pt`` / the Qwen3-4B safetensors /
a merged reference VLM checkpoint map through our converters
(``models/convert_qwen3.convert_state_dict``, ``models/vggt`` /
``models/perceiver`` / ``models/geom`` ``convert_torch_state_dict``) with the
exact shape the converter assumes?  This tool answers that WITHOUT running the
(16 GB) conversion:

- It declares, per component, the **expected torch-side key manifest**
  (name → shape) derived from the config — the single source of truth that
  ``tests/test_audit_checkpoint.py`` proves equal to what the converters
  actually consume (tiny-config access-tracking round trip).
- It reads the checkpoint's **actual** manifest cheaply: safetensors headers
  are parsed without touching tensor data; ``.pt`` files load with
  ``mmap=True``; a recorded JSON manifest (``--write_manifest`` output, or a
  hand-recorded one from the machine that holds the weights) works with no
  weights present at all.
- It diffs the two and reports, per component: matched keys/params, shape
  mismatches, missing keys, and the remainder — split into *known-bypassed*
  families (VGGT's depth/point/camera/track heads, which the reference loads
  ``strict=False`` and never calls — ``src/models/vggt_qwen3_vlm.py:86-98,
  142-143`` — plus HF rotary buffers) and *unknown* keys, which fail the audit.

Exit code 0 ⇔ every expected key is present with the expected shape and no
unknown remainder. Usage (see docs/WEIGHTS_DAY_RUNBOOK.md):

    # audit a real checkpoint (any of: .safetensors / .pt / HF dir / merged
    # reference dir / recorded-manifest .json)
    python tools/audit_checkpoint.py --src /path/to/Qwen3-4B --component text
    python tools/audit_checkpoint.py --src vggt_1B_commercial.pt --component vision
    python tools/audit_checkpoint.py --src ckpts/stage1/step_30000 --component vlm

    # record a manifest for offline auditing / fixtures
    python tools/audit_checkpoint.py --src ... --write_manifest manifest.json

    # print the expected manifest (what the converter will consume)
    python tools/audit_checkpoint.py --expected --component text
"""

from __future__ import annotations

import argparse
import json
import re
import struct
import sys
from pathlib import Path
from typing import Dict, Iterable, List, Optional, Tuple

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

Shape = Tuple[int, ...]
Manifest = Dict[str, Shape]  # torch-side key name → shape


# ---------------------------------------------------------------------------
# Expected manifests (torch-side), one per converter
# ---------------------------------------------------------------------------


def expected_qwen3_keys(cfg) -> Manifest:
    """Keys ``models/convert_qwen3.convert_state_dict`` consumes, HF naming
    (``model.``-prefixed, as in Qwen3 safetensors)."""
    H, V, I = cfg.hidden_size, cfg.vocab_size, cfg.intermediate_size
    Q, KV, D = cfg.q_dim, cfg.kv_dim, cfg.head_dim
    m: Manifest = {
        "model.embed_tokens.weight": (V, H),
        "model.norm.weight": (H,),
    }
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}"
        m[f"{p}.input_layernorm.weight"] = (H,)
        m[f"{p}.post_attention_layernorm.weight"] = (H,)
        m[f"{p}.self_attn.q_proj.weight"] = (Q, H)
        m[f"{p}.self_attn.k_proj.weight"] = (KV, H)
        m[f"{p}.self_attn.v_proj.weight"] = (KV, H)
        m[f"{p}.self_attn.o_proj.weight"] = (H, Q)
        m[f"{p}.self_attn.q_norm.weight"] = (D,)
        m[f"{p}.self_attn.k_norm.weight"] = (D,)
        m[f"{p}.mlp.gate_proj.weight"] = (I, H)
        m[f"{p}.mlp.up_proj.weight"] = (I, H)
        m[f"{p}.mlp.down_proj.weight"] = (H, I)
    if not cfg.tie_word_embeddings:
        m["lm_head.weight"] = (V, H)
    return m


def _vit_block_keys(prefix: str, L: int, E: int, F: int) -> Manifest:
    m: Manifest = {}
    for i in range(L):
        p = f"{prefix}.{i}"
        m[f"{p}.norm1.weight"] = (E,)
        m[f"{p}.norm1.bias"] = (E,)
        m[f"{p}.attn.qkv.weight"] = (3 * E, E)
        m[f"{p}.attn.qkv.bias"] = (3 * E,)
        m[f"{p}.attn.proj.weight"] = (E, E)
        m[f"{p}.attn.proj.bias"] = (E,)
        m[f"{p}.ls1.gamma"] = (E,)
        m[f"{p}.norm2.weight"] = (E,)
        m[f"{p}.norm2.bias"] = (E,)
        m[f"{p}.mlp.fc1.weight"] = (F, E)
        m[f"{p}.mlp.fc1.bias"] = (F,)
        m[f"{p}.mlp.fc2.weight"] = (E, F)
        m[f"{p}.mlp.fc2.bias"] = (E,)
        m[f"{p}.ls2.gamma"] = (E,)
    return m


# keys the VGGT converter reads via .reshape(): any shape with the right
# element count is accepted (public checkpoints carry leading 1s / [1,2,...]).
VGGT_RESHAPE_KEYS = {
    "patch_embed.cls_token",
    "patch_embed.register_tokens",
    "patch_embed.pos_embed",
    "camera_token",
    "register_token",
}


def expected_vggt_keys(cfg) -> Manifest:
    """Keys ``models/vggt.convert_torch_state_dict`` consumes (``aggregator.``
    prefix stripped; the loader also accepts unprefixed / ``model.``-prefixed).

    Canonical shapes follow the public VGGT-1B layout; the keys in
    :data:`VGGT_RESHAPE_KEYS` are compared by element count only (the
    converter reshapes them).
    """
    E, P, R = cfg.embed_dim, cfg.patch_size, cfg.num_register_tokens
    n = cfg.img_size // P
    F = int(E * cfg.mlp_ratio)
    m: Manifest = {
        "patch_embed.patch_embed.proj.weight": (E, 3, P, P),
        "patch_embed.patch_embed.proj.bias": (E,),
        "patch_embed.cls_token": (1, 1, E),
        "patch_embed.register_tokens": (1, R, E),
        "patch_embed.pos_embed": (1, 1 + n * n, E),
        "patch_embed.norm.weight": (E,),
        "patch_embed.norm.bias": (E,),
        "camera_token": (1, 2, 1, E),
        "register_token": (1, 2, R, E),
    }
    m.update(_vit_block_keys("patch_embed.blocks", cfg.patch_depth, E, F))
    m.update(_vit_block_keys("frame_blocks", cfg.num_layers, E, F))
    m.update(_vit_block_keys("global_blocks", cfg.num_layers, E, F))
    return m


def expected_perceiver_keys(cfg, in_dim: int, out_dim: int) -> Manifest:
    """Keys ``models/perceiver.convert_torch_state_dict`` consumes (reference
    ``PerceiverProjector.state_dict()`` naming, ``projector_perceiver.py``)."""
    D, F = cfg.latent_dim, cfg.ffn_dim
    m: Manifest = {
        "latents": (cfg.num_latents, D),
        "in_proj.weight": (D, in_dim),
        "in_proj.bias": (D,),
        "out_proj.weight": (out_dim, D),
        "out_proj.bias": (out_dim,),
    }
    for i in range(cfg.num_layers):
        p = f"layers.{i}"
        m[f"{p}.self_attn.in_proj_weight"] = (3 * D, D)
        m[f"{p}.self_attn.in_proj_bias"] = (3 * D,)
        m[f"{p}.self_attn.out_proj.weight"] = (D, D)
        m[f"{p}.self_attn.out_proj.bias"] = (D,)
        m[f"{p}.norm1.weight"] = (D,)
        m[f"{p}.norm1.bias"] = (D,)
        m[f"{p}.norm2.weight"] = (D,)
        m[f"{p}.norm2.bias"] = (D,)
        m[f"{p}.mlp.0.weight"] = (F, D)
        m[f"{p}.mlp.0.bias"] = (F,)
        m[f"{p}.mlp.3.weight"] = (D, F)
        m[f"{p}.mlp.3.bias"] = (D,)
    return m


def expected_geom_keys(hidden: int, feature_dim: int = 37) -> Manifest:
    """Keys ``models/geom.convert_torch_state_dict`` consumes — the reference
    ``geom_head = nn.Sequential(Linear, SiLU, Linear)`` (``vggt_qwen3_vlm.py:
    51-56``)."""
    return {
        "0.weight": (hidden, feature_dim),
        "0.bias": (hidden,),
        "2.weight": (hidden, hidden),
        "2.bias": (hidden,),
    }


# Families present in public checkpoints that our converters deliberately do
# not consume. VGGT heads: bypassed by the reference ("dtype issues", only
# aggregated tokens feed the LLM — vggt_qwen3_vlm.py:142-143) and loaded
# strict=False (:86-98). HF side: non-persistent rotary/masks occasionally
# serialized by older exporters.
KNOWN_BYPASSED = (
    r"^(aggregator\.)?(depth_head|point_head|camera_head|track_head)\.",
    r"\.rotary_emb\.inv_freq$",
    r"\.masked_bias$",
    r"^(aggregator\.)?patch_embed\.mask_token$",  # DINOv2 iBOT mask token (unused at inference)
)


def is_known_bypassed(key: str) -> bool:
    return any(re.search(p, key) for p in KNOWN_BYPASSED)


# ---------------------------------------------------------------------------
# Actual-manifest readers (cheap: no tensor data materialized)
# ---------------------------------------------------------------------------


def read_safetensors_header(path: Path) -> Dict[str, Dict]:
    """Parse one safetensors file's header: name → {shape, dtype}."""
    with open(path, "rb") as f:
        (n,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(n))
    return {
        k: {"shape": tuple(v["shape"]), "dtype": v["dtype"]}
        for k, v in header.items()
        if k != "__metadata__"
    }


def read_torch_manifest(path: Path) -> Dict[str, Dict]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True, mmap=True)
    for wrapper in ("model", "state_dict"):
        if isinstance(sd, dict) and wrapper in sd and isinstance(sd[wrapper], dict):
            sd = sd[wrapper]
            break
    out = {}
    for k, v in sd.items():
        if hasattr(v, "shape"):
            out[k] = {"shape": tuple(v.shape), "dtype": str(v.dtype).removeprefix("torch.")}
    return out


def load_actual_manifest(src: Path) -> Dict[str, Dict]:
    """name → {shape, dtype} from a file, dir, or recorded JSON manifest."""
    if src.is_file():
        if src.suffix == ".json":
            raw = json.loads(src.read_text())
            raw = raw.get("tensors", raw)  # accept {"tensors": {...}} wrapping
            return {
                k: {"shape": tuple(v["shape"]), "dtype": v.get("dtype", "?")}
                for k, v in raw.items()
            }
        if src.suffix == ".safetensors":
            return read_safetensors_header(src)
        return read_torch_manifest(src)
    # directory: sharded safetensors (HF) > sharded .bin index > flat files
    out: Dict[str, Dict] = {}
    for sub in (src / "pytorch_model_fp32", src):
        if not sub.is_dir():
            continue
        st = sorted(sub.glob("*.safetensors"))
        if st:
            for f in st:
                out.update(read_safetensors_header(f))
            return out
        index = sub / "pytorch_model.bin.index.json"
        if index.exists():
            weight_map = json.loads(index.read_text())["weight_map"]
            for shard in sorted(set(weight_map.values())):
                out.update(read_torch_manifest(sub / shard))
            return out
        bins = sorted(sub.glob("*.bin")) + sorted(sub.glob("*.pt"))
        if bins:
            for f in bins:
                out.update(read_torch_manifest(f))
            return out
    raise FileNotFoundError(f"no checkpoint tensors found under {src}")


# ---------------------------------------------------------------------------
# Audit core
# ---------------------------------------------------------------------------


def _canon(key: str, component: str) -> str:
    """Canonicalize an actual key to the expected manifest's naming."""
    k = key.removeprefix("module.")
    if component == "text":
        # expected uses the HF `model.` prefix; accept bare decoder keys
        if not k.startswith(("model.", "lm_head.")):
            k = f"model.{k}"
        return k
    if component == "vision":
        return k.removeprefix("aggregator.").removeprefix("model.")
    return k


def _route_vlm(actual: Dict[str, Dict]) -> Dict[str, Dict[str, Dict]]:
    """Split a merged VLM checkpoint by reference module prefix (mirrors
    ``tools/convert_reference_ckpt.split_by_prefix``)."""
    groups: Dict[str, Dict[str, Dict]] = {"text": {}, "projector": {}, "geom": {}, "vision": {}}
    for key, meta in actual.items():
        k = key.removeprefix("module.")
        if k.startswith("text_model."):
            groups["text"][k.removeprefix("text_model.")] = meta
        elif k.startswith("projector."):
            groups["projector"][k.removeprefix("projector.")] = meta
        elif k.startswith("geom_head."):
            groups["geom"][k.removeprefix("geom_head.")] = meta
        elif k.startswith("vision_model."):
            groups["vision"][k.removeprefix("vision_model.")] = meta
        else:
            groups["text"][k] = meta  # bare HF Qwen3 checkpoints
    return groups


def audit_component(
    component: str,
    expected: Manifest,
    actual: Dict[str, Dict],
    reshape_ok: Iterable[str] = (),
) -> Dict:
    reshape_ok = set(reshape_ok)
    # Build the canonical map collision-aware: two actual keys canonicalizing
    # identically (e.g. 'foo' and 'model.foo') would silently shadow each
    # other and one tensor would escape the audit — report as failures.
    canon_actual: Dict[str, Tuple[str, Dict]] = {}
    collisions: List[Dict] = []
    for k, v in actual.items():
        name = _canon(k, component)
        if name in canon_actual:
            collisions.append({"canonical": name, "keys": [canon_actual[name][0], k]})
        canon_actual[name] = (k, v)
    matched: List[str] = []
    mismatched: List[Dict] = []
    missing: List[str] = []
    params = 0
    for name, shape in expected.items():
        hit = canon_actual.pop(name, None)
        if hit is None:
            missing.append(name)
            continue
        orig, meta = hit
        a_shape = tuple(meta["shape"])
        n_exp = 1
        for d in shape:
            n_exp *= d
        n_act = 1
        for d in a_shape:
            n_act *= d
        ok = a_shape == shape or (name in reshape_ok and n_exp == n_act)
        if ok:
            matched.append(name)
            params += n_act
        else:
            mismatched.append(
                {"key": orig, "expected": list(shape), "actual": list(a_shape)}
            )
    bypassed = [orig for name, (orig, _) in canon_actual.items() if is_known_bypassed(orig) or is_known_bypassed(name)]
    unknown = [
        orig
        for name, (orig, _) in canon_actual.items()
        if not (is_known_bypassed(orig) or is_known_bypassed(name))
    ]
    return {
        "component": component,
        "matched": len(matched),
        "params_matched": params,
        "missing": sorted(missing),
        "shape_mismatch": mismatched,
        "bypassed_remainder": sorted(bypassed),
        "unknown_remainder": sorted(unknown),
        "canon_collisions": collisions,
        "ok": not missing and not mismatched and not unknown and not collisions,
    }


def build_expected(component: str, stage) -> Tuple[Manifest, Iterable[str]]:
    cfg = stage.model
    if component == "text":
        return expected_qwen3_keys(cfg.text), ()
    if component == "vision":
        if cfg.vision is None:
            raise SystemExit("config has no vision tower; pass a vision-enabled config")
        return expected_vggt_keys(cfg.vision), VGGT_RESHAPE_KEYS
    if component == "projector":
        in_dim = 2 * cfg.vision.embed_dim if cfg.vision is not None else 2048
        return expected_perceiver_keys(cfg.projector, in_dim, cfg.text.hidden_size), ()
    if component == "geom":
        return expected_geom_keys(cfg.text.hidden_size), ()
    raise SystemExit(f"unknown component {component!r}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--src", type=Path, help="checkpoint file/dir or recorded manifest .json")
    ap.add_argument(
        "--component",
        default="vlm",
        choices=["vlm", "text", "vision", "projector", "geom"],
        help="what the checkpoint holds: a merged reference VLM (routed by "
        "module prefix) or a single component",
    )
    ap.add_argument("--config", default="configs/stage1_3d.yaml")
    ap.add_argument("--tiny", action="store_true", help="tiny configs (tests)")
    ap.add_argument("--write_manifest", type=Path, help="record src's manifest to JSON and exit")
    ap.add_argument("--expected", action="store_true", help="print the expected manifest and exit")
    ap.add_argument("--json", action="store_true", help="machine-readable report")
    args = ap.parse_args()

    from vggt_qwen3_tpu.config import QWEN3_TINY, VGGT_TINY, load_stage_config

    stage = load_stage_config(
        args.config,
        text_config=QWEN3_TINY if args.tiny else None,
        vision_config=VGGT_TINY if args.tiny else None,
    )

    if args.expected:
        comps = ["text", "vision", "projector", "geom"] if args.component == "vlm" else [args.component]
        out = {}
        for c in comps:
            exp, _ = build_expected(c, stage)
            out[c] = {k: list(v) for k, v in exp.items()}
        print(json.dumps(out, indent=1))
        return

    if not args.src:
        raise SystemExit("--src required (or use --expected)")
    actual = load_actual_manifest(args.src)

    if args.write_manifest:
        args.write_manifest.write_text(
            json.dumps(
                {"source": str(args.src), "tensors": {k: {"shape": list(v["shape"]), "dtype": v["dtype"]} for k, v in actual.items()}},
                indent=1,
            )
        )
        print(f"recorded {len(actual)} tensors → {args.write_manifest}")
        return

    if args.component == "vlm":
        groups = _route_vlm(actual)
        reports = []
        for c in ("text", "vision", "projector", "geom"):
            if not groups[c]:
                continue
            exp, reshape_ok = build_expected(c, stage)
            reports.append(audit_component(c, exp, groups[c], reshape_ok))
    else:
        exp, reshape_ok = build_expected(args.component, stage)
        reports = [audit_component(args.component, exp, actual, reshape_ok)]

    ok = all(r["ok"] for r in reports)
    if args.json:
        print(json.dumps({"ok": ok, "reports": reports}, indent=1))
    else:
        for r in reports:
            status = "OK " if r["ok"] else "FAIL"
            print(
                f"[{status}] {r['component']}: {r['matched']} keys matched "
                f"({r['params_matched']/1e6:.1f}M params), "
                f"{len(r['missing'])} missing, {len(r['shape_mismatch'])} shape "
                f"mismatches, remainder {len(r['bypassed_remainder'])} bypassed "
                f"/ {len(r['unknown_remainder'])} unknown"
            )
            for k in r["missing"][:20]:
                print(f"    missing: {k}")
            for mm in r["shape_mismatch"][:20]:
                print(f"    shape:   {mm['key']} expected {mm['expected']} got {mm['actual']}")
            for k in r["unknown_remainder"][:20]:
                print(f"    unknown: {k}")
            for name in ("missing", "shape_mismatch", "unknown_remainder"):
                if len(r[name]) > 20:
                    print(f"    … +{len(r[name]) - 20} more {name}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
