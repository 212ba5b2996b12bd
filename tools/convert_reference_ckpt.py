"""Convert a reference (PyTorch) VGGT-Qwen3 checkpoint into our param tree.

Replaces the reference's DeepSpeed ``zero_to_fp32`` merge + 4-level loading
fallback chain (``qa_inference.py:51-105``, SURVEY.md §5.4) with one tool.
Accepts any of:

- a merged reference checkpoint dir (``pytorch_model_fp32/`` with
  ``pytorch_model.bin.index.json`` + shards, or flat ``*.bin``/``*.safetensors``),
- a single state-dict file,
- an HF Qwen3 model dir (text model only).

Key routing (reference module names — ``vggt_qwen3_vlm.py:26-58``):
``text_model.*`` → Qwen3, ``projector.*`` → Perceiver, ``geom_head.*`` →
geometry head, ``vision_model.*`` → VGGT. Output: an Orbax checkpoint ready
for ``--checkpoint_dir`` in our inference CLIs, or an .npz.

    python tools/convert_reference_ckpt.py --src ckpts/stage2_3d/step_30000 \
        --dest ckpts/converted/stage2 --config configs/stage1_3d.yaml [--tiny]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path
from typing import Dict

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def load_torch_state_dict(src: Path) -> Dict:
    """Gather a full state dict from shards / flat files / a single file."""
    import torch

    def torch_load(p: Path):
        sd = torch.load(p, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict):
            sd = sd["model"]
        elif isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
        return sd

    if src.is_file():
        if src.suffix == ".safetensors":
            from safetensors.torch import load_file

            return load_file(str(src))
        return torch_load(src)

    for sub in (src / "pytorch_model_fp32", src / "pytorch_model_fp32.bin", src):
        index = sub / "pytorch_model.bin.index.json"
        if sub.is_dir() and index.exists():
            weight_map = json.loads(index.read_text())["weight_map"]
            state: Dict = {}
            for shard in sorted(set(weight_map.values())):
                state.update(torch_load(sub / shard))
            return state
    for sub in (src / "pytorch_model_fp32", src):
        if sub.is_dir():
            files = sorted(sub.glob("*.safetensors")) or sorted(sub.glob("*.bin"))
            if files:
                state = {}
                for f in files:
                    if f.suffix == ".safetensors":
                        from safetensors.torch import load_file

                        state.update(load_file(str(f)))
                    else:
                        state.update(torch_load(f))
                return state
    raise FileNotFoundError(f"no checkpoint weights found under {src}")


def split_by_prefix(sd: Dict) -> Dict[str, Dict]:
    groups: Dict[str, Dict] = {"text": {}, "projector": {}, "geom": {}, "vision": {}}
    for key, val in sd.items():
        k = key.removeprefix("module.")
        if k.startswith("text_model."):
            groups["text"][k.removeprefix("text_model.")] = val
        elif k.startswith("projector."):
            groups["projector"][k.removeprefix("projector.")] = val
        elif k.startswith("geom_head."):
            groups["geom"][k.removeprefix("geom_head.")] = val
        elif k.startswith("vision_model."):
            groups["vision"][k.removeprefix("vision_model.")] = val
        else:
            groups["text"][k] = val  # bare HF Qwen3 checkpoints
    return groups


def convert(src: Path, stage, dtype: str) -> Dict:
    from vggt_qwen3_tpu.models import geom as geom_mod
    from vggt_qwen3_tpu.models import perceiver, vggt, vlm
    from vggt_qwen3_tpu.models.convert_qwen3 import convert_state_dict

    import jax

    sd = load_torch_state_dict(src)
    groups = split_by_prefix(sd)
    print({k: len(v) for k, v in groups.items()})

    # start from random init so missing components stay usable (the reference
    # loads with strict=False for the same reason)
    params = vlm.init_params(jax.random.PRNGKey(0), stage.model, dtype=dtype)
    if groups["text"]:
        params["text"] = convert_state_dict(groups["text"], stage.model.text, dtype=dtype)
        print("✔ text model converted")
    if groups["projector"]:
        params["projector"] = perceiver.convert_torch_state_dict(
            groups["projector"], stage.model.projector, dtype=dtype
        )
        print("✔ projector converted")
    if groups["geom"]:
        params["geom"] = geom_mod.convert_torch_state_dict(groups["geom"], dtype=dtype)
        print("✔ geometry head converted")
    if groups["vision"] and stage.model.vision is not None:
        params["vision"] = vggt.convert_torch_state_dict(
            groups["vision"], stage.model.vision, dtype=dtype
        )
        print("✔ vision tower converted")
    return params


def main() -> None:
    ap = argparse.ArgumentParser(description="Reference checkpoint → TPU params.")
    ap.add_argument("--src", type=Path, required=True)
    ap.add_argument("--dest", type=Path, required=True)
    ap.add_argument("--config", default="configs/stage1_3d.yaml")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--tiny", action="store_true", help="tiny configs (tests)")
    ap.add_argument("--format", choices=["orbax", "npz"], default="orbax")
    args = ap.parse_args()

    from vggt_qwen3_tpu.config import QWEN3_TINY, VGGT_TINY, load_stage_config

    stage = load_stage_config(
        args.config,
        text_config=QWEN3_TINY if args.tiny else None,
        vision_config=VGGT_TINY if args.tiny else None,
    )
    params = convert(args.src, stage, args.dtype)

    if args.format == "orbax":
        import orbax.checkpoint as ocp

        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(args.dest.absolute(), {"params": params})
        print(f"saved Orbax checkpoint → {args.dest}")
    else:
        import numpy as np
        import jax

        flat = {}
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
            flat["/".join(str(getattr(p, "key", p)) for p in path)] = np.asarray(leaf)
        np.savez(args.dest, **flat)
        print(f"saved npz → {args.dest}")


if __name__ == "__main__":
    main()
