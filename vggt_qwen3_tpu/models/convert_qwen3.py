"""HF Qwen3 checkpoint → stacked JAX param tree converter.

Replaces the reference's HF ``from_pretrained`` weight path
(``src/models/vggt_qwen3_vlm.py:36-40``) and its DeepSpeed
``zero_to_fp32``/fallback-chain machinery (SURVEY.md §5.4) with a single
converter: HF safetensors (or any name→array mapping) → the stacked layout of
``models/qwen3.py``, ready to be device_put with mesh shardings.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Mapping, Optional

import numpy as np

from ..config import Qwen3Config


def _to_numpy(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (possibly bf16): round-trip via float32 view
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


def convert_state_dict(
    sd: Mapping[str, object], cfg: Qwen3Config, dtype: str = "bfloat16"
) -> Dict:
    """Convert an HF ``Qwen3ForCausalLM`` state dict to our param tree.

    torch ``nn.Linear`` stores ``weight`` as [out, in] and computes ``x @ W.T``;
    our convention is ``x @ w`` with ``w`` [in, out], so every linear transposes.
    """
    import jax.numpy as jnp

    dt = jnp.dtype(dtype)

    def get(name: str) -> np.ndarray:
        key = name if name in sd else f"model.{name}"
        if key not in sd and name.startswith("model."):
            key = name[len("model.") :]
        return _to_numpy(sd[key])

    L = cfg.num_layers
    stacked: Dict[str, list] = {
        k: [] for k in ("ln1", "ln2", "wq", "wk", "wv", "wo", "q_norm", "k_norm", "gate", "up", "down")
    }
    for i in range(L):
        p = f"model.layers.{i}"
        stacked["ln1"].append(get(f"{p}.input_layernorm.weight"))
        stacked["ln2"].append(get(f"{p}.post_attention_layernorm.weight"))
        stacked["wq"].append(get(f"{p}.self_attn.q_proj.weight").T)
        stacked["wk"].append(get(f"{p}.self_attn.k_proj.weight").T)
        stacked["wv"].append(get(f"{p}.self_attn.v_proj.weight").T)
        stacked["wo"].append(get(f"{p}.self_attn.o_proj.weight").T)
        stacked["q_norm"].append(get(f"{p}.self_attn.q_norm.weight"))
        stacked["k_norm"].append(get(f"{p}.self_attn.k_norm.weight"))
        stacked["gate"].append(get(f"{p}.mlp.gate_proj.weight").T)
        stacked["up"].append(get(f"{p}.mlp.up_proj.weight").T)
        stacked["down"].append(get(f"{p}.mlp.down_proj.weight").T)

    params = {
        "embed": jnp.asarray(get("model.embed_tokens.weight"), dtype=dt),
        "final_norm": jnp.asarray(get("model.norm.weight"), dtype=dt),
        "layers": {k: jnp.asarray(np.stack(v), dtype=dt) for k, v in stacked.items()},
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = jnp.asarray(get("lm_head.weight").T, dtype=dt)
    return params


def load_safetensors_dir(path: str | Path) -> Dict[str, np.ndarray]:
    """Read all ``*.safetensors`` shards in a directory into one flat dict."""
    from safetensors.numpy import load_file

    path = Path(path)
    out: Dict[str, np.ndarray] = {}
    files = sorted(path.glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files under {path}")
    for f in files:
        out.update(load_file(str(f)))
    return out


def config_from_hf(hf_config) -> Qwen3Config:
    """Build our :class:`Qwen3Config` from a transformers ``Qwen3Config``."""
    return Qwen3Config(
        vocab_size=hf_config.vocab_size,
        hidden_size=hf_config.hidden_size,
        num_layers=hf_config.num_hidden_layers,
        num_heads=hf_config.num_attention_heads,
        num_kv_heads=hf_config.num_key_value_heads,
        head_dim=hf_config.head_dim,
        intermediate_size=hf_config.intermediate_size,
        rope_theta=hf_config.rope_theta,
        rms_norm_eps=hf_config.rms_norm_eps,
        tie_word_embeddings=hf_config.tie_word_embeddings,
        max_position_embeddings=hf_config.max_position_embeddings,
    )


def load_qwen3(
    model_dir: str | Path, cfg: Optional[Qwen3Config] = None, dtype: str = "bfloat16"
):
    """Load (cfg, params) from a local HF model directory (safetensors)."""
    model_dir = Path(model_dir)
    if cfg is None:
        import json

        hf_raw = json.loads((model_dir / "config.json").read_text())
        cfg = Qwen3Config(
            vocab_size=hf_raw["vocab_size"],
            hidden_size=hf_raw["hidden_size"],
            num_layers=hf_raw["num_hidden_layers"],
            num_heads=hf_raw["num_attention_heads"],
            num_kv_heads=hf_raw["num_key_value_heads"],
            head_dim=hf_raw.get("head_dim", hf_raw["hidden_size"] // hf_raw["num_attention_heads"]),
            intermediate_size=hf_raw["intermediate_size"],
            rope_theta=hf_raw.get("rope_theta", 10_000.0),
            rms_norm_eps=hf_raw.get("rms_norm_eps", 1e-6),
            tie_word_embeddings=hf_raw.get("tie_word_embeddings", False),
            max_position_embeddings=hf_raw.get("max_position_embeddings", 32_768),
        )
    sd = load_safetensors_dir(model_dir)
    return cfg, convert_state_dict(sd, cfg, dtype=dtype)
