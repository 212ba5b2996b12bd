"""Model-init sanity check — reference ``scripts/check_init.py``.

Builds the composed VLM (tiny text model for speed, like the reference's
Qwen2.5-1.5B substitution — ``check_init.py:32``) and asserts no NaN/Inf in
projector / geometry-head parameters, printing per-tensor shape/mean/std.

    python scripts/check_init.py [--full]
"""

from __future__ import annotations

import argparse
import sys

sys.path.insert(0, ".")

import vggt_qwen3_tpu  # noqa: F401,E402 — honors JAX_PLATFORMS before backend init (axon quirk)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true", help="use the full 4B/1B configs")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from vggt_qwen3_tpu.config import (
        PerceiverConfig, QWEN3_4B_INSTRUCT_2507, QWEN3_TINY, VGGT_1B, VGGT_TINY, VLMConfig,
    )
    from vggt_qwen3_tpu.models import vlm

    cfg = VLMConfig(
        text=QWEN3_4B_INSTRUCT_2507 if args.full else QWEN3_TINY,
        vision=VGGT_1B if args.full else VGGT_TINY,
        projector=PerceiverConfig() if args.full else PerceiverConfig(
            latent_dim=64, num_latents=16, num_heads=4, num_layers=2, ffn_dim=128
        ),
        num_vis_tokens=16,
        geom_tokens=8,
        dtype="float32",
    )
    params = vlm.init_params(jax.random.PRNGKey(args.seed), cfg)

    bad = 0
    for top in ("projector", "geom"):
        flat = jax.tree_util.tree_flatten_with_path(params[top])[0]
        for path, leaf in flat:
            name = top + "".join(str(p) for p in path)
            arr = np.asarray(leaf, np.float32)
            finite = np.isfinite(arr).all()
            status = "✅" if finite else "❌"
            print(f"{status} {name}: shape {arr.shape} mean {arr.mean():+.4f} std {arr.std():.4f}")
            if not finite:
                bad += 1
    if bad:
        print(f"\n❌ {bad} parameter tensors contain NaN/Inf")
        sys.exit(1)
    print("\n✅ all projector/geom parameters finite")


if __name__ == "__main__":
    main()
