"""Frozen-VGGT serving quantization: W8 / W8A8 block matmuls.

Gates: quantized aggregator outputs stay close to bf16/f32 (relative drift
bounds at tiny dims), the tuple contract is preserved, and the quantized
tower composes with the full VLM encode path. The EM-level acceptance on
real weights is ``evals/baseline.py --compare_quant`` with vision
quantization enabled in serving.
"""

import numpy as np

import jax
import jax.numpy as jnp

from vggt_qwen3_tpu.config import VGGT_TINY, PerceiverConfig, Qwen3Config, VLMConfig
from vggt_qwen3_tpu.models import vggt, vlm


def _tiny_vlm_cfg():
    text = Qwen3Config(
        vocab_size=256, hidden_size=64, num_layers=2, num_heads=4, num_kv_heads=2,
        head_dim=16, intermediate_size=128, rope_theta=1e4, tie_word_embeddings=True,
        dtype="float32",
    )
    return VLMConfig(
        text=text, vision=VGGT_TINY, projector=PerceiverConfig(
            latent_dim=64, num_latents=8, num_heads=2, num_layers=1, ffn_dim=128,
        ),
        num_vis_tokens=8, geom_tokens=0, dtype="float32", vision_backbone="vggt",
    )


def test_vision_w8_aggregator_drift_small():
    cfg = VGGT_TINY
    params = {"vision": vggt.init_params(jax.random.PRNGKey(0), cfg, dtype="float32")}
    images = jnp.asarray(
        np.random.default_rng(1).uniform(0, 1, (1, 2, 3, 56, 56)), jnp.float32
    )
    ref, psi = vggt.aggregator(params["vision"], cfg, images)
    q8 = vlm.quantize_vision(params, mode="w8", donate=False)
    out8, psi8 = vggt.aggregator(q8["vision"], cfg, images)
    assert psi == psi8
    r = np.asarray(ref[-1], np.float32)
    o = np.asarray(out8[-1], np.float32)
    rel8 = np.abs(r - o).max() / np.abs(r).max()

    qa8 = vlm.quantize_vision(params, mode="w8a8", donate=False)
    outa, _ = vggt.aggregator(qa8["vision"], cfg, images)
    rela = np.abs(r - np.asarray(outa[-1], np.float32)).max() / np.abs(r).max()
    print(f"\nvision quant drift: W8 {rel8:.4f}, W8A8 {rela:.4f}")
    assert rel8 < 0.05, rel8
    assert rela < 0.15, rela


def test_vision_quant_composes_with_vlm_encode():
    cfg = _tiny_vlm_cfg()
    params = vlm.init_params(jax.random.PRNGKey(2), cfg, dtype="float32")
    images = jnp.asarray(
        np.random.default_rng(3).uniform(0, 1, (2, 1, 3, 56, 56)), jnp.float32
    )
    ref = np.asarray(vlm.encode_images(params, cfg, images), np.float32)
    qp = vlm.quantize_vision(params, mode="w8", donate=False)
    out = np.asarray(vlm.encode_images(qp, cfg, images), np.float32)
    assert out.shape == ref.shape
    rel = np.abs(ref - out).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.2, rel  # perceiver re-mixes; bound is loose but finite
    # mock tower is a no-op for quantize_vision
    mock_cfg = VLMConfig(
        text=cfg.text, vision=None, projector=cfg.projector,
        num_vis_tokens=8, geom_tokens=0, dtype="float32", vision_backbone="mock",
    )
    mp = vlm.init_params(jax.random.PRNGKey(4), mock_cfg, dtype="float32")
    assert "vision" not in mp
    assert vlm.quantize_vision(mp, mode="w8") is mp  # strict no-op for mock
