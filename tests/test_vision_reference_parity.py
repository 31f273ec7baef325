"""Vision tower numeric parity vs the reference stack (VERDICT r3 #8).

The reference VisionEncoder wraps a transformers CLIPVisionModel, consumes
``last_hidden_state`` with the CLS token dropped, and projects through a
Linear/GELU/Linear mm_projector (ref: vllm_i64/layers/vision.py:122-155).
Here a RANDOM-INIT CLIPVisionModel (no network needed) plus a projector
built by the reference's own ``_build_projector`` are loaded into
models/vision.py via ``load_clip_vision_tower`` and both stacks must agree
on identical pixel inputs to fp32 tolerance.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

sys.path.insert(0, "/root/reference")
try:
    from vllm_i64.layers.vision import VisionEncoder as RefVisionEncoder

    HAS_REFERENCE = True
except Exception:  # pragma: no cover
    HAS_REFERENCE = False

pytestmark = pytest.mark.skipif(not HAS_REFERENCE,
                                reason="reference tree not importable")

import jax.numpy as jnp  # noqa: E402

from vllm_i64_tpu.models.vision import (  # noqa: E402
    clip_vision_config,
    load_clip_vision_tower,
    vision_encode,
)


@pytest.fixture(scope="module")
def clip_pair():
    """(torch CLIPVisionModel, torch projector, our params, our cfg)."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(3)
    hf_cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, hidden_act="quick_gelu",
    )
    tower = CLIPVisionModel(hf_cfg).eval()
    llm_hidden = 48
    projector = RefVisionEncoder._build_projector(
        hf_cfg.hidden_size, llm_hidden, "mlp2x_gelu").eval()

    sd = {k: v.detach().numpy() for k, v in tower.state_dict().items()}
    sd.update({f"mm_projector.{k}": v.detach().numpy()
               for k, v in projector.state_dict().items()})
    cfg = clip_vision_config(hf_cfg, llm_hidden)
    params = load_clip_vision_tower(sd, cfg, dtype=jnp.float32, strict=True)
    return tower, projector, params, cfg


def ref_forward(tower, projector, pixels_nchw):
    """The reference VisionEncoder.forward composition verbatim
    (ref: vision.py:122-155): tower -> last_hidden_state -> drop CLS ->
    mm_projector."""
    with torch.no_grad():
        feats = tower(pixel_values=pixels_nchw).last_hidden_state[:, 1:, :]
        return projector(feats).numpy()


def test_clip_tower_parity_fp32(clip_pair):
    tower, projector, params, cfg = clip_pair
    rng = np.random.default_rng(0)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    want = ref_forward(tower, projector,
                       torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
    got = np.asarray(vision_encode(params, cfg, jnp.asarray(pixels)))
    assert got.shape == want.shape == (2, cfg.num_patches, 48)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_clip_tower_parity_without_projector(clip_pair):
    """Patch embeddings straight out of the tower (linear projector set to
    identity-free comparison): isolate the encoder itself."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(11)
    hf_cfg = CLIPVisionConfig(
        image_size=16, patch_size=8, hidden_size=16,
        num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
    )
    tower = CLIPVisionModel(hf_cfg).eval()
    cfg = clip_vision_config(hf_cfg, hf_cfg.hidden_size,
                             projector_type="linear")
    sd = {k: v.detach().numpy() for k, v in tower.state_dict().items()}
    # identity linear projector: tower output passes through unchanged
    sd["mm_projector.weight"] = np.eye(hf_cfg.hidden_size, dtype=np.float32)
    sd["mm_projector.bias"] = np.zeros(hf_cfg.hidden_size, np.float32)
    params = load_clip_vision_tower(sd, cfg, dtype=jnp.float32, strict=True)

    rng = np.random.default_rng(5)
    pixels = rng.standard_normal((1, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = tower(
            pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state[:, 1:, :].numpy()
    got = np.asarray(vision_encode(params, cfg, jnp.asarray(pixels)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_strict_load_reports_missing(clip_pair):
    _, _, _, cfg = clip_pair
    with pytest.raises(ValueError, match="missing"):
        load_clip_vision_tower({}, cfg, strict=True)


# ---------------------------------------------------------------------------
# SigLIP tower (VERDICT r4 #5): the second tower family the reference's
# VisionEncoder loads (ref: vision.py:79-88) — no class token, biased patch
# conv, no pre-LN, post_layernorm ON last_hidden_state, tanh-gelu, eps 1e-6.
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def siglip_pair():
    """(torch SiglipVisionModel, torch projector, our params, our cfg)."""
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from vllm_i64_tpu.models.vision import (
        load_siglip_vision_tower,
        siglip_vision_config,
    )

    torch.manual_seed(5)
    hf_cfg = SiglipVisionConfig(
        image_size=32, patch_size=8, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128,
    )
    tower = SiglipVisionModel(hf_cfg).eval()
    llm_hidden = 48
    projector = RefVisionEncoder._build_projector(
        hf_cfg.hidden_size, llm_hidden, "mlp2x_gelu").eval()

    sd = {k: v.detach().numpy() for k, v in tower.state_dict().items()}
    sd.update({f"mm_projector.{k}": v.detach().numpy()
               for k, v in projector.state_dict().items()})
    cfg = siglip_vision_config(hf_cfg, llm_hidden)
    params = load_siglip_vision_tower(sd, cfg, dtype=jnp.float32,
                                      strict=True)
    return tower, projector, params, cfg


def ref_forward_siglip(tower, projector, pixels_nchw):
    """The reference VisionEncoder.forward composition for a SigLIP tower
    following its documented SigLIP branch (ref: vision.py:143-146 "SigLIP:
    all tokens are patch tokens" — last_hidden_state, nothing dropped).

    NOTE: the shipped detection (`hasattr(config, "num_image_tokens")`,
    ref: vision.py:142) misfires on transformers versions whose
    SiglipVisionConfig lacks that field, which would drop a real PATCH
    token. We implement — and test against — the intended semantics."""
    with torch.no_grad():
        feats = tower(pixel_values=pixels_nchw).last_hidden_state
        return projector(feats).numpy()


def test_siglip_tower_parity_fp32(siglip_pair):
    from vllm_i64_tpu.models.vision import vision_encode

    tower, projector, params, cfg = siglip_pair
    rng = np.random.default_rng(1)
    pixels = rng.standard_normal((2, 32, 32, 3)).astype(np.float32)

    want = ref_forward_siglip(tower, projector,
                              torch.from_numpy(pixels.transpose(0, 3, 1, 2)))
    got = np.asarray(vision_encode(params, cfg, jnp.asarray(pixels)))
    assert got.shape == want.shape == (2, 16, 48)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_siglip_post_layernorm_matters(siglip_pair):
    """Zeroing the loaded post_layernorm weight must change the output —
    proves the SigLIP-only post-LN actually sits on last_hidden_state."""
    from vllm_i64_tpu.models.vision import vision_encode

    _, _, params, cfg = siglip_pair
    rng = np.random.default_rng(2)
    pixels = rng.standard_normal((1, 32, 32, 3)).astype(np.float32)
    base = np.asarray(vision_encode(params, cfg, jnp.asarray(pixels)))
    p2 = dict(params)
    p2["post_ln_w"] = params["post_ln_w"] * 0.5
    changed = np.asarray(vision_encode(p2, cfg, jnp.asarray(pixels)))
    assert not np.allclose(base, changed)


def test_siglip_loader_strict_missing_key():
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from vllm_i64_tpu.models.vision import (
        load_siglip_vision_tower,
        siglip_vision_config,
    )

    hf_cfg = SiglipVisionConfig(
        image_size=32, patch_size=8, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, intermediate_size=128)
    tower = SiglipVisionModel(hf_cfg).eval()
    sd = {k: v.detach().numpy() for k, v in tower.state_dict().items()}
    sd.pop("vision_model.post_layernorm.weight")
    cfg = siglip_vision_config(hf_cfg, 48)
    with pytest.raises(ValueError, match="missing"):
        load_siglip_vision_tower(sd, cfg, strict=True)
