"""Vision tower tests (ref: vllm_i64/layers/vision.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from vllm_i64_tpu.models.vision import (
    VisionConfig,
    init_vision_params,
    preprocess_images,
    vision_encode,
)


def tiny_vision_cfg(**kw):
    kw.setdefault("image_size", 32)
    kw.setdefault("patch_size", 8)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("num_layers", 2)
    kw.setdefault("num_heads", 2)
    kw.setdefault("llm_hidden_size", 128)
    return VisionConfig(**kw)


def test_preprocess_resizes_and_normalizes():
    img = np.random.default_rng(0).integers(0, 256, (2, 50, 70, 3),
                                            dtype=np.uint8)
    out = preprocess_images(img, image_size=32)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == np.float32
    # CLIP normalization centers values near 0
    assert abs(float(out.mean())) < 2.0
    # single image without batch dim also works
    out1 = preprocess_images(img[0], image_size=32)
    assert out1.shape == (1, 32, 32, 3)


def test_vision_encode_shapes():
    cfg = tiny_vision_cfg()
    params = init_vision_params(cfg, jax.random.PRNGKey(0))
    pixels = jnp.asarray(
        np.random.default_rng(0).standard_normal((3, 32, 32, 3)), jnp.float32)
    out = vision_encode(params, cfg, pixels)
    assert out.shape == (3, cfg.num_patches, 128)  # (N, 16 patches, llm_h)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vision_encode_linear_projector():
    cfg = tiny_vision_cfg(projector_type="linear")
    params = init_vision_params(cfg, jax.random.PRNGKey(1))
    assert "w2" not in params["proj_out"]
    pixels = jnp.zeros((1, 32, 32, 3), jnp.float32)
    out = vision_encode(params, cfg, pixels)
    assert out.shape == (1, 16, 128)


def test_vision_deterministic_and_input_sensitive():
    cfg = tiny_vision_cfg()
    params = init_vision_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    a = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((1, 32, 32, 3)), jnp.float32)
    oa1 = np.asarray(vision_encode(params, cfg, a))
    oa2 = np.asarray(vision_encode(params, cfg, a))
    ob = np.asarray(vision_encode(params, cfg, b))
    np.testing.assert_array_equal(oa1, oa2)
    assert not np.allclose(oa1, ob)


def test_engine_encode_images(tiny_config):
    from vllm_i64_tpu.config import EngineConfig
    from vllm_i64_tpu.engine import Engine
    from vllm_i64_tpu.models import complexity_deep as cdm

    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    eng = Engine(params, tiny_config,
                 EngineConfig(max_batch_size=2, max_seq_len=64,
                              kv_block_size=4, max_kv_blocks=16,
                              dtype="float32", kv_cache_dtype="float32"))
    cfg = tiny_vision_cfg(llm_hidden_size=tiny_config.hidden_size)
    eng.enable_vision(init_vision_params(cfg, jax.random.PRNGKey(2)), cfg)
    img = np.random.default_rng(0).integers(0, 256, (1, 48, 48, 3),
                                            dtype=np.uint8)
    emb = eng.encode_images(img)
    assert emb.shape == (1, cfg.num_patches, tiny_config.hidden_size)
