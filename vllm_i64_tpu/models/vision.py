"""Vision tower for VLM support — JAX-native ViT + projector.

Reference analog (ref: vllm_i64/layers/vision.py): a CLIP/SigLIP vision
tower whose patch features are projected into the LLM hidden space by a
linear or mlp2x_gelu projector, with image preprocessing (resize +
normalize). The reference wraps pretrained torch towers; this is a
from-scratch functional ViT so the whole path is jit-compiled on TPU —
checkpoints in CLIP layout load via ``load_vision_tower``.

Engine plumbing: requests carry ``pixel_values``; the engine encodes them
once at admission (``Engine.encode_images``) and the resulting patch
embeddings join the prompt as soft tokens (full fusion lands with a VLM
checkpoint — the reference ships none either, i64_engine.py:1129-1151).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import logging

import jax
import jax.numpy as jnp
import numpy as np

logger = logging.getLogger("vllm_i64_tpu.vision")

Params = Dict[str, Any]

# CLIP normalization constants
_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 256  # vision tower width
    num_layers: int = 4
    num_heads: int = 4
    mlp_ratio: int = 4
    llm_hidden_size: int = 1024  # projection target
    projector_type: str = "mlp2x_gelu"  # or "linear"
    # CLIP exactness knobs (ref towers are HF CLIPVisionModel,
    # ref: vision.py:91-101): CLIP prepends a learned class token that
    # patch tokens ATTEND to (dropping it post-hoc is NOT equivalent to
    # not having it) and uses quick_gelu (x * sigmoid(1.702 x)) in the
    # encoder MLPs. Defaults keep the lean from-scratch tower.
    use_class_token: bool = False
    hidden_act: str = "gelu"  # or "quick_gelu" (CLIP)
    # SigLIP exactness knobs (ref loads SigLIP towers too,
    # ref: vision.py:79-88, all-patch last_hidden_state at :145):
    # SigLIP's patch conv HAS a bias, there is NO pre-embedding layernorm,
    # and post_layernorm applies to last_hidden_state (in CLIP it only
    # feeds the pooled output, so the CLIP path skips it).
    patch_bias: bool = False
    use_pre_ln: bool = True
    use_post_ln: bool = False
    ln_eps: float = 1e-5  # CLIP 1e-5, SigLIP 1e-6 (HF layer_norm_eps)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def num_positions(self) -> int:
        return self.num_patches + (1 if self.use_class_token else 0)

    @property
    def patch_dim(self) -> int:
        return 3 * self.patch_size * self.patch_size


def preprocess_images(images: np.ndarray, image_size: int = 224) -> np.ndarray:
    """(N, H, W, 3) uint8/float -> (N, size, size, 3) f32 CLIP-normalized."""
    arr = np.asarray(images)
    is_int = np.issubdtype(arr.dtype, np.integer)
    x = jnp.asarray(arr, jnp.float32)
    if x.ndim == 3:
        x = x[None]
    if is_int:
        # dtype decides, not a value heuristic — a near-black uint8 image
        # whose max is <= 2 must still scale by 255
        x = x / 255.0
    elif float(x.max()) > 2.0:
        x = x / 255.0
    n = x.shape[0]
    x = jax.image.resize(x, (n, image_size, image_size, 3), method="bilinear")
    return np.asarray((x - _MEAN) / _STD)


def init_vision_params(cfg: VisionConfig, key: jax.Array,
                       dtype=jnp.float32) -> Params:
    keys = iter(jax.random.split(key, 16))
    h = cfg.hidden_size
    mlp = h * cfg.mlp_ratio

    def w(shape, scale=0.02):
        return (jax.random.normal(next(keys), shape, jnp.float32)
                * scale).astype(dtype)

    blocks = {
        "ln1_w": jnp.ones((cfg.num_layers, h), dtype),
        "ln1_b": jnp.zeros((cfg.num_layers, h), dtype),
        "qkv": w((cfg.num_layers, h, 3 * h)),
        "qkv_b": jnp.zeros((cfg.num_layers, 3 * h), dtype),
        "proj": w((cfg.num_layers, h, h)),
        "proj_b": jnp.zeros((cfg.num_layers, h), dtype),
        "ln2_w": jnp.ones((cfg.num_layers, h), dtype),
        "ln2_b": jnp.zeros((cfg.num_layers, h), dtype),
        "fc1": w((cfg.num_layers, h, mlp)),
        "fc1_b": jnp.zeros((cfg.num_layers, mlp), dtype),
        "fc2": w((cfg.num_layers, mlp, h)),
        "fc2_b": jnp.zeros((cfg.num_layers, h), dtype),
    }
    params: Params = {
        "patch_embed": w((cfg.patch_dim, h)),
        "pos_embed": w((cfg.num_positions, h)),
        "blocks": blocks,
    }
    if cfg.use_pre_ln:
        params["pre_ln_w"] = jnp.ones((h,), dtype)
        params["pre_ln_b"] = jnp.zeros((h,), dtype)
    if cfg.use_post_ln:
        params["post_ln_w"] = jnp.ones((h,), dtype)
        params["post_ln_b"] = jnp.zeros((h,), dtype)
    if cfg.patch_bias:
        params["patch_embed_b"] = jnp.zeros((h,), dtype)
    if cfg.use_class_token:
        params["class_embed"] = w((h,))
    if cfg.projector_type == "linear":
        params["proj_out"] = {"w1": w((h, cfg.llm_hidden_size)),
                              "b1": jnp.zeros((cfg.llm_hidden_size,), dtype)}
    else:  # mlp2x_gelu (ref: vision.py _build_projector)
        params["proj_out"] = {
            "w1": w((h, cfg.llm_hidden_size)),
            "b1": jnp.zeros((cfg.llm_hidden_size,), dtype),
            "w2": w((cfg.llm_hidden_size, cfg.llm_hidden_size)),
            "b2": jnp.zeros((cfg.llm_hidden_size,), dtype),
        }
    return params


def _layer_norm(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) ** 2, axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _act(x, hidden_act: str):
    if hidden_act == "quick_gelu":  # CLIP: x * sigmoid(1.702 x)
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x)


def _vit_block(p, x, num_heads, hidden_act="gelu", eps=1e-5):
    b, n, h = x.shape
    d = h // num_heads
    res = x
    y = _layer_norm(x, p["ln1_w"], p["ln1_b"], eps)
    qkv = y @ p["qkv"] + p["qkv_b"]
    q, k, v = jnp.split(qkv.reshape(b, n, 3, num_heads, d), 3, axis=2)
    q, k, v = q[:, :, 0], k[:, :, 0], v[:, :, 0]  # (B, N, Hh, d)
    scores = jnp.einsum("bnhd,bmhd->bhnm", q, k,
                        preferred_element_type=jnp.float32) / (d ** 0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("bhnm,bmhd->bnhd", probs, v).reshape(b, n, h)
    x = res + (attn @ p["proj"] + p["proj_b"])

    res = x
    y = _layer_norm(x, p["ln2_w"], p["ln2_b"], eps)
    y = _act(y @ p["fc1"] + p["fc1_b"], hidden_act)
    return res + (y @ p["fc2"] + p["fc2_b"])


def vision_encode(params: Params, cfg: VisionConfig,
                  pixel_values: jax.Array) -> jax.Array:
    """(N, S, S, 3) f32 -> (N, num_patches, llm_hidden) soft tokens."""
    n = pixel_values.shape[0]
    p = cfg.patch_size
    g = cfg.image_size // p
    # patchify: (N, g, p, g, p, 3) -> (N, g*g, p*p*3)
    x = pixel_values.reshape(n, g, p, g, p, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, g * g, cfg.patch_dim)
    x = x @ params["patch_embed"]
    if cfg.patch_bias:
        x = x + params["patch_embed_b"]
    if cfg.use_class_token:
        cls = jnp.broadcast_to(
            params["class_embed"][None, None], (n, 1, cfg.hidden_size)
        ).astype(x.dtype)
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][None]
    if cfg.use_pre_ln:
        x = _layer_norm(x, params["pre_ln_w"], params["pre_ln_b"],
                        cfg.ln_eps)

    def body(x, block):
        return _vit_block(block, x, cfg.num_heads, cfg.hidden_act,
                          cfg.ln_eps), None

    x, _ = jax.lax.scan(body, x, params["blocks"])

    if cfg.use_post_ln:
        # SigLIP applies post_layernorm to last_hidden_state itself
        # (transformers SiglipVisionTransformer.forward); CLIP does not
        x = _layer_norm(x, params["post_ln_w"], params["post_ln_b"],
                        cfg.ln_eps)
    if cfg.use_class_token:
        # the reference projects patch tokens only; CLS is dropped AFTER
        # the encoder so patches still attended to it (ref: vision.py CLIP
        # branch "skip CLS token (index 0)")
        x = x[:, 1:]
    po = params["proj_out"]
    out = x @ po["w1"] + po["b1"]
    if "w2" in po:
        # torch nn.GELU default is the exact erf form (ref projector,
        # vision.py _build_projector)
        out = jax.nn.gelu(out, approximate=False) @ po["w2"] + po["b2"]
    return out


def load_vision_tower(state_dict: Dict[str, np.ndarray],
                      cfg: VisionConfig, dtype=jnp.float32) -> Params:
    """Assemble tower params from a CLIP-layout checkpoint.

    Loads patch/pos embeddings, EVERY transformer block (per-layer
    ``blocks.{i}.*`` keys stacked onto the layer axis), the pre-LN, and
    the projector — the previous loader silently kept random init for
    everything but the patch embedding, which produced garbage soft
    tokens that looked like a successful load. Missing keys keep their
    init but are WARNED about with a count."""
    params = init_vision_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    h = cfg.hidden_size
    loaded = []
    missing = []

    def take(key, target_shape, transpose=False):
        w = state_dict.get(key)
        if w is None:
            missing.append(key)
            return None
        w = np.asarray(w, np.float32)
        if transpose:
            w = w.T
        if w.shape != tuple(target_shape):
            missing.append(f"{key} (shape {w.shape} != {tuple(target_shape)})")
            return None
        loaded.append(key)
        return w

    pe = take("patch_embed.weight", (cfg.patch_dim, h), transpose=True)
    if pe is not None:
        params["patch_embed"] = jnp.asarray(pe, dtype)
    pos = take("pos_embed", (cfg.num_patches, h))
    if pos is not None:
        params["pos_embed"] = jnp.asarray(pos, dtype)
    for name, shape in (("pre_ln_w", (h,)), ("pre_ln_b", (h,))):
        w = take(f"pre_ln.{'weight' if name.endswith('_w') else 'bias'}",
                 shape)
        if w is not None:
            params[name] = jnp.asarray(w, dtype)

    # per-layer block weights -> stacked (L, ...) arrays. Linear weights
    # are stored torch-style (out, in) and transpose to x @ w orientation.
    mlp = h * cfg.mlp_ratio
    spec = {
        "ln1_w": ("ln1.weight", (h,), False),
        "ln1_b": ("ln1.bias", (h,), False),
        "qkv": ("attn.qkv.weight", (h, 3 * h), True),
        "qkv_b": ("attn.qkv.bias", (3 * h,), False),
        "proj": ("attn.proj.weight", (h, h), True),
        "proj_b": ("attn.proj.bias", (h,), False),
        "ln2_w": ("ln2.weight", (h,), False),
        "ln2_b": ("ln2.bias", (h,), False),
        "fc1": ("mlp.fc1.weight", (h, mlp), True),
        "fc1_b": ("mlp.fc1.bias", (mlp,), False),
        "fc2": ("mlp.fc2.weight", (mlp, h), True),
        "fc2_b": ("mlp.fc2.bias", (h,), False),
    }
    blocks = dict(params["blocks"])
    for pkey, (ckpt_suffix, shape, transpose) in spec.items():
        rows = [take(f"blocks.{i}.{ckpt_suffix}", shape, transpose)
                for i in range(cfg.num_layers)]
        if all(r is not None for r in rows):
            blocks[pkey] = jnp.asarray(np.stack(rows), dtype)
    params["blocks"] = blocks

    proj = dict(params["proj_out"])
    for pkey, ckpt, shape, transpose in (
        ("w1", "projector.0.weight", (h, cfg.llm_hidden_size), True),
        ("b1", "projector.0.bias", (cfg.llm_hidden_size,), False),
        ("w2", "projector.2.weight",
         (cfg.llm_hidden_size, cfg.llm_hidden_size), True),
        ("b2", "projector.2.bias", (cfg.llm_hidden_size,), False),
    ):
        if pkey not in proj:
            continue
        w = take(ckpt, shape, transpose)
        if w is not None:
            proj[pkey] = jnp.asarray(w, dtype)
    params["proj_out"] = proj

    if missing:
        logger.warning(
            "vision tower: loaded %d tensors, %d missing/mismatched kept "
            "random init (first few: %s)", len(loaded), len(missing),
            missing[:5])
    return params


def clip_vision_config(hf_cfg, llm_hidden_size: int,
                       projector_type: str = "mlp2x_gelu") -> VisionConfig:
    """VisionConfig mirroring a transformers CLIPVisionConfig."""
    return VisionConfig(
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        mlp_ratio=hf_cfg.intermediate_size // hf_cfg.hidden_size,
        llm_hidden_size=llm_hidden_size,
        projector_type=projector_type,
        use_class_token=True,
        hidden_act=getattr(hf_cfg, "hidden_act", "quick_gelu"),
    )


def load_clip_vision_tower(state_dict: Dict[str, np.ndarray],
                           cfg: VisionConfig, dtype=jnp.float32,
                           strict: bool = True) -> Params:
    """Assemble tower params from a HF ``CLIPVisionModel`` state dict —
    the exact tower family the reference wraps (ref: vision.py:91-101).

    Key map (HF `vision_model.*` layout):
      embeddings.class_embedding / patch_embedding.weight (conv, no bias) /
      position_embedding.weight; pre_layrnorm (HF's spelling);
      encoder.layers.{i}.self_attn.{q,k,v,out}_proj + layer_norm1/2 +
      mlp.fc1/fc2. ``post_layernorm`` is intentionally skipped: the
      reference consumes ``last_hidden_state``, which CLIP computes
      WITHOUT it (post_layernorm only feeds pooled output).

    Projector weights (``mm_projector.*`` from the reference module, torch
    Sequential indices 0/2) load when present.
    """
    if not cfg.use_class_token:
        raise ValueError("CLIP towers require use_class_token=True")
    sd = {}
    for k, v in state_dict.items():
        sd[k[len("vision_model."):] if k.startswith("vision_model.") else k] \
            = np.asarray(v, np.float32)
    params = init_vision_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    h, L = cfg.hidden_size, cfg.num_layers
    missing = []

    def take(key):
        w = sd.get(key)
        if w is None:
            missing.append(key)
        return w

    conv = take("embeddings.patch_embedding.weight")  # (h, 3, p, p)
    if conv is not None:
        # patchify flattens (p_row, p_col, chan); conv kernel is
        # (out, in=3, kh, kw) -> permute to (kh, kw, in, out)
        params["patch_embed"] = jnp.asarray(
            conv.transpose(2, 3, 1, 0).reshape(cfg.patch_dim, h), dtype)
    cls = take("embeddings.class_embedding")
    if cls is not None:
        params["class_embed"] = jnp.asarray(cls.reshape(h), dtype)
    pos = take("embeddings.position_embedding.weight")
    if pos is not None:
        params["pos_embed"] = jnp.asarray(pos, dtype)
    for pk, ck in (("pre_ln_w", "pre_layrnorm.weight"),
                   ("pre_ln_b", "pre_layrnorm.bias")):
        w = take(ck)
        if w is not None:
            params[pk] = jnp.asarray(w, dtype)

    def stack(fmt, transpose=False):
        rows = [take(fmt.format(i)) for i in range(L)]
        if any(r is None for r in rows):
            return None
        return np.stack([r.T if transpose else r for r in rows])

    pre = "encoder.layers.{}."
    qw = stack(pre + "self_attn.q_proj.weight", transpose=True)
    kw = stack(pre + "self_attn.k_proj.weight", transpose=True)
    vw = stack(pre + "self_attn.v_proj.weight", transpose=True)
    qb = stack(pre + "self_attn.q_proj.bias")
    kb = stack(pre + "self_attn.k_proj.bias")
    vb = stack(pre + "self_attn.v_proj.bias")
    blocks = dict(params["blocks"])
    if all(w is not None for w in (qw, kw, vw, qb, kb, vb)):
        blocks["qkv"] = jnp.asarray(np.concatenate([qw, kw, vw], -1), dtype)
        blocks["qkv_b"] = jnp.asarray(np.concatenate([qb, kb, vb], -1), dtype)
    for pk, fmt, tr in (
        ("proj", pre + "self_attn.out_proj.weight", True),
        ("proj_b", pre + "self_attn.out_proj.bias", False),
        ("ln1_w", pre + "layer_norm1.weight", False),
        ("ln1_b", pre + "layer_norm1.bias", False),
        ("ln2_w", pre + "layer_norm2.weight", False),
        ("ln2_b", pre + "layer_norm2.bias", False),
        ("fc1", pre + "mlp.fc1.weight", True),
        ("fc1_b", pre + "mlp.fc1.bias", False),
        ("fc2", pre + "mlp.fc2.weight", True),
        ("fc2_b", pre + "mlp.fc2.bias", False),
    ):
        rows = stack(fmt, transpose=tr)
        if rows is not None:
            blocks[pk] = jnp.asarray(rows, dtype)
    params["blocks"] = blocks

    proj = dict(params["proj_out"])
    if cfg.projector_type == "linear":
        pairs = (("w1", "mm_projector.weight", True),
                 ("b1", "mm_projector.bias", False))
    else:  # torch nn.Sequential(Linear, GELU, Linear) indices 0 / 2
        pairs = (("w1", "mm_projector.0.weight", True),
                 ("b1", "mm_projector.0.bias", False),
                 ("w2", "mm_projector.2.weight", True),
                 ("b2", "mm_projector.2.bias", False))
    for pk, ck, tr in pairs:
        w = sd.get(ck)
        if w is not None and pk in proj:
            proj[pk] = jnp.asarray(w.T if tr else w, dtype)
    params["proj_out"] = proj

    if missing and strict:
        raise ValueError(f"CLIP tower load missing {len(missing)} keys: "
                         f"{missing[:6]}")
    if missing:
        logger.warning("CLIP tower: %d keys missing (kept init): %s",
                       len(missing), missing[:6])
    return params


def siglip_vision_config(hf_cfg, llm_hidden_size: int,
                         projector_type: str = "mlp2x_gelu") -> VisionConfig:
    """VisionConfig mirroring a transformers SiglipVisionConfig.

    SigLIP differences vs CLIP, all reflected here (ref consumes either
    tower through the same VisionEncoder, ref: vision.py:79-88 with the
    all-patch branch at :145): no class token, a biased patch conv, no
    pre-embedding layernorm, post_layernorm applied to last_hidden_state,
    tanh-gelu activations, eps 1e-6.
    """
    return VisionConfig(
        image_size=hf_cfg.image_size,
        patch_size=hf_cfg.patch_size,
        hidden_size=hf_cfg.hidden_size,
        num_layers=hf_cfg.num_hidden_layers,
        num_heads=hf_cfg.num_attention_heads,
        mlp_ratio=hf_cfg.intermediate_size // hf_cfg.hidden_size,
        llm_hidden_size=llm_hidden_size,
        projector_type=projector_type,
        use_class_token=False,
        hidden_act=getattr(hf_cfg, "hidden_act", "gelu_pytorch_tanh"),
        patch_bias=True,
        use_pre_ln=False,
        use_post_ln=True,
        ln_eps=getattr(hf_cfg, "layer_norm_eps", 1e-6),
    )


def load_siglip_vision_tower(state_dict: Dict[str, np.ndarray],
                             cfg: VisionConfig, dtype=jnp.float32,
                             strict: bool = True) -> Params:
    """Assemble tower params from a HF ``SiglipVisionModel`` state dict —
    the second tower family the reference wraps (ref: vision.py:79-88).

    Key map (HF ``vision_model.*`` layout): embeddings.patch_embedding
    (conv WITH bias) / position_embedding.weight; encoder.layers.{i}.
    self_attn.{q,k,v,out}_proj + layer_norm1/2 + mlp.fc1/fc2;
    post_layernorm (applied to last_hidden_state — loaded, unlike CLIP's).
    The attention-pooling ``head.*`` keys are ignored: the reference
    consumes last_hidden_state, which the pooling head never touches.

    Projector weights (``mm_projector.*``) load when present, as in
    ``load_clip_vision_tower``.
    """
    if cfg.use_class_token or cfg.use_pre_ln or not cfg.use_post_ln:
        raise ValueError("SigLIP towers need use_class_token=False, "
                         "use_pre_ln=False, use_post_ln=True "
                         "(siglip_vision_config builds this)")
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("vision_model.head."):
            continue  # pooling head: unused by last_hidden_state
        sd[k[len("vision_model."):] if k.startswith("vision_model.") else k] \
            = np.asarray(v, np.float32)
    params = init_vision_params(cfg, jax.random.PRNGKey(0), dtype=dtype)
    h, L = cfg.hidden_size, cfg.num_layers
    missing = []

    def take(key):
        w = sd.get(key)
        if w is None:
            missing.append(key)
        return w

    conv = take("embeddings.patch_embedding.weight")  # (h, 3, p, p)
    if conv is not None:
        params["patch_embed"] = jnp.asarray(
            conv.transpose(2, 3, 1, 0).reshape(cfg.patch_dim, h), dtype)
    cb = take("embeddings.patch_embedding.bias")
    if cb is not None:
        params["patch_embed_b"] = jnp.asarray(cb, dtype)
    pos = take("embeddings.position_embedding.weight")
    if pos is not None:
        params["pos_embed"] = jnp.asarray(pos, dtype)
    for pk, ck in (("post_ln_w", "post_layernorm.weight"),
                   ("post_ln_b", "post_layernorm.bias")):
        w = take(ck)
        if w is not None:
            params[pk] = jnp.asarray(w, dtype)

    def stack(fmt, transpose=False):
        rows = [take(fmt.format(i)) for i in range(L)]
        if any(r is None for r in rows):
            return None
        return np.stack([r.T if transpose else r for r in rows])

    pre = "encoder.layers.{}."
    qw = stack(pre + "self_attn.q_proj.weight", transpose=True)
    kw = stack(pre + "self_attn.k_proj.weight", transpose=True)
    vw = stack(pre + "self_attn.v_proj.weight", transpose=True)
    qb = stack(pre + "self_attn.q_proj.bias")
    kb = stack(pre + "self_attn.k_proj.bias")
    vb = stack(pre + "self_attn.v_proj.bias")
    blocks = dict(params["blocks"])
    if all(w is not None for w in (qw, kw, vw, qb, kb, vb)):
        blocks["qkv"] = jnp.asarray(np.concatenate([qw, kw, vw], -1), dtype)
        blocks["qkv_b"] = jnp.asarray(np.concatenate([qb, kb, vb], -1), dtype)
    for pk, fmt, tr in (
        ("proj", pre + "self_attn.out_proj.weight", True),
        ("proj_b", pre + "self_attn.out_proj.bias", False),
        ("ln1_w", pre + "layer_norm1.weight", False),
        ("ln1_b", pre + "layer_norm1.bias", False),
        ("ln2_w", pre + "layer_norm2.weight", False),
        ("ln2_b", pre + "layer_norm2.bias", False),
        ("fc1", pre + "mlp.fc1.weight", True),
        ("fc1_b", pre + "mlp.fc1.bias", False),
        ("fc2", pre + "mlp.fc2.weight", True),
        ("fc2_b", pre + "mlp.fc2.bias", False),
    ):
        rows = stack(fmt, transpose=tr)
        if rows is not None:
            blocks[pk] = jnp.asarray(rows, dtype)
    params["blocks"] = blocks

    proj = dict(params["proj_out"])
    if cfg.projector_type == "linear":
        pairs = (("w1", "mm_projector.weight", True),
                 ("b1", "mm_projector.bias", False))
    else:
        pairs = (("w1", "mm_projector.0.weight", True),
                 ("b1", "mm_projector.0.bias", False),
                 ("w2", "mm_projector.2.weight", True),
                 ("b2", "mm_projector.2.bias", False))
    for pk, ck, tr in pairs:
        w = sd.get(ck)
        if w is not None and pk in proj:
            proj[pk] = jnp.asarray(w.T if tr else w, dtype)
    params["proj_out"] = proj

    if missing and strict:
        raise ValueError(f"SigLIP tower load missing {len(missing)} keys: "
                         f"{missing[:6]}")
    if missing:
        logger.warning("SigLIP tower: %d keys missing (kept init): %s",
                       len(missing), missing[:6])
    return params
