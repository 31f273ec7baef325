"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch real TPU hardware — sharding/parallelism is validated on a
host-platform mesh (XLA_FLAGS=--xla_force_host_platform_device_count=8),
mirroring the multi-chip layout the driver dry-runs.

NOTE: this environment's sitecustomize force-registers a TPU PJRT plugin and
overrides JAX_PLATFORMS, so we must override back via jax.config *after*
import, and set XLA_FLAGS before the backend initializes.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import asyncio  # noqa: E402
import inspect  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from vllm_i64_tpu.config import ModelConfig  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line("markers", "asyncio: run test via asyncio.run")


def pytest_pyfunc_call(pyfuncitem):
    """Minimal async test support (pytest-asyncio is not in this image)."""
    fn = pyfuncitem.obj
    if inspect.iscoroutinefunction(fn):
        kwargs = {
            name: pyfuncitem.funcargs[name]
            for name in pyfuncitem._fixtureinfo.argnames
        }
        asyncio.run(fn(**kwargs))
        return True
    return None


@pytest.fixture(autouse=True)
def _reset_quant_globals():
    """Engine dispatch sets the process-global W8A8 / fused-norm-quant flags
    and (deliberately) leaves them set — runners re-sync per dispatch. Tests
    that call model forwards OUTSIDE a runner would otherwise inherit
    whatever the previous test's engine last dispatched with (exposed when
    the EngineConfig w8a8 default flipped to True)."""
    from vllm_i64_tpu.ops import dequant_matmul as dm

    prev_w = dm.w8a8_enabled()
    prev_f = dm.fused_norm_quant_enabled()
    yield
    dm.set_w8a8(prev_w)
    dm.set_fused_norm_quant(prev_f)


@pytest.fixture(scope="session")
def tiny_config() -> ModelConfig:
    """Tiny routed config mirroring the reference test fixture
    (ref: tests/test_model.py:38-54)."""
    return ModelConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=128,
        num_experts=4,
        top_k=2,
        shared_expert=True,
        use_qk_norm=True,
        use_mu_guidance=False,
    )


@pytest.fixture(scope="session")
def tiny_dense_config() -> ModelConfig:
    return ModelConfig(
        vocab_size=256,
        hidden_size=128,
        intermediate_size=256,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=2,
        max_position_embeddings=128,
        use_token_routed_mlp=False,
        num_experts=1,
        shared_expert=False,
        use_qk_norm=False,
    )


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
