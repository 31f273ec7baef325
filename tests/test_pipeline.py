"""Pipeline parallelism tests (ref: vllm_i64/parallel/pipeline_parallel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vllm_i64_tpu.models import complexity_deep as cdm
from vllm_i64_tpu.parallel.pipeline import (
    PipelinedModel,
    get_pp_indices,
    slice_stage_params,
)


def test_get_pp_indices_even_split():
    assert get_pp_indices(20, 0, 2) == (0, 10)
    assert get_pp_indices(20, 1, 2) == (10, 20)
    # remainder goes to the first ranks
    assert get_pp_indices(7, 0, 3) == (0, 3)
    assert get_pp_indices(7, 1, 3) == (3, 5)
    assert get_pp_indices(7, 2, 3) == (5, 7)
    # all layers covered exactly once
    covered = []
    for r in range(3):
        a, b = get_pp_indices(7, r, 3)
        covered.extend(range(a, b))
    assert covered == list(range(7))
    with pytest.raises(ValueError):
        get_pp_indices(7, 3, 3)


def test_stage_params_are_slices(tiny_config):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    s0 = slice_stage_params(params, 0, 1)
    assert s0["q"].shape[0] == 1
    np.testing.assert_allclose(np.asarray(s0["q"][0]),
                               np.asarray(params["layers"]["q"][0]))


def test_pipelined_forward_matches_full_model(tiny_config):
    """2-stage pipeline must reproduce the single-program forward exactly."""
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[5, 17, 42, 7], [9, 11, 13, 2]], jnp.int32)
    want = np.asarray(cdm.forward(params, tiny_config, tokens))

    pm = PipelinedModel(params, tiny_config, pp_size=2)
    got = np.asarray(pm.forward(tokens))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_pipelined_forward_across_devices(tiny_config):
    """Stages on distinct (virtual) devices with device_put hand-off."""
    devices = jax.devices()[:2]
    if len(devices) < 2:
        pytest.skip("needs 2 devices")
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    tokens = jnp.asarray([[5, 17, 42, 7]], jnp.int32)
    want = np.asarray(cdm.forward(params, tiny_config, tokens))
    pm = PipelinedModel(params, tiny_config, pp_size=2, devices=devices)
    got = np.asarray(pm.forward(tokens))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # stage params actually live on the right devices
    assert list(pm.stage_layers[0]["q"].devices())[0] == devices[0]
    assert list(pm.stage_layers[1]["q"].devices())[0] == devices[1]


def test_pp_size_bounds(tiny_config):
    params = cdm.init_params(tiny_config, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        PipelinedModel(params, tiny_config, pp_size=0)
    with pytest.raises(ValueError):
        PipelinedModel(params, tiny_config,
                       pp_size=tiny_config.num_hidden_layers + 1)


def test_pp_three_stages_remainder_split(tiny_config):
    """num_layers=2, pp=2 is the trivial split; exercise uneven splits via
    a 5-layer model over pp=3 (remainder spread over the first ranks,
    ref: pipeline_parallel.py:85-104) with logits parity."""
    import jax
    import numpy as np

    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.parallel.pipeline import PipelinedModel, get_pp_indices

    cfg = tiny_config.replace(num_hidden_layers=5)
    assert [get_pp_indices(5, r, 3) for r in range(3)] == [
        (0, 2), (2, 4), (4, 5)]
    params = cdm.init_params(cfg, jax.random.PRNGKey(2))
    toks = np.random.default_rng(0).integers(3, 250, size=(2, 9))
    import jax.numpy as jnp

    toks = jnp.asarray(toks, jnp.int32)
    ref = cdm.forward(params, cfg, toks)
    pp = PipelinedModel(params, cfg, pp_size=3)
    got = pp.forward(toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_pp_stage_devices_receive_their_layers(tiny_config):
    import jax

    from vllm_i64_tpu.models import complexity_deep as cdm
    from vllm_i64_tpu.parallel.pipeline import PipelinedModel

    cfg = tiny_config
    params = cdm.init_params(cfg, jax.random.PRNGKey(3))
    devs = jax.devices()[:2]
    pp = PipelinedModel(params, cfg, pp_size=2, devices=devs)
    d0 = pp.stage_layers[0]["q"].devices()
    d1 = pp.stage_layers[1]["q"].devices()
    assert d0 == {devs[0]}
    assert d1 == {devs[1]}
