"""Multi-chip sharding tests on a virtual 8-device CPU mesh (conftest sets
XLA_FLAGS=--xla_force_host_platform_device_count=8)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dorado_tpu.models.crf_model import init_lstm_crf_params, lstm_crf_forward
from dorado_tpu.models.presets import fast_v40_config, hac_v43_config
from dorado_tpu.ops.crf_scan import backward_scores, forward_scores, viterbi_path
from dorado_tpu.parallel import make_mesh, make_sharded_basecall_step, shard_params


@pytest.fixture(scope="module")
def setup():
    config = fast_v40_config()
    params = init_lstm_crf_params(config, jax.random.PRNGKey(0))
    return config, params


def test_devices_available():
    assert len(jax.devices()) >= 8


class TestShardedStep:
    def test_data_parallel_matches_single(self, setup):
        config, params = setup
        mesh = make_mesh(8, model=1)
        sharded = shard_params(params, mesh, config)
        step = make_sharded_basecall_step(config, mesh, decoder="viterbi")
        sig = np.random.RandomState(0).randn(16, 600).astype(np.float32)
        states, moves, posts = step(sharded, jnp.asarray(sig))

        scores = lstm_crf_forward(params, jnp.asarray(sig), config)
        scores_tnc = jnp.swapaxes(scores, 0, 1)
        ref_states, ref_moves = viterbi_path(scores_tnc, 2.0)
        np.testing.assert_array_equal(np.asarray(states), np.asarray(ref_states).T)
        np.testing.assert_array_equal(np.asarray(moves), np.asarray(ref_moves).T)

    def test_tensor_parallel_head(self, setup):
        config, params = setup
        mesh = make_mesh(8, model=2)
        sharded = shard_params(params, mesh, config)
        step = make_sharded_basecall_step(config, mesh, decoder="viterbi")
        sig = np.random.RandomState(1).randn(8, 600).astype(np.float32)
        states, moves, posts = step(sharded, jnp.asarray(sig))

        scores = lstm_crf_forward(params, jnp.asarray(sig), config)
        scores_tnc = jnp.swapaxes(scores, 0, 1)
        ref_states, _ = viterbi_path(scores_tnc, 2.0)
        np.testing.assert_array_equal(np.asarray(states), np.asarray(ref_states).T)

    def test_beam_outputs_sharded(self, setup):
        config, params = setup
        mesh = make_mesh(8, model=1)
        sharded = shard_params(params, mesh, config)
        step = make_sharded_basecall_step(config, mesh, decoder="beam")
        sig = np.random.RandomState(2).randn(8, 600).astype(np.float32)
        scores, bwd, posts = step(sharded, jnp.asarray(sig))
        t_out = 600 // config.stride
        assert scores.shape == (8, t_out, config.outsize)
        assert bwd.shape == (8, t_out + 1, config.num_states)


class TestGraftEntry:
    def test_entry_compiles(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", "/root/repo/__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        fn, args = mod.entry()
        out = jax.jit(fn)(*args)
        assert out.shape[0] == 8

    def test_dryrun_multichip(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "__graft_entry__", "/root/repo/__graft_entry__.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.dryrun_multichip(8)
