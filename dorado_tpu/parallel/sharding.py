"""Multi-chip sharding: mesh construction and the sharded basecall step.

The reference's only parallelism is device data-parallelism over dynamically
assembled chunk batches (SURVEY §2.4: one `CudaCaller` per GPU pulling from
shared queues, dorado/api/runner_creation.cpp:86-124). The TPU-native
equivalent is a 2-D `("data", "model")` mesh:

  - **data** axis: the chunk batch is sharded — chunks are embarrassingly
    parallel, so scaling is linear and needs no collectives in the hot loop;
  - **model** axis: the CRF head (and transformer FF) weights can be sharded
    over their output dimension for very large models; XLA inserts the
    all-gather where decode needs full state scores. For production models
    this axis is 1 (params replicated), mirroring the reference.

Everything is `jax.jit` + `NamedSharding` annotations: we pick the mesh and
placement, XLA chooses the collectives.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dorado_tpu.config import BasecallModelConfig
from dorado_tpu.models.crf_model import lstm_crf_forward
from dorado_tpu.ops.crf_scan import backward_scores, forward_scores, viterbi_path


def make_mesh(
    n_devices: int | None = None, data: int | None = None, model: int = 1
) -> Mesh:
    """Build a ("data", "model") mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if data is None:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def _head_partition(config: BasecallModelConfig):
    """PartitionSpec pytree for the parameter dict: replicate everything
    except the CRF head output dim, which shards over "model"."""

    def spec_for(path: tuple, leaf) -> P:
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "linear1" in keys or "linear2" in keys or "crf" in keys:
            if keys[-1] == "w" and np.ndim(leaf) == 2:
                return P("model", None)
            if keys[-1] == "b":
                return P("model")
        return P()

    return spec_for


def shard_params(params, mesh: Mesh, config: BasecallModelConfig):
    """Place parameters on the mesh: replicated, except the CRF head which is
    sharded over the "model" axis (no-op when that axis is 1)."""
    spec_for = _head_partition(config)

    def place(path, leaf):
        spec = spec_for(path, leaf)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def make_sharded_basecall_step(
    config: BasecallModelConfig,
    mesh: Mesh,
    decoder: str = "viterbi",
    compute_dtype=jnp.float32,
):
    """jit-compiled basecall step with batch sharded over the "data" axis.

    signal [N, T] (N divisible by the data-axis size) -> decode outputs.
    """
    blank = 2.0

    def step(params, signal):
        signal = jax.lax.with_sharding_constraint(
            signal, NamedSharding(mesh, P("data", None))
        )
        scores = lstm_crf_forward(params, signal.astype(compute_dtype), config)
        scores_tnc = jnp.swapaxes(scores, 0, 1)
        alpha = forward_scores(scores_tnc, blank)
        beta = backward_scores(scores_tnc, blank)
        posts = jax.nn.softmax(alpha + beta, axis=-1)
        if decoder == "viterbi":
            states, moves = viterbi_path(scores_tnc, blank)
            return (
                jnp.swapaxes(states, 0, 1),
                jnp.swapaxes(moves, 0, 1),
                jnp.swapaxes(posts, 0, 1),
            )
        return scores, jnp.swapaxes(beta, 0, 1), jnp.swapaxes(posts, 0, 1)

    batch_sharding = NamedSharding(mesh, P("data", None))
    return jax.jit(step, in_shardings=(None, batch_sharding))
