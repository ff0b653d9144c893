import jax, jax.numpy as jnp
import numpy as np
from dorado_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from dorado_tpu.models.presets import sup_v50_config
from dorado_tpu.models.tx_model import init_tx_params, make_tx_forward_fn

config = sup_v50_config()
params = init_tx_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
forward = jax.jit(make_tx_forward_fn(config, compute_dtype=jnp.bfloat16))
sig = jax.random.normal(jax.random.PRNGKey(1), (32, 12288), jnp.bfloat16)
r = forward(params, sig); np.asarray(r).ravel()[0]
jax.profiler.start_trace("/tmp/jaxtrace")
for _ in range(2):
    r = forward(params, sig)
np.asarray(r).ravel()[0]
jax.profiler.stop_trace()
print("done")
