import jax, jax.numpy as jnp
import numpy as np
from dorado_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from dorado_tpu.models.presets import hac_v43_config
from dorado_tpu.models.crf_model import init_lstm_crf_params
from dorado_tpu.basecall.runner import BasecallRunner

config = hac_v43_config()
params = init_lstm_crf_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
runner = BasecallRunner(config, params, chunk_size=9996, batch_size=1024,
                        decoder="viterbi", compute_dtype=jnp.bfloat16)
sig = jnp.asarray(np.random.RandomState(0).randn(1024, 9996).astype(np.float16))
out = runner._device_fn(runner.params, sig)
np.asarray(out[3])
jax.profiler.start_trace("/tmp/jaxtrace_hac")
for _ in range(2):
    out = runner._device_fn(runner.params, sig)
np.asarray(out[3])
jax.profiler.stop_trace()
print("done")
