import time
from functools import partial
import jax, jax.numpy as jnp
import numpy as np
from dorado_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from dorado_tpu.models.presets import sup_v50_config
from dorado_tpu.models.tx_model import init_tx_params, make_tx_forward_fn

config = sup_v50_config()
params = init_tx_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
forward = make_tx_forward_fn(config, compute_dtype=jnp.bfloat16)
batch, chunk = 32, 12288
iters = 8

@partial(jax.jit, static_argnums=(2,))
def chained(p, sig, n):
    def body(s, _):
        out = forward(p, s)
        nxt = jnp.repeat(out.mean(axis=-1), config.stride, axis=1)[:, : s.shape[1]].astype(s.dtype)
        return nxt, ()
    s, _ = jax.lax.scan(body, sig, None, length=n)
    return s.mean()

@jax.jit
def trivial(x): return x.mean()
float(trivial(jnp.zeros((8,8))))
t0=time.perf_counter(); float(trivial(jnp.zeros((8,8)))); rpc=time.perf_counter()-t0

sig = jax.random.normal(jax.random.PRNGKey(1), (batch, chunk), jnp.bfloat16)
float(chained(params, sig, iters))
best = 1e9
for rep in range(5):
    t0 = time.perf_counter()
    float(chained(params, sig, iters))
    dt = max(1e-9, (time.perf_counter() - t0 - rpc) / iters)
    best = min(best, dt)
    tput = batch * chunk / dt
    print(f"rep {rep}: {dt*1e3:.2f} ms/step, {tput/1e6:.2f} Msamples/s ({tput/7.79e6:.3f}x A100)", flush=True)
print(f"best: {batch*chunk/best/1e6:.2f} Msamples/s ({batch*chunk/best/7.79e6:.3f}x A100)")
