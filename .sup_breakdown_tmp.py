import time
import jax, jax.numpy as jnp
import numpy as np
from dorado_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()
from dorado_tpu.models.presets import sup_v50_config
from dorado_tpu.models.tx_model import (
    init_tx_params, conv_stack, rope_tables, rms_norm,
)
from dorado_tpu.ops.attention import windowed_attention_qkv_rope

config = sup_v50_config()
tx = config.tx.tx
params = init_tx_params(config, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
n, chunk = 32, 12288
t = 1024
h, dmodel, ff = tx.nhead, tx.d_model, tx.dim_feedforward
cos, sin = rope_tables(t, dmodel // h, tx.theta)
alpha = tx.deepnorm_alpha
win = tx.attn_window
lp = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *params["layers"])
lp0 = params["layers"][0]

@jax.jit
def trivial(x): return x.mean()
float(trivial(jnp.zeros((8,8))))
t0=time.perf_counter(); float(trivial(jnp.zeros((8,8)))); rpc=time.perf_counter()-t0
print(f"rpc {rpc*1e3:.1f} ms", flush=True)

def chain_time(name, f, x0, length=20, reps=3):
    """f: x -> y (any shape); chained via scalar feedback."""
    @jax.jit
    def g(x):
        def body(q, _):
            out = f(q)
            return q + out.mean().astype(q.dtype) * 1e-6, ()
        q, _ = jax.lax.scan(body, x, None, length=length)
        return q.mean()
    float(g(x0))
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        float(g(x0))
        best = min(best, (time.perf_counter() - t0 - rpc) / length)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)
    return best

x = jax.random.normal(jax.random.PRNGKey(1), (n, t, dmodel), jnp.bfloat16)
sig = jax.random.normal(jax.random.PRNGKey(2), (n, chunk, 1), jnp.bfloat16)
dt = jnp.bfloat16

chain_time("conv stack", lambda s: conv_stack(params, s, config), sig, length=8)

def qkv_mm(xx):
    return jnp.einsum("ntc,gc->ntg", xx, lp0["wqkv"].astype(dt), preferred_element_type=jnp.float32).astype(dt)
chain_time("qkv matmul", qkv_mm, x)

qkv = qkv_mm(x)
chain_time("attention kernel+rope", lambda q: windowed_attention_qkv_rope(q, cos, sin, h, win[0], win[1]), qkv)

def out_proj(a):
    return (jnp.einsum("ntc,dc->ntd", a, lp0["out_proj_w"].astype(dt), preferred_element_type=jnp.float32) + lp0["out_proj_b"].astype(jnp.float32)).astype(dt)
chain_time("out_proj", out_proj, x)

chain_time("rms_norm+residual", lambda xx: rms_norm(xx + xx * jnp.asarray(alpha, dt), lp0["norm1"]), x)

def mlp(xx):
    ffv = jnp.einsum("ntc,fc->ntf", xx, lp0["fc1"].astype(dt), preferred_element_type=jnp.float32).astype(dt)
    y, gate = jnp.split(ffv, 2, axis=-1)
    t_act = jax.nn.silu(gate.astype(jnp.float32)).astype(dt) * y
    return jnp.einsum("ntf,cf->ntc", t_act, lp0["fc2"].astype(dt), preferred_element_type=jnp.float32).astype(dt)
chain_time("mlp (fc1+swiglu+fc2)", mlp, x)

# one full encoder layer
from dorado_tpu.models.tx_model import tx_encoder_layer
chain_time("one full encoder layer", lambda xx: tx_encoder_layer(lp0, xx, cos, sin, h, alpha, win), x)

# 18 layers as scanned stack
def enc18(xx):
    def body(carry, layer_p):
        return tx_encoder_layer(layer_p, carry, cos, sin, h, alpha, win), None
    out, _ = jax.lax.scan(body, xx, lp)
    return out
chain_time("18 layers (scan)", enc18, x, length=4)

# head
ups = params["upsample"]
def head(xx):
    m, tt, c = xx.shape
    sf = config.tx.upsample.scale_factor
    yy = (jnp.einsum("ntc,uc->ntu", xx, ups["w"].astype(dt), preferred_element_type=jnp.float32) + ups["b"].astype(jnp.float32)).astype(dt)
    yy = yy.reshape(m, sf * tt, c)
    w = (params["crf"]["w"].astype(jnp.float32) * config.tx.crf.scale).astype(dt)
    return jnp.einsum("ntc,oc->nto", yy, w, preferred_element_type=jnp.float32)
chain_time("upsample+crf head", head, x, length=8)
