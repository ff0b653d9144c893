import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dorado_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()

T, N, H = 1666, 1024, 384
G4 = 4 * H
key = jax.random.PRNGKey(0)
x = jax.random.normal(key, (T, N, H), jnp.bfloat16) * 0.5
wih = jax.random.normal(jax.random.PRNGKey(1), (H, G4), jnp.bfloat16) * 0.05
whh = jax.random.normal(jax.random.PRNGKey(2), (H, G4), jnp.bfloat16) * 0.05
bias = jax.random.normal(jax.random.PRNGKey(3), (G4,), jnp.float32) * 0.1

def make_kernel(fused, gate_dtype, bt):
    def kernel(*refs):
        if fused:
            x_ref, wih_ref, whh_ref, bias_ref, out_ref, h_ref, c_ref = refs
        else:
            xp_ref, whh_ref, out_ref, h_ref, c_ref = refs
        t_idx = pl.program_id(1)
        @pl.when(t_idx == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)
        hidden = h_ref.shape[-1]
        def step(i, _):
            j = i
            h = h_ref[:]
            if fused:
                gates = (jnp.dot(x_ref[j], wih_ref[:], preferred_element_type=jnp.float32)
                         + jnp.dot(h, whh_ref[:], preferred_element_type=jnp.float32)
                         + bias_ref[:])
            else:
                gates = xp_ref[j].astype(jnp.float32) + jnp.dot(
                    h, whh_ref[:], preferred_element_type=jnp.float32)
            g = gates.astype(gate_dtype)
            ig = jax.nn.sigmoid(g[:, :hidden])
            fg = jax.nn.sigmoid(g[:, hidden:2*hidden])
            gg = jnp.tanh(g[:, 2*hidden:3*hidden])
            og = jax.nn.sigmoid(g[:, 3*hidden:])
            c = fg.astype(jnp.float32) * c_ref[:] + (ig * gg).astype(jnp.float32)
            h_new = og.astype(jnp.float32) * jnp.tanh(c)
            c_ref[:] = c
            h_ref[:] = h_new.astype(h_ref.dtype)
            out_ref[j] = h_new.astype(out_ref.dtype)
            return ()
        jax.lax.fori_loop(0, bt, step, (), unroll=True)
    return kernel

def build(fused, gate_dtype, bn, bt):
    n_tiles, t_tiles = N // bn, T // bt
    def t_map(b, t): return (t, b, 0)
    const = lambda b, t: (0, 0)
    kernel = make_kernel(fused, gate_dtype, bt)
    if fused:
        in_specs = [
            pl.BlockSpec((bt, bn, H), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G4), const, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G4), const, memory_space=pltpu.VMEM),
        ]
    else:
        in_specs = [
            pl.BlockSpec((bt, bn, G4), t_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((H, G4), const, memory_space=pltpu.VMEM),
        ]
    def call(*args):
        return pl.pallas_call(
            kernel, grid=(n_tiles, t_tiles), in_specs=in_specs,
            out_specs=pl.BlockSpec((bt, bn, H), t_map, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N, H), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bn, H), jnp.bfloat16),
                            pltpu.VMEM((bn, H), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(*args)
    if fused:
        def layer(xx):
            return call(xx, wih, whh, bias.reshape(1, -1))
    else:
        def layer(xx):
            xp = (jnp.einsum("tnh,hg->tng", xx, wih,
                             preferred_element_type=jnp.float32)
                  + bias).astype(jnp.bfloat16)
            return call(xp, whh)
    return layer

@jax.jit
def trivial(v): return v.mean()
float(trivial(jnp.zeros((8,8))))
t0=time.perf_counter(); float(trivial(jnp.zeros((8,8)))); rpc=time.perf_counter()-t0

ref = None
for name, fused, gd, bn, bt in [
    ("split f32 bn128 bt8 (current)", False, jnp.float32, 128, 8),
    ("fused f32 bn128 bt8", True, jnp.float32, 128, 8),
    ("fused f32 bn256 bt4", True, jnp.float32, 256, 4),
    ("fused bf16 bn128 bt8", True, jnp.bfloat16, 128, 8),
    ("fused bf16 bn256 bt4", True, jnp.bfloat16, 256, 4),
    ("split bf16 bn128 bt8", False, jnp.bfloat16, 128, 8),
]:
    try:
        layer = build(fused, gd, bn, bt)
        @jax.jit
        def chained(xx, layer=layer):
            def body(q, _):
                out = layer(q)
                return out, ()
            q, _ = jax.lax.scan(body, xx, None, length=6)
            return q.mean()
        out1 = np.asarray(jax.jit(layer)(x)).astype(np.float32)
        if ref is None:
            ref = out1
        else:
            print(f"  max err vs base: {np.abs(out1-ref).max():.2e}")
        float(chained(x))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x))
            best = min(best, (time.perf_counter()-t0-rpc)/6)
        print(f"{name}: {best*1e3:.2f} ms/layer", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:160]}", flush=True)
