import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from dorado_tpu.utils.jax_setup import enable_compilation_cache
enable_compilation_cache()

T, N, H = 1666, 1024, 384
G4 = 4 * H
x = jax.random.normal(jax.random.PRNGKey(0), (T, N, H), jnp.bfloat16) * 0.1
wih = jax.random.normal(jax.random.PRNGKey(1), (H, G4), jnp.bfloat16) * 0.02
whh = jax.random.normal(jax.random.PRNGKey(2), (H, G4), jnp.bfloat16) * 0.02
bias = jax.random.normal(jax.random.PRNGKey(3), (G4,), jnp.float32) * 0.1

def gates_f32(g, c_prev, hidden):
    ig = jax.nn.sigmoid(g[:, :hidden])
    fg = jax.nn.sigmoid(g[:, hidden:2*hidden])
    gg = jnp.tanh(g[:, 2*hidden:3*hidden])
    og = jax.nn.sigmoid(g[:, 3*hidden:])
    c = fg * c_prev + ig * gg
    h_new = og * jnp.tanh(c)
    return h_new, c

def make_pipe_kernel(bt):
    SB = 128
    def kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref):
        t_idx = pl.program_id(1)
        @pl.when(t_idx == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)
        hidden = h_ref.shape[-1]
        w = whh_ref[:]
        # software-pipelined pair of 128-row chains: MXU of one chain
        # overlaps VPU gate math of the other
        mA = jnp.dot(h_ref[:SB], w, preferred_element_type=jnp.float32)
        def step(j, mA):
            mB = jnp.dot(h_ref[SB:], w, preferred_element_type=jnp.float32)
            gA = xp_ref[j, :SB].astype(jnp.float32) + mA
            hA, cA = gates_f32(gA, c_ref[:SB], hidden)
            c_ref[:SB] = cA
            h_ref[:SB] = hA.astype(h_ref.dtype)
            out_ref[j, :SB] = hA.astype(out_ref.dtype)
            mA2 = jnp.dot(hA.astype(xp_ref.dtype), w, preferred_element_type=jnp.float32)
            gB = xp_ref[j, SB:].astype(jnp.float32) + mB
            hB, cB = gates_f32(gB, c_ref[SB:], hidden)
            c_ref[SB:] = cB
            h_ref[SB:] = hB.astype(h_ref.dtype)
            out_ref[j, SB:] = hB.astype(out_ref.dtype)
            return mA2
        jax.lax.fori_loop(0, bt, step, mA, unroll=True)
    return kernel

def make_base_kernel(bt):
    def kernel(xp_ref, whh_ref, out_ref, h_ref, c_ref):
        t_idx = pl.program_id(1)
        @pl.when(t_idx == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)
        hidden = h_ref.shape[-1]
        def step(j, _):
            h = h_ref[:]
            g = xp_ref[j].astype(jnp.float32) + jnp.dot(
                h, whh_ref[:], preferred_element_type=jnp.float32)
            h_new, c = gates_f32(g, c_ref[:], hidden)
            c_ref[:] = c
            h_ref[:] = h_new.astype(h_ref.dtype)
            out_ref[j] = h_new.astype(out_ref.dtype)
            return ()
        jax.lax.fori_loop(0, bt, step, (), unroll=True)
    return kernel

def build(pipelined, bn, bt):
    n_tiles, t_tiles = N // bn, T // bt
    def t_map(b, t): return (t, b, 0)
    const = lambda b, t: (0, 0)
    kernel = make_pipe_kernel(bt) if pipelined else make_base_kernel(bt)
    def call(xp):
        return pl.pallas_call(
            kernel, grid=(n_tiles, t_tiles),
            in_specs=[pl.BlockSpec((bt, bn, G4), t_map, memory_space=pltpu.VMEM),
                      pl.BlockSpec((H, G4), const, memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((bt, bn, H), t_map, memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((T, N, H), jnp.bfloat16),
            scratch_shapes=[pltpu.VMEM((bn, H), jnp.bfloat16),
                            pltpu.VMEM((bn, H), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary")),
        )(xp, whh)
    def layer(xx):
        xp = (jnp.einsum("tnh,hg->tng", xx, wih,
                         preferred_element_type=jnp.float32) + bias).astype(jnp.bfloat16)
        return call(xp)
    return layer

@jax.jit
def trivial(v): return v.mean()
float(trivial(jnp.zeros((8,8))))
t0=time.perf_counter(); float(trivial(jnp.zeros((8,8)))); rpc=time.perf_counter()-t0

ref = None
for name, pipelined, bn, bt in [
    ("base bn128 bt8", False, 128, 8),
    ("pipe2 bn256 bt8", True, 256, 8),
    ("pipe2 bn256 bt4", True, 256, 4),
]:
    try:
        layer = build(pipelined, bn, bt)
        out1 = np.asarray(jax.jit(layer)(x)).astype(np.float32)
        if ref is None: ref = out1
        else: print(f"  max err vs base: {np.abs(out1-ref).max():.2e}")
        @jax.jit
        def chained(xx, layer=layer):
            def body(q, _):
                return layer(q), ()
            q, _ = jax.lax.scan(body, xx, None, length=6)
            return q.mean()
        float(chained(x))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            float(chained(x))
            best = min(best, (time.perf_counter()-t0-rpc)/6)
        print(f"{name}: {best*1e3:.2f} ms/layer", flush=True)
    except Exception as e:
        print(f"{name}: FAILED {str(e)[:200]}", flush=True)
