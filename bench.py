"""Benchmark: hac LSTM-CRF forward throughput on the attached TPU chip.

Metric semantics mirror the reference's auto-batch-size benchmark tables
(dorado/basecall/CudaCaller.cpp:495-575): forward over [batch, chunk] input
with chunk = 288*stride samples; throughput = batch*chunk / time.

Baseline: NVIDIA A100 80GB PCIe, dna_r10.4.1_e8.2_400bps_hac@v4.3.0, best
table entry 0.0330413 ms/chunk @ batch 4608
(dorado/basecall/benchmarks/NVIDIA_A100_80GB_PCIe.cpp:22-28)
=> 1728 samples / 0.0330413 ms = 52.30M samples/s.

Timing method: the device link here is a high-latency tunnel (~30 ms RPC
round-trip), so each measurement chains `ITERS` forwards inside one jitted
scan — each iteration's input derived from the previous output so nothing
can be elided — and fetches a scalar once; the RPC overhead (measured on a
trivial program) is subtracted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import jax
import jax.numpy as jnp

A100_HAC_V43_SAMPLES_PER_S = 1728.0 / 0.0330413e-3
ITERS = 10


def main() -> None:
    from dorado_tpu.utils.jax_setup import enable_compilation_cache

    enable_compilation_cache()
    from dorado_tpu.models.crf_model import init_lstm_crf_params, make_crf_forward_fn
    from dorado_tpu.models.presets import hac_v43_config

    config = hac_v43_config()
    chunk = 288 * config.stride  # 1728, same as the reference sweep
    key = jax.random.PRNGKey(0)
    params = init_lstm_crf_params(config, key, dtype=jnp.bfloat16)
    use_pallas = jax.default_backend() == "tpu"
    forward = make_crf_forward_fn(
        config, use_pallas=use_pallas, compute_dtype=jnp.bfloat16
    )

    @partial(jax.jit, static_argnums=(2,))
    def chained(p, sig, iters):
        def body(s, _):
            out = forward(p, s)  # [N, T/stride, C]
            nxt = jnp.repeat(out.mean(axis=-1), config.stride, axis=1).astype(s.dtype)
            return nxt, ()

        s, _ = jax.lax.scan(body, sig, None, length=iters)
        return s.mean()

    @jax.jit
    def trivial(x):
        return x.mean()

    x = jnp.zeros((8, 8))
    float(trivial(x))
    t0 = time.perf_counter()
    float(trivial(x))
    rpc = time.perf_counter() - t0

    platform = jax.devices()[0].platform
    batches = [512, 1024, 2048] if platform == "tpu" else [32]

    best_tput = 0.0
    for batch in batches:
        sig = jax.random.normal(key, (batch, chunk), jnp.bfloat16)
        try:
            float(chained(params, sig, ITERS))  # warmup/compile
            t0 = time.perf_counter()
            float(chained(params, sig, ITERS))
            dt = time.perf_counter() - t0
        except Exception as e:  # OOM at large batch: stop the sweep
            print(f"batch {batch}: {e}", file=sys.stderr)
            break
        per_iter = max(1e-9, (dt - rpc) / ITERS)
        tput = batch * chunk / per_iter
        print(
            f"batch {batch}: {per_iter * 1e3 / batch:.4f} ms/chunk, "
            f"{tput / 1e6:.2f} Msamples/s",
            file=sys.stderr,
        )
        best_tput = max(best_tput, tput)

    print(
        json.dumps(
            {
                "metric": "hac_v4.3_forward_samples_per_s",
                "value": round(best_tput, 1),
                "unit": "samples/s",
                "vs_baseline": round(best_tput / A100_HAC_V43_SAMPLES_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
