"""Stress tests for the threaded host pipeline (OrderedPool / OrderedSink /
ModBaseBatchScheduler interplay) — the TSan-less stand-in for the reference's
sanitizer CI jobs (the reference hammers MessageSink/AsyncQueue via
tsan-built unit tests). Random delays are injected into every stage; the
assertions are: no deadlock (bounded wall time via pytest timeout), no loss,
no duplication, and submission-order delivery.
"""

import random
import threading
import time

import numpy as np
import pytest

from dorado_tpu.pipeline.host import OrderedPool, OrderedSink


class TestOrderedPoolStress:
    @pytest.mark.parametrize("workers", [1, 3, 8])
    def test_jittered_map_preserves_order(self, workers):
        rng = random.Random(workers)

        def slow_sq(x):
            time.sleep(rng.random() * 0.003)
            return x * x

        pool = OrderedPool(slow_sq, workers=workers, window=5)
        n = 300
        got = list(pool.map(range(n)))
        pool.shutdown()
        assert got == [x * x for x in range(n)]

    def test_exception_propagates_and_pool_survives(self):
        def boom(x):
            if x == 37:
                raise ValueError("boom")
            return x

        pool = OrderedPool(boom, workers=4, window=8)
        with pytest.raises(ValueError):
            list(pool.map(range(100)))
        # pool still usable after a failed map
        assert list(pool.map([1, 2, 3])) == [1, 2, 3]
        pool.shutdown()

    def test_window_bounds_inflight(self):
        active = []
        lock = threading.Lock()
        peak = [0]

        def tracked(x):
            with lock:
                active.append(x)
                peak[0] = max(peak[0], len(active))
            time.sleep(0.002)
            with lock:
                active.remove(x)
            return x

        pool = OrderedPool(tracked, workers=8, window=6)
        out = list(pool.map(range(200)))
        pool.shutdown()
        assert out == list(range(200))
        assert peak[0] <= 6


class TestOrderedSinkStress:
    @pytest.mark.parametrize("workers", [1, 4])
    def test_interleaved_submit_drain(self, workers):
        rng = random.Random(7)
        consumed = []

        def work(x):
            time.sleep(rng.random() * 0.002)
            return x + 1000

        sink = OrderedSink(work, consumed.append, workers=workers, window=4)
        for i in range(500):
            sink.submit(i)
            if rng.random() < 0.3:
                sink.drain_ready()
            if rng.random() < 0.02:
                sink.drain_all()
        sink.shutdown()
        assert consumed == [i + 1000 for i in range(500)]

    def test_consume_on_caller_thread(self):
        caller = threading.get_ident()
        seen_threads = set()

        def consume(x):
            seen_threads.add(threading.get_ident())

        sink = OrderedSink(lambda x: x, consume, workers=4)
        for i in range(100):
            sink.submit(i)
        sink.shutdown()
        assert seen_threads == {caller}


class TestFullPipelineStress:
    def test_feeder_finisher_with_injected_delays(self, monkeypatch, tmp_path):
        """End-to-end run with random sleeps injected into scale and finish
        stages: output must equal the inline (workers=0) run exactly, in the
        same order."""
        import shutil

        import jax

        from dorado_tpu.config import load_model_config
        from dorado_tpu.models.crf_model import init_lstm_crf_params
        from dorado_tpu.models.load import save_lstm_params
        from dorado_tpu.pipeline import basecaller as bc
        from dorado_tpu.pipeline.basecaller import BasecallerPipeline

        FAST = "dna_r10.4.1_e8.2_260bps_fast@v4.0.0"
        d = tmp_path / FAST
        d.mkdir()
        shutil.copy(
            f"/root/reference/tests/data/model_configs/{FAST}/config.toml",
            d / "config.toml",
        )
        cfg = load_model_config(d)
        params = init_lstm_crf_params(cfg, jax.random.PRNGKey(3))
        save_lstm_params(cfg, params, d)

        pod5_dir = "/root/reference/tests/data/pod5/dna_r10.4.1_e8.2_400bps_5khz"

        class Collect:
            def __init__(self):
                self.records = []

            def write(self, rec):
                self.records.append((rec.qname, rec.seq, rec.qual))

        def run(threads: int, jitter: bool):
            monkeypatch.setenv("DORADO_TPU_HOST_THREADS", str(threads))
            from dorado_tpu.models.load import load_model

            config, p = load_model(d)
            pipe = BasecallerPipeline(
                config, p, chunk_size=4000, batch_size=4, decoder="viterbi"
            )
            if jitter:
                rng = random.Random(0)
                orig_scale = pipe._prepare_read

                def slow_prepare(read):
                    time.sleep(rng.random() * 0.02)
                    return orig_scale(read)

                pipe._prepare_read = slow_prepare
            out = Collect()
            pipe.run(pod5_dir, out)
            return out.records

        baseline = run(0, jitter=False)
        assert len(baseline) == 3
        jittered = run(6, jitter=True)
        assert jittered == baseline
