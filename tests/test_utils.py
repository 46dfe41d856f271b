"""Utility-layer tests: filters, progress, tracing."""

import io
import logging

import numpy as np
import pytest

from grav1synth_tpu.bitio import BitReader
from grav1synth_tpu.utils.filters import KERNELS, FilterChain
from grav1synth_tpu.utils.progress import Progress
from grav1synth_tpu.utils.trace import field_tracer, trace_log


class TestFilters:
    def _planes(self, h=64, w=64):
        rng = np.random.default_rng(0)
        y = rng.integers(0, 255, (h, w)).astype(np.uint8)
        u = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
        v = rng.integers(0, 255, (h // 2, w // 2)).astype(np.uint8)
        return [y, u, v]

    def test_parse_dsl(self):
        chain = FilterChain.parse(
            "crop:top=8,bottom=4;resize:width=32,height=16,alg=lanczos"
        )
        assert len(chain.filters) == 2

    def test_bad_filter_name(self):
        with pytest.raises(ValueError):
            FilterChain.parse("sharpen:amount=2")

    def test_bad_resize_alg(self):
        with pytest.raises(ValueError):
            FilterChain.parse("resize:width=2,height=2,alg=bogus")

    def test_crop(self):
        chain = FilterChain.parse("crop:top=8,bottom=8,left=4,right=4")
        out = chain.apply(self._planes(), 8)
        assert out[0].shape == (48, 56)
        assert out[1].shape == (24, 28)  # chroma at half rate

    @pytest.mark.parametrize("alg", sorted(KERNELS))
    def test_resize_kernels(self, alg):
        chain = FilterChain.parse(f"resize:width=32,height=32,alg={alg}")
        out = chain.apply(self._planes(), 8)
        assert out[0].shape == (32, 32)
        assert out[1].shape == (16, 16)
        assert out[0].dtype == np.uint8

    def test_resize_identity_on_constant(self):
        planes = [np.full((64, 64), 77, np.uint8)] * 3
        chain = FilterChain.parse("resize:width=48,height=48")
        out = chain.apply(planes, 8)
        assert (out[0] == 77).all()

    def test_upscale(self):
        chain = FilterChain.parse("resize:width=128,height=96")
        out = chain.apply(self._planes(), 8)
        assert out[0].shape == (96, 128)


class TestProgress:
    def test_hidden_when_not_tty(self):
        buf = io.StringIO()  # not a tty
        bar = Progress(total=10, out=buf)
        for _ in range(10):
            bar.step()
        bar.done()
        assert buf.getvalue() == ""

    def test_counts(self):
        bar = Progress(total=5, enabled=False)
        for _ in range(5):
            bar.step()
        assert bar.count == 5


class TestTrace:
    def test_field_tracer_logs_positions(self, caplog):
        r = BitReader(bytes([0b1010_1100]))
        r.trace = field_tracer(0)
        with caplog.at_level(logging.DEBUG, logger="trace_headers"):
            r.f(3, "alpha")
            r.f(5, "beta")
        msgs = [rec.getMessage() for rec in caplog.records]
        # reference trace.rs:37-49 layout: pos left-12, name+binary
        # padded to column 60
        assert msgs == [
            "0           alpha" + "101".rjust(55) + " = 5",
            "3           beta" + "01100".rjust(56) + " = 12",
        ]

    def test_zero_overhead_without_hook(self):
        r = BitReader(b"\xff")
        assert r.trace is None
        assert r.f(8, "named") == 255


class TestPrefetch:
    def test_order_and_completion(self):
        from grav1synth_tpu.utils.prefetch import PrefetchIterator

        out = list(PrefetchIterator(iter(range(1000)), depth=7))
        assert out == list(range(1000))

    def test_exception_propagates(self):
        from grav1synth_tpu.utils.prefetch import PrefetchIterator

        def gen():
            yield 1
            raise ValueError("boom")

        it = PrefetchIterator(gen(), depth=2)
        assert next(it) == 1
        import pytest

        with pytest.raises(ValueError, match="boom"):
            for _ in it:
                pass

    def test_close_unblocks_producer(self):
        import itertools

        from grav1synth_tpu.utils.prefetch import PrefetchIterator

        it = PrefetchIterator(itertools.count(), depth=2)
        assert next(it) == 0
        it.close()  # must not hang on the infinite producer

    def test_maybe_prefetch_env_override(self, monkeypatch):
        from grav1synth_tpu.utils import prefetch

        monkeypatch.setenv("GRAV1_PREFETCH", "0")
        it = prefetch.maybe_prefetch(iter([1, 2]), depth=2)
        assert isinstance(it, prefetch._Passthrough)
        assert list(it) == [1, 2]
        monkeypatch.setenv("GRAV1_PREFETCH", "1")
        it = prefetch.maybe_prefetch(iter([3]), depth=2)
        assert isinstance(it, prefetch.PrefetchIterator)
        assert list(it) == [3]
