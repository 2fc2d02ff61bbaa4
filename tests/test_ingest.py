"""Host-ingest prefetch pipeline (parallel/ingest.py)."""

import time

import jax
import numpy as np
import pytest

from ov_plane_tpu.parallel.ingest import Prefetcher, device_prefetch


def test_order_preserved_and_staged():
    staged = []

    def stage(x):
        staged.append(x)
        return x * 10

    out = list(Prefetcher(range(20), stage=stage, depth=3))
    assert out == [x * 10 for x in range(20)]
    assert staged == list(range(20))


def test_overlaps_producer_and_consumer():
    """With depth 2, slow staging overlaps slow consumption: total wall is
    close to max(sum_stage, sum_consume), not the sum of both."""
    d = 0.02
    pf = Prefetcher(range(10), stage=lambda x: (time.sleep(d), x)[1], depth=2)
    t0 = time.perf_counter()
    for _ in pf:
        time.sleep(d)
    wall = time.perf_counter() - t0
    assert wall < 10 * d * 2 * 0.85, wall  # sequential would be ~10*2d


def test_exception_propagates():
    def items():
        yield 1
        raise RuntimeError("disk died")

    pf = Prefetcher(items(), depth=2)
    assert next(pf) == 1
    with pytest.raises(RuntimeError, match="disk died"):
        next(pf)
        next(pf)


def test_device_prefetch_places_on_device():
    arrs = [np.ones((4,)) * k for k in range(5)]
    dev = jax.devices()[0]
    out = list(device_prefetch(arrs, device=dev, depth=2))
    assert len(out) == 5
    for k, a in enumerate(out):
        assert a.devices() == {dev}
        np.testing.assert_allclose(np.asarray(a), arrs[k])


def test_close_releases_producer_and_error_persists():
    import threading

    # Early consumer exit: close() must unblock and join the producer.
    pf = Prefetcher(range(1000), stage=lambda x: x, depth=2)
    assert next(pf) == 0
    pf.close()
    assert not pf._thread.is_alive()
    with pytest.raises(StopIteration):
        next(pf)

    # After a propagated error, further next() re-raises instead of blocking.
    def items():
        yield 1
        raise RuntimeError("boom")

    pf2 = Prefetcher(items(), depth=2)
    assert next(pf2) == 1
    with pytest.raises(RuntimeError):
        for _ in range(3):
            next(pf2)
    with pytest.raises(RuntimeError):
        next(pf2)
