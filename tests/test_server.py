"""BatchedPredictor micro-batching server tests (CPU, fake + real model)."""

import threading
import time

import numpy as np
import pytest

from coastline.infer.server import BatchedPredictor


def make_fake_predict(calls):
    """Mask = image's red channel thresholded; records per-call batch."""

    def predict(batch):
        calls.append(batch.shape[0])
        return (batch[..., 0] > 127).astype(np.uint8)

    return predict


def test_results_match_per_image_and_order():
    calls = []
    rng = np.random.default_rng(0)
    images = [rng.integers(0, 255, (512, 512, 3), dtype=np.uint8) for _ in range(10)]
    with BatchedPredictor(make_fake_predict(calls), batch_size=4) as srv:
        masks = srv.predict_many(images)
    for im, m in zip(images, masks):
        np.testing.assert_array_equal(m, (im[..., 0] > 127).astype(np.uint8))
    # every call padded to the fixed batch shape internally, results exact
    assert all(c == 4 for c in calls)


def test_partial_batch_flushes_within_delay():
    calls = []
    srv = BatchedPredictor(make_fake_predict(calls), batch_size=8, max_delay_ms=20)
    try:
        fut = srv.submit(np.zeros((512, 512, 3), np.uint8))
        mask = fut.result(timeout=5)
        assert mask.shape == (512, 512)
    finally:
        srv.close()


def test_concurrent_submitters_batch_together():
    calls = []
    # generous flush window: on a 1-vCPU host, thread STARTUP can straggle
    # past a tight deadline and split the batch (the flush is now an
    # absolute deadline from the first arrival)
    srv = BatchedPredictor(make_fake_predict(calls), batch_size=8, max_delay_ms=2000)
    results = {}

    def client(i):
        im = np.full((512, 512, 3), i * 20, np.uint8)
        results[i] = srv.submit(im).result(timeout=10)

    try:
        threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    finally:
        srv.close()
    for i in range(8):
        expect = 1 if i * 20 > 127 else 0
        assert (results[i] == expect).all()
    # 8 concurrent clients should need clearly fewer than 8 device calls
    assert len(calls) <= 4


def test_shape_validation_and_closed_rejection():
    srv = BatchedPredictor(make_fake_predict([]), batch_size=2)
    with pytest.raises(ValueError):
        srv.submit(np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(ValueError):
        srv.submit(np.zeros((512, 512, 3), np.float32))
    srv.close()
    with pytest.raises(RuntimeError):
        srv.submit(np.zeros((512, 512, 3), np.uint8))


def test_predict_error_propagates_to_waiters():
    def boom(batch):
        raise RuntimeError("device on fire")

    srv = BatchedPredictor(boom, batch_size=2, max_delay_ms=5)
    try:
        fut = srv.submit(np.zeros((512, 512, 3), np.uint8))
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(timeout=5)
    finally:
        srv.close()


def test_with_real_extractor_small():
    """End-to-end with the actual jitted predict path at a small size."""
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    rng = np.random.default_rng(1)
    images = [rng.integers(0, 255, (64, 64, 3), dtype=np.uint8) for _ in range(5)]
    direct = ex.predict_masks_batch(np.stack(images + images[:3]))[:5]
    with BatchedPredictor(ex.predict_masks_batch, batch_size=8,
                          image_size=64) as srv:
        masks = srv.predict_many(images)
    for i in range(5):
        np.testing.assert_array_equal(masks[i], direct[i])


def test_extractor_serve_contextmanager():
    from coastline.infer.extract import CoastlineExtractor

    ex = CoastlineExtractor(image_size=64)
    im = np.random.default_rng(2).integers(0, 255, (64, 64, 3), dtype=np.uint8)
    with ex.serve(batch_size=4) as srv:
        mask = srv.submit(im).result(timeout=30)
    assert mask.shape == (64, 64) and set(np.unique(mask)) <= {0, 1}


def test_cancelled_future_does_not_poison_batch():
    """A client that times out and cancels its Future must not corrupt
    the other waiters' results or kill the worker."""
    ev = threading.Event()

    def slow_predict(batch):
        ev.wait(0.2)
        return (batch[..., 0] > 127).astype(np.uint8)

    srv = BatchedPredictor(slow_predict, batch_size=2, max_delay_ms=1)
    try:
        im0 = np.zeros((512, 512, 3), np.uint8)
        im1 = np.full((512, 512, 3), 200, np.uint8)
        f0 = srv.submit(im0)
        f1 = srv.submit(im1)
        f0.cancel()  # races the worker's resolve; must be tolerated
        mask1 = f1.result(timeout=10)
        assert (mask1 == 1).all()
        # worker still alive and serving
        f2 = srv.submit(im1)
        assert (f2.result(timeout=10) == 1).all()
    finally:
        srv.close()
