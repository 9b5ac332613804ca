"""Micro-batching server benchmark on the real chip: 64 concurrent
clients vs the sequential per-image loop (the reference GUI's shape).

Measured 2026-08-17 on v5e through the ~30ms-RTT tunnel:
  sequential 64 images: 5.92s (10.8 img/s)
  served 64 clients:    3.31s (19.4 img/s)  speedup 1.8x, bit-identical
"""
import threading
import time
import numpy as np
from coastline.infer.extract import CoastlineExtractor

ex = CoastlineExtractor(image_size=512)
rng = np.random.default_rng(0)
images = [rng.integers(0, 255, (512, 512, 3), dtype=np.uint8) for _ in range(64)]

# warm both compiled paths
ex.predict_mask_batchless_warm = ex.predict_masks_batch(np.stack(images[:8]))
single_warm = ex.predict_masks_batch(images[0][None])

# sequential per-image (the reference GUI's loop shape)
t0 = time.perf_counter()
seq = [ex.predict_masks_batch(im[None])[0] for im in images]
t_seq = time.perf_counter() - t0

# concurrent clients through the server
results = [None] * 64
with ex.serve(batch_size=8, max_delay_ms=5) as srv:
    def client(i):
        results[i] = srv.submit(images[i]).result(timeout=120)
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(64)]
    for t in threads: t.start()
    for t in threads: t.join()
    t_srv = time.perf_counter() - t0

for i in range(64):
    np.testing.assert_array_equal(results[i], seq[i])
print(f"sequential 64 images: {t_seq:.2f}s ({64/t_seq:.1f} img/s)")
print(f"served 64 clients:    {t_srv:.2f}s ({64/t_srv:.1f} img/s)  "
      f"speedup {t_seq/t_srv:.1f}x, results identical")
