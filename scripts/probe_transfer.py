"""Probe: does the relay H2D link multiplex concurrent transfers?

Serial vs 2/4-thread concurrent device_put of equal total bytes. If
concurrency scales, multi-threaded producers raise effective MB/s and the
sustained eval ceiling with them; if not, the link is a hard pipe and only
wire-size cuts help.
"""
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

TOTAL_MB = 84


def put_all(chunks):
    arrs = [jax.device_put(c) for c in chunks]
    for a in arrs:
        a.block_until_ready()


def timed(label, fn, *args):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        fn(*args)
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best*1e3:7.1f} ms ({TOTAL_MB/best:6.1f} MB/s)",
          flush=True)


def main():
    total = TOTAL_MB * 1024 * 1024 // 4
    buf = np.arange(total, dtype=np.int32)
    jax.device_put(buf[:1024]).block_until_ready()  # init backend

    timed("serial 1x84MB          ", put_all, [buf])
    for n in (2, 4, 8):
        chunks = np.array_split(buf, n)

        def concurrent(chunks=chunks, n=n):
            ths = []
            for c in chunks:
                th = threading.Thread(target=put_all, args=([c],))
                ths.append(th)
                th.start()
            for th in ths:
                th.join()

        timed(f"serial  {n}x{TOTAL_MB//n}MB chunks   ", put_all, chunks)
        timed(f"concur  {n}x{TOTAL_MB//n}MB threads  ", concurrent)

    # Donation/commitment variants: committed device + explicit layout.
    dev = jax.devices()[0]
    timed("device_put(device=dev) ", lambda: jax.device_put(
        buf, device=dev).block_until_ready())


if __name__ == "__main__":
    main()
