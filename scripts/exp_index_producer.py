"""Round-4 experiment (VERDICT r3 #4): where does the producer's non-decode
CPU go?

bench_index r03 measured e2e 252 img/s vs a decode-only ceiling of ~271 on
this 1-core host — a ~7% gap attributed (unverified) to the per-image loop,
stat() calls, prepare_batch_planar packing, and writer CRC. This drives the
REAL _pipelined_build with a zero-cost stub encoder + writer so everything
EXCEPT device encode is measured, then cProfiles the same run to break the
gap down by function. CPU-only: no TPU claim.

Usage: python scripts/exp_index_producer.py [n_images]
"""

from __future__ import annotations

import cProfile
import pstats
import shutil
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

from evossearch_tpu.core import CLIP_MODEL_SPECS
from evossearch_tpu.index.builder import _pipelined_build
from evossearch_tpu.preprocess.io import load_batch_planar

N = int(sys.argv[1]) if len(sys.argv) > 1 else 768
BATCH = 128
SHORT = 224


class StubEncoder:
    spec = CLIP_MODEL_SPECS["ViT-B/32"]

    def encode_prepared_planar(self, y, c, *rest):
        return np.zeros((y.shape[0], 512), np.float32)

    def encode_prepared(self, canv, *rest):
        return np.zeros((canv.shape[0], 512), np.float32)


class StubWriter:
    rows = 0

    def append(self, emb, paths, meta):
        self.rows += len(paths)


def synth(tmp: str) -> list[Path]:
    from PIL import Image

    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
    for i in range(N):
        arr = np.roll(base, shift=i * 7, axis=1)
        arr[0, 0] = (i & 255, (i >> 8) & 255, 0)
        Image.fromarray(arr).save(f"{tmp}/img_{i:05d}.jpg", quality=85)
    return sorted(Path(tmp).glob("*.jpg"))


def run_build(paths) -> float:
    w = StubWriter()
    t0 = time.perf_counter()
    _pipelined_build(paths, set(), w, StubEncoder(), BATCH,
                     fast_decode=True, decode_short_side=SHORT, planar=True)
    dt = time.perf_counter() - t0
    assert w.rows == N, w.rows
    return dt


def run_decode_only(paths) -> float:
    t0 = time.perf_counter()
    n_ok = 0
    for start in range(0, len(paths), BATCH):
        ents = load_batch_planar(paths[start:start + BATCH],
                                 min_short_side=SHORT, fast=True)
        n_ok += sum(e is not None for e in ents)
    dt = time.perf_counter() - t0
    assert n_ok == N
    return dt


def main() -> None:
    tmp = tempfile.mkdtemp(prefix="exp_producer_")
    try:
        paths = synth(tmp)
        # interleave to cancel thermal/cache drift; skip first of each
        for name, fn in (("decode-only", run_decode_only),
                         ("stub-build ", run_build)):
            fn(paths)  # warm (page cache, thread pool)
            times = [fn(paths) for _ in range(3)]
            best = min(times)
            print(f"{name}: best {best:.2f}s = {N / best:.0f} img/s "
                  f"(runs: {[f'{t:.2f}' for t in times]})")

        prof = cProfile.Profile()
        prof.enable()
        run_build(paths)
        prof.disable()
        st = pstats.Stats(prof)
        st.sort_stats("cumulative")
        print("\n-- cumulative top 25 (producer+consumer, stub encode) --")
        st.print_stats(25)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
