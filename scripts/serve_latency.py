"""Engine-level single-query serving latency probe (real TPU).

Measures the FULL search_text wall (tokenize -> text tower dispatch ->
batched search dispatch -> packed fetch) with a text-cache MISS on every
rep, plus the cache-hit path, against a synthetic 1M-row device corpus.
Confirms the serving chain pipelines to ~one relay round trip (the relay
overlaps async dispatches; only the final packed fetch blocks).

Run: PYTHONPATH="/root/repo:$PYTHONPATH" python scripts/serve_latency.py
"""
import os
import shutil
import tempfile
import time

import numpy as np

os.environ.setdefault("EVOSSEARCH_HBM_BUDGET_MB", "-1")

import jax
import jax.numpy as jnp

from evossearch_tpu.core.config import Config
from evossearch_tpu.engine import SearchEngine
from evossearch_tpu.index.store import IndexWriter

N, D, K = 1_000_000, 512, 48


def main():
    tmp = tempfile.mkdtemp(prefix="serve_lat_")
    try:
        cfg = Config()
        eng = SearchEngine(cfg)
        # synthetic corpus written through the real store
        rng = np.random.default_rng(0)
        emb = rng.standard_normal((N, D), np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        paths = [f"img_{i:07d}.jpg" for i in range(N)]
        w = IndexWriter.create(
            tmp, model=eng.spec.name, dim=D,
            dtype_name="float32", index_folder_name=cfg.INDEX_FOLDER_NAME,
        )
        w.append(emb, paths, [{} for _ in paths])
        w.finalize()

        trivial = jax.jit(lambda x: x + 1.0)
        z = jnp.zeros((8,))
        np.asarray(trivial(z))

        # warm: compile text tower + search kernel for this corpus
        r = eng.search_text(tmp, "warmup query", K)
        assert r is not None and len(r[0]) == K

        def p50(fn, reps=21):
            ts = []
            for i in range(reps):
                t0 = time.perf_counter()
                fn(i)
                ts.append((time.perf_counter() - t0) * 1e3)
            return float(np.percentile(ts, 50))

        floor = p50(lambda i: np.asarray(trivial(z)), 15)
        print(f"floor={floor:.2f}ms", flush=True)

        # cache-miss: a fresh text each rep (same token count bucket)
        miss = p50(lambda i: eng.search_text(tmp, f"fresh query number {i:04d}", K))
        print(f"search_text cache-MISS wall p50={miss:.2f}ms (net {miss-floor:.2f})", flush=True)

        hit = p50(lambda i: eng.search_text(tmp, "warmup query", K))
        print(f"search_text cache-HIT  wall p50={hit:.2f}ms (net {hit-floor:.2f})", flush=True)

        # find-similar by stored path (embedding lookup -> search)
        sim = p50(lambda i: eng.search_embedding(
            tmp, emb[i % 64], K))
        print(f"search_embedding (np query) wall p50={sim:.2f}ms (net {sim-floor:.2f})", flush=True)
        eng.close()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


main()
