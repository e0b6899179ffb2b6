"""CPU smoke test for bench.py's phases (no TPU claim, reduced scale).

Validates that each phase runs end-to-end — imports resolve, APIs match,
summary lines print — so a hardware bench run never dies to a typo.
Not a performance measurement.

Usage: python scripts/smoke_bench_phases.py [phase ...]
       (default: bench_serve bench_train — the round-4 additions)
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_platforms", "cpu")  # sitecustomize forces axon,cpu

import bench  # noqa: E402


def shrink() -> None:
    bench.N_VECTORS = 20_000
    bench.QUERY_BATCH = 8
    bench.ITERS = 3


def _patched_phase(fn, *replacements: tuple[str, str]):
    """Re-exec a bench phase's source with literal replacements, asserting
    every replacement actually matched — an unmatched pattern (the bench
    source drifted) would otherwise silently run the FULL-scale phase on
    the 1-core CPU rig for minutes instead of seconds."""
    import inspect
    import textwrap

    src = inspect.getsource(fn)
    for old, new in replacements:
        patched = src.replace(old, new)
        assert patched != src, (
            f"smoke patch target not found in {fn.__name__}: {old!r}"
        )
        src = patched
    ns = dict(bench.__dict__)
    exec(textwrap.dedent(src), ns)
    return ns[fn.__name__]


def smoke_serve() -> None:
    # bench_serve hardcodes n, chunk, threads, per_thread locally; run a
    # re-exec'd copy with the literals shrunk (checked replacements).
    _patched_phase(
        bench.bench_serve,
        ("n, chunk = 1_000_000, 1 << 17", "n, chunk = 4096, 2048"),
        ("threads, per_thread = 8, 40", "threads, per_thread = 4, 3"),
    )()


def smoke_train() -> None:
    # a genuinely tiny spec: the full ViT-B/32 fwd+bwd+AdamW jit costs
    # minutes of XLA compile on the 1-core CPU rig, defeating the
    # runs-in-seconds purpose of the smoke (a prior version assigned the
    # full spec here, making the replacement a no-op)
    from evossearch_tpu.core.constants import CLIPModelSpec

    bench.__dict__["_TINY_SPEC"] = CLIPModelSpec(
        name="smoke-tiny", image_size=32, patch_size=16, vision_width=64,
        vision_layers=2, vision_heads=4, text_width=64, text_layers=2,
        text_heads=4, vocab_size=49408, context_length=16, embed_dim=32,
    )
    try:
        _patched_phase(
            bench.bench_train,
            ("bs = 256", "bs = 4"),
            ("reps = 10", "reps = 2"),
            ('CLIP_MODEL_SPECS["ViT-B/32"]', "_TINY_SPEC"),
        )()
    finally:
        bench.__dict__.pop("_TINY_SPEC", None)


def smoke_search() -> None:
    shrink()
    bench.bench_search()


def smoke_index() -> None:
    _patched_phase(bench.bench_index, ("n_images = 1536", "n_images = 64"))()


def smoke_hbm() -> None:
    # Pin the single-device kernel: under the forced 8-CPU-device test
    # mesh the engine auto-resolves to "sharded", whose per-chip
    # reservations are 8x smaller — nothing would evict and the SQ8 tier
    # would never engage, so the asserts below would test nothing.
    _patched_phase(
        bench.bench_hbm,
        ("rows, chunk = 300_000, 1 << 16", "rows, chunk = 20_000, 10_000"),
        ("cfg.HBM_BUDGET_MB = 480",
         "cfg.HBM_BUDGET_MB = 30\n        cfg.SEARCH_KERNEL = 'best'"),
        ("cfg2.HBM_BUDGET_MB = 4",
         "cfg2.HBM_BUDGET_MB = 4\n        cfg2.SEARCH_KERNEL = 'best'"),
    )()
    line = bench._SUMMARY[-1][1]
    assert "2 evictions" in line, line
    assert "fallback 1/1" in line, line
    assert "tie-exact=True" in line, line


def smoke_tailwindow() -> None:
    """Simulate the driver's ~2000-char trailing capture over a full-size
    run's summary state: every prio-0 evidence line must sit inside the
    window and the LAST line must be the parseable headline JSON
    (VERDICT r4 #1/#2 — r04 shipped parsed=null because the re-printed
    block overflowed the window and the JSON printed 30 min early)."""
    import contextlib
    import io
    import json

    bench._SUMMARY.clear()
    # Realistic full-length lines: the r04 artifact's lines plus the
    # round-5 formats, at their observed/maximum lengths.
    p0 = [
        "search 1M f32 batched 48, one dispatch: total p50=38.50ms -> "
        "0.802 ms/query (k=48)",
        "single query net of RPC floor = 3.99 ms (wall p50=33.10 "
        "min=29.85 max=41.02, floor=29.11; 1 kernel + 1 packed fetch per "
        "query, so spread = relay noise) [target < 10]",
        "SQ8 20M rows EXACT, batched 48: select p50 76.0ms wall = 1.583 "
        "ms/query (~214 GB/s sweep), cert 48/48 [capacity: 2x the bf16 "
        "HBM ceiling, exact results]",
        "IVF 1M (nlist=1000): build=74.0s, recall@48=1.0000 [target >= "
        "0.99], query=43.4 ms (single-query wall incl ~28ms RPC floor; "
        "recall-calibrated nprobe=3); batched 32: 88.3 ms total = 2.76 "
        "ms/query",
        "bench_index: e2e 219 img/s (= 68% of decode-only 323); upload "
        "probes pre/post 22/18 MB/s (211/172 img/s), metered in-run 708 "
        "MB = >=101 MB/s -> PROBE INCONSISTENT: e2e beats min(decode, "
        "upload)=172 by 27% (> the +-25% relay band) — the probes missed "
        "the e2e-time relay state (101 MB/s metered)",
        "HBM on-chip: 2x295MB bf16 folders vs 480MB budget: 2 evictions "
        "(A steady 31ms -> B first 21.4s evict+upload -> A re-mat 20.8s "
        "-> A steady 30ms, 293MB reserved); SQ8 cert-fail fallback 1/1 "
        "queries, tie-exact=True",
        "serve HTTP 8 threads x 40 fresh-text queries @1M bf16: 128 qps, "
        "p50=60ms p99=96ms (reference: single-threaded dev server)",
    ]
    p1 = [
        "train ViT-B/32 bf16 contrastive step (fwd+bwd+AdamW, remat, "
        "batch 256, dp=1): 1513 pairs/s/chip",
        "encode ViT-B/32 bf16: 11477 images/sec/chip (batch 512, 20 "
        "reps, seq_merge=2) [target >= 1000]",
        "device pipeline (fused preprocess+encode, 480x640 uint8 -> "
        "embedding): 9684 img/s/chip (batch 128) [indexing device "
        "ceiling; target >= 1000]",
        "IVF 3M bf16 (nlist=1732, factor=1.5, tuned nprobe=3): "
        "build=85.5s, recall@48=0.9970; batched 48: IVF 2.682 ms/query "
        "vs exact 0.779 ms/query -> EXACT wins on-chip",
        "HOST crossover @150k f32 (1-core BLAS, build 17s on host XLA): "
        "exact 28.2 ms/q vs IVF probe 2.5 ms/q (11.4x, recall@48=1.0000, "
        "nprobe=3) -> IVF wins on host",
        "10M bf16 batched 48: total p50=51.6ms -> 1.074 ms/query",
        "1M bf16 (default store dtype) batched 48: total p50=34.8ms -> "
        "0.726 ms/query",
    ]
    p2 = [
        "encode ViT-B/16 bf16: 2642 images/sec/chip (batch 128, ~47% MFU "
        "vs 197 TFLOP/s bf16 peak)",
        "encode ViT-L/14 bf16: 599 images/sec/chip (batch 64, ~49% MFU "
        "vs 197 TFLOP/s bf16 peak)",
        "encode RN50 bf16: 6486 images/sec/chip (batch 128, ~38% MFU vs "
        "197 TFLOP/s bf16 peak)",
        "IVF@10M bf16 one-chip: steady 14.3 GB + build peak 23.8 GB vs "
        "HBM 16 GB (v5e; relay hides memory_stats) -> infeasible (exact "
        "sweeps in-place; at this scale IVF runs mesh-sharded or on the "
        "host)",
    ]
    # insertion order mimics the phase order (interleaved priorities)
    for msg in (p0[:2] + p2 + p1 + p0[2:]):
        prio = 0 if msg in p0 else (1 if msg in p1 else 2)
        bench._SUMMARY.append((prio, msg))
    bench._HEADLINE_JSON = json.dumps({
        "metric": "exact_top48_per_query_ms_at_1M_vectors_batch48",
        "value": 0.802, "unit": "ms", "vs_baseline": 12.469,
    })
    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        bench.print_summary()
    tail = buf.getvalue()[-2000:]
    last = tail.strip().splitlines()[-1]
    parsed = json.loads(last)
    assert parsed["metric"].startswith("exact_top48"), parsed
    for marker in (
        "search 1M f32 batched", "single query net of RPC floor",
        "SQ8 20M rows EXACT", "IVF 1M (nlist=1000)", "bench_index: e2e",
        "HBM on-chip:", "serve HTTP",
    ):
        assert marker in tail, f"prio-0 evidence missing from tail: {marker}"
    bench._SUMMARY.clear()
    bench._HEADLINE_JSON = None
    print("tailwindow: all prio-0 lines + trailing JSON inside 2000 chars",
          file=sys.stderr)


def smoke_encode_rn50() -> None:
    # full RN50 at batch 1 x 1 rep: ~seconds on CPU, exercises the real
    # spec + conv stack + flops accounting end to end
    bench._bench_encode_spec("RN50", batch=1, reps=1)


SMOKES = {
    "bench_serve": smoke_serve,
    "bench_train": smoke_train,
    "bench_search": smoke_search,
    "bench_encode_rn50": smoke_encode_rn50,
    "bench_index": smoke_index,
    "bench_hbm": smoke_hbm,
    "tailwindow": smoke_tailwindow,
}


if __name__ == "__main__":
    names = sys.argv[1:] or ["bench_serve", "bench_train"]
    for name in names:
        print(f"--- smoke {name} ---", file=sys.stderr, flush=True)
        SMOKES[name]()
    print("SMOKE OK", file=sys.stderr)
