"""Single-device exact top-k search over an embedding matrix.

Replaces FAISS ``IndexFlatIP.search`` (reference oldapp.py:2005, 2112):
embeddings are L2-normalized at encode time, so inner product == cosine,
and exact top-k is one (N, d) x (d,) matvec plus a top-k selection. On TPU
the matvec rides the MXU and ``lax.top_k`` runs fused on device — this is
the baseline the Pallas streaming kernel (ops/) must beat.

Determinism contract: ties broken by LOWER row index (jax.lax.top_k is
stable in that sense; property-tested in tests/test_search.py), which the
multi-chip merge in parallel/ relies on to make sharded results bit-equal
to single-device results.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


# Rows per block for the two-stage top-k. A flat lax.top_k over millions of
# scores is a full selection over one huge vector; reshaping to (G, BLOCK)
# and running per-block top-k (one small, well-tiled selection per row)
# followed by a merge over G*k candidates is exact and far faster on TPU.
_BLOCK = 4096

# Observability: device round-trip counts for the packed fast paths.
# Each packed search is designed to cost exactly ONE kernel dispatch plus
# ONE device->host fetch; uncertified rows add a fallback dispatch. A
# latency harness (bench.py) reads deltas of this dict to attribute
# wall-time spread to relay noise vs extra round trips. Diagnostic only:
# unlocked increments, so counts are approximate under concurrent serving
# (the bench phases that consume them are single-threaded).
DISPATCH_COUNTS = {"kernel": 0, "fetch": 0, "fallback": 0}


def dispatch_counts_snapshot() -> dict:
    return dict(DISPATCH_COUNTS)

# Above this corpus size the certified-approx fast path takes over: TPU's
# native ApproxTopK (lax.approx_max_k) is ~70x faster than blockwise exact
# selection at 10M rows, and a cheap certification makes it exact (below).
_FAST_PATH_MIN_ROWS = 1 << 18


def _score_precision(emb: jax.Array):
    """Score-matmul precision shared by every device kernel: HIGHEST
    (bf16x3, f32-faithful) for f32 corpora so the XLA and Pallas paths
    compute bit-identical scores and therefore identical rankings; DEFAULT
    for bf16 corpora (native MXU f32 accumulation — nothing to choose)."""
    return (
        jax.lax.Precision.HIGHEST
        if emb.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )


def _overfetch(k: int) -> int:
    """ApproxTopK candidate count. Swept on v5e at 1M rows: c=64/rt=0.999
    runs ~5x faster than c=256 AND certifies more often (fewer candidates
    -> higher certification threshold -> fewer tie collisions)."""
    return 64 if k <= 48 else 2 * k


def blocked_top_k(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Exact top-k over a 1-D score vector via block-then-merge.

    Tie contract preserved: per-block top_k favors lower in-block index and
    blocks are concatenated in order, so the stable final top_k yields
    ascending global indices for equal scores — identical to flat top_k.
    """
    n = scores.shape[0]
    if n <= _BLOCK or k >= _BLOCK:
        return jax.lax.top_k(scores, k)
    g = -(-n // _BLOCK)
    pad = g * _BLOCK - n
    if pad:
        scores = jnp.concatenate(
            [scores, jnp.full((pad,), -jnp.inf, scores.dtype)]
        )
    blocks = scores.reshape(g, _BLOCK)
    bs, bi = jax.lax.top_k(blocks, k)  # (g, k) per-block candidates
    gidx = bi + (jnp.arange(g, dtype=bi.dtype) * _BLOCK)[:, None]
    fs, fp = jax.lax.top_k(bs.reshape(-1), k)
    return fs, gidx.reshape(-1)[fp]


def sort_by_score_then_index(cand_s: jax.Array, cand_i: jax.Array, k: int):
    """Order (Q, C) candidate rows by (score desc, index asc) and keep the
    first k: ONE batched two-key lax.sort over the VALUES. Equivalent to
    the per-query ``jnp.lexsort((i, -s))`` + two gathers this replaces
    (indices are unique per row, so the orders are identical), but without
    the iota payload, the vmap, and the take_along_axis pair. Score
    negation is exact in f32, so the sort keys are bit-faithful."""
    neg_s, top_i = jax.lax.sort((-cand_s, cand_i), dimension=1, num_keys=2)
    return -neg_s[:, :k], top_i[:, :k]


def _certified_topk(scores: jax.Array, k: int):
    """Exact top-k over (Q, N) scores via certified ApproxTopK.

    TPU's native ApproxTopK (per-bucket maxima; ~70x faster than blockwise
    exact selection at 10M rows) retrieves C=_OVERFETCH candidates per
    query. The only way a true top-k element can be missing is if it scores
    >= m, the minimum retrieved candidate. Certification: if exactly C
    scores are >= m, the candidate set IS the >=m set — nothing was missed,
    and the lexsorted top-k of the candidates equals the global exact top-k
    including the lowest-index tie contract. `ok`=False marks queries that
    need the slow exact fallback (vanishingly rare at recall 0.999 with
    >5x overfetch; guaranteed caught when it happens).

    Verified on TPU at 10M bf16 rows: certified rows match the blocked
    exact selection bit-for-bit when both run on the same score tensor.
    (Two separately compiled matmuls can rank bf16 near-ties differently —
    exactness is always w.r.t. the scores a path computes.)
    """
    c = min(_overfetch(k), scores.shape[1])
    cand_s, cand_i = jax.lax.approx_max_k(
        scores, c, recall_target=0.999, aggregate_to_topk=True
    )
    m = cand_s[:, -1]
    # Two certificates, either suffices:
    #  (a) exactly c scores >= m  ->  candidates ARE the >=m set.
    #  (b) tie-robust (bf16 corpora produce exact score ties at the
    #      boundary ALL the time at 10M rows — cert (a) alone made every
    #      batch pay the slow exact fallback): candidates contain every
    #      score strictly greater than m AND the selected k-th score is
    #      itself > m, so boundary ties can't reach the top-k and the
    #      lowest-index contract among them is moot.
    ge = jnp.sum(scores >= m[:, None], axis=1)
    gt = jnp.sum(scores > m[:, None], axis=1)
    cand_gt = jnp.sum(cand_s > m[:, None], axis=1)

    top_s, top_i = sort_by_score_then_index(cand_s, cand_i, k)
    s_k = top_s[:, -1]
    ok = (ge == c) | ((gt == cand_gt) & (s_k > m))
    return ok, top_s, top_i


@functools.partial(jax.jit, static_argnames=("k",))
def _fast_topk_batch(emb: jax.Array, queries: jax.Array, k: int):
    scores = jnp.dot(
        queries.astype(emb.dtype), emb.T,
        preferred_element_type=jnp.float32, precision=_score_precision(emb),
    )
    return _certified_topk(scores, k)


# Max corpus rows a packed result can carry: indices ride in f32 VALUES,
# which are exact integers up to 2**24. NEVER bitcast indices into f32 —
# small ints are denormal bit patterns and TPU compute flushes denormals
# to zero in some compilations (observed on-device: correct scores, all
# indices zeroed).
_PACK_MAX_ROWS = 1 << 24


def packed_topk(
    emb: jax.Array, queries: jax.Array, k: int, flavor: str,
    interpret: bool = False,
) -> jax.Array:
    """TRACEABLE packed top-k: (Q, 2k+1) f32 [scores | float(indices) |
    ok]. The one scoring+selection routine shared by the standalone
    packed entry points below and by larger jit programs that fuse other
    work around the search (the engine's one-dispatch text->search
    serving program). Flavors mirror the module's routing policy:
    "certified" (ApproxTopK + certificate), "exact" (blocked exact
    selection, ok always 1), "block"/"tree" (the Pallas one-pass
    kernels). Indices ride as f32 VALUES (exact below 2**24; see
    _PACK_MAX_ROWS — callers must route larger corpora elsewhere)."""
    if flavor in ("block", "tree"):
        from ..ops.topk_pallas import fused_topk_batch, fused_topk_batch_tree

        kernel = fused_topk_batch_tree if flavor == "tree" else fused_topk_batch
        ok, s, i = kernel(
            emb, queries.astype(jnp.float32), k, interpret=interpret
        )
    else:
        scores = jnp.dot(
            queries.astype(emb.dtype), emb.T,
            preferred_element_type=jnp.float32,
            precision=_score_precision(emb),
        )
        if flavor == "certified":
            ok, s, i = _certified_topk(scores, k)
        else:  # exact blocked selection — always certified by construction
            s, i = jax.vmap(lambda row: blocked_top_k(row, k))(scores)
            ok = jnp.ones((s.shape[0],), jnp.bool_)
    return jnp.concatenate(
        [s, i.astype(jnp.float32), ok[:, None].astype(jnp.float32)], axis=1
    )


def choose_packed_flavor(n: int, d: int, k: int, dtype, kernel: str):
    """Per-corpus packed-kernel choice, mirroring pallas_search_batch /
    best_exact_search_batch / exact_search_batch routing so a fused
    caller selects the same scoring kernel the two-stage path would.
    Returns (flavor, interpret) for packed_topk. Callers must separately
    keep n < _PACK_MAX_ROWS (the packed index encoding's ceiling)."""
    backend_cpu = jax.default_backend() == "cpu"
    if kernel in ("pallas", "best"):
        eligible = d % 128 == 0 and 0 < k <= 128 and 512 <= n < _PACK_MAX_ROWS
        if kernel == "best" and (backend_cpu or n < _FAST_PATH_MIN_ROWS):
            eligible = False  # best_exact_search_batch's documented policy
        if eligible:
            from ..ops.topk_pallas import use_tree_kernel

            return (
                "tree" if use_tree_kernel(n, k, dtype) else "block",
                backend_cpu,  # explicit pallas on CPU = interpret (tests)
            )
    if _FAST_PATH_MIN_ROWS <= n < _PACK_MAX_ROWS and k <= 128:
        return "certified", False
    return "exact", False


@functools.partial(jax.jit, static_argnames=("k",))
def _fast_topk_batch_packed(emb: jax.Array, queries: jax.Array, k: int):
    """Same as _fast_topk_batch, packed into ONE (Q, 2k+1) f32 array:
    [scores | float(indices) | ok]. One device->host fetch instead of
    three — device->host round-trips are not free (this rig's relay
    charges ~30ms each; even PCIe charges latency)."""
    return packed_topk(emb, queries, k, "certified")


def query_row_bucket(q: int) -> int:
    """Query-row bucket ladder shared by the serving path and every
    uncertified-row fallback: {1, 8, 64} then powers of two. Each kernel
    jit specializes on the query count, so unbucketed calls compile a
    fresh program per distinct row count — an adversarial tie-heavy corpus
    (fallback) or a concurrent burst (serving) becomes a compile storm.
    The ladder is coarse on purpose: kernels pad queries to 128 MXU lanes
    internally, so an 8-row pass costs the same HBM sweep as a 2-row one,
    and fewer buckets means fewer one-time compiles."""
    for pad in (1, 8, 64):
        if q <= pad:
            return pad
    pad = 128
    while pad < q:
        pad <<= 1
    return pad


def gather_query_rows(queries_d, rows: np.ndarray):
    """Bucket-padded device gather of query rows: the (b,) index vector is
    padded with row `rows[0]` up to the ladder bucket, so the gather and
    every downstream kernel specialize on the BUCKET, not on the exact
    failed-row count. Returns (sub_queries (b, d), n_real)."""
    n = len(rows)
    b = query_row_bucket(n)
    idx = np.empty(b, np.int32)
    idx[:n] = rows
    idx[n:] = rows[0]
    return jnp.take(jnp.asarray(queries_d), jnp.asarray(idx), axis=0), n


def _unpack_with_fallback(packed: np.ndarray, emb, queries_d, k: int):
    """Unpack a (Q, 2k+1) [scores | float(indices) | ok] result and re-run
    the exact XLA path for any uncertified rows. Shared by every packed
    fast path so the index-encoding and fallback contracts live in ONE
    place. Fallback queries ride the bucket ladder (query_row_bucket) so
    distinct failure counts reuse a handful of compiled programs."""
    s = packed[:, :k].copy()
    i = packed[:, k : 2 * k].astype(np.int64)
    ok = packed[:, -1] > 0
    if not ok.all():
        DISPATCH_COUNTS["fallback"] += 1
        fail = np.flatnonzero(~ok)
        sub, n = gather_query_rows(queries_d, fail)
        slow_s, slow_i = _topk_batch(emb, sub, k)
        s[fail] = np.asarray(slow_s)[:n]
        i[fail] = np.asarray(slow_i)[:n]
    return s, i


def _searched_with_fallback(emb, queries: np.ndarray, k: int):
    """Fast certified path with per-query exact fallback; (Q,k) results."""
    import jax.numpy as jnp

    emb = jnp.asarray(emb)
    queries_d = jnp.asarray(queries, dtype=jnp.float32)  # no-op if on device
    DISPATCH_COUNTS["kernel"] += 1
    DISPATCH_COUNTS["fetch"] += 1
    packed = np.asarray(_fast_topk_batch_packed(emb, queries_d, k))
    return _unpack_with_fallback(packed, emb, queries_d, k)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_matvec(emb: jax.Array, query: jax.Array, k: int):
    scores = jnp.dot(
        emb, query.astype(emb.dtype),
        preferred_element_type=jnp.float32, precision=_score_precision(emb),
    )
    return blocked_top_k(scores, k)


def exact_search(emb, query: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Exact top-k by inner product.

    emb: (N, d) device or host array (f32/bf16). query: (d,) float32.
    Returns (scores (k,), indices (k,)) sorted by descending score —
    the same contract as FAISS index.search with a single query row.
    """
    n = emb.shape[0]
    k = min(k, n)
    if k == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
    if _FAST_PATH_MIN_ROWS <= n < _PACK_MAX_ROWS and k <= 128:
        # index with [None, :] rather than np.asarray so a device-resident
        # query stays on device (np.asarray would be a blocking fetch)
        query_2d = (
            query[None, :] if getattr(query, "ndim", None) == 1
            else np.asarray(query, np.float32)[None, :]
        )
        s, i = _searched_with_fallback(emb, query_2d, k)
        return s[0], i[0]
    scores, idx = _topk_matvec(jnp.asarray(emb), jnp.asarray(query), k)
    return np.asarray(scores), np.asarray(idx)


@functools.partial(jax.jit, static_argnames=("k",))
def _topk_batch(emb: jax.Array, queries: jax.Array, k: int):
    scores = jnp.dot(
        queries.astype(emb.dtype), emb.T,
        preferred_element_type=jnp.float32, precision=_score_precision(emb),
    )
    return jax.vmap(lambda s: blocked_top_k(s, k))(scores)


def exact_search_host(emb: np.ndarray, query: np.ndarray, k: int):
    """Exact top-k on the HOST via the native C++ scanner (threaded, zero-
    copy over np.memmap shards). Fallback engine when no accelerator is
    present and the verification oracle for the device paths; same tie
    contract. Falls back to numpy when the extension isn't built."""
    from ..preprocess.io import get_native

    is_bf16 = emb.dtype != np.float32
    if is_bf16:
        # bf16 store: quantize the query to the store dtype first, exactly
        # like the device kernels (which cast queries to emb.dtype before
        # the MXU dot) — otherwise host scores are bf16_emb . f32_query
        # and rank differently from every device path.
        query = np.asarray(query).astype(emb.dtype)
    query = np.ascontiguousarray(query, dtype=np.float32)
    n, d = emb.shape
    k = min(k, n)
    if k == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
    native = get_native()
    if is_bf16 and native is not None and hasattr(native, "topk_bf16"):
        # Stream the bf16 shard directly (widening happens inside the C++
        # scan loop) — a per-query O(N*d) f32 conversion of the corpus
        # would defeat the zero-copy mmap contract of the host path.
        # .view(uint16): bf16 has no stable buffer-protocol format char
        # ("cannot include dtype 'E' in a buffer"); the bit pattern is
        # what the scanner wants anyway.
        emb_c = np.ascontiguousarray(emb).view(np.uint16)
        scores, idx = native.topk_bf16(emb_c.data, n, d, query.data, k)
        return np.asarray(scores, np.float32), np.asarray(idx, np.int64)
    emb = np.ascontiguousarray(emb, dtype=np.float32)
    if native is not None:
        scores, idx = native.topk(emb.data, n, d, query.data, k)
        return np.asarray(scores, np.float32), np.asarray(idx, np.int64)
    scores = emb @ query
    order = np.lexsort((np.arange(n), -scores))[:k]
    return scores[order].astype(np.float32), order.astype(np.int64)


def exact_search_host_reader(reader, query: np.ndarray, k: int):
    """Host exact top-k straight over a reader's mmap shards — no
    concatenation, no device: scan each shard with the native scanner and
    merge with global row offsets. The zero-copy path for corpora larger
    than host RAM would allow duplicating."""
    k = min(k, reader.count)
    if k == 0:
        return np.zeros((0,), np.float32), np.zeros((0,), np.int64)
    best_s: list[np.ndarray] = []
    best_i: list[np.ndarray] = []
    offset = 0
    for shard in reader.shard_arrays():
        s, i = exact_search_host(shard, query, min(k, shard.shape[0]))
        best_s.append(s)
        best_i.append(i + offset)
        offset += shard.shape[0]
    cand_s = np.concatenate(best_s)
    cand_i = np.concatenate(best_i)
    order = np.lexsort((cand_i, -cand_s))[:k]
    return cand_s[order], cand_i[order]


_HOST_BATCH_BLOCK = 16384  # rows per GEMM block (f32 transient <= 32 MB)


def exact_search_host_batch(emb: np.ndarray, queries: np.ndarray, k: int):
    """Batched exact top-k over ONE host-resident (or mmap) shard: each
    row block is read once and scored against ALL queries with a single
    BLAS GEMM — a Q-query batch costs ~1/Q of the memory traffic of Q
    native scans (the C++ scanner is single-query). bf16 shards quantize
    the queries to the store dtype first (same contract as every device
    kernel and the single-query scanner) and widen per block.

    Tie contract (score desc, row index asc) holds exactly: argpartition
    is tie-arbitrary at the k-th score, so the boundary is re-split into
    `sure` rows (score strictly above the k-th) plus the LOWEST-index
    rows at the k-th score — equivalent to a full per-query lexsort
    without materializing an (N, Q) score matrix. Exactness is w.r.t.
    the BLAS-accumulated scores this path computes (summation order may
    differ from the C++ scan in the last ulp)."""
    is_bf16 = emb.dtype != np.float32
    queries = np.asarray(queries, np.float32)
    if is_bf16:
        queries = queries.astype(emb.dtype).astype(np.float32)
    qt = np.ascontiguousarray(queries.T)  # (d, Q)
    n = emb.shape[0]
    nq = queries.shape[0]
    k = min(k, n)
    if k == 0 or nq == 0:
        return np.zeros((nq, k), np.float32), np.zeros((nq, k), np.int64)
    cand_s: list[list[np.ndarray]] = [[] for _ in range(nq)]
    cand_i: list[list[np.ndarray]] = [[] for _ in range(nq)]
    for start in range(0, n, _HOST_BATCH_BLOCK):
        blk = emb[start : start + _HOST_BATCH_BLOCK]
        s = np.asarray(blk, np.float32) @ qt  # (B, Q)
        b = s.shape[0]
        part = (
            np.argpartition(-s, k - 1, axis=0)[:k] if b > k else None
        )
        for qi in range(nq):
            col = s[:, qi]
            if part is None:
                rows = np.arange(b)
            else:
                kth = col[part[:, qi]].min()
                sure = np.flatnonzero(col > kth)
                ties = np.flatnonzero(col == kth)[: k - len(sure)]
                rows = np.concatenate([sure, ties])
            cand_s[qi].append(col[rows])
            cand_i[qi].append(rows + start)
    out_s = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int64)
    for qi in range(nq):
        ss = np.concatenate(cand_s[qi])
        ii = np.concatenate(cand_i[qi]).astype(np.int64)
        order = np.lexsort((ii, -ss))[:k]
        out_s[qi] = ss[order]
        out_i[qi] = ii[order]
    return out_s, out_i


def exact_search_host_reader_batch(reader, queries: np.ndarray, k: int):
    """Batched host exact top-k over a reader's mmap shards — the
    engine's over-HBM-budget route. Each shard is swept ONCE for the
    whole batch (exact_search_host_batch); per-shard candidates merge
    with global row offsets under the shared tie contract. A 1-row batch
    keeps the single-query native scanner (no f32 widening pass)."""
    queries = np.asarray(queries, np.float32)
    nq = queries.shape[0]
    k = min(k, reader.count)
    if k == 0 or nq == 0:
        return np.zeros((nq, k), np.float32), np.zeros((nq, k), np.int64)
    if nq == 1:
        s, i = exact_search_host_reader(reader, queries[0], k)
        return s[None], i[None]
    parts_s: list[np.ndarray] = []
    parts_i: list[np.ndarray] = []
    offset = 0
    for shard in reader.shard_arrays():
        s, i = exact_search_host_batch(
            shard, queries, min(k, shard.shape[0])
        )
        parts_s.append(s)
        parts_i.append(i + offset)
        offset += shard.shape[0]
    cs = np.concatenate(parts_s, axis=1)
    ci = np.concatenate(parts_i, axis=1)
    out_s = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int64)
    for qi in range(nq):
        order = np.lexsort((ci[qi], -cs[qi]))[:k]
        out_s[qi] = cs[qi][order]
        out_i[qi] = ci[qi][order]
    return out_s, out_i


@functools.partial(jax.jit, static_argnames=("k", "interpret", "tree"))
def _pallas_topk_packed(emb: jax.Array, queries: jax.Array, k: int,
                        interpret: bool = False, tree: bool = False):
    """Pallas one-pass kernel + packed (Q, 2k+1) f32 result:
    [scores | float(indices) | ok] — one device->host fetch. Indices ride
    as f32 values (exact below 2**24; see _PACK_MAX_ROWS note above)."""
    return packed_topk(emb, queries, k, "tree" if tree else "block", interpret)


def pallas_search_batch(emb, queries: np.ndarray, k: int):
    """Exact batched top-k via the Pallas one-pass kernels.

    Multi-million-row corpora take the halving-tree kernel (bandwidth-
    bound: ~580 GB/s at 10M bf16 on v5e vs ~230 GB/s for the block kernel);
    smaller ones the per-block selection kernel, whose certification holds
    at mid scale. Certified-exact per query; the rare uncertified rows
    (adversarial mass ties, or corpora too small for the candidate scheme
    — which the engine routes elsewhere anyway) fall back to the exact XLA
    path. Delegates entirely to exact_search_batch when the kernel's shape
    contract (d % 128 == 0, k <= 128) doesn't hold.

    NOTE: callers choosing a kernel by POLICY should go through
    ``best_exact_search_batch`` — the block certificate only becomes
    reliable on large corpora (failure needs >= LEVELS of the top-k in
    one 256-row block; at a few thousand rows that happens for nearly
    every query, so each batch would pay kernel pass + exact fallback,
    i.e. two dispatches). This function honors an EXPLICIT
    kernel="pallas" choice for any shape the kernel accepts.
    """
    from ..ops.topk_pallas import use_tree_kernel

    n, d = emb.shape
    k = min(k, n)
    if d % 128 or k > 128 or n < 512 or n >= _PACK_MAX_ROWS:
        return exact_search_batch(emb, queries, k)
    if k == 0:
        q = np.asarray(queries).shape[0]
        return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
    emb = jnp.asarray(emb)
    queries_d = jnp.asarray(queries, dtype=jnp.float32)
    interpret = jax.default_backend() == "cpu"
    tree = use_tree_kernel(n, k, emb.dtype)
    if queries_d.shape[0] <= 128:  # kernel cap: 128 lanes
        # no [0:128] slice here: slicing a device array is an eager
        # dispatch of its own, and the serving single-query path counts
        # on exactly one dispatch + one packed fetch
        DISPATCH_COUNTS["kernel"] += 1
        DISPATCH_COUNTS["fetch"] += 1
        packed = np.asarray(
            _pallas_topk_packed(emb, queries_d, k, interpret, tree)
        )
        return _unpack_with_fallback(packed, emb, queries_d, k)
    outs = []
    for start in range(0, queries_d.shape[0], 128):
        DISPATCH_COUNTS["kernel"] += 1
        DISPATCH_COUNTS["fetch"] += 1
        outs.append(
            np.asarray(
                _pallas_topk_packed(
                    emb, queries_d[start : start + 128], k, interpret, tree
                )
            )
        )
    packed = np.concatenate(outs, axis=0)
    return _unpack_with_fallback(packed, emb, queries_d, k)


def best_exact_search_batch(emb, queries: np.ndarray, k: int):
    """Measured auto policy (v5e, batch-48): the Pallas one-pass kernel for
    every accelerator corpus. For f32 it wins outright (4.4 vs 7.7 ms net
    at 1M). For bf16 its RAW pass is slightly slower than certified-XLA's
    (37 vs 29 ms at 10M), but bf16-quantized scores tie in exact plateaus
    at the candidate boundary, failing the XLA certification for a few
    queries in almost every batch and triggering ~100 ms exact fallbacks
    (158 ms p50 measured end to end); the Pallas block-local certificate
    only fails when >=4 of the top-k share one 256-row block, which
    cross-corpus tie plateaus do not cause (cert rate 1.000 measured at
    10M bf16). CPU backend takes the XLA path (interpret Pallas is
    test-only). Small corpora (< _FAST_PATH_MIN_ROWS) also take the XLA
    path: with only a handful of 256-row blocks the block certificate
    fails for nearly every query (>= LEVELS of the top-48 share a block)
    and the kernel would pay a full exact fallback — a second dispatch —
    per batch."""
    if (
        jax.default_backend() != "cpu"
        and emb.shape[0] >= _FAST_PATH_MIN_ROWS
    ):
        return pallas_search_batch(emb, queries, k)
    return exact_search_batch(emb, queries, k)


def exact_search_batch(emb, queries: np.ndarray, k: int):
    """Batched exact top-k: queries (Q, d) -> (scores (Q,k), indices (Q,k))."""
    n = emb.shape[0]
    k = min(k, n)
    if k == 0:
        q = np.asarray(queries).shape[0]
        return np.zeros((q, 0), np.float32), np.zeros((q, 0), np.int64)
    if _FAST_PATH_MIN_ROWS <= n < _PACK_MAX_ROWS and k <= 128:
        return _searched_with_fallback(emb, queries, k)
    scores, idx = _topk_batch(jnp.asarray(emb), jnp.asarray(queries), k)
    return np.asarray(scores), np.asarray(idx)
