"""SQ8: certified-exact search over an int8-quantized corpus sidecar.

The capacity tier. A v5e chip holds ~8M f32 / ~16M bf16 rows of corpus in
HBM; folders beyond the budget previously fell back to the host mmap scan
(seconds per batch on one core). SQ8 keeps a quarter/half-sized int8
sidecar on device instead and still returns EXACT results:

  1. device: one Pallas pass over the int8 corpus computes a rigorous
     UPPER BOUND on every row's true score (ops.topk_pallas._make_sq8_kernel)
     and tree-reduces to certified candidates, exactly like the exact tree
     kernel but with bounds in place of scores;
  2. device: hardware ApproxTopK fetches the top-``fetch`` bounds with an
     m-free counting certificate (the fetched set provably equals the
     "bound >= mf" set, mf = lowest fetched bound);
  3. host: the fetched rows are gathered from the mmap store and reranked
     with the SAME score function as the host exact scan
     (index.search.exact_search_host*), then certified: with m = the
     k-th reranked score, ``m >= mf`` proves every row whose bound could
     reach the top-k was fetched, and ``max 3rd-class-bound < m`` proves
     the kernel dropped nothing that mattered. Certified rows are the
     exact top-k under the engine's (score desc, index asc) tie
     contract, scored with the host scan's score function (BLAS f32 —
     reduction order, hence the last ulp, varies with GEMM shape, same
     as between any two exact kernels); uncertified rows (mass ties,
     pathologically flat score distributions) rerun through the host
     batch scan.

Replaces (at beyond-HBM scale) the FAISS IndexFlatIP scan of the
reference (oldapp.py:87, 2005) the same way the exact kernels do within
HBM — no recall loss, ever: a quantization artifact can only cost a
fallback, never a wrong result.
"""

from __future__ import annotations

import functools
import json
import logging
from pathlib import Path

import jax
import numpy as np

log = logging.getLogger("evossearch.index.sq8")

C_BF16 = 2.0 ** -9  # half-ulp relative error of round-to-nearest bf16

_SQ8_VERSION = 1
_F_BIN = "sq8.bin"
_F_SCALES = "sq8_scales.bin"
_F_META = "sq8.json"

# ApproxTopK fetch depth. The certificate needs the k-th EXACT score to
# beat the ``fetch``-th highest BOUND; bounds sit ~radd (~1e-2 for unit
# CLIP rows) above their scores, so the fetch must reach far enough down
# the score tail to clear that gap. 512 clears it with >2x margin at 10M
# random rows (the hardest case - real corpora spread wider); overridable
# via EVOSSEARCH_SQ8_FETCH.
DEFAULT_FETCH = 512

_ID_SPLIT = 4096  # candidate ids ride as f32 hi/lo pairs: both < 2**23


def quantize_rows(rows: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row symmetric int8 quantization + rigorous bound scalars.

    rows: (n, d) float32 (bf16 stores widen first — widening is exact).
    Returns (e8 (n, d) int8, scal2 (2, n) f32 = [scale; radd]).

    Bound derivation, per row ``a`` and query ``q`` (q~ = bf16(q), which
    is ALSO the query the kernel and the bf16 host scan use):

        s = <a, q> = scale*<e8, q> + <r, q>,     r = a - scale*e8
        kernel computes  dot = f32-accum <e8, q~>  (exact products:
          int8 and bf16 both carry <= 8-bit mantissas)
        |<r, q>|  and  |<r, q~>|   <= ||r|| * ||q|| * (1 + C_BF16)
        scale*|<e8, q - q~>|       <= scale*||e8|| * C_BF16 * ||q||
        f32 accumulation error     <= scale*||e8|| * d * 2^-24 * ||q||
          (conservative serial bound, doubled to cover the host rerank
          BLAS accumulation too)

    so  u = dot*scale + radd*||q||  >=  the score ANY of our exact paths
    computes for this row (raw-f32 query or bf16-quantized query). The
    1.05 / 1e-5 / 1e-7 inflations absorb the rounding of the bound FMAs
    themselves; rigor is property-tested in tests/test_sq8.py.
    """
    a = np.ascontiguousarray(rows, np.float32)
    n, d = a.shape
    m = np.abs(a).max(axis=1)
    scale = np.where(m > 0, m / 127.0, 1.0).astype(np.float32)
    # One reused f32 buffer, in-place ops throughout: the f64-temporary
    # formulation ran at 6.6k rows/s on this host (50 min for a 20M
    # sidecar); this one measures 70k rows/s with bit-identical e8. The
    # f32 norm rounding (~1e-7 relative) is absorbed by the (1+4e-3)
    # and 1.05 inflations with >1000x margin.
    q = np.empty_like(a)
    np.divide(a, scale[:, None], out=q)   # true divide: e8 must match
    np.rint(q, out=q)                     # quantize_rows_device exactly
    np.minimum(q, np.float32(127.0), out=q)
    np.maximum(q, np.float32(-127.0), out=q)
    e8 = q.astype(np.int8)
    anorm = scale * np.sqrt(
        (q * q).sum(axis=1, dtype=np.float64)
    ).astype(np.float32)
    q *= scale[:, None]                   # q := scale*ef
    np.subtract(a, q, out=q)              # q := residual r
    rnorm = np.sqrt((q * q).sum(axis=1, dtype=np.float64)).astype(np.float32)
    radd = (
        rnorm * (1 + 4e-3)
        + anorm * (C_BF16 + 2.0 * d * 2.0 ** -24) * 1.05
    ) * (1 + 1e-5) + 1e-7
    scal2 = np.stack([scale, radd.astype(np.float32)])
    return e8, np.ascontiguousarray(scal2, np.float32)


@jax.jit
def quantize_rows_device(a):
    """Device-side quantize_rows (bench/validation; production sidecars
    build host-side from the mmap store). Same bound formula; the f32
    residual computation's own rounding (vs the host path's f64) is
    ~anorm * 2^-24, absorbed by the rnorm inflation with >100x margin."""
    import jax.numpy as jnp

    d = a.shape[1]
    m = jnp.max(jnp.abs(a), axis=1)
    scale = jnp.where(m > 0, m / 127.0, 1.0)
    e8 = jnp.clip(jnp.round(a / scale[:, None]), -127, 127).astype(jnp.int8)
    ef = e8.astype(jnp.float32)
    r = a - scale[:, None] * ef
    rnorm = jnp.sqrt(jnp.sum(r * r, axis=1))
    anorm = scale * jnp.sqrt(jnp.sum(ef * ef, axis=1))
    radd = (
        rnorm * (1 + 4e-3)
        + anorm * (C_BF16 + 2.0 * d * 2.0 ** -24) * 1.05
    ) * (1 + 1e-5) + 1e-7
    return e8, jnp.stack([scale, radd])


@functools.partial(
    jax.jit, static_argnames=("fetch", "tile_rows", "interpret")
)
def _sq8_select(e8, scal2, queries, fetch: int, tile_rows: int,
                interpret: bool):
    """Device half of the SQ8 search: bound sweep + ApproxTopK fetch +
    m-free counting certificate, packed into ONE (Q, 3*fetch + 2) f32
    fetch: [bounds | id_hi | id_lo | cnt_ok | m3max]. Ids ride as
    hi/lo f32 pairs (each < 2**23, exact) so corpora past 2**24 rows —
    the whole point of the capacity tier — don't corrupt indices."""
    import jax
    import jax.numpy as jnp

    from ..ops.topk_pallas import LANES, sq8_candidates

    q = queries.shape[0]
    queries = queries.astype(jnp.float32)
    qn = jnp.linalg.norm(queries, axis=1, keepdims=True)
    if q < LANES:
        d = queries.shape[1]
        queries = jnp.concatenate(
            [queries, jnp.zeros((LANES - q, d), jnp.float32)]
        )
        qn = jnp.concatenate([qn, jnp.zeros((LANES - q, 1), jnp.float32)])
    cs, ci, m3 = sq8_candidates(e8, scal2, queries, qn, tile_rows, interpret)
    cand_s = cs[:q]
    cand_i = ci[:q]
    m3max = jnp.max(m3[:q], axis=1)
    fb, fpos = jax.lax.approx_max_k(
        cand_s, fetch, recall_target=0.999, aggregate_to_topk=True
    )
    fid = jnp.take_along_axis(cand_i, fpos, axis=1)
    mf = fb[:, -1]
    ge_all = jnp.sum(cand_s >= mf[:, None], axis=1)
    ge_got = jnp.sum(fb >= mf[:, None], axis=1)
    cnt_ok = (ge_all == ge_got).astype(jnp.float32)
    hi = jnp.floor_divide(fid, _ID_SPLIT).astype(jnp.float32)
    lo = jnp.mod(fid, _ID_SPLIT).astype(jnp.float32)
    return jnp.concatenate(
        [fb, hi, lo, cnt_ok[:, None], m3max[:, None]], axis=1
    )


def rerank_and_certify(index, queries: np.ndarray, ids: np.ndarray,
                       finite: np.ndarray, k: int, cert):
    """Shared host half of both SQ8 tiers (one-chip and mesh-sharded):
    gather the candidate rows off the mmap store, rerank every query
    with ONE BLAS GEMM, rank under the (score desc, index asc) tie
    contract, and rerun queries whose certificate fails through the
    host exact scan. ``cert(qi, m)`` decides, given the k-th reranked
    score m, whether query qi's result is proven exact — the only part
    that differs between the tiers."""
    nq = queries.shape[0]
    uniq = np.unique(ids)
    rows = index._gather_rows(uniq)
    rq = index._rerank_queries(queries)
    rs = rows @ rq.T  # (m, Q): one BLAS GEMM reranks every query
    pos = np.searchsorted(uniq, ids)

    out_s = np.empty((nq, k), np.float32)
    out_i = np.empty((nq, k), np.int64)
    fail: list[int] = []
    for qi in range(nq):
        s = np.where(finite[qi], rs[pos[qi], qi], -np.inf)
        order = np.lexsort((ids[qi], -s))[:k]
        out_s[qi] = s[order]
        out_i[qi] = ids[qi][order]
        m = out_s[qi, k - 1]
        if not (np.isfinite(m) and cert(qi, m)):
            fail.append(qi)
    if fail:
        if index.counters is not None:
            index.counters.add("sq8_fallback_queries", len(fail))
        from .search import exact_search_host_reader_batch

        fs, fi = exact_search_host_reader_batch(
            index.reader, queries[fail], k
        )
        out_s[fail] = fs
        out_i[fail] = fi
    return out_s, out_i


class SQ8Index:
    """Int8 sidecar + certified search over a shard-store reader.

    Build/persist is pure host numpy (chunked over the mmap shards — an
    over-budget corpus by definition can't ride through the device);
    search holds only the int8 matrix + (2, n) scalars on device.
    """

    def __init__(self, e8: np.ndarray, scal2: np.ndarray, reader,
                 fetch: int = DEFAULT_FETCH, tile_rows: int | None = None):
        from ..ops.topk_pallas import SQ8_TILE_ROWS

        self.e8 = e8            # (n, d) int8 (mmap or ndarray)
        self.scal2 = scal2      # (2, n) f32
        self.reader = reader
        self.n, self.dim = e8.shape
        self.fetch = fetch
        # The class certificate needs many (tile, residue-class) cells to
        # spread the top-k over (cells = 128 * n / tile); the default tile
        # is sized for the multi-million-row corpora this tier exists for,
        # tests shrink it.
        self.tile_rows = tile_rows or SQ8_TILE_ROWS
        self._e8_d = None
        self._scal2_d = None
        # optional evossearch_tpu.utils counters sink (the engine sets it
        # at install time); uncertified fallbacks land in
        # `sq8_fallback_queries` so operators can see certificate health
        self.counters = None

    # -- persistence ------------------------------------------------------

    @classmethod
    def build_from_reader(cls, reader, fetch: int = DEFAULT_FETCH,
                          chunk: int = 1 << 18,
                          store_mtime: float | None = None) -> "SQ8Index":
        """Quantize the store into staged sidecar files and publish them
        (write + rename — a crashed build never leaves a loadable
        half-sidecar). Direct-to-memmap: peak host RAM is one chunk.

        ``store_mtime`` (the manifest mtime the caller's reader was
        opened under) is stamped into the meta: a build that races a
        re-index publishes sidecar files NEWER than the new manifest,
        which the engine's file-mtime freshness rule alone would accept
        — but the stamp pins the sidecar to the exact store generation
        its bounds were derived from (stale bounds are not upper bounds
        for the new rows, so a mismatch must read as "no sidecar")."""
        root = Path(reader.root)
        tmp_bin = root / (_F_BIN + ".tmp")
        tmp_sc = root / (_F_SCALES + ".tmp")
        tmp_meta = root / (_F_META + ".tmp")
        n, d = reader.count, reader.dim
        e8 = np.memmap(tmp_bin, dtype=np.int8, mode="w+", shape=(n, d))
        scal2 = np.memmap(tmp_sc, dtype=np.float32, mode="w+", shape=(2, n))
        off = 0
        for shard in reader.shard_arrays():
            for s in range(0, shard.shape[0], chunk):
                blk = np.asarray(shard[s : s + chunk], np.float32)
                q8, sc = quantize_rows(blk)
                e8[off : off + len(q8)] = q8
                scal2[:, off : off + len(q8)] = sc
                off += len(q8)
        e8.flush()
        scal2.flush()
        meta = {
            "version": _SQ8_VERSION, "count": n, "dim": d,
            "src_dtype": reader.dtype_name,
        }
        if store_mtime is not None:
            meta["store_mtime"] = store_mtime
        tmp_meta.write_text(json.dumps(meta))
        # bins first, meta LAST: the meta rename publishes the sidecar
        tmp_bin.replace(root / _F_BIN)
        tmp_sc.replace(root / _F_SCALES)
        tmp_meta.replace(root / _F_META)
        return cls(
            np.memmap(root / _F_BIN, dtype=np.int8, mode="r", shape=(n, d)),
            np.asarray(
                np.memmap(root / _F_SCALES, dtype=np.float32, mode="r",
                          shape=(2, n))
            ),
            reader, fetch=fetch,
        )

    @classmethod
    def load(cls, reader, fetch: int = DEFAULT_FETCH,
             store_mtime: float | None = None) -> "SQ8Index | None":
        """Open a persisted sidecar; None on any anomaly (missing files,
        count/dim/dtype mismatch, short bins) — the engine then rebuilds.
        Coarse staleness vs the store manifest is the CALLER's check
        (same file-mtime rule as the IVF sidecars); pass ``store_mtime``
        to additionally require the build-time stamp to match the exact
        store generation (sidecars written before the stamp existed
        carry none and pass — the file-mtime rule covers them)."""
        root = Path(reader.root)
        try:
            meta = json.loads((root / _F_META).read_text())
            if (
                meta.get("version") != _SQ8_VERSION
                or meta.get("count") != reader.count
                or meta.get("dim") != reader.dim
                or meta.get("src_dtype") != reader.dtype_name
            ):
                return None
            if (
                store_mtime is not None
                and "store_mtime" in meta
                and meta["store_mtime"] != store_mtime
            ):
                return None
            n, d = reader.count, reader.dim
            if (root / _F_BIN).stat().st_size != n * d:
                return None
            if (root / _F_SCALES).stat().st_size != 2 * n * 4:
                return None
            e8 = np.memmap(root / _F_BIN, dtype=np.int8, mode="r",
                           shape=(n, d))
            scal2 = np.asarray(
                np.memmap(root / _F_SCALES, dtype=np.float32, mode="r",
                          shape=(2, n))
            )
        except Exception:
            return None
        return cls(e8, scal2, reader, fetch=fetch)

    @staticmethod
    def sidecar_mtime(reader) -> float | None:
        try:
            return (Path(reader.root) / _F_META).stat().st_mtime
        except OSError:
            return None

    def device_bytes(self) -> int:
        return self.n * self.dim + 8 * self.n

    # -- search -----------------------------------------------------------

    def ensure_device(self) -> None:
        """Materialize the int8 matrix + scalars on device (the caller —
        the engine — reserves the HBM budget first)."""
        if self._e8_d is None:
            import jax.numpy as jnp

            self._e8_d = jnp.asarray(np.ascontiguousarray(self.e8))
            self._scal2_d = jnp.asarray(self.scal2)

    def _gather_rows(self, ids: np.ndarray) -> np.ndarray:
        """Widened f32 rows for sorted-unique global ids, straight off
        the mmap shards — the rerank reads ~fetch rows/query, not the
        corpus."""
        out = np.empty((ids.shape[0], self.dim), np.float32)
        off = 0
        for shard in self.reader.shard_arrays():
            hi = off + shard.shape[0]
            m = (ids >= off) & (ids < hi)
            if m.any():
                out[m] = np.asarray(shard[ids[m] - off], np.float32)
            off = hi
        return out

    def _rerank_queries(self, queries: np.ndarray) -> np.ndarray:
        """The query the score contract demands: bf16 stores quantize it
        to bf16 first (index.search.exact_search_host does the same), so
        certified SQ8 scores are the host scan's score function applied
        to the same operands (agreeing to BLAS f32 reduction rounding)."""
        if self.reader.dtype_name == "bfloat16":
            from .store import _dtype_of

            return queries.astype(_dtype_of("bfloat16")).astype(np.float32)
        return queries

    def search_batch(self, queries: np.ndarray, k: int):
        """(Q, d) queries -> exact (scores (Q, k) f32, ids (Q, k) i64)
        under the global (score desc, index asc) tie contract."""
        import jax.numpy as jnp

        from ..ops.topk_pallas import TREE_CLASSES
        from .search import query_row_bucket

        queries = np.asarray(queries, np.float32)
        nq = queries.shape[0]
        k = min(k, self.n)
        if k == 0 or nq == 0:
            return (np.zeros((nq, k), np.float32),
                    np.zeros((nq, k), np.int64))
        from ..ops.topk_pallas import LANES as _LANES

        if nq > _LANES:
            # the kernel reads only the first LANES query rows (fixed
            # BlockSpec); chunk like pallas_search_batch does
            parts = [
                self.search_batch(queries[i : i + _LANES], k)
                for i in range(0, nq, _LANES)
            ]
            return (np.concatenate([p[0] for p in parts]),
                    np.concatenate([p[1] for p in parts]))
        self.ensure_device()
        tile = self.tile_rows
        grid = -(-self.n // tile)
        c_total = grid * 2 * TREE_CLASSES
        fetch = min(max(self.fetch, k + 32), c_total)
        full_fetch = fetch == c_total
        # bucket the query count: the jit specializes on Q (serving
        # ladder shared with every device kernel)
        pad = query_row_bucket(nq)
        qpad = queries
        if pad > nq:
            qpad = np.concatenate(
                [queries, np.broadcast_to(queries[:1], (pad - nq, queries.shape[1]))]
            )
        interpret = jax.default_backend() == "cpu"
        packed = np.asarray(_sq8_select(
            self._e8_d, self._scal2_d, jnp.asarray(qpad),
            fetch, tile, interpret,
        ))[:nq]
        fb = packed[:, :fetch]
        ids = (
            packed[:, fetch : 2 * fetch].astype(np.int64) * _ID_SPLIT
            + packed[:, 2 * fetch : 3 * fetch].astype(np.int64)
        )
        cnt_ok = packed[:, -2] > 0
        m3max = packed[:, -1]
        mf = fb[:, -1]
        # -inf-bound slots (tiny/tail-only classes) carry garbage ids:
        # keep them out of the gather and the ranking
        finite = np.isfinite(fb) & (fb > np.float32(np.finfo(np.float32).min) / 2)
        ids = np.where(finite, ids, 0)

        def cert(qi: int, m: float) -> bool:
            return bool(
                m3max[qi] < m
                and (full_fetch or (cnt_ok[qi] and m >= mf[qi]))
            )

        return rerank_and_certify(self, queries, ids, finite, k, cert)
