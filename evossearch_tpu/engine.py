"""SearchEngine — the L2 engine layer tying tokenizer, CLIP towers, the
fused preprocess, and the shard store into the operations the HTTP layer
needs (reference counterpart: module-level functions + globals in
oldapp.py:21-135).

Differences from the reference, all deliberate:
  * encoders are jitted once and batched (padded to fixed bucket sizes so
    XLA compiles a handful of shapes, not one per request);
  * loaded indexes are cached on device keyed by manifest mtime — the
    reference re-reads FAISS + pickles from disk on every request
    (oldapp.py:1993);
  * weights come from a converted OpenAI/HF checkpoint when configured,
    else deterministic random init (this image ships no CLIP weights).
"""

from __future__ import annotations

import functools
import threading
import time
from collections import OrderedDict

import numpy as np

from .core import CLIP_MODEL_SPECS, Config, config as default_config
from .core.constants import CLIPModelSpec
from .index import build_index
from .index.store import IndexReader
from .tokenizer import load_tokenizer
from .utils import Counters, StageTimer, get_logger

log = get_logger("engine")

_UNSET = object()  # _batcher's lock-free "not initialized" sentinel


def _bucket(n: int, cap: int) -> int:
    """Smallest power-of-two >= n, capped — bounds jit recompiles."""
    b = 1
    while b < n and b < cap:
        b <<= 1
    return min(b, cap)


class PendingEmbeddings:
    """Deferred result of ``encode_prepared*(..., fetch=False)``: the fused
    dispatches are in flight on device; :meth:`resolve` performs the
    device->host fetch (a pure relay round trip once the compute has
    finished under subsequent host work) and returns the (n, embed_dim)
    float32 embeddings. Single-use."""

    def __init__(self, buckets: list, n: int, engine: "SearchEngine"):
        self._buckets = buckets
        self._n = n
        self._engine = engine

    def resolve(self) -> np.ndarray:
        eng = self._engine
        if self._n == 0:
            return np.zeros((0, eng.spec.embed_dim), np.float32)
        with eng.timers.stage("prep_encode_fetch"):
            out = [np.asarray(b, np.float32) for b in self._buckets]
        self._buckets = []  # free the device buffers promptly
        emb = np.concatenate(out, axis=0)[: self._n]
        eng.counters.add("images_encoded", self._n)
        return emb


def _canon(folder: str) -> str:
    """Canonical cache/lock key for a folder: two clients naming the same
    physical directory differently (relative vs absolute, `a/../b`,
    symlinks) must take the same per-folder lock and cache slot, or the
    serialization those locks provide is defeated."""
    import os

    return os.path.realpath(folder)


class SearchEngine:
    def __init__(
        self,
        cfg: Config | None = None,
        spec: CLIPModelSpec | None = None,
        params: dict | None = None,
    ):
        self.cfg = cfg or default_config
        if spec is None and self.cfg.CLIP_MODEL not in CLIP_MODEL_SPECS:
            # mirror clip.load's clear failure (oldapp.py:28): name the
            # bad knob and the valid set instead of a bare KeyError
            raise ValueError(
                f"unknown CLIP model {self.cfg.CLIP_MODEL!r} "
                f"(EVOSSEARCH_CLIP_MODEL); available: "
                f"{', '.join(CLIP_MODEL_SPECS)}"
            )
        self.spec = spec or CLIP_MODEL_SPECS[self.cfg.CLIP_MODEL]
        self.tokenizer = load_tokenizer(self.cfg.BPE_VOCAB_PATH or None)
        self._params = params
        self._params_lock = threading.Lock()
        if params is None and self.cfg.CHECKPOINT_PATH:
            # Load eagerly: the checkpoint may carry a different
            # architecture, and _load_params overwrites self.spec — which
            # the cached jit encoders and index manifests capture. Lazy
            # loading would let them capture the stale default spec.
            self._params = self._load_params()
        # Per-folder search-state cache, LRU-bounded: each entry can pin a
        # corpus-sized device array, so unbounded growth would eat HBM.
        self._index_cache: "OrderedDict[str, dict]" = OrderedDict()
        self._cache_lock = threading.Lock()
        self._max_cached_folders = 4
        # Serializes concurrent /index runs per folder (the staging dir is
        # per-folder; the reference's single-threaded server never races).
        self._folder_locks: dict[str, threading.Lock] = {}
        # LRU of text -> device embedding (see _encode_text_device)
        self._text_cache: "OrderedDict[str, object]" = OrderedDict()
        self._text_cache_lock = threading.Lock()
        # LRU of content-keyed device resample matrices (see _device_mats)
        self._mat_cache: "OrderedDict[tuple, tuple]" = OrderedDict()
        self._mat_cache_lock = threading.Lock()
        self.timers = StageTimer()
        self.counters = Counters()

    def close(self) -> None:
        """Stop the batcher worker threads. Engines are usually
        process-lifetime singletons; close() exists for benches/tests
        that create several engines so worker threads don't accumulate."""
        for attr in (
            "_batcher_inst", "_host_batcher_inst", "_text_batcher_inst",
            "_fused_batcher_inst",
        ):
            inst = self.__dict__.get(attr)
            if inst is not None:
                inst.close()

    # -- model/params --

    @property
    def params(self) -> dict:
        with self._params_lock:
            if self._params is None:
                self._params = self._load_params()
            return self._params

    def _load_params(self) -> dict:
        import jax

        path = self.cfg.CHECKPOINT_PATH
        if path:
            if path.endswith(".npz"):  # our native checkpoint format
                from .models.checkpoint import load_params

                params, spec = load_params(path)
            else:  # OpenAI .pt / HF directory
                from .models import load_checkpoint

                params, spec = load_checkpoint(path)
            self.spec = spec
            log.info("loaded checkpoint %s (%s)", path, spec.name)
            return jax.device_put(params)
        log.warning(
            "no checkpoint configured (EVOSSEARCH_CHECKPOINT); using "
            "deterministic random-init %s weights", self.spec.name,
        )
        from .models import init_params

        return init_params(jax.random.key(0), self.spec)

    @functools.cached_property
    def _compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.cfg.COMPUTE_DTYPE == "bfloat16" else jnp.float32

    # -- encoders --

    # index.builder._pipelined_build probes this to pipeline batch N's
    # fetch under batch N+1's dispatch via encode_prepared*(fetch=False)
    supports_deferred_fetch = True

    @functools.cached_property
    def _jit_encode_text(self):
        import jax

        from .models import encode_text

        spec, dtype = self.spec, self._compute_dtype

        @jax.jit
        def fn(params, tokens):
            return encode_text(params, tokens, spec, compute_dtype=dtype)

        return fn

    @functools.cached_property
    def _jit_text_search(self):
        """ONE fused XLA program for the fresh-text serving path: text
        tower + corpus top-k, returning a single packed (B, 2k+1+d) f32
        array [scores | float(indices) | ok | query embeddings]. A
        text-cache-miss search is then exactly one device dispatch + one
        packed fetch — the split encode-then-search chain paid ~3 RPC
        round trips per request on this rig's relay (each with the
        ~27 ms floor), which dominated HTTP serving throughput. The
        embedding columns ride home in the same fetch to seed the text
        cache. The corpus is an explicit argument (never a closure
        constant — see the dev-guide relay hazard); the selection flavor
        is static and chosen per corpus by index.search.choose_packed_flavor
        so rankings match the two-stage path's kernel routing."""
        import jax
        import jax.numpy as jnp

        from .index.search import packed_topk
        from .models import encode_text

        spec, dtype = self.spec, self._compute_dtype

        @functools.partial(
            jax.jit, static_argnames=("k", "flavor", "interpret")
        )
        def fn(params, tokens, emb, k, flavor, interpret):
            q = encode_text(params, tokens, spec, compute_dtype=dtype)
            packed = packed_topk(emb, q, k, flavor, interpret)
            return jnp.concatenate([packed, q], axis=1)

        return fn

    @functools.cached_property
    def _jit_prep_encode(self):
        """One fused XLA program: resample+crop+normalize+ViT encode.

        The north-star 'fused preprocessing stage feeding the encoder':
        canvases go to the device once; everything to the embedding happens
        in a single compiled computation.
        """
        import functools as _ft

        import jax

        from .models import encode_image
        from .preprocess import device_preprocess_indexed

        spec, dtype = self.spec, self._compute_dtype
        # Sequence-merge: run 2 images as one masked sequence when the ViT
        # sequence is short (<128 tokens, i.e. B/32's 50) — the attention
        # batched matmuls underfeed the MXU otherwise (measured 1.57x on
        # the tower at batch 512 on v5e). Identical math (models/clip.py).
        want_merge = 2 if (
            spec.family == "vit" and spec.num_image_tokens < 128
            and jax.default_backend() != "cpu"
        ) else 1

        @_ft.partial(jax.jit, static_argnames=("m",))
        def fn(params, canvases, a_h_u, a_w_u, size_idx, m=1):
            x = device_preprocess_indexed(
                canvases, a_h_u, a_w_u, size_idx, out_dtype=dtype
            )
            return encode_image(params, x, spec, compute_dtype=dtype, seq_merge=m)

        def dispatch(params, canvases, a_h_u, a_w_u, size_idx):
            m = want_merge if canvases.shape[0] % 2 == 0 else 1
            return fn(params, canvases, a_h_u, a_w_u, size_idx, m=m)

        return dispatch

    @functools.cached_property
    def _jit_prep_encode_planar(self):
        """Planar twin of _jit_prep_encode: fused chroma-upsampling
        resample + YCbCr->RGB + normalize + ViT encode in ONE XLA program.
        Fed by the planar JPEG decode path (native decode_jpeg_planar),
        which halves the host->device canvas bytes."""
        import functools as _ft

        import jax

        from .models import encode_image
        from .preprocess import device_preprocess_planar_indexed

        spec, dtype = self.spec, self._compute_dtype
        want_merge = 2 if (
            spec.family == "vit" and spec.num_image_tokens < 128
            and jax.default_backend() != "cpu"
        ) else 1

        @_ft.partial(jax.jit, static_argnames=("m",))
        def fn(params, y, c, a_h_y, a_w_y, a_h_c, a_w_c, size_idx, m=1):
            x = device_preprocess_planar_indexed(
                y, c, a_h_y, a_w_y, a_h_c, a_w_c, size_idx, out_dtype=dtype
            )
            return encode_image(params, x, spec, compute_dtype=dtype, seq_merge=m)

        def dispatch(params, y, c, a_h_y, a_w_y, a_h_c, a_w_c, size_idx):
            m = want_merge if y.shape[0] % 2 == 0 else 1
            return fn(params, y, c, a_h_y, a_w_y, a_h_c, a_w_c, size_idx, m=m)

        return dispatch

    @functools.cached_property
    def _encode_sharding(self):
        """Batch-axis NamedSharding for data-parallel indexing encode, or
        None on a single device. SURVEY §2 parallelism row 1: shard image
        batches across the mesh for indexing throughput — each device
        encodes 1/n of every batch, params are replicated by XLA."""
        import jax

        devices = jax.devices()
        if len(devices) <= 1 or not self.cfg.DP_ENCODE:
            return None
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        mesh = Mesh(np.array(devices), ("data",))
        return NamedSharding(mesh, PartitionSpec("data"))

    @property
    def _index_batch(self) -> int:
        """Images per fused device dispatch in the indexing pipeline —
        also the encode bucket cap. Bigger than the reference-parity
        BATCH_SIZE serving default: every dispatch pays the host->device
        RPC floor and ships the batch's resample matrices."""
        return self.cfg.INDEX_BATCH or max(self.cfg.BATCH_SIZE, 128)

    def _device_mats(self, mats: tuple) -> tuple:
        """Device-resident cache of per-batch resample weight matrices.

        Indexing a homogeneous folder re-ships IDENTICAL matrix stacks
        with every batch (e.g. ~0.8 MB x 48 batches for one source size)
        — on upload-bound rigs that's pure waste. Key on content (shape +
        blake2b of the bytes, ~1 ms per MB) and keep a small LRU of
        device copies; under DP encode the copies are mesh-replicated so
        they compose with batch-sharded canvases."""
        import hashlib

        key = tuple(
            (m.shape, hashlib.blake2b(m.tobytes(), digest_size=16).digest())
            for m in mats
        )
        with self._mat_cache_lock:
            cached = self._mat_cache.get(key)
            if cached is not None:
                self._mat_cache.move_to_end(key)
                return cached
        import jax

        sharding = self._encode_sharding
        if sharding is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = NamedSharding(sharding.mesh, PartitionSpec())
            out = tuple(jax.device_put(m, rep) for m in mats)
        else:
            out = tuple(jax.device_put(m) for m in mats)
        with self._mat_cache_lock:
            self._mat_cache[key] = out
            self._mat_cache.move_to_end(key)
            while len(self._mat_cache) > 16:
                self._mat_cache.popitem(last=False)
        return out

    def _encode_prepared_impl(
        self, canvases: tuple, mats: tuple, size_idx: np.ndarray,
        fetch: bool, dispatch,
    ):
        """The bucket/DP-pad/two-in-flight pipeline shared by
        encode_prepared (one RGB canvas) and encode_prepared_planar
        (Y + chroma canvases); ``dispatch(canvas_batches, mats, idx)``
        issues the fused jit for one bucket.

        Two buckets in flight: fetching each bucket's embeddings
        synchronously serialized upload -> compute -> fetch per bucket;
        a bounded window lets bucket i+1's host->device transfer and
        dispatch overlap bucket i's execution and fetch, while capping
        live device canvases at 2 buckets of HBM."""
        import jax

        n = canvases[0].shape[0]
        if n == 0:
            empty = np.zeros((0, self.spec.embed_dim), np.float32)
            return empty if fetch else PendingEmbeddings([], 0, self)
        b = _bucket(n, max(self._index_batch, 1))
        sharding = self._encode_sharding
        if sharding is not None:
            ndev = len(sharding.mesh.devices)
            if b % ndev:  # pad the bucket so every device gets equal rows
                b = -(-b // ndev) * ndev
        if n < b or n % b:
            pad = -(-n // b) * b - n
            canvases = tuple(
                np.concatenate([c, np.zeros((pad,) + c.shape[1:], c.dtype)])
                for c in canvases
            )
            size_idx = np.concatenate([size_idx, np.zeros(pad, size_idx.dtype)])
        mats = self._device_mats(mats)
        out = []
        in_flight: list = []
        with self.timers.stage("prep_encode"):
            for start in range(0, canvases[0].shape[0], b):
                sl = slice(start, start + b)
                batches = tuple(c[sl] for c in canvases)
                # metering for rig-bound accounting (bench_index): canvas
                # bytes actually shipped host->device this dispatch
                self.counters.add(
                    "upload_canvas_bytes",
                    sum(int(c.nbytes) for c in batches),
                )
                if sharding is not None:
                    batches = tuple(
                        jax.device_put(c, sharding) for c in batches
                    )
                in_flight.append(dispatch(batches, mats, size_idx[sl]))
                if fetch and len(in_flight) >= 2:
                    out.append(np.asarray(in_flight.pop(0)))
            if not fetch:
                return PendingEmbeddings(in_flight, n, self)
            out.extend(np.asarray(o) for o in in_flight)
        emb = np.concatenate(out, axis=0)[:n]
        self.counters.add("images_encoded", n)
        return emb

    def encode_prepared(
        self, canvases: np.ndarray, a_h_u: np.ndarray, a_w_u: np.ndarray,
        size_idx: np.ndarray, fetch: bool = True,
    ):
        """Host-prepared batch (canvases + unique-size resample matrices +
        per-image size index) -> (B, embed_dim) embeddings via the fused
        program; pads the batch to a bucket size. With >1 device the batch
        axis is sharded across the mesh (per-image math is independent, so
        sharded results are identical to single-device).

        ``fetch=False`` returns a :class:`PendingEmbeddings` instead of a
        numpy array: the dispatches are issued but the device->host fetch
        is deferred to ``.resolve()``. The indexing pipeline uses this to
        overlap batch N's fetch (a pure relay round trip by then — the
        compute finished under batch N+1's decode) with further host work
        instead of serializing upload -> compute -> fetch per batch."""
        return self._encode_prepared_impl(
            (canvases,), (a_h_u, a_w_u), size_idx, fetch,
            lambda cs, mats, idx: self._jit_prep_encode(
                self.params, cs[0], *mats, idx
            ),
        )

    def encode_prepared_planar(
        self, y_canvas: np.ndarray, c_canvas: np.ndarray,
        a_h_y: np.ndarray, a_w_y: np.ndarray,
        a_h_c: np.ndarray, a_w_c: np.ndarray, size_idx: np.ndarray,
        fetch: bool = True,
    ):
        """prepare_batch_planar output -> (B, embed_dim) embeddings via
        the fused planar program; same bucket padding, DP sharding,
        two-bucket pipelining, and ``fetch=False`` deferral as
        encode_prepared (shared _encode_prepared_impl)."""
        return self._encode_prepared_impl(
            (y_canvas, c_canvas), (a_h_y, a_w_y, a_h_c, a_w_c), size_idx,
            fetch,
            lambda cs, mats, idx: self._jit_prep_encode_planar(
                self.params, cs[0], cs[1], *mats, idx
            ),
        )

    def encode_images(self, images: list) -> np.ndarray:
        """PIL images / uint8 RGB arrays -> (B, embed_dim) L2-normalized
        float32 embeddings via the fused preprocess+encode program."""
        from .preprocess import prepare_batch

        if len(images) == 0:
            return np.zeros((0, self.spec.embed_dim), np.float32)
        arrays = []
        for img in images:
            if isinstance(img, np.ndarray):
                arrays.append(img)
            else:
                if img.mode != "RGB":
                    img = img.convert("RGB")
                arrays.append(np.asarray(img, dtype=np.uint8))
        from .preprocess.pipeline import MAX_UNIQUE_SIZES

        # Split into groups of <= MAX_UNIQUE_SIZES distinct sizes: the
        # per-unique-size resample matrices scale with U and would blow up
        # on a large batch where every image has its own size.
        groups: list[list] = [[]]
        sizes: set = set()
        for a in arrays:
            hw = a.shape[:2]
            if hw not in sizes and len(sizes) >= MAX_UNIQUE_SIZES:
                groups.append([])
                sizes = set()
            groups[-1].append(a)
            sizes.add(hw)
        outs = []
        for group in groups:
            with self.timers.stage("preprocess"):
                canvases, a_h_u, a_w_u, size_idx = prepare_batch(
                    group, target=self.spec.image_size
                )
            outs.append(
                self.encode_prepared(canvases, a_h_u, a_w_u, size_idx)
            )
        return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)

    def encode_image_device(self, img):
        """One image -> (1, embed_dim) DEVICE row — the image twin of
        :meth:`_encode_text_device`. The fused preprocess+encode dispatch
        is issued but NOT fetched (the encoders emit float32, so the row
        is bit-identical to the fetched path); the follow-on search
        dispatch chains on device, so the whole upload->encode->search
        chain pays ONE blocking round trip (the packed result fetch)
        instead of two — on this rig's ~27 ms-floor relay that halves
        /search_by_image latency. Reference counterpart:
        oldapp.py:2092-2112 (PIL -> encode_image -> index.search, each a
        separate device round trip)."""
        from .preprocess import prepare_batch

        if not isinstance(img, np.ndarray):
            if img.mode != "RGB":
                img = img.convert("RGB")
            img = np.asarray(img, dtype=np.uint8)
        with self.timers.stage("preprocess"):
            canvases, a_h_u, a_w_u, size_idx = prepare_batch(
                [img], target=self.spec.image_size
            )
        pend = self.encode_prepared(
            canvases, a_h_u, a_w_u, size_idx, fetch=False
        )
        self.counters.add("images_encoded", 1)  # resolve() is never called
        # async row slice: a dispatch, but not a blocking fetch
        return pend._buckets[0][0:1]

    def encode_text(self, text: str) -> np.ndarray:
        """Query text -> (embed_dim,) L2-normalized float32 embedding.

        With the byte-level fallback tokenizer (~1 token/byte, no vocab
        asset configured) any query over ~75 bytes would overflow the
        context and raise; truncate in that mode so moderate queries work.
        With a real vocab, overflow raises like `clip.tokenize` does in the
        reference (-> HTTP 500, oldapp.py error path).
        """
        return np.asarray(self._encode_text_device(text))[0]

    def _encode_text_device(self, text: str):
        """encode_text but leaving the embedding ON DEVICE as a (1, d)
        row — the serving path feeds it straight into the batched search
        dispatch, avoiding a device->host->device round trip per query.

        The 2-D shape is deliberate: slicing/reshaping a device array
        (``emb[0]``, ``emb[None, :]``) is an eager dispatch of its own,
        and on this rig every dispatch pays the ~30 ms relay RPC floor —
        keeping the row (1, d) end to end makes a cache-hit text search
        exactly ONE kernel dispatch + one packed fetch (VERDICT r3 #2).

        Repeated queries (users iterate on the same few phrases; the
        frontend re-submits on sort changes) hit a small LRU instead of
        re-dispatching the text tower — params are immutable for the
        engine's lifetime, so a cached embedding never goes stale."""
        with self._text_cache_lock:
            cached = self._text_cache.get(text)
            if cached is not None:
                self._text_cache.move_to_end(text)
                self.counters.add("text_cache_hits")
                return cached
        with self.timers.stage("encode_text"):
            tokens = self.tokenizer.tokenize(
                [text], self.spec.context_length,
                truncate=self.tokenizer.fallback,
            )
            batcher = self._text_batcher
            if batcher is not None:
                emb = batcher.submit(np.asarray(tokens[0], np.int32))
            else:
                emb = self._jit_encode_text(self.params, tokens)
        self.counters.add("texts_encoded")
        self._text_cache_put(text, emb)
        return emb

    def _text_cache_put(self, text: str, emb) -> None:
        """Insert an embedding ((1, d) device row or numpy row — both
        flow into every search path) into the LRU text cache."""
        with self._text_cache_lock:
            self._text_cache[text] = emb
            self._text_cache.move_to_end(text)
            while len(self._text_cache) > 1024:  # ~2 MB of 512-d f32
                self._text_cache.popitem(last=False)

    # -- index operations --

    def index_folder(
        self, folder: str, resume: bool = False, incremental: bool | None = None
    ) -> int:
        """Batched (re)index of a folder; returns row count (0 = no images)."""
        if incremental is None:
            incremental = self.cfg.INCREMENTAL_INDEX
        with self._folder_lock(folder), self.timers.stage("index_folder"):
            count = build_index(
                folder,
                pipeline_encoder=self,
                incremental=incremental,
                model_name=self.spec.name,
                dim=self.spec.embed_dim,
                batch_size=self._index_batch,
                dtype_name=self.cfg.STORE_DTYPE,
                extensions=self.cfg.SUPPORTED_EXTENSIONS,
                index_folder_name=self.cfg.INDEX_FOLDER_NAME,
                resume=resume,
                rows_per_shard=self.cfg.SHARD_SIZE,
                fast_decode=self.cfg.FAST_DECODE,
                decode_short_side=(
                    self.cfg.DECODE_SHORT_SIDE or self.spec.image_size
                ),
                planar=self.cfg.PLANAR_JPEG,
            )
        with self._cache_lock:
            self._index_cache.pop(_canon(folder), None)
        return count

    def _folder_lock(self, folder: str) -> threading.Lock:
        with self._cache_lock:
            return self._folder_locks.setdefault(_canon(folder), threading.Lock())

    def open_index(self, folder: str) -> IndexReader | None:
        from pathlib import Path

        reader = IndexReader.open(folder, self.cfg.INDEX_FOLDER_NAME)
        if (
            reader is None
            and self.cfg.MIGRATE_LEGACY
            # Only take the folder lock when legacy artifacts actually
            # exist: the lock is shared with /index runs, and grabbing it
            # for every not-yet-indexed folder made /check_index and
            # /search block behind a whole first-time indexing run
            # instead of answering "not indexed".
            and (
                Path(folder) / self.cfg.INDEX_FOLDER_NAME / "index.faiss"
            ).exists()
        ):
            from .index.legacy import migrate_legacy_index

            # Migration rewrites the index dir; serialize with /index runs
            # and concurrent first-touch requests (racing writers would
            # destroy the legacy files without publishing a replacement).
            with self._folder_lock(folder):
                reader = IndexReader.open(folder, self.cfg.INDEX_FOLDER_NAME)
                if reader is None:
                    migrated = migrate_legacy_index(
                        folder, self.spec.name, self.spec.embed_dim,
                        self.cfg.INDEX_FOLDER_NAME,
                    )
                    # `is not None`: a legitimate 0-row legacy index
                    # migrates to a published empty index (count 0) and
                    # must read as indexed, like the reference's
                    # load_index would.
                    if migrated is not None:
                        reader = IndexReader.open(
                            folder, self.cfg.INDEX_FOLDER_NAME
                        )
        return reader

    def _cached_index(self, folder: str):
        """Per-folder search-state cache, invalidated by manifest mtime.

        The cache entry lazily materializes whichever representation the
        configured kernel needs: device matrix (xla/pallas), ShardedIndex
        (mesh), IVFIndex (approximate), or nothing (host scan reads the
        mmap directly).
        """
        from .index.store import index_dir

        key = _canon(folder)
        # Invalidation token is a cheap manifest stat — a full
        # IndexReader.open re-parses O(corpus) JSON and must only happen on
        # miss/change, not per query. The stat is retried once after a
        # short sleep: finalize()'s two-rename publish has a microsecond
        # window where manifest.json is absent, and a query landing inside
        # it would otherwise get a spurious "not indexed".
        manifest_path = (
            index_dir(folder, self.cfg.INDEX_FOLDER_NAME) / "manifest.json"
        )
        mtime = None
        for attempt in (0, 1):
            try:
                mtime = manifest_path.stat().st_mtime
                break
            except OSError:
                if attempt == 0:
                    time.sleep(0.002)  # outlive the rename window
        with self._cache_lock:
            cached = self._index_cache.get(key)
            if cached is not None and mtime is not None and cached["mtime"] == mtime:
                self._index_cache.move_to_end(key)
                return cached, cached["reader"]
        if mtime is None:
            return None, None
        reader = self.open_index(folder)
        if reader is None:
            return None, None
        if reader.model != self.spec.name:
            # Same flaw exists in the reference (no model recorded at all):
            # embeddings from a different encoder give silently wrong
            # rankings. We at least know, so say so.
            log.warning(
                "index in %s was built with model %r but the server runs %r "
                "— results will be wrong until the folder is re-indexed",
                folder, reader.model, self.spec.name,
            )
        with self._cache_lock:
            # entry["lock"] guards lazy materialization of corpus-sized
            # state (device matrix / ShardedIndex / IVF): a burst of first
            # queries must build it once, not once per thread.
            # Stamp with the mtime statted BEFORE open: a re-index
            # finalizing between our open and a fresh stat would key the
            # OLD reader under the NEW manifest mtime and serve stale
            # results forever. With the pre-open stamp that interleaving
            # just causes one extra re-open on the next query.
            entry = {
                "mtime": mtime, "reader": reader,
                "lock": threading.Lock(),
            }
            self._index_cache[key] = entry
            self._index_cache.move_to_end(key)
            while len(self._index_cache) > self._max_cached_folders:
                self._index_cache.popitem(last=False)
        return entry, reader

    def _resolve_kernel(self) -> str:
        kind = self.cfg.SEARCH_KERNEL
        if kind != "auto":
            return kind
        import jax

        # "best" = per-corpus choice between the Pallas one-pass kernel
        # (f32, measured 1.75x faster) and the certified-XLA path (bf16 /
        # CPU) — see index.search.best_exact_search_batch.
        return "sharded" if len(jax.devices()) > 1 else "best"

    # -- micro-batched serving path --

    def _lazy_batcher(self, attr: str, factory):
        """Double-checked lazy init shared by the batcher properties.

        NOT functools.cached_property: that descriptor is no longer
        locked (3.12+), and two concurrent first searches would each
        spawn a worker thread, leaking the loser forever. The lock-free
        read keeps the hot path (2-3 accesses per search) off the global
        cache lock. Every batcher is disabled together when
        MICROBATCH_MS <= 0 (factory not called); close() tears the
        instances down by these attr names."""
        inst = self.__dict__.get(attr, _UNSET)
        if inst is not _UNSET:
            return inst
        with self._cache_lock:
            if attr not in self.__dict__:
                self.__dict__[attr] = (
                    None if self.cfg.MICROBATCH_MS <= 0 else factory()
                )
            return self.__dict__[attr]

    @property
    def _batcher(self):
        def make():
            from .serving import MicroBatcher

            return MicroBatcher(
                self._execute_search_batch,
                window_ms=self.cfg.MICROBATCH_MS,
            )

        return self._lazy_batcher("_batcher_inst", make)

    @property
    def _host_batcher(self):
        # Separate worker for over-HBM-budget folders: a host mmap scan
        # takes seconds on this class of host, and routing it through the
        # device batcher's single worker would head-of-line block every
        # other folder's sub-millisecond device searches behind it.
        # Same natural-batching executor — concurrent host queries still
        # amortize one GEMM pass per shard.
        def make():
            from .serving import MicroBatcher

            return MicroBatcher(
                self._execute_search_batch,
                window_ms=self.cfg.MICROBATCH_MS,
            )

        return self._lazy_batcher("_host_batcher_inst", make)

    @property
    def _text_batcher(self):
        # Batches concurrent TEXT ENCODES into one (B, ctx) tower
        # dispatch (see serving.TextEncodeBatcher).
        def make():
            from .serving import TextEncodeBatcher

            return TextEncodeBatcher(
                lambda tokens: self._jit_encode_text(self.params, tokens)
            )

        return self._lazy_batcher("_text_batcher_inst", make)

    @property
    def _fused_batcher(self):
        # Fused text->search batcher (serving.TextSearchBatcher): fresh
        # text queries go out as ONE encode+search dispatch per
        # concurrent same-folder batch.
        def make():
            from .serving import TextSearchBatcher

            return TextSearchBatcher(
                self._execute_text_search_batch,
                window_ms=self.cfg.MICROBATCH_MS,
            )

        return self._lazy_batcher("_fused_batcher_inst", make)

    # -- HBM budget: device-byte accounting for cached corpora --
    #
    # Each cache entry can pin a corpus-sized device array (10M bf16 rows
    # = ~10 GB); two concurrently-queried huge folders would exceed a
    # v5e's 16 GB HBM and crash mid-request. Policy (scaling the
    # reference's single in-RAM FAISS index, oldapp.py:87): corpora that
    # FIT the budget evict colder folders' device state LRU-first before
    # materializing; corpora that can NEVER fit route to the host mmap
    # scanner instead of jnp.asarray.

    @functools.cached_property
    def _hbm_budget(self):
        """Device-bytes budget, or None = unlimited. See Config.HBM_BUDGET_MB."""
        mb = self.cfg.HBM_BUDGET_MB
        if mb < 0:
            return None
        if mb > 0:
            return mb << 20
        import jax

        try:
            stats = jax.devices()[0].memory_stats() or {}
            limit = stats.get("bytes_limit", 0)
        except Exception:
            limit = 0
        return int(limit * 0.8) if limit else None

    def hbm_snapshot(self) -> dict:
        """Device-byte accounting for /stats: the per-chip budget and
        every cached folder's reserved bytes + route verdict."""
        budget = self._hbm_budget
        entries = {}
        with self._cache_lock:
            for key, e in self._index_cache.items():
                entries[key] = {
                    "device_bytes": e.get("device_bytes", 0),
                    "fits_device": e.get("fits_device"),
                    "tiers": [
                        f for f in (
                            "emb", "sharded", "ivf", "sharded_ivf", "sq8",
                        ) if e.get(f) is not None
                    ],
                }
        return {
            "budget_bytes": budget,
            "reserved_bytes": sum(
                e["device_bytes"] for e in entries.values()
            ),
            "folders": entries,
        }

    def _corpus_device_bytes(self, reader) -> int:
        itemsize = 2 if reader.dtype_name == "bfloat16" else 4
        return reader.count * reader.dim * itemsize

    def _fits_device(self, entry, reader) -> bool:
        """Whether this corpus may ever be materialized on device under
        the configured kernel. Cached per entry (kernel choice is stable
        for the engine's lifetime); the over-budget verdict is logged
        once. The budget is PER CHIP, so the sharded kernel divides the
        corpus bytes by the mesh size, and IVF counts ~(1 + bucket_factor)
        x corpus at the store dtype (dense buckets + spill)."""
        fits = entry.get("fits_device")
        if fits is None:
            budget = self._hbm_budget
            if self.cfg.INDEX_KIND == "ivf":
                need = 3 * self._corpus_device_bytes(reader)
            else:
                need = self._corpus_device_bytes(reader)
            if self._resolve_kernel() == "sharded":
                # budget is per chip: sharded exact AND sharded IVF both
                # split their corpus-sized tensors over the mesh
                import jax

                need //= max(
                    self.cfg.MESH_DEVICES or len(jax.devices()), 1
                )
            fits = budget is None or need <= budget
            if not fits:
                log.warning(
                    "corpus of %d rows (%.2f GB %s) exceeds the HBM budget "
                    "(%.2f GB) — routing queries to the SQ8 device tier "
                    "(certified int8 sidecar) or the host mmap scanner; "
                    "raise EVOSSEARCH_HBM_BUDGET_MB or use a larger mesh "
                    "to search this folder at full dtype on device",
                    reader.count, need / 2**30, reader.dtype_name,
                    budget / 2**30,
                )
            entry["fits_device"] = fits
        return fits

    def _reserve_device_bytes(self, entry, need: int) -> None:
        """Bookkeeping before materializing `need` device bytes for
        `entry`: evicts OTHER entries' device arrays LRU-first until the
        cached total fits the budget. Entries mid-materialization (their
        lock is held) are skipped — they are the hottest entries anyway.
        Caller holds entry['lock']."""
        budget = self._hbm_budget
        with self._cache_lock:
            entry["device_bytes"] = entry.get("device_bytes", 0) + need
            if budget is None:
                return
            total = sum(
                e.get("device_bytes", 0) for e in self._index_cache.values()
            )
            # entries not in the LRU anymore (evicted while queried) still
            # count nothing here; their arrays die with the caller's ref
            if total <= budget:
                return
            for other in list(self._index_cache.values()):  # LRU-first
                if other is entry or not other.get("device_bytes"):
                    continue
                if not other["lock"].acquire(blocking=False):
                    continue
                try:
                    for field in (
                        "emb", "sharded", "ivf", "sharded_ivf", "sq8",
                    ):
                        other.pop(field, None)
                    total -= other["device_bytes"]
                    other["device_bytes"] = 0
                    self.counters.add("hbm_evictions")
                finally:
                    other["lock"].release()
                if total <= budget:
                    return

    def _release_device_bytes(self, entry, need: int) -> None:
        """Roll back a reservation whose materialization failed. Without
        this, the phantom bytes are charged AGAIN on retry and the cached
        total permanently exceeds the budget — every later materialization
        of any folder then evicts everyone else (eviction thrash) until
        process restart."""
        with self._cache_lock:
            entry["device_bytes"] = max(
                0, entry.get("device_bytes", 0) - need
            )

    # -- lazy corpus-state materialization (double-checked per-entry lock:
    #    a burst of first queries builds each corpus-sized object once).
    #    Readers use .get() + a local ref, NOT `in` + re-index: eviction
    #    (_reserve_device_bytes) pops these keys from live entries without
    #    the reader holding any lock, so `entry["emb"]` after an unlocked
    #    membership check can KeyError. The local ref keeps the evicted
    #    array alive for the in-flight query; the next query
    #    re-materializes. Reservations happen BEFORE the device put —
    #    evicting colder folders first is the whole point (the transient
    #    old+new sum would otherwise OOM the chip) — and roll back if the
    #    materialization throws. --

    def _entry_emb(self, entry, reader):
        import jax.numpy as jnp

        emb = entry.get("emb")
        if emb is None:
            with entry["lock"]:
                emb = entry.get("emb")
                if emb is None:
                    need = self._corpus_device_bytes(reader)
                    self._reserve_device_bytes(entry, need)
                    try:
                        # single-shard stores: embeddings() is the mmap
                        # view; the device copy reads it through the
                        # page cache (np.asarray on a memmap is a no-op
                        # view — the host-RAM copy only ever existed for
                        # multi-file stores, whose concatenate remains)
                        emb = jnp.asarray(reader.embeddings())
                    except BaseException:
                        self._release_device_bytes(entry, need)
                        raise
                    entry["emb"] = emb
        return emb

    def _entry_sharded(self, entry, reader):
        sharded = entry.get("sharded")
        if sharded is None:
            with entry["lock"]:
                sharded = entry.get("sharded")
                if sharded is None:
                    from .parallel import ShardedIndex, corpus_mesh

                    # budget is per chip; each device holds 1/n of the rows
                    mesh = corpus_mesh(self.cfg.MESH_DEVICES)
                    need = self._corpus_device_bytes(reader) // max(
                        mesh.devices.size, 1
                    )
                    self._reserve_device_bytes(entry, need)
                    try:
                        # straight off the mmap, one shard per callback —
                        # no whole-corpus host copy
                        sharded = ShardedIndex.from_reader(reader, mesh=mesh)
                    except BaseException:
                        self._release_device_bytes(entry, need)
                        raise
                    entry["sharded"] = sharded
        return sharded

    def _entry_ivf(self, entry, reader):
        ivf = entry.get("ivf")
        if ivf is not None:
            return ivf
        with entry["lock"]:
            ivf = entry.get("ivf")
            if ivf is None:
                # IVF device bytes ~= (1 + bucket_factor) x corpus at
                # the store dtype (dense buckets + spill; centroids
                # are small). Reserved BEFORE load/build — both
                # device-put corpus-sized tensors.
                need = 3 * self._corpus_device_bytes(reader)
                self._reserve_device_bytes(entry, need)
                try:
                    ivf = self._load_or_build_ivf(entry, reader)
                except BaseException:
                    self._release_device_bytes(entry, need)
                    raise
                entry["ivf"] = ivf
        return ivf

    def _entry_ivf_any(self, entry, reader):
        """The IVF for the resolved kernel: mesh-sharded buckets when the
        kernel is 'sharded' (the over-one-chip deployment IVF exists
        for), single-device otherwise. Both expose the same
        search/search_batch contract."""
        if self._resolve_kernel() == "sharded":
            return self._entry_sharded_ivf(entry, reader)
        return self._entry_ivf(entry, reader)

    def _entry_sharded_ivf(self, entry, reader):
        ivf = entry.get("sharded_ivf")
        if ivf is not None:
            return ivf
        with entry["lock"]:
            ivf = entry.get("sharded_ivf")
            if ivf is None:
                from .parallel import corpus_mesh

                mesh = corpus_mesh(self.cfg.MESH_DEVICES)
                # ~(1 + bucket_factor) x corpus at the store dtype,
                # divided over the mesh (budget is per chip)
                need = 3 * self._corpus_device_bytes(reader) // max(
                    int(mesh.devices.size), 1
                )
                self._reserve_device_bytes(entry, need)
                try:
                    ivf = self._load_or_build_sharded_ivf(
                        entry, reader, mesh
                    )
                except BaseException:
                    self._release_device_bytes(entry, need)
                    raise
                entry["sharded_ivf"] = ivf
        return ivf

    def _load_or_build_sharded_ivf(self, entry, reader, mesh):
        """Mesh-sharded IVF with its own sidecar (`ivf_mesh{S}.npz` — the
        per-shard layout is mesh-size-specific; ShardedIVFIndex.load
        rejects a size mismatch). Same staleness rules as the
        single-device sidecar."""
        from .parallel import ShardedIVFIndex

        n_dev = int(mesh.devices.size)
        ivf_path = reader.root / f"ivf_mesh{n_dev}.npz"
        ivf = self._load_ivf_sidecar(
            ivf_path, entry, reader,
            lambda p: ShardedIVFIndex.load(p, mesh=mesh),
        )
        if ivf is None:
            ivf = ShardedIVFIndex.build(
                np.asarray(reader.embeddings()),
                mesh=mesh,
                nlist=self.cfg.IVF_NLIST,
                pre_normalized=True,
            )
            try:
                ivf.save(ivf_path)
            except OSError:
                pass  # persistence is an optimization only
        return ivf

    def _load_or_build_ivf(self, entry, reader):
        from .index.ivf import IVFIndex

        ivf_path = reader.root / "ivf.npz"
        ivf = self._load_ivf_sidecar(ivf_path, entry, reader, IVFIndex.load)
        import jax

        if jax.default_backend() != "cpu":
            # Measured on v5e: the exact kernels beat IVF at
            # every corpus size that fits HBM (ARCHITECTURE
            # "IVF positioning"); say so instead of silently
            # serving 3-5x slower queries.
            log.warning(
                "INDEX_KIND=ivf on an accelerator: exact "
                "search is measured FASTER for on-device "
                "corpora at every size that fits HBM — "
                "consider EVOSSEARCH_INDEX_KIND=exact "
                "(IVF remains the right choice for host-only "
                "or beyond-HBM deployments)",
            )
        if ivf is None:
            # Store embeddings are L2-normalized at encode
            # time; buckets keep the store dtype (bf16 halves
            # the IVF HBM footprint).
            ivf = IVFIndex.build(
                np.asarray(reader.embeddings()),
                nlist=self.cfg.IVF_NLIST,
                pre_normalized=True,
            )
            try:
                ivf.save(ivf_path)
            except OSError:
                pass  # persistence is an optimization only
        return ivf

    def _ivf_want_nlist(self, reader) -> int:
        """Effective nlist, mirroring IVFIndex.build's resolution
        (0 = auto sqrt(n), clamped to n) — a persisted index built under
        an old EVOSSEARCH_IVF_NLIST must not silently pin the setting."""
        want = self.cfg.IVF_NLIST or max(1, int(reader.count ** 0.5))
        return min(want, max(reader.count, 1))

    def _load_ivf_sidecar(self, path, entry, reader, loader):
        """A persisted IVF sidecar, iff it is fresh (not older than the
        entry's manifest mtime) and matches the store's row count and
        the CURRENT effective nlist (_ivf_want_nlist) — one rule for the
        single-device, mesh-sharded, and host loaders, so a staleness
        policy change cannot silently miss a route. None on
        absent/stale/mismatched."""
        if not (path.exists() and path.stat().st_mtime >= entry["mtime"]):
            return None
        ivf = loader(path)
        if ivf is not None and (
            ivf.n != reader.count
            or ivf.nlist != self._ivf_want_nlist(reader)
        ):
            return None
        return ivf

    def _entry_ivf_host(self, entry, reader):
        """Host-resident IVF for an over-HBM-budget folder, or None.

        Loads the persisted sidecar with host=True (pure numpy, zero
        device bytes) so INDEX_KIND=ivf still means "probe nprobe
        buckets" instead of silently degrading to a full exact host
        scan — the probe touches ~nprobe*cap + spill rows per query.
        Never BUILDS on a miss: training device-puts the corpus, which
        is exactly what an over-budget folder cannot do."""
        if "ivf_host" not in entry:
            with entry["lock"]:
                if "ivf_host" not in entry:
                    from .index.ivf import IVFIndex

                    ivf = self._load_ivf_sidecar(
                        reader.root / "ivf.npz", entry, reader,
                        lambda p: IVFIndex.load(p, host=True),
                    )
                    if ivf is None:
                        log.warning(
                            "INDEX_KIND=ivf but the over-HBM-budget folder "
                            "has no matching ivf.npz sidecar — serving the "
                            "exact host scan instead (build the sidecar on "
                            "a device with enough HBM, or re-index)",
                        )
                    entry["ivf_host"] = ivf
        return entry["ivf_host"]

    def _entry_sq8(self, entry, reader):
        """SQ8 capacity tier for an over-HBM-budget folder, or None.

        Keeps a certified int8 sidecar (index/sq8.py) on device —
        quarter/half the corpus bytes — and serves EXACT results via the
        bound-sweep kernel + host rerank, instead of the seconds-long
        host scan. The sidecar builds host-side (chunked numpy over the
        mmap shards — an over-budget corpus by definition cannot ride
        through the device) and persists next to the store with the same
        mtime staleness rule as the IVF sidecars. Device residency rides
        the normal reservation/eviction accounting."""
        sq8 = entry.get("sq8", _UNSET)
        if sq8 is not _UNSET:
            return sq8
        with entry["lock"]:
            sq8 = entry.get("sq8", _UNSET)
            if sq8 is not _UNSET:
                return sq8
            from .index.sq8 import SQ8Index

            need = reader.count * (reader.dim + 8)
            if self._resolve_kernel() == "sharded":
                # the sidecar row-shards over the mesh (SQ8ShardedIndex);
                # budget is per chip, like every sharded corpus tensor
                import jax as _jax

                need //= max(
                    self.cfg.MESH_DEVICES or len(_jax.devices()), 1
                )
            budget = self._hbm_budget
            if not (
                self.cfg.SQ8 != "off"
                and reader.count
                and reader.dim % 128 == 0
                and (budget is None or need <= budget)
            ):
                entry["sq8"] = None
                return None
            mt = SQ8Index.sidecar_mtime(reader)
            if mt is not None and mt >= entry["mtime"]:
                sq8 = SQ8Index.load(reader, fetch=self.cfg.SQ8_FETCH,
                                    store_mtime=entry["mtime"])
                if sq8 is not None:
                    self._install_sq8(entry, sq8, need)
                    return entry["sq8"]
            if reader.count <= self.cfg.SQ8_SYNC_ROWS:
                log.info(
                    "building the SQ8 sidecar for %d rows (one-time, "
                    "host-side; persisted next to the store)",
                    reader.count,
                )
                try:
                    sq8 = SQ8Index.build_from_reader(
                        reader, fetch=self.cfg.SQ8_FETCH,
                        store_mtime=entry["mtime"],
                    )
                except OSError as e:  # read-only index dir, disk full
                    log.warning("SQ8 sidecar build failed (%s) — "
                                "serving the host scan instead", e)
                    sq8 = None
                if sq8 is not None:
                    self._install_sq8(entry, sq8, need)
                entry.setdefault("sq8", sq8)
                return entry["sq8"]
            # Big corpus, no sidecar yet: a synchronous build would stall
            # this query (and the folder) for minutes — build in the
            # background and serve the host scan until it publishes.
            if not entry.get("sq8_building"):
                entry["sq8_building"] = True
                self.counters.add("sq8_async_builds")
                log.info(
                    "building the SQ8 sidecar for %d rows in the "
                    "background (queries ride the host scan until it is "
                    "ready; EVOSSEARCH_SQ8_SYNC_ROWS forces inline)",
                    reader.count,
                )
                threading.Thread(
                    target=self._build_sq8_background,
                    args=(entry, reader, need), daemon=True,
                    name="sq8-build",
                ).start()
            return None

    def _install_sq8(self, entry, sq8, need: int) -> None:
        """Reserve HBM and materialize a built/loaded sidecar; on any
        device failure the folder keeps serving via the host scan.
        Caller holds entry['lock']."""
        sq8.counters = self.counters  # uncertified fallbacks -> /stats
        if self._resolve_kernel() == "sharded":
            from .parallel import SQ8ShardedIndex, corpus_mesh

            sq8 = SQ8ShardedIndex(sq8, corpus_mesh(self.cfg.MESH_DEVICES))
        self._reserve_device_bytes(entry, need)
        try:
            sq8.ensure_device()
        except Exception as e:
            self._release_device_bytes(entry, need)
            log.warning("SQ8 device materialization failed (%s) — "
                        "serving the host scan instead", e)
            entry["sq8"] = None
            return
        entry["sq8"] = sq8

    def _build_sq8_background(self, entry, reader, need: int) -> None:
        """Daemon-thread sidecar build for over-SQ8_SYNC_ROWS corpora.

        Publishes the files, then installs under the entry lock. If the
        folder was re-indexed meanwhile this entry is already orphaned
        (the cache keys entries by manifest mtime) and the published
        sidecar carries the OLD store_mtime stamp, so the fresh entry's
        load() rejects it and rebuilds — never stale bounds."""
        from .index.sq8 import SQ8Index

        try:
            sq8 = SQ8Index.build_from_reader(
                reader, fetch=self.cfg.SQ8_FETCH, store_mtime=entry["mtime"]
            )
        except Exception as e:
            log.warning("background SQ8 sidecar build failed (%s) — "
                        "the host scan keeps serving this folder", e)
            with entry["lock"]:
                entry["sq8"] = None
                entry["sq8_building"] = False
            return
        with entry["lock"]:
            try:
                with self._cache_lock:
                    live = any(
                        e is entry for e in self._index_cache.values()
                    )
                if not live:
                    # the folder was re-indexed (or evicted) mid-build:
                    # this entry is orphaned and the published sidecar
                    # carries the old generation stamp — installing
                    # corpus-sized device arrays nobody can reach would
                    # only squat HBM until GC
                    log.info(
                        "folder changed during the background SQ8 build "
                        "— discarding the stale install (the fresh entry "
                        "rebuilds against the new store)",
                    )
                    entry["sq8"] = None
                    return
                if entry.get("sq8") is not None:
                    # build_from_reader publishes the files BEFORE this
                    # lock is taken: a query thread in _entry_sq8's
                    # locked section may have already loaded + installed
                    # the just-published sidecar — installing again would
                    # double-reserve device bytes with no release path
                    return
                self._install_sq8(entry, sq8, need)
                if entry.get("sq8") is not None:
                    log.info(
                        "SQ8 sidecar ready: %d rows now served by the "
                        "certified device tier", reader.count,
                    )
            finally:
                entry["sq8_building"] = False

    def _ivf_host_search_batch(self, ivf, queries: np.ndarray, k: int):
        """Batch of host IVF probes, padded to the device search_batch
        contract: (Q, k) scores/ids with id -1 / -inf score where the
        probed lists covered fewer than k rows."""
        from .index.ivf import NEG_INF

        nq = queries.shape[0]
        out_s = np.full((nq, k), NEG_INF, np.float32)
        out_i = np.full((nq, k), -1, np.int64)
        for qi in range(nq):
            s, i = ivf.search_host(
                queries[qi], k, nprobe=self.cfg.IVF_NPROBE
            )
            out_s[qi, : len(s)] = s
            out_i[qi, : len(i)] = i
        return out_s, out_i

    def _execute_search_batch(self, folder: str, queries: np.ndarray, k: int):
        """One batched device dispatch over a folder's cached corpus
        (single-device matrix, Pallas one-pass kernel, or sharded mesh,
        per the resolved kernel)."""
        entry, reader = self._cached_index(folder)
        if reader is None:
            raise LookupError("Folder not indexed")
        k = min(k, reader.count)
        if not self._fits_device(entry, reader):
            # Over-HBM-budget corpus: no device residency. INDEX_KIND=ivf
            # with a matching persisted sidecar serves the host IVF probe
            # (touches ~nprobe*cap + spill rows/query); otherwise exact
            # scan in place over the mmap shards. BEFORE the bucket
            # padding — host scans cost real work per row, so pad rows
            # would be full scans, not free lanes.
            self.counters.add("host_routed_queries", queries.shape[0])
            queries = np.asarray(queries)
            if self.cfg.INDEX_KIND == "ivf":
                ivf = self._entry_ivf_host(entry, reader)
                if ivf is not None:
                    self.counters.add("ivf_host_queries", queries.shape[0])
                    return self._ivf_host_search_batch(ivf, queries, k)
            sq8 = self._entry_sq8(entry, reader)
            if sq8 is not None:
                self.counters.add("sq8_queries", queries.shape[0])
                return sq8.search_batch(queries, k)
            from .index.search import exact_search_host_reader_batch

            return exact_search_host_reader_batch(reader, queries, k)
        # Bucket the query-batch size to {1, 8, 64, 128, ...}: every
        # kernel jit specializes on Q, and concurrent load otherwise
        # compiles a fresh program per distinct batch size mid-burst
        # (measured as multi-second p99 stalls). Extra rows repeat row 0;
        # their results are sliced away. Ladder rationale lives with
        # index.search.query_row_bucket (shared with the uncertified-row
        # fallbacks).
        from .index.search import query_row_bucket

        q = queries.shape[0]
        pad = query_row_bucket(q)
        if pad > q:
            if isinstance(queries, np.ndarray):
                queries = np.concatenate([
                    queries,
                    np.broadcast_to(queries[:1], (pad - q,) + queries.shape[1:]),
                ])
            else:  # device-resident stack: pad on device, no host fetch
                import jax.numpy as jnp

                queries = jnp.concatenate([
                    queries,
                    jnp.broadcast_to(queries[:1], (pad - q,) + queries.shape[1:]),
                ])
        s, i = self._execute_search_batch_padded(entry, reader, queries, k)
        return s[:q], i[:q]

    def _fused_text_eligible(self, entry, reader) -> bool:
        """Whether a folder's fresh-text searches can take the fused
        one-dispatch encode+search program: a single-device exact kernel
        over a device-resident corpus small enough for the packed f32
        index encoding. IVF / sharded / host / SQ8 routes keep the
        encode-then-route path (with its own batchers)."""
        from .index.search import _PACK_MAX_ROWS

        return (
            self.cfg.INDEX_KIND != "ivf"
            and reader.count < _PACK_MAX_ROWS
            and self._resolve_kernel() in ("xla", "pallas", "best")
            and self._fits_device(entry, reader)
        )

    def _execute_text_search_batch(self, folder: str, tokens, k: int):
        """ONE fused device dispatch for a batch of fresh-text searches:
        text tower + corpus top-k in a single XLA program, one packed
        fetch of [scores | indices | ok | query embeddings]
        (serving.TextSearchBatcher's executor). The split chain paid one
        RPC round trip per stage — ~3 per request on this rig — which
        capped HTTP serving at 43 qps; fused, a whole concurrent batch
        costs one round trip. Folders that can't take the fused program
        (re-index race, non-device routes) fall back to encode-then-
        route inside this worker. Returns (scores (B, k'), indices
        (B, k'), embeddings (B, d) f32 numpy)."""
        entry, reader = self._cached_index(folder)
        if reader is None:
            raise LookupError("Folder not indexed")
        k = min(k, reader.count)
        b0 = tokens.shape[0]
        if k == 0 or not self._fused_text_eligible(entry, reader):
            # Rare here (search_text pre-routes): emptied or re-routed
            # folder between submit and execution. Embeddings are still
            # returned — the caller's text cache wants them.
            emb = np.asarray(self._jit_encode_text(self.params, tokens))
            if k == 0:
                return (
                    np.zeros((b0, 0), np.float32),
                    np.zeros((b0, 0), np.int64),
                    emb,
                )
            s, i = self._execute_search_batch(folder, emb, k)
            return s, i, emb
        from .index.search import (
            _unpack_with_fallback, choose_packed_flavor, query_row_bucket,
        )

        # Same bucket ladder as the embedding path: the fused jit
        # specializes on the token-batch rows, and concurrent load would
        # otherwise compile a fresh program per distinct batch size.
        pad = query_row_bucket(b0)
        if pad > b0:
            tokens = np.concatenate([
                tokens,
                np.broadcast_to(tokens[:1], (pad - b0,) + tokens.shape[1:]),
            ])
        emb_d = self._entry_emb(entry, reader)
        flavor, interpret = choose_packed_flavor(
            reader.count, reader.dim, k, emb_d.dtype, self._resolve_kernel()
        )
        packed = np.asarray(
            self._jit_text_search(
                self.params, tokens, emb_d, k, flavor, interpret
            )
        )
        q = packed[:, 2 * k + 1 :]
        s, i = _unpack_with_fallback(packed[:, : 2 * k + 1], emb_d, q, k)
        return s[:b0], i[:b0], q[:b0]

    def _execute_search_batch_padded(self, entry, reader, queries, k: int):
        from .index.search import (
            best_exact_search_batch, exact_search_batch, pallas_search_batch,
        )

        if self.cfg.INDEX_KIND == "ivf":
            return self._entry_ivf_any(entry, reader).search_batch(
                queries, k, nprobe=self.cfg.IVF_NPROBE
            )
        kernel = self._resolve_kernel()
        if kernel == "sharded":
            return self._entry_sharded(entry, reader).search_batch(queries, k)
        if kernel == "pallas":
            return pallas_search_batch(self._entry_emb(entry, reader), queries, k)
        if kernel == "best":
            return best_exact_search_batch(
                self._entry_emb(entry, reader), queries, k
            )
        return exact_search_batch(self._entry_emb(entry, reader), queries, k)

    def search_embedding(self, folder: str, query, k: int):
        """Top-k over a folder's index. ``query`` is a (d,) or (1, d)
        row — numpy, or device-resident (the text path submits a (1, d)
        DEVICE row so a text-cache-hit search costs exactly ONE kernel
        dispatch + one packed fetch; any eager slice/reshape of a device
        array would be a second dispatch, ~30 ms on this rig's relay).
        Returns (scores, indices, reader) or None when not indexed."""
        entry, reader = self._cached_index(folder)
        if reader is None:
            return None
        k = min(k, reader.count)
        if k == 0:
            return np.zeros((0,), np.float32), np.zeros((0,), np.int64), reader
        if isinstance(query, np.ndarray):
            query = np.asarray(query, np.float32)
            q2d = query[None, :] if query.ndim == 1 else query
        else:  # device array: normalize shape without a host fetch
            q2d = query if getattr(query, "ndim", 1) == 2 else query[None, :]

        def q1_host() -> np.ndarray:
            # Host-scan routes need a numpy (d,) row; they fetch the
            # embedding anyway, so this sync is not an extra round trip.
            return np.asarray(q2d, np.float32).reshape(-1)

        with self.timers.stage("search"):
            if not self._fits_device(entry, reader):
                # Over-HBM-budget corpus -> host IVF probe (when
                # INDEX_KIND=ivf and a matching sidecar exists) or host
                # mmap scan, via the DEDICATED host batcher: submissions
                # reach the same routing inside _execute_search_batch, so
                # concurrent host queries amortize one scan pass, without
                # a seconds-long scan head-of-line blocking the device
                # batcher's sub-ms searches of other folders. IVF rows
                # may come back -1-padded where probes covered < k.
                use_ivf = (
                    self.cfg.INDEX_KIND == "ivf"
                    and self._entry_ivf_host(entry, reader) is not None
                )
                if self._host_batcher is not None:
                    try:
                        scores, idx = self._host_batcher.submit(
                            _canon(folder), q1_host(), k
                        )
                    except LookupError:
                        # index vanished between this thread's check and
                        # the worker's re-open — same contract as the
                        # fused text path: any load anomaly -> "not
                        # indexed" (None), never a 500
                        return None
                    if use_ivf:
                        valid = idx >= 0
                        scores, idx = scores[valid], idx[valid]
                elif use_ivf:
                    self.counters.add("host_routed_queries")
                    self.counters.add("ivf_host_queries")
                    scores, idx = self._entry_ivf_host(
                        entry, reader
                    ).search_host(q1_host(), k, nprobe=self.cfg.IVF_NPROBE)
                else:
                    self.counters.add("host_routed_queries")
                    sq8 = self._entry_sq8(entry, reader)
                    if sq8 is not None:
                        self.counters.add("sq8_queries")
                        s1, i1 = sq8.search_batch(q1_host()[None, :], k)
                        scores, idx = s1[0], i1[0]
                    else:
                        from .index.search import exact_search_host_reader

                        scores, idx = exact_search_host_reader(
                            reader, q1_host(), k
                        )
            elif self.cfg.INDEX_KIND == "ivf":
                if self._batcher is not None:
                    # Concurrent IVF queries share one batched dispatch
                    # (IVFIndex.search_batch); rows come back padded with
                    # id -1 where the probes covered < k vectors.
                    # Materialize the IVF in THIS request thread first: a
                    # first-touch build (chunked k-means, tens of seconds
                    # at 1M rows) inside the single batcher worker would
                    # head-of-line block every other folder's searches.
                    self._entry_ivf_any(entry, reader)
                    try:
                        scores, idx = self._batcher.submit(
                            _canon(folder), q2d, k
                        )
                    except LookupError:
                        return None  # index vanished before the worker ran
                    valid = idx >= 0
                    scores, idx = scores[valid], idx[valid]
                else:
                    scores, idx = self._entry_ivf_any(entry, reader).search(
                        q2d, k, nprobe=self.cfg.IVF_NPROBE
                    )
            else:
                kernel = self._resolve_kernel()
                if (
                    kernel in ("xla", "sharded", "pallas", "best")
                    and self._batcher is not None
                ):
                    try:
                        scores, idx = self._batcher.submit(
                            _canon(folder), q2d, k
                        )
                    except LookupError:
                        return None  # index vanished before the worker ran
                elif kernel == "host":
                    from .index.search import exact_search_host_reader

                    scores, idx = exact_search_host_reader(
                        reader, q1_host(), k
                    )
                elif kernel == "sharded":
                    s, i = self._entry_sharded(entry, reader).search_batch(
                        np.asarray(q2d, np.float32), k
                    )
                    scores, idx = s[0], i[0]
                elif kernel in ("pallas", "best"):
                    from .index.search import (
                        best_exact_search_batch, pallas_search_batch,
                    )

                    fn = (
                        pallas_search_batch if kernel == "pallas"
                        else best_exact_search_batch
                    )
                    # q2d keeps a device-resident embedding on device
                    # (np.asarray would be a blocking fetch)
                    s, i = fn(self._entry_emb(entry, reader), q2d, k)
                    scores, idx = s[0], i[0]
                else:  # xla
                    from .index.search import exact_search_batch

                    s, i = exact_search_batch(
                        self._entry_emb(entry, reader), q2d, k
                    )
                    scores, idx = s[0], i[0]
        self.counters.add("queries")
        return scores, idx, reader

    def stored_embedding(self, folder: str, image_path: str):
        """The stored row embedding for an already-indexed, UNCHANGED
        file, or None. The find-similar flow re-encodes the original
        (reference oldapp.py:1741-1760, 2092-2106); when the query is an
        indexed file whose (mtime, size) still match, the stored row IS
        the vector that encode would produce (the pipeline is
        deterministic), so the encode dispatch can be skipped."""
        import os

        entry, reader = self._cached_index(folder)
        if reader is None or not reader.metadata:
            return None
        rows = self._path_rows(entry, reader)
        row = rows.get(str(image_path))
        if row is None:
            row = rows.get(os.path.abspath(image_path))
        if row is None:
            return None
        try:
            st = os.stat(image_path)
        except OSError:
            return None
        meta = reader.metadata[row]
        if meta.get("mtime") != st.st_mtime or meta.get("size") != st.st_size:
            return None
        for shard in reader.shard_arrays():
            if row < shard.shape[0]:
                return np.asarray(shard[row], np.float32)
            row -= shard.shape[0]
        return None

    def search_text(self, folder: str, query: str, k: int):
        """Text query -> top-k over a folder. Fresh texts (cache misses)
        against device-resident corpora ride the FUSED text->search
        batcher: tokenize on host, then ONE device dispatch + ONE packed
        fetch for a whole concurrent batch (encode + search + embedding
        return). Cache hits and non-fused routes (IVF / sharded / host /
        SQ8 / batching disabled) take the classic encode-then-search
        path. Reference counterpart: oldapp.py:2005 (clip.tokenize +
        model.encode_text + index.search per request)."""
        with self._text_cache_lock:
            cached = self._text_cache.get(query)
            if cached is not None:
                self._text_cache.move_to_end(query)
        if cached is not None:
            self.counters.add("text_cache_hits")
            return self.search_embedding(folder, cached, k)
        batcher = self._fused_batcher
        if batcher is None:
            return self.search_embedding(
                folder, self._encode_text_device(query), k
            )
        entry, reader = self._cached_index(folder)
        if reader is None:
            return None
        if reader.count == 0 or not self._fused_text_eligible(entry, reader):
            return self.search_embedding(
                folder, self._encode_text_device(query), k
            )
        tokens = self.tokenizer.tokenize(
            [query], self.spec.context_length,
            truncate=self.tokenizer.fallback,
        )
        with self.timers.stage("search"):
            try:
                scores, idx, emb_row = batcher.submit(
                    _canon(folder), np.asarray(tokens[0], np.int32),
                    min(k, reader.count),
                )
            except LookupError:
                return None  # index vanished between the check and dispatch
        self.counters.add("texts_encoded")
        self.counters.add("queries")
        self._text_cache_put(query, emb_row)
        return scores, idx, reader

    def search_image(self, folder: str, pil_image, k: int):
        emb = self.encode_image_device(pil_image)
        return self.search_embedding(folder, emb, k)

    def warmup(self) -> None:
        """Compile the hot paths before serving (text encode + fused
        preprocess/encode on a small canvas), so the first user request
        doesn't pay the multi-second XLA compile."""
        with self.timers.stage("warmup"):
            self.encode_text("warmup")
            self.encode_images([np.zeros((64, 64, 3), np.uint8)])
        log.info("engine warmed up (text + image paths compiled)")

    def is_indexed(self, folder: str) -> bool:
        """Authoritative check (full validated open; may migrate legacy)."""
        return self.open_index(folder) is not None

    def is_indexed_fast(self, folder: str) -> bool:
        """Cache-backed check for hot request paths: a manifest stat on
        cache hits instead of the O(corpus) validated open."""
        _, reader = self._cached_index(folder)
        if reader is not None:
            return True
        # cache miss AND no manifest: maybe an unmigrated legacy index
        return self.cfg.MIGRATE_LEGACY and self.is_indexed(folder)

    @staticmethod
    def _path_rows(entry: dict, reader) -> dict:
        """Stored-spelling -> row lookup for a cached index entry. Keys
        are the very string objects in ``reader.paths`` — no second copy
        of the corpus's path strings is materialized (paths.json and
        metadata.json are row-aligned by the writer, so this mapping
        serves both stored_embedding and /image/ membership)."""
        rows = entry.get("path_rows")
        if rows is None:
            # benign race: built at most once per cache entry per process
            rows = {p: r for r, p in enumerate(reader.paths)}
            entry["path_rows"] = rows
        return rows

    def index_contains(self, folder: str, path: str) -> bool | None:
        """O(1) membership: is ``path`` a row of ``folder``'s index?
        None when the folder isn't indexed. The /image/ route's access
        check (reference counterpart: serving any file under an indexed
        folder, oldapp.py /image/<path>; we restrict to actual rows).

        Accepts the stored spelling of a row, or its ABSOLUTE spelling:
        indexes built from a relative folder path store relative paths,
        while /image/ membership checks arrive absolute. The absolute
        arm re-derives the candidate stored spelling by joining each of
        the store's (few) distinct directory prefixes with the basename
        — resolved against the canonical FOLDER, not os.path.abspath,
        whose CWD need not match the index-time CWD. Replaces a
        frozenset of BOTH spellings of every row, which pinned
        2 x O(corpus) host strings at 10M-row scale (VERDICT r3 #5);
        this probes the shared _path_rows dict instead and keeps only a
        per-folder set of distinct dirname prefixes (typically one).
        Exact — no hashing, no false positives."""
        import os

        entry, reader = self._cached_index(folder)
        if reader is None:
            return None
        rows = self._path_rows(entry, reader)
        path = str(path)
        if path in rows:
            return True
        head, name = os.path.split(path)
        if not name or head != _canon(folder):
            return False
        prefixes = entry.get("path_prefixes")
        if prefixes is None:
            # transient dirname strings; only the few distinct survive
            prefixes = frozenset(os.path.dirname(p) for p in reader.paths)
            entry["path_prefixes"] = prefixes
        return any(
            (os.path.join(pref, name) if pref else name) in rows
            for pref in prefixes
        )
