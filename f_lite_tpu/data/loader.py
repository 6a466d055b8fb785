"""Prefetching data loader (host-side TPU input pipeline).

Replaces the reference's torch DataLoader with 4 workers
(`train.py:186-231`): items fetched in a worker pool, collated into numpy
batches, and a bounded prefetch queue keeps the accelerator fed while the
host decodes the next batch.

Worker types (`tools/bench_input_pipeline.py` measures both):
- "thread" (default): IO-bound fetching releases the GIL in requests/PIL,
  and PIL decode + the native OpenMP normalize run outside the GIL too —
  the right default for network-backed datasets.
- "process": for decode-bound workloads where Python-level crop/metadata
  work throttles threads. Picklable datasets (the product path —
  ImageDataset drops its lazy HTTP/S3 clients on pickle) run under a
  FORKSERVER pool: workers fork from a clean, thread-free server process
  started with the TPU backend env stripped, so they can never inherit a
  lock held mid-fork by the parent's jax/gRPC/OpenMP threads (plain fork
  from a live training process is the classic fork-with-threads deadlock,
  and the parent's native OpenMP normalize makes libgomp state in a
  forked child undefined). Each worker receives the dataset once, pickled
  through the pool initializer, and never re-imports the user's __main__
  script (no `if __name__ == "__main__"` guard needed — see
  _no_main_reimport). Unpicklable datasets (e.g. closures/local classes)
  fall back to the old fork pool with a logged warning.
"""

from __future__ import annotations

import contextlib
import functools
import importlib.machinery
import itertools
import queue
import sys
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterable

# per-iteration registry: forked children inherit the whole dict and each
# pool's tasks carry their own token, so two loaders iterated concurrently
# (train + val) can never serve each other's items (a single module-level
# slot raced: B's assignment between A's fork and A's first map would bind
# A's workers to B's dataset). Tokens come from a monotonic counter — not
# id(self), which CPython reuses after a loader dies and could re-bind a
# dead pool's in-flight lookups to a new loader's dataset — and each entry
# is unregistered when its pool shuts down (produce()'s finally), so
# short-lived loaders don't pin their datasets for the process lifetime.
_FORK_DATASETS: dict[int, object] = {}
_FORK_TOKENS = itertools.count()


def _fork_getitem(token, idx):
    return _FORK_DATASETS[token][idx]


def _fork_child_init():
    # forked children inherit the parent's atexit handlers (jax runtime /
    # remote-backend teardown); running those in a worker hangs pool
    # shutdown. Children only compute dataset items — drop the handlers.
    import atexit

    atexit._clear()


# forkserver workers: the dataset arrives once via the pool initializer
# (pickled in initargs), not via fork inheritance
_WORKER_DATASET = None


def _proc_init(ds_bytes):
    global _WORKER_DATASET
    import pickle

    _WORKER_DATASET = pickle.loads(ds_bytes)


def _proc_getitem(idx):
    return _WORKER_DATASET[idx]


_forkserver_started = False
_FORKSERVER_LOCK = threading.Lock()

_MAIN_SPEC_LOCK = threading.Lock()


@contextlib.contextmanager
def _no_main_reimport():
    """Forkserver children run multiprocessing.spawn.prepare(), which
    re-imports the parent's __main__ from its file path — re-executing an
    unguarded `python script.py` once per worker (verified: it crashed the
    pool from a plain script whose module level touches the TPU). Loader
    workers need only this module plus the pickled dataset, never user
    main: naming __main__'s spec literally "__main__" makes the child's
    spawn._fixup_main_from_name return before importing anything. Held
    around every pool call that can lazily spawn a worker (spawning is
    one-per-submit in ProcessPoolExecutor)."""
    main = sys.modules.get("__main__")
    with _MAIN_SPEC_LOCK:
        old = getattr(main, "__spec__", None) if main is not None else None
        if main is not None:
            main.__spec__ = importlib.machinery.ModuleSpec("__main__", None)
        try:
            yield
        finally:
            if main is not None:
                main.__spec__ = old


class _ForkserverPool:
    """ProcessPoolExecutor wrapper that spawns ALL workers eagerly at
    construction under _no_main_reimport, so the __spec__ patch is a
    one-time, loader-startup-bounded event rather than recurring per
    batch (a recurring patch could race a user's own concurrent spawn
    of an unrelated Process). map() re-applies the patch only in the
    rare case the pool is not fully spawned (private pre-spawn API
    unavailable, or a dead worker being replaced)."""

    def __init__(self, ex, n_workers):
        self._ex = ex
        self._n = n_workers
        with _no_main_reimport():
            try:
                # one process per call while none are idle (3.12 executor
                # spawns lazily, one per submit, via this same method)
                while len(ex._processes) < n_workers:
                    before = len(ex._processes)
                    ex._adjust_process_count()
                    if len(ex._processes) == before:
                        break
            except AttributeError:  # private API changed: lazy spawning
                pass

    def map(self, fn, *iterables):
        if len(getattr(self._ex, "_processes", ())) >= self._n:
            return self._ex.map(fn, *iterables)
        with _no_main_reimport():
            return self._ex.map(fn, *iterables)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return self._ex.__exit__(*exc)


def _ensure_clean_forkserver():
    """Start the (singleton) forkserver with TPU/axon env stripped, so
    neither the server nor its forked workers ever register the remote
    TPU backend. Preloads the (jax-free) dataset module so every worker
    forks with numpy/PIL already imported; __main__ is never preloaded or
    re-imported (see _no_main_reimport). The server starts exactly once
    per process; later pools reuse it."""
    global _forkserver_started
    with _FORKSERVER_LOCK:  # concurrent loaders: strip/restore once only
        if _forkserver_started:
            return
        import multiprocessing
        import os

        # ImportError during preload is swallowed by the server (warm-up
        # only). ONLY this (jax-free: numpy+PIL) module may be preloaded:
        # importing any f_lite_tpu.* submodule would execute the package
        # __init__ chain, and if that pulled jax into the server its
        # at-fork handlers/threads would reintroduce the very
        # fork-with-threads hazard the forkserver exists to avoid
        # (test_data.py::test_forkserver_preload_is_jax_free enforces it).
        multiprocessing.set_forkserver_preload(["f_lite_tpu.data.dataset"])
        from multiprocessing import forkserver

        if getattr(forkserver._forkserver, "_forkserver_pid", None):
            # someone (user code, another library) already started the
            # singleton forkserver — with the parent's env intact.
            # ensure_running() is then a no-op: our env strip and preload
            # cannot apply, and workers forked from that server may
            # register the remote TPU backend. Loud, once.
            import logging

            logging.getLogger(__name__).warning(
                "multiprocessing forkserver was already running before "
                "the DataLoader started it: its workers inherit the "
                "parent's TPU env (PALLAS_AXON_POOL_IPS/JAX_PLATFORMS) "
                "instead of the stripped one — create process-worker "
                "loaders before starting your own forkserver processes"
            )
            _forkserver_started = True
            return

        saved = {
            k: os.environ.pop(k, None)
            for k in ("PALLAS_AXON_POOL_IPS", "JAX_PLATFORMS")
        }
        os.environ["JAX_PLATFORMS"] = "cpu"
        try:
            forkserver.ensure_running()
        finally:
            for k, val in saved.items():
                if val is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = val
        _forkserver_started = True


class DataLoader:
    def __init__(
        self,
        dataset,
        batch_size: int | None = None,
        sampler: Iterable | None = None,
        batch_sampler: Iterable | None = None,
        num_workers: int = 4,
        prefetch: int = 2,
        collate_fn=None,
        drop_last: bool = False,
        worker_type: str = "thread",
    ):
        self.drop_last = drop_last
        if batch_sampler is not None and batch_size is not None:
            raise ValueError("pass batch_size or batch_sampler, not both")
        if worker_type not in ("thread", "process"):
            raise ValueError("worker_type must be 'thread' or 'process'")
        self.dataset = dataset
        self.batch_size = batch_size or 1
        self.sampler = sampler
        self.batch_sampler = batch_sampler
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.worker_type = worker_type
        self.collate_fn = collate_fn or getattr(
            dataset, "collate_fn", _default_collate
        )

    def _make_pool(self):
        if self.worker_type == "process":
            import multiprocessing
            import pickle
            from concurrent.futures import ProcessPoolExecutor

            try:
                ds_bytes = pickle.dumps(
                    self.dataset, protocol=pickle.HIGHEST_PROTOCOL
                )
            except Exception as e:
                ds_bytes = None
                pickle_err = e
            if ds_bytes is not None and b"__main__" in ds_bytes:
                # classes defined in the user's script pickle by
                # reference to __main__ — which forkserver workers never
                # import (by design, _no_main_reimport), so loads() there
                # would AttributeError. Fork inherits them via memory.
                ds_bytes = None
                pickle_err = (
                    "dataset references __main__-defined classes; move "
                    "them into an importable module to use the (safer) "
                    "forkserver pool"
                )
            if ds_bytes is not None:
                if len(ds_bytes) > 64 << 20:
                    import logging

                    logging.getLogger(__name__).info(
                        "pickled dataset is %.0f MB; it is re-sent to "
                        "every process worker at each epoch start "
                        "(forkserver workers cannot share parent memory "
                        "copy-on-write)", len(ds_bytes) / 2**20,
                    )
                # forkserver: workers fork from a clean thread-free server
                # (no fork-with-threads / libgomp hazard — module
                # docstring). Dataset pickled ONCE per pool creation (one
                # pool per __iter__), so epoch-dependent dataset state
                # (set_epoch) is current in each fresh epoch's workers.
                _ensure_clean_forkserver()
                ctx = multiprocessing.get_context("forkserver")
                return (
                    _ForkserverPool(
                        ProcessPoolExecutor(self.num_workers,
                                            mp_context=ctx,
                                            initializer=_proc_init,
                                            initargs=(ds_bytes,)),
                        self.num_workers),
                    _proc_getitem,
                    None,
                )
            # unpicklable dataset: fall back to fork inheritance through
            # _FORK_DATASETS (no per-task dataset pickling, only
            # (idx, result) cross pipes) — carries the fork-with-threads
            # hazard, hence the warning (once per loader, not per epoch:
            # _make_pool runs at every __iter__)
            if not getattr(self, "_fork_warned", False):
                self._fork_warned = True
                import logging

                logging.getLogger(__name__).warning(
                    "dataset is not picklable (%s); process workers fall "
                    "back to fork, which is unsafe in a multithreaded/"
                    "TPU-attached parent — make the dataset picklable to "
                    "use the forkserver pool", pickle_err,
                )
            token = next(_FORK_TOKENS)
            _FORK_DATASETS[token] = self.dataset
            ctx = multiprocessing.get_context("fork")
            return (
                ProcessPoolExecutor(self.num_workers, mp_context=ctx,
                                    initializer=_fork_child_init),
                functools.partial(_fork_getitem, token),
                token,
            )
        return (
            ThreadPoolExecutor(self.num_workers),
            self.dataset.__getitem__,
            None,
        )

    def _batches(self):
        if self.batch_sampler is not None:
            yield from self.batch_sampler
        else:
            sampler = (
                self.sampler
                if self.sampler is not None
                else range(len(self.dataset))
            )
            buf = []
            for idx in sampler:
                buf.append(idx)
                if len(buf) == self.batch_size:
                    yield buf
                    buf = []
            if buf and not self.drop_last:
                yield buf

    def __len__(self):
        if self.batch_sampler is not None:
            return len(self.batch_sampler)
        n = (
            len(self.sampler)
            if self.sampler is not None
            else len(self.dataset)
        )
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put(item) -> bool:
            # never block forever: if the consumer abandoned the iterator
            # (eval loop break, max_steps, preemption) the queue stays
            # full and a bare q.put would pin this thread inside `with
            # pool:`, leaking the worker pool — forked OS processes in
            # 'process' mode — once per abandoned iteration
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            # pool creation sits INSIDE the try: if _make_pool raises
            # (fork unavailable, EMFILE on executor pipes) the error must
            # reach the consumer — dying before the finally would leave
            # q.get() blocked forever with no signal
            token = None
            try:
                pool, getitem, token = self._make_pool()
                with pool:
                    for batch_idx in self._batches():
                        if stop.is_set():
                            return
                        items = list(pool.map(getitem, batch_idx))
                        if not put(self.collate_fn(items)):
                            return
            except Exception as e:  # surface worker errors to consumer
                put(e)
            finally:
                if token is not None:
                    _FORK_DATASETS.pop(token, None)
                put(_END)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()


_END = object()


def _default_collate(items):
    import numpy as np

    out = {}
    for k in items[0]:
        vals = [it[k] for it in items]
        if isinstance(vals[0], np.ndarray):
            out[k] = np.stack(vals)
        else:
            out[k] = vals
    return out
