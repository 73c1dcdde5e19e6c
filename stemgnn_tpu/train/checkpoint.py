"""Crash-safe checkpointing.

Reference contract (handler.py:16-38,169,179-187): a checkpoint per epoch
at `<dir>/<epoch>_stemgnn.*` plus a best-by-validation-MAE checkpoint at
`<dir>/_stemgnn.*`; `load` silently returns None when the file is missing;
norm stats travel separately as `norm_stat.json` (handler.py:122-124).

Improvements over the reference (SURVEY.md section 5): the checkpoint also
carries optimizer state, epoch counter, best-MAE bookkeeping, and the RNG
key — enabling `--resume`, which the reference lacks entirely — and writes
are atomic (tmp file + os.replace) so a crash never corrupts the latest
checkpoint.

Format: flax msgpack bytes for the {params, opt_state} pytree + a JSON
sidecar header, concatenated in one file (8-byte header-length prefix).
"""

from __future__ import annotations

import json
import os
import queue
import struct
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

CKPT_SUFFIX = "_stemgnn.ckpt"


def _path(model_dir: str, epoch=None) -> str:
    epoch = str(epoch) if epoch is not None and epoch != "" else ""
    return os.path.join(model_dir, epoch + CKPT_SUFFIX)


def save(
    model_dir: str,
    params: Any,
    opt_state: Any = None,
    *,
    epoch: Optional[int] = None,
    meta: Optional[Dict] = None,
) -> str:
    """Atomically write a checkpoint; `epoch=None` writes the best-model file."""
    if model_dir is None:
        return ""
    os.makedirs(model_dir, exist_ok=True)
    state = {"params": params}
    if opt_state is not None:
        state["opt_state"] = opt_state
    blob = serialization.to_bytes(state)
    header = json.dumps(meta or {}).encode("utf-8")
    path = _path(model_dir, epoch)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(struct.pack("<Q", len(header)))
        f.write(header)
        f.write(blob)
    os.replace(tmp, path)
    return path


def load(
    model_dir: str,
    params_template: Any,
    opt_state_template: Any = None,
    *,
    epoch: Optional[int] = None,
) -> Optional[Tuple[Any, Any, Dict]]:
    """Restore (params, opt_state, meta); None if absent (handler.py:34-35)."""
    if not model_dir:
        return None
    path = _path(model_dir, epoch)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        meta = json.loads(f.read(hlen).decode("utf-8"))
        blob = f.read()
    template = {"params": params_template}
    if opt_state_template is not None:
        template["opt_state"] = opt_state_template
    state = serialization.from_bytes(template, blob)
    return state["params"], state.get("opt_state"), meta


def latest_epoch(model_dir: str) -> Optional[int]:
    """Highest epoch number with a checkpoint on disk (for --resume)."""
    if not os.path.isdir(model_dir):
        return None
    epochs = []
    for name in os.listdir(model_dir):
        if name.endswith(CKPT_SUFFIX) and name != CKPT_SUFFIX:
            stem = name[: -len(CKPT_SUFFIX)]
            if stem.isdigit():
                epochs.append(int(stem))
    return max(epochs) if epochs else None


def save_norm_stat(result_dir: str, normalize_statistic: Optional[Dict]) -> None:
    """norm_stat.json contract (handler.py:122-124)."""
    if normalize_statistic is None:
        return
    os.makedirs(result_dir, exist_ok=True)
    tmp = os.path.join(result_dir, "norm_stat.json.tmp")
    with open(tmp, "w") as f:
        json.dump(normalize_statistic, f)
    os.replace(tmp, os.path.join(result_dir, "norm_stat.json"))


def load_norm_stat(result_dir: str) -> Dict:
    """handler.py:195-196."""
    with open(os.path.join(result_dir, "norm_stat.json"), "r") as f:
        return json.load(f)


class AsyncCheckpointer:
    """Overlap checkpoint I/O with the next epoch's device work.

    The reference pickles the whole module synchronously every epoch
    (handler.py:169). Here the hot loop only snapshots the pytree with an
    on-device copy (cheap, non-blocking, and safe against the next step's
    buffer donation); the device->host transfer, serialization, and atomic
    file write all happen on a single worker thread. Writes are strictly
    ordered (one queue, one worker), so the best-model file and the
    per-epoch files can never interleave into a torn state.

    `wait()` drains the queue — call it before reading checkpoints back
    (e.g. at end of training or before `test`).
    """

    def __init__(self, max_pending: int = 2):
        # bounded queue: if the disk can't keep up we block the trainer
        # rather than accumulate unbounded host copies of the model
        self._q: queue.Queue = queue.Queue(maxsize=max_pending)
        self._err: Optional[BaseException] = None
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            item = self._q.get()
            if item is None:
                self._q.task_done()
                return
            model_dir, state, epoch, meta = item
            try:
                state = jax.device_get(state)  # transfer off the hot path
                save(model_dir, state["params"], state.get("opt_state"),
                     epoch=epoch, meta=meta)
            except BaseException as e:  # surfaced on next submit/wait
                self._err = e
            finally:
                self._q.task_done()

    def _raise_pending(self):
        if self._err is not None:
            err, self._err = self._err, None
            raise err

    def submit(self, model_dir: str, params: Any, opt_state: Any = None, *,
               epoch: Optional[int] = None, meta: Optional[Dict] = None):
        """Snapshot (device-side copy) and enqueue an asynchronous save."""
        self._raise_pending()
        if model_dir is None:
            return
        state = {"params": params}
        if opt_state is not None:
            state["opt_state"] = opt_state
        # device-side copy: the trainer donates `params`/`opt_state` buffers
        # to the next step, so the worker must not read the originals
        state = jax.tree.map(
            lambda a: a.copy() if isinstance(a, jax.Array) else np.asarray(a),
            state,
        )
        self._q.put((model_dir, state, epoch, dict(meta or {})))

    def wait(self):
        """Block until every queued checkpoint is durably on disk."""
        self._q.join()
        self._raise_pending()

    def close(self):
        """Drain the queue, stop the worker, then surface any pending I/O
        error — the sentinel is enqueued and the thread joined FIRST so a
        failed write never abandons a live worker thread."""
        self._q.join()
        self._q.put(None)
        self._thread.join()
        self._raise_pending()
