"""Checkpoint save/load: atomic, optionally async, shape-tolerant restore.

The reference persists ``{model, optimizer, scheduler, steps, epochs}`` via
``torch.save`` (trainer.py:138-153) and restores with a tolerant
key-intersection copy that slice-copies the overlapping min-shape region on
mismatch (trainer.py:173-195), enabling head resizing across runs.  We keep
the same dict contract in a msgpack file (flax serialization), plus a sidecar
JSON with config provenance, and reproduce the min-shape merge semantics in
``tolerant_merge``.

Beyond the reference (SURVEY.md §5.4 "should use Orbax"):

- **Atomic writes**: every save goes to a temp file, is fsync'd, and is
  ``os.replace``d into place — a crash mid-save can never corrupt the last
  good checkpoint (the reference's ``torch.save`` truncates in place).
- **Async saves**: the device→host snapshot is taken synchronously (so
  donated buffers from the next step can't invalidate it), then
  serialization + IO run on a single background writer thread; training
  continues immediately.  ``wait_for_pending_saves()`` joins and re-raises.
- **Orbax backend** (``backend="orbax"``): the same state tree saved through
  ``orbax.checkpoint`` (directory format, its own atomic rename + async
  machinery).  ``restore_raw`` auto-detects directories, so the tolerant
  restore path is shared across both formats.

``tools/convert_torch_checkpoint.py`` converts reference ``.pth`` files into
the msgpack format for parity evaluations — that path is unchanged.
"""

from __future__ import annotations

import json
import logging
import os
import threading
from concurrent.futures import Future, ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from flax import serialization

logger = logging.getLogger(__name__)

_WRITER_LOCK = threading.Lock()
_WRITER: Optional[ThreadPoolExecutor] = None
_PENDING: List[Future] = []
_ORBAX_CKPTR = None


def _writer() -> ThreadPoolExecutor:
    global _WRITER
    with _WRITER_LOCK:
        if _WRITER is None:
            _WRITER = ThreadPoolExecutor(max_workers=1, thread_name_prefix="ckpt-writer")
        return _WRITER


def _atomic_write(path: str, data: bytes) -> None:
    """Write-to-temp + fsync + rename: a crash can never corrupt ``path``."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as handle:
        handle.write(data)
        handle.flush()
        os.fsync(handle.fileno())
    os.replace(tmp, path)


def wait_for_pending_saves() -> None:
    """Block until all async checkpoint saves finish; re-raise any failure."""
    global _PENDING
    with _WRITER_LOCK:
        pending, _PENDING = _PENDING, []
    for fut in pending:
        fut.result()
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


def _orbax_checkpointer():
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp

        _ORBAX_CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _ORBAX_CKPTR


def save_checkpoint(
    checkpoint_path: str,
    params: Any,
    batch_stats: Any,
    opt_state: Any,
    steps: int,
    epochs: int,
    extra_meta: Optional[Dict] = None,
    async_save: bool = False,
    backend: str = "msgpack",
) -> None:
    """Persist the full training state (reference trainer.py:138-153).

    The device→host copy happens synchronously in all modes; with
    ``async_save`` the serialization and disk IO move to a writer thread.
    """
    state = {
        "model": {
            "params": jax.device_get(params),
            "batch_stats": jax.device_get(batch_stats),
        },
        "optimizer": jax.device_get(opt_state),
        "steps": int(steps),
        "epochs": int(epochs),
    }
    directory = os.path.dirname(checkpoint_path)
    if directory and not os.path.exists(directory):
        os.makedirs(directory, exist_ok=True)
    meta = {"steps": int(steps), "epochs": int(epochs)}
    if extra_meta:
        meta.update(extra_meta)

    if backend == "orbax":
        import orbax.checkpoint as ocp

        pure = _to_pure(serialization.to_state_dict(state))
        ckptr = _orbax_checkpointer()
        ckptr.save(
            os.path.abspath(checkpoint_path),
            args=ocp.args.StandardSave(pure),
            force=True,
        )
        if not async_save:
            ckptr.wait_until_finished()
        return
    if backend != "msgpack":
        raise ValueError(f"Unknown checkpoint backend: {backend!r}")

    def _serialize_and_write() -> None:
        # to_state_dict converts optax namedtuple/tuple state into plain
        # string-keyed dicts that msgpack can serialize
        blob = serialization.msgpack_serialize(
            _to_pure(serialization.to_state_dict(state))
        )
        _atomic_write(checkpoint_path, blob)
        _atomic_write(
            checkpoint_path + ".json",
            json.dumps(meta, sort_keys=True, default=str).encode("utf-8"),
        )

    if async_save:
        fut = _writer().submit(_serialize_and_write)
        with _WRITER_LOCK:
            _PENDING.append(fut)
    else:
        _serialize_and_write()


def restore_raw(checkpoint_path: str) -> Dict:
    if os.path.isdir(checkpoint_path):  # orbax directory format
        ckptr = _orbax_checkpointer()
        return ckptr.restore(os.path.abspath(checkpoint_path))
    with open(checkpoint_path, "rb") as handle:
        return serialization.msgpack_restore(handle.read())


def _to_pure(tree):
    """Convert all leaves to numpy for msgpack serialization."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if isinstance(x, (jnp.ndarray, np.ndarray, np.generic)) else x,
        tree,
    )


def tolerant_merge(target, source, force_load: bool = True, path: str = ""):
    """Key-intersection merge with min-shape slice copy on mismatch
    (reference trainer.py:173-195).

    Returns a tree with ``target``'s structure; leaves present in ``source``
    overwrite, mismatched shapes overlap-copy when ``force_load``.
    """
    if isinstance(target, dict):
        out = {}
        src = source if isinstance(source, dict) else {}
        src_by_norm = {str(k): v for k, v in src.items()}
        for key, tval in target.items():
            sval = src_by_norm.get(str(key), None)
            if sval is None:
                out[key] = tval
            else:
                out[key] = tolerant_merge(tval, sval, force_load, f"{path}/{key}")
        return out
    # leaf — compare via shape/dtype metadata first: target leaves may live
    # on the device (restoring into a live Trainer), and np.asarray on a
    # device array is a synchronous device->host fetch.  One fetch per leaf
    # over a remote transport turns restore into minutes; only the
    # shape-mismatch overlap-copy path actually needs the target's values.
    try:
        sval = np.asarray(source)
    except Exception:
        logger.info("not exist :%s", path)
        return target
    t_shape = tuple(getattr(target, "shape", np.shape(target)))
    t_dtype = np.dtype(getattr(target, "dtype", None) or np.asarray(target).dtype)
    if sval.shape == t_shape:
        return sval.astype(t_dtype) if sval.dtype != t_dtype else sval
    logger.info("%s does not have same shape: %s vs %s", path, sval.shape, t_shape)
    if not force_load:
        return target
    tval = np.asarray(target)
    min_shape = np.minimum(np.array(sval.shape), np.array(tval.shape)) if sval.ndim == tval.ndim else None
    if min_shape is None:
        return target
    merged = np.array(tval, copy=True)
    slices = tuple(slice(0, int(m)) for m in min_shape)
    merged[slices] = sval[slices]
    return merged


def load_checkpoint(
    checkpoint_path: str,
    params_template: Any,
    batch_stats_template: Any,
    opt_state_template: Any = None,
    load_only_params: bool = False,
    force_load: bool = True,
) -> Tuple[Any, Any, Any, int, int]:
    """Restore state (reference trainer.py:155-171).

    Returns (params, batch_stats, opt_state, steps, epochs); opt_state/steps/
    epochs come back as the template/0 when ``load_only_params``.
    """
    raw = restore_raw(checkpoint_path)
    model = raw.get("model", {})
    params_pure = serialization.to_state_dict(params_template)
    stats_pure = serialization.to_state_dict(batch_stats_template)
    params = serialization.from_state_dict(
        params_template, tolerant_merge(params_pure, model.get("params", {}), force_load)
    )
    batch_stats = serialization.from_state_dict(
        batch_stats_template,
        tolerant_merge(stats_pure, model.get("batch_stats", {}), force_load),
    )
    if load_only_params:
        return params, batch_stats, opt_state_template, 0, 0

    steps = int(raw.get("steps", 0))
    epochs = int(raw.get("epochs", 0))
    opt_state = opt_state_template
    if opt_state_template is not None and "optimizer" in raw:
        try:
            opt_state = serialization.from_state_dict(opt_state_template, raw["optimizer"])
        except Exception as exc:  # optimizer topology changed — keep fresh state
            logger.warning("Could not restore optimizer state (%s); reinitialising.", exc)
    return params, batch_stats, opt_state, steps, epochs
