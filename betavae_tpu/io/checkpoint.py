"""Sharded checkpoints with reference-compatible naming and CLI surface.

Capability parity with reference ``src/utils/brain_tumor_utils/io.py:14-70``:

- shard files named ``<base>_shard{i}<ext>`` next to the base path
  (reference ``io.py:8-11``); we keep the reference's ``.pt`` extension for the
  run-directory surface even though the payload is a NumPy zip archive, so
  ``--resume best|latest`` and ``scripts/reshard_checkpoint.py`` work
  identically.
- ``model_state`` keys are sorted then distributed round-robin across shards
  (reference ``io.py:23-28``).
- load autodetects shard count by globbing, merges ``model_state``, takes
  metadata from the first shard, and falls back to a single base file
  (reference ``io.py:42-70``).

Deviation (documented; SURVEY.md quirk list): the reference duplicates the
full optimizer state into every shard (``io.py:32-35``), defeating the size
reduction.  We shard ``optim_state`` round-robin by key as well; metadata
scalars only are duplicated.

Payload schema (a plain dict):
    ``{"epoch": int, "total_steps": int, "model_state": {flatkey: ndarray},
       "optim_state": {flatkey: ndarray}, ...scalar extras...}``

Pytrees (flax params, optax states) are converted to/from flat
``{path: array}`` dicts with :func:`flatten_pytree` / :func:`unflatten_like`.
"""

from __future__ import annotations

import glob
import io as _io
import json
import os
import zipfile

import jax
import numpy as np

_META_KEY = "__meta__"
# torch_adam_moments rides as an array section so resharding a torch-origin
# checkpoint keeps the imported optimizer moments (r5 review finding — they
# were silently dropped); stored flat as mu/<path>, nu/<path> + a count meta
_ARRAY_SECTIONS = ("model_state", "optim_state", "torch_adam_moments")
_MOMENTS_COUNT_KEY = "torch_adam_moments_count"


# ---------------------------------------------------------------------------
# pytree <-> flat dict
# ---------------------------------------------------------------------------

def _format_path(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:  # pragma: no cover
            parts.append(str(p))
    return "/".join(parts)


def flatten_pytree(tree, to_host: bool = True) -> dict:
    """Flatten an arbitrary pytree of arrays into ``{"a/b/0": ndarray}``.

    ``to_host=False`` keeps ``jax.Array`` leaves on device (no transfer);
    used by the async checkpoint writer, which snapshots on device and
    performs the device→host pull in its background thread.
    """
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_format_path(path)] = np.asarray(leaf) if to_host else leaf
    return flat


def unflatten_like(target_tree, flat: dict):
    """Rebuild a pytree with the structure of ``target_tree`` from a flat dict.

    Leaves are matched by flattened path; dtypes/shapes are validated against
    the target leaves so a checkpoint/model mismatch fails loudly.
    """
    paths_and_leaves = jax.tree_util.tree_flatten_with_path(target_tree)
    treedef = paths_and_leaves[1]
    new_leaves = []
    for path, leaf in paths_and_leaves[0]:
        key = _format_path(path)
        if key not in flat:
            raise KeyError(f"Checkpoint missing parameter {key!r}")
        arr = np.asarray(flat[key])
        if hasattr(leaf, "shape") and tuple(arr.shape) != tuple(leaf.shape):
            raise ValueError(
                f"Shape mismatch for {key!r}: checkpoint {arr.shape} vs model {leaf.shape}"
            )
        if hasattr(leaf, "dtype"):
            arr = arr.astype(leaf.dtype)
        new_leaves.append(arr)
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


# ---------------------------------------------------------------------------
# shard paths
# ---------------------------------------------------------------------------

def _shard_paths(base_path: str, num_shards: int):
    root, ext = os.path.splitext(base_path)
    suffix = ext if ext else ".pt"
    return [f"{root}_shard{i}{suffix}" for i in range(num_shards)]


def normalize_base_path(base_path: str) -> str:
    """Append the default ``.pt`` extension when the base has none."""
    return base_path if os.path.splitext(base_path)[1] else base_path + ".pt"


def discover_shards(base_path: str) -> list:
    """Glob the on-disk ``<base>_shard*<ext>`` files for a checkpoint base."""
    root, ext = os.path.splitext(base_path)
    return sorted(glob.glob(f"{root}_shard*{ext if ext else '.pt'}"))


def checkpoint_shard_count(base_path: str) -> int:
    """How many files currently hold this checkpoint (1 = unsharded base file).

    Raises ``FileNotFoundError`` when neither shards nor a base file exist.
    """
    found = discover_shards(base_path)
    if found:
        return len(found)
    if os.path.exists(base_path):
        return 1
    raise FileNotFoundError(
        f"checkpoint not found: no shard files and no base file at {base_path}"
    )


# ---------------------------------------------------------------------------
# save / load
# ---------------------------------------------------------------------------

def _write_shard(path: str, arrays: dict, meta: dict) -> None:
    """Write one shard as an uncompressed zip of ``.npy`` members + meta JSON."""
    tmp = path + ".tmp"
    with zipfile.ZipFile(tmp, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr(_META_KEY + ".json", json.dumps(meta))
        for key, arr in arrays.items():
            buf = _io.BytesIO()
            np.save(buf, np.asarray(arr), allow_pickle=False)
            zf.writestr(key + ".npy", buf.getvalue())
    os.replace(tmp, path)


def _read_shard(path: str):
    """Read one shard: our npz-zip format, else a reference torch pickle.

    A file that is neither (e.g. a truncated write) raises a clear
    corruption error instead of being handed to torch's unpickler.
    """
    try:
        with zipfile.ZipFile(path, "r") as zf:
            names = zf.namelist()
            if _META_KEY + ".json" in names:
                arrays = {}
                meta = {}
                for name in names:
                    if name == _META_KEY + ".json":
                        meta = json.loads(zf.read(name).decode("utf-8"))
                    elif name.endswith(".npy"):
                        buf = _io.BytesIO(zf.read(name))
                        arrays[name[: -len(".npy")]] = np.load(
                            buf, allow_pickle=False)
                return arrays, meta
            is_zip = True
    except zipfile.BadZipFile:
        is_zip = False

    # torch checkpoints are zips too (new serializer, no __meta__.json
    # member) or raw pickles (legacy, protocol-2 magic); anything else is
    # a corrupt file, not a format to fall through on
    with open(path, "rb") as f:
        magic = f.read(2)
    if not (is_zip or magic[:1] == b"\x80"):
        raise ValueError(
            f"checkpoint shard {path} is neither this framework's zip "
            "format nor a torch pickle — file is corrupt or truncated")
    from .torch_compat import read_torch_shard

    return read_torch_shard(path)


def read_checkpoint_meta(base_path: str) -> dict:
    """Metadata scalars (epoch, val_total, …) without loading any arrays.

    Reads one shard's ``__meta__.json`` member for native checkpoints; torch
    pickles have no cheap side-channel and fall back to a full shard read.
    """
    shards = discover_shards(base_path)
    target = shards[0] if shards else base_path
    if not os.path.exists(target):
        raise FileNotFoundError(f"No checkpoint found at {base_path}")
    try:
        with zipfile.ZipFile(target, "r") as zf:
            if _META_KEY + ".json" in zf.namelist():
                meta = json.loads(zf.read(_META_KEY + ".json").decode("utf-8"))
                return {k: v for k, v in meta.items()
                        if k not in ("shard_id", "num_shards")}
    except zipfile.BadZipFile:
        pass
    _, meta = _read_shard(target)
    return {k: v for k, v in meta.items()
            if k not in ("shard_id", "num_shards")}


def save_sharded_checkpoint(base_path: str, payload: dict, num_shards: int = 2):
    """Save ``payload`` split across ``num_shards`` files (reference ``io.py:14-39``)."""
    parent = os.path.dirname(base_path)
    if parent:
        os.makedirs(parent, exist_ok=True)
    model_state = payload.get("model_state")
    if model_state is None:
        raise ValueError("payload missing model_state for sharded checkpoint save")
    if num_shards < 1:
        num_shards = 1

    payload = dict(payload)
    moments = payload.pop("torch_adam_moments", None)
    if moments is not None:
        payload["torch_adam_moments"] = {
            f"{m}/{k}": v for m in ("mu", "nu")
            for k, v in (moments.get(m) or {}).items()}
        payload[_MOMENTS_COUNT_KEY] = int(moments.get("count", 0))

    sections = {}
    for sec in _ARRAY_SECTIONS:
        state = payload.get(sec) or {}
        keys = sorted(state.keys())
        per_shard = [[] for _ in range(num_shards)]
        for idx, k in enumerate(keys):
            per_shard[idx % num_shards].append(k)
        sections[sec] = (state, per_shard)

    meta_base = {
        k: v
        for k, v in payload.items()
        if k not in _ARRAY_SECTIONS and _json_scalar(v)
    }
    dropped = [k for k in payload
               if k not in _ARRAY_SECTIONS and not _json_scalar(payload[k])]
    if dropped:
        import warnings
        warnings.warn(
            f"save_sharded_checkpoint: dropping non-serializable payload "
            f"entries {dropped} — they will NOT survive a load of "
            f"{base_path}")

    paths = _shard_paths(base_path, num_shards)
    for shard_idx, shard_path in enumerate(paths):
        arrays = {}
        for sec, (state, per_shard) in sections.items():
            for k in per_shard[shard_idx]:
                arrays[f"{sec}/{k}"] = state[k]
        meta = dict(meta_base)
        meta["shard_id"] = shard_idx
        meta["num_shards"] = num_shards
        _write_shard(shard_path, arrays, meta)
    # remove STALE higher-index shards from a previous wider save (e.g. an
    # in-place reshard 4->2): a later load globs every shard file, and a
    # leftover _shard2/_shard3 would silently merge old-epoch arrays over
    # the fresh ones (r5 review finding)
    for stale in discover_shards(base_path):
        if stale not in paths:
            os.remove(stale)
    if os.path.exists(base_path):
        os.remove(base_path)
    return paths


def _json_scalar(v) -> bool:
    try:
        json.dumps(v)
        return True
    except (TypeError, ValueError):
        return False


def load_sharded_checkpoint(base_path: str, num_shards: int | None = None) -> dict:
    """Load a sharded checkpoint; merges shards (reference ``io.py:42-70``)."""
    shard_paths = []
    if num_shards is None:
        shard_paths = discover_shards(base_path)
        if shard_paths:
            num_shards = len(shard_paths)
    if not shard_paths and num_shards is not None:
        shard_paths = _shard_paths(base_path, num_shards)

    if shard_paths and all(os.path.exists(p) for p in shard_paths):
        merged = {sec: {} for sec in _ARRAY_SECTIONS}
        meta = {}
        seen_meta = []
        for p in shard_paths:
            arrays, shard_meta = _read_shard(p)
            for key, arr in arrays.items():
                sec, _, rest = key.partition("/")
                merged.setdefault(sec, {})[rest] = arr
            seen_meta.append((p, shard_meta))
            if not meta:
                meta = {
                    k: v
                    for k, v in shard_meta.items()
                    if k not in ("shard_id", "num_shards")
                }
        _validate_shard_set(shard_paths, seen_meta)
        out = dict(meta)
        for sec in _ARRAY_SECTIONS:
            if merged.get(sec):
                out[sec] = merged[sec]
        return _maybe_convert_torch_payload(_renest_moments(out))
    if os.path.exists(base_path):
        arrays, meta = _read_shard(base_path)
        out = dict(meta)
        for key, arr in arrays.items():
            sec, _, rest = key.partition("/")
            out.setdefault(sec, {})[rest] = arr
        return _maybe_convert_torch_payload(_renest_moments(out))
    raise FileNotFoundError(f"No checkpoint found at {base_path} or shards")


def _validate_shard_set(shard_paths, seen_meta) -> None:
    """Cross-shard consistency check (r5 review finding).

    A hard kill between the per-shard ``os.replace`` calls, or a stale file
    from an earlier wider save, produces a mixed-epoch shard set that would
    otherwise merge silently.  Every shard duplicates the metadata scalars
    (the reference does too, ``io.py:32-35``), so equality of ``epoch`` /
    ``total_steps`` — and of the recorded ``num_shards`` vs the discovered
    file count, when present — is a cheap invariant.
    """
    declared = [(p, m.get("num_shards")) for p, m in seen_meta
                if m.get("num_shards") is not None]
    for p, n in declared:
        if int(n) != len(shard_paths):
            raise ValueError(
                f"checkpoint shard set is inconsistent: {p} records "
                f"num_shards={n} but {len(shard_paths)} shard files were "
                f"found — a stale shard from an earlier save is mixed in; "
                f"delete the stale files or reshard explicitly")
    for key in ("epoch", "total_steps"):
        vals = {p: m[key] for p, m in seen_meta if key in m}
        if len(set(vals.values())) > 1:
            raise ValueError(
                f"checkpoint shard set is torn: {key} differs across shards "
                f"({vals}) — an interrupted save mixed epochs; resume from "
                f"the best checkpoint or an earlier epoch instead")


def _renest_moments(out: dict) -> dict:
    """Rebuild the nested ``torch_adam_moments`` payload from its flat
    array-section form (inverse of the save-side flattening)."""
    flat = out.pop("torch_adam_moments", None)
    if flat:
        out["torch_adam_moments"] = {
            "count": int(out.pop(_MOMENTS_COUNT_KEY, 0)),
            "mu": {k[len("mu/"):]: v for k, v in flat.items()
                   if k.startswith("mu/")},
            "nu": {k[len("nu/"):]: v for k, v in flat.items()
                   if k.startswith("nu/")},
        }
    return out


def _maybe_convert_torch_payload(payload: dict) -> dict:
    """Translate a reference torch ``model_state`` to flax naming in place.

    A torch Adam ``optim_state`` (index-keyed moments) is converted to
    flax-named moment trees under ``torch_adam_moments`` — the train loop
    grafts them onto its fresh optax state at resume (best-effort; a failed
    conversion warns and drops them).  The raw index-keyed section is
    removed either way: its keys are meaningless to ``unflatten_like``.
    """
    from .torch_compat import (convert_adam_moments, convert_model_state,
                               looks_like_torch_state)

    state = payload.get("model_state")
    if state and looks_like_torch_state(state):
        optim = payload.pop("optim_state", None)
        if optim:
            moments = convert_adam_moments(optim, state)
            if moments is not None:
                payload["torch_adam_moments"] = moments
        payload["model_state"] = convert_model_state(state)
    return payload
