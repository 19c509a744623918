"""Precompiled serving bundles: export AOT-compiled serving programs to
disk and reload them without tracing OR compiling.

Why this exists: XLA compilation of the full serving program set is the
dominant cold-start cost — on the remote-tunneled runtime used here the
persistent compilation cache does not help (compiles happen terminal-side,
CLAUDE.md) and a fresh `AdaptiveDehazer` pays minutes of compiles before
the first image is served. A precompiled bundle moves that cost to a
one-time export step: `deserialize_and_load` hands the PJRT runtime an
already-compiled executable, so a cold process reaches first-batch-served
in load time (seconds) instead of compile time (minutes). Weights ride
along inside the executables (the serving applies close over them as
constants), so a bundle is a self-contained deployment artifact.

    d = AdaptiveDehazer.from_experiment("experiments/x")
    d.export_precompiled("experiments/x/precompiled")   # one-time, slow

    d2 = AdaptiveDehazer.from_experiment("experiments/x",
                                         precompiled="experiments/x/precompiled")
    out, cls = d2.route_hard(images)                    # no compiles

Scope and honesty:
- A bundle is pinned to (backend, device_kind, jax version). `attach_bundle`
  refuses a mismatched bundle and the engine falls back to normal jit —
  loading a v5e bundle on a v6e never silently serves stale code (same rule
  as serving_autotune's cache key).
- Programs are keyed by exact input avals (shape + dtype). Shapes outside
  the exported set fall back to jit per program (PrecompiledDispatch), so a
  partial bundle degrades to the status quo, never to an error.
- Bundle files are pickles of XLA executables: like torch checkpoints they
  are code-equivalent artifacts — load bundles you produced yourself.

The reference has no counterpart (its TorchScript/export story is absent;
`/root/reference/main.py` re-builds models from source every run).
"""
from __future__ import annotations

import json
import os
import pickle
import warnings
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BUNDLE_VERSION = 1
MANIFEST = "MANIFEST.json"


def _env_meta() -> Dict[str, str]:
    dev = jax.devices()[0]
    return {
        "bundle_version": BUNDLE_VERSION,
        "backend": jax.default_backend(),
        "device_kind": dev.device_kind,
        "jax_version": jax.__version__,
    }


def _sig_of_args(args) -> str:
    """Filename-safe aval signature of a flat arg tuple."""
    leaves = jax.tree_util.tree_leaves(args)
    parts = []
    for a in leaves:
        a = jnp.asarray(a)
        parts.append(f"{a.dtype.name}{'x'.join(str(int(s)) for s in a.shape)}")
    return "-".join(parts)


def _fname(name: str, sig: str) -> str:
    return f"{name}__{sig}.jexec"


def export_program(jitted_fn: Callable, args: Tuple, name: str,
                   bundle_dir: str) -> str:
    """AOT-compile `jitted_fn` at `args` and serialize the executable.

    `jitted_fn` must be a jax.jit-wrapped callable (supports .lower).
    Returns the written filename. Overwrites an existing export of the
    same (name, signature).
    """
    from jax.experimental import serialize_executable as se
    os.makedirs(bundle_dir, exist_ok=True)
    sig = _sig_of_args(args)
    compiled = jitted_fn.lower(*args).compile()
    payload = se.serialize(compiled)
    # Record how many devices the executable spans: deserialize_and_load
    # defaults to ALL local devices, which breaks single-device programs on
    # a multi-device client (execute_sharded expects one shard per device).
    devs = set()
    for s in jax.tree_util.tree_leaves(compiled.input_shardings):
        devs.update(getattr(s, "device_set", ()))
    fname = _fname(name, sig)
    record = {"meta": _env_meta(), "name": name, "sig": sig,
              "num_devices": max(1, len(devs)), "payload": payload}
    tmp = os.path.join(bundle_dir, fname + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(record, f)
    os.replace(tmp, os.path.join(bundle_dir, fname))
    _update_manifest(bundle_dir, fname, name, sig)
    return fname


def _update_manifest(bundle_dir: str, fname: str, name: str, sig: str):
    path = os.path.join(bundle_dir, MANIFEST)
    manifest = {"meta": _env_meta(), "programs": {}}
    if os.path.exists(path):
        try:
            with open(path) as f:
                manifest = json.load(f)
        except (OSError, ValueError):
            pass
    manifest["meta"] = _env_meta()
    manifest.setdefault("programs", {})[fname] = {"name": name, "sig": sig}
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def set_manifest_extra(bundle_dir: str, **extra):
    """Record caller metadata (e.g. serving quant mode) in the manifest."""
    path = os.path.join(bundle_dir, MANIFEST)
    manifest = read_manifest(bundle_dir) or {"meta": _env_meta(),
                                             "programs": {}}
    manifest.setdefault("extra", {}).update(extra)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    os.replace(tmp, path)


def read_manifest(bundle_dir: str) -> Optional[Dict]:
    path = os.path.join(bundle_dir, MANIFEST)
    if not os.path.exists(path):
        return None
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def bundle_compatible(bundle_dir: str) -> Tuple[bool, str]:
    """Does the bundle match the attached runtime? (ok, reason)."""
    manifest = read_manifest(bundle_dir)
    if manifest is None:
        return False, f"no {MANIFEST} under {bundle_dir}"
    meta, here = manifest.get("meta", {}), _env_meta()
    for k in ("bundle_version", "backend", "device_kind", "jax_version"):
        if meta.get(k) != here[k]:
            return False, f"{k}: bundle={meta.get(k)!r} runtime={here[k]!r}"
    return True, "ok"


def load_bundle_programs(bundle_dir: str) -> Dict[str, Dict[str, Callable]]:
    """Load every compatible program: {name: {sig: loaded_callable}}.

    Individual files that fail to deserialize are skipped with a warning
    (the dispatcher's jit fallback covers them).
    """
    from jax.experimental import serialize_executable as se
    ok, reason = bundle_compatible(bundle_dir)
    if not ok:
        raise ValueError(f"incompatible precompiled bundle: {reason}")
    manifest = read_manifest(bundle_dir)
    table: Dict[str, Dict[str, Callable]] = {}
    for fname in manifest.get("programs", {}):
        path = os.path.join(bundle_dir, fname)
        try:
            with open(path, "rb") as f:
                record = pickle.load(f)
            n_dev = record.get("num_devices", 1)
            loaded = se.deserialize_and_load(
                *record["payload"],
                execution_devices=jax.devices()[:n_dev])
            table.setdefault(record["name"], {})[record["sig"]] = loaded
        except Exception as e:  # missing/corrupt file, PJRT refusal
            warnings.warn(f"skipping precompiled program {fname}: "
                          f"{type(e).__name__}: {e}")
    return table


class PrecompiledDispatch:
    """Shape-dispatching callable over loaded executables with jit fallback.

    Calls whose arg signature matches an exported program run the loaded
    executable (no trace, no compile); any other signature falls through to
    the original jitted function. `hits`/`misses` counters make the
    no-compile property assertable in tests.
    """
    precompiled = True

    def __init__(self, fallback: Callable, programs: Dict[str, Callable]):
        self._fallback = fallback
        self._programs = programs
        self.hits = 0
        self.misses = 0

    def __call__(self, *args):
        fn = self._programs.get(_sig_of_args(args))
        if fn is not None:
            self.hits += 1
            return fn(*args)
        self.misses += 1
        return self._fallback(*args)


def export_engine(engine, bundle_dir: str, batch_sizes: Sequence[int],
                  buckets: Optional[Sequence[int]] = None,
                  queue_buckets: Sequence[int] = (),
                  img_hw: Optional[Tuple[int, int]] = None,
                  dtype=jnp.float32, progress: Optional[Callable] = None,
                  ) -> Dict[str, str]:
    """Export a BinnedAdaptiveEngine's serving programs.

    Programs written (names are the engine attributes they accelerate):
    - `classify` / `logits` at each batch size in `batch_sizes`.
    - `step{cls}` (fused gather->branch->scatter, donated out) at every
      (batch_size, bucket) pair, bucket defaulting to the engine ladder.
    - `branch{cls}` plain applies at each size in `queue_buckets` (the
      run_queued dispatch shapes).

    img_hw defaults to 256x256. Returns {program_filename: name}.
    """
    h, w = img_hw or (256, 256)
    buckets = tuple(buckets if buckets is not None else engine.buckets)
    written: Dict[str, str] = {}

    def _jitted(fn):
        # Engines already attached to a bundle hold dispatchers; export from
        # their jit fallback (loaded executables can't be re-lowered).
        return fn._fallback if isinstance(fn, PrecompiledDispatch) else fn

    def _note(msg):
        if progress:
            progress(msg)

    for n in batch_sizes:
        x = jnp.zeros((n, h, w, 3), dtype)
        for name, fn in (("classify", _jitted(engine._classify)),
                         ("logits", _jitted(engine._logits))):
            _note(f"export {name} n={n}")
            written[export_program(fn, (x,), name, bundle_dir)] = name
        for cls, step in enumerate(engine._bucket_steps):
            for b in buckets:
                if b > max(engine.buckets):
                    continue
                idx = jnp.zeros((b,), jnp.int32)
                out = jnp.zeros((n, h, w, 3), dtype)
                name = f"step{cls}"
                _note(f"export {name} n={n} b={b}")
                written[export_program(_jitted(step), (x, idx, out), name,
                                       bundle_dir)] = name
    for cls, apply_fn in enumerate(engine.branch_applies):
        for b in queue_buckets:
            xq = jnp.zeros((b, h, w, 3), dtype)
            name = f"branch{cls}"
            _note(f"export {name} b={b}")
            written[export_program(_jitted(apply_fn), (xq,), name,
                                   bundle_dir)] = name
    return written


def attach_engine(engine, table: Dict[str, Dict[str, Callable]]) -> int:
    """Swap an engine's jitted programs for bundle-backed dispatchers.

    Unmatched shapes still reach the original jitted fns (fallback inside
    PrecompiledDispatch). Returns the number of attached executables.
    """
    attached = 0
    for name, attr in (("classify", "_classify"), ("logits", "_logits")):
        progs = table.get(name)
        if progs:
            setattr(engine, attr,
                    PrecompiledDispatch(getattr(engine, attr), progs))
            attached += len(progs)
    for cls in range(len(engine._bucket_steps)):
        progs = table.get(f"step{cls}")
        if progs:
            engine._bucket_steps[cls] = PrecompiledDispatch(
                engine._bucket_steps[cls], progs)
            attached += len(progs)
        progs = table.get(f"branch{cls}")
        if progs:
            engine.branch_applies[cls] = PrecompiledDispatch(
                engine.branch_applies[cls], progs)
            attached += len(progs)
    return attached
