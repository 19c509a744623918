"""Precompiled serving bundles: export AOT-compiled serving programs to
disk and reload them without tracing OR compiling.

Why this exists: XLA compilation of the full serving program set is the
dominant cold-start cost — on the remote-tunneled runtime used here the
persistent compilation cache does not help (compiles happen terminal-side,
CLAUDE.md) and a fresh `AdaptiveDehazer` pays minutes of compiles before
the first image is served. A precompiled bundle moves that cost to a
one-time export step: `deserialize_and_load` hands the PJRT runtime an
already-compiled executable, so a cold process reaches first-batch-served
in load time (seconds) instead of compile time (minutes).

    d = AdaptiveDehazer.from_experiment("experiments/x")
    d.export_precompiled("experiments/x/precompiled")   # one-time, slow

    d2 = AdaptiveDehazer.from_experiment("experiments/x",
                                         precompiled="experiments/x/precompiled")
    out, cls = d2.route_hard(images)                    # no compiles

Weights are NOT baked into the executables. The first design closed the
serving applies over their parameters, so AOT lowering embedded the weight
tensors as constants in EVERY program — a 3.3 GB bundle for the trained
system (the high branch duplicated across all 6 bucket programs) whose
device upload cost ~340 s at first execution, eating the compile win.
Exported programs instead take the parameter tree as their FIRST argument
(`n_bound=1`): executables are code-only (KBs-MBs), and at attach time the
dispatcher binds the experiment's already-restored, device-resident
weights. `bound_sig` (a hash of the bound tree's avals) is checked at
attach so a bundle never silently runs with a mismatched tree.

Scope and honesty:
- A bundle is pinned to (backend, device_kind, jax version). Loading
  refuses a mismatched bundle and the engine falls back to normal jit —
  a v5e bundle on a v6e never silently serves stale code (same rule as
  serving_autotune's cache key).
- Programs are keyed by exact unbound input avals (shape + dtype). Shapes
  outside the exported set fall back to jit per program
  (PrecompiledDispatch), so a partial bundle degrades to the status quo,
  never to an error.
- Bundle files are pickles of XLA executables: like torch checkpoints they
  are code-equivalent artifacts — load bundles you produced yourself.

The reference has no counterpart (its TorchScript/export story is absent;
`/root/reference/main.py` re-builds models from source every run).
"""
from __future__ import annotations

import hashlib
import json
import os
import pickle
import warnings
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

BUNDLE_VERSION = 2
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
    """Filename-safe aval signature of a flat arg tuple.

    Runs on every PrecompiledDispatch call, so it must read dtype/shape
    without materializing: jnp.asarray on a host numpy batch would pay a
    full host->device transfer just to compute the dispatch key."""
    leaves = jax.tree_util.tree_leaves(args)
    parts = []
    for a in leaves:
        dt, shp = getattr(a, "dtype", None), getattr(a, "shape", None)
        if dt is None or shp is None:  # python scalar / list leaf
            a = jnp.asarray(a)
            dt, shp = a.dtype, a.shape
        # canonicalize like jnp.asarray would (f64 host batch -> the f32
        # executable's key) so the key matches what tracing will see
        dt = jax.dtypes.canonicalize_dtype(jnp.dtype(dt))
        parts.append(
            f"{dt.name}{'x'.join(str(int(s)) for s in shp)}")
    sig = "-".join(parts)
    if len(sig) > 96:  # param trees: hundreds of leaves -> hash
        return "h" + hashlib.sha1(sig.encode()).hexdigest()[:20]
    return sig


def _fname(name: str, sig: str) -> str:
    return f"{name}__{sig}.jexec"


def export_program(jitted_fn: Callable, args: Tuple, name: str,
                   bundle_dir: str, n_bound: int = 0) -> str:
    """AOT-compile `jitted_fn` at `args` and serialize the executable.

    `jitted_fn` must be a jax.jit-wrapped callable (supports .lower).
    The first `n_bound` args are BIND-time inputs (e.g. the parameter
    tree): they are part of the compiled program's signature but not of
    the dispatch key — at load, `PrecompiledDispatch` binds concrete
    values for them and dispatches on the remaining args only.
    Returns the written filename. Overwrites an existing export of the
    same (name, signature).
    """
    from jax.experimental import serialize_executable as se
    os.makedirs(bundle_dir, exist_ok=True)
    sig = _sig_of_args(args[n_bound:])
    bound_sig = _sig_of_args(args[:n_bound]) if n_bound else ""
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
              "n_bound": n_bound, "bound_sig": bound_sig,
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


class LoadedProgram:
    """A deserialized executable plus its bind contract."""

    def __init__(self, loaded: Callable, n_bound: int, bound_sig: str):
        self._loaded = loaded
        self.n_bound = n_bound
        self.bound_sig = bound_sig

    def __call__(self, *args):
        return self._loaded(*args)


def load_bundle_programs(bundle_dir: str) -> Dict[str, Dict[str, Callable]]:
    """Load every compatible program: {name: {sig: LoadedProgram}}.

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
            table.setdefault(record["name"], {})[record["sig"]] = (
                LoadedProgram(loaded, record.get("n_bound", 0),
                              record.get("bound_sig", "")))
        except Exception as e:  # missing/corrupt file, PJRT refusal
            warnings.warn(f"skipping precompiled program {fname}: "
                          f"{type(e).__name__}: {e}")
    return table


class PrecompiledDispatch:
    """Shape-dispatching callable over loaded executables with jit fallback.

    Calls whose UNBOUND arg signature matches an exported program run the
    loaded executable (no trace, no compile), with `bind` (e.g. the
    device-resident parameter tree) prepended; any other signature falls
    through to the original jitted function. `hits`/`misses` counters make
    the no-compile property assertable in tests.
    """
    precompiled = True

    def __init__(self, fallback: Callable, programs: Dict[str, Callable],
                 bind: Tuple = ()):
        self._fallback = fallback
        self._bind = tuple(bind)
        bind_sig = _sig_of_args(self._bind) if self._bind else ""
        self._programs = {}
        for sig, prog in programs.items():
            want = getattr(prog, "bound_sig", "") or ""
            n_bound = getattr(prog, "n_bound", 0)
            if n_bound and (len(self._bind) != n_bound
                            or want != bind_sig):
                warnings.warn(
                    f"precompiled program {sig}: bound-arg signature "
                    f"mismatch (bundle {want!r} vs runtime {bind_sig!r}) — "
                    "falling back to jit for this program")
                continue
            self._programs[sig] = prog
        self.hits = 0
        self.misses = 0

    def __call__(self, *args):
        fn = self._programs.get(_sig_of_args(args))
        if fn is not None:
            self.hits += 1
            if getattr(fn, "n_bound", 0):
                return fn(*self._bind, *args)
            return fn(*args)
        self.misses += 1
        return self._fallback(*args)


def attach_engine(engine, table: Dict[str, Dict[str, Callable]],
                  binds: Optional[Dict[str, Tuple]] = None) -> int:
    """Swap an engine's jitted programs for bundle-backed dispatchers.

    binds: {program_name: bind_tuple} — the values prepended to every
    loaded-executable call of that program (the parameter trees for
    weightless n_bound=1 programs; omit/empty for weight-baked programs).
    Unmatched shapes still reach the original jitted fns (fallback inside
    PrecompiledDispatch). Returns the number of attached executables.
    """
    binds = binds or {}
    attached = 0
    for name, attr in (("classify", "_classify"), ("logits", "_logits")):
        progs = table.get(name)
        if progs:
            d = PrecompiledDispatch(getattr(engine, attr), progs,
                                    bind=binds.get(name, ()))
            setattr(engine, attr, d)
            attached += len(d._programs)
    for cls in range(len(engine._bucket_steps)):
        progs = table.get(f"step{cls}")
        if progs:
            d = PrecompiledDispatch(engine._bucket_steps[cls], progs,
                                    bind=binds.get(f"step{cls}", ()))
            engine._bucket_steps[cls] = d
            attached += len(d._programs)
        progs = table.get(f"branch{cls}")
        if progs:
            d = PrecompiledDispatch(engine.branch_applies[cls], progs,
                                    bind=binds.get(f"branch{cls}", ()))
            engine.branch_applies[cls] = d
            attached += len(d._programs)
    return attached
