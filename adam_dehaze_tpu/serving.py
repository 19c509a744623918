"""High-level serving API: load a trained experiment and dehaze images.

This is the "product" entry point a reference user lands on after training
(the reference's demo mode was an unimplemented TODO, main.py:210-215).

    dehazer = AdaptiveDehazer.from_experiment("experiments/exp1")
    out = dehazer(images_nhwc_float01)            # soft routing (default)
    out, intensity = dehazer.route_hard(images)   # binned hard routing

Modes map onto the routing engines in models/routing.py:
- soft: one fused jit, all branches + blend (throughput).
- switch: per-image lax.switch (lowest latency, exactly one branch/image).
- binned: host-binned buckets (adaptive FLOPs at batch scale).
"""
from __future__ import annotations

import os
import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from adam_dehaze_tpu.config import load_config, update_checkpoint_paths


class AdaptiveDehazer:
    def __init__(self, router, state, config, autotune: bool = False,
                 autotune_cache: Optional[str] = None,
                 precompiled: Optional[str] = None,
                 resolution_policy: Optional[str] = None,
                 lowres=()):
        self.router = router
        self.config = config
        self._variables = {"params": state.params,
                           "batch_stats": state.batch_stats}
        self._soft = jax.jit(
            lambda x: router.apply(self._variables, x, train=False))
        self._engines: Dict[str, object] = {}
        self._autotune = autotune
        self._autotune_cache = autotune_cache
        # Tuned per-branch resolution policy (resolution_autotune.py);
        # consumed by lowres="auto" in route_hard/route_hard_stream.
        self._resolution_policy_path = resolution_policy
        # Construction-time DEFAULT dial for route_hard/route_hard_stream:
        # () = full resolution; "auto" = the experiment's tuned policy
        # (quality-guarded; loud if the policy file is absent). Per-call
        # `lowres=` always overrides.
        self._default_lowres = lowres
        self.autotune_report: Dict[str, dict] = {}
        # Precompiled serving bundle (serving_export.py): loaded executables
        # keyed by program name + input signature; attached to the plain
        # binned engine and the device-binned programs as they are built.
        # An incompatible bundle (other backend / device generation / jax
        # version) is refused here and serving falls back to normal jit.
        self._bundle_table = None
        if precompiled:
            from adam_dehaze_tpu.serving_export import (
                load_bundle_programs, read_manifest)
            try:
                quant = self.config.get("tpu", {}).get("serving_quant") or None
                manifest = read_manifest(precompiled) or {}
                extra = manifest.get("extra", {})
                bundle_quant = extra.get("quant")
                if bundle_quant != quant:
                    raise ValueError(
                        f"bundle quant={bundle_quant!r} != config "
                        f"quant={quant!r} (results would differ)")
                if bool(extra.get("autotune", False)) != bool(autotune):
                    raise ValueError(
                        f"bundle autotune={extra.get('autotune')!r} != "
                        f"requested autotune={autotune!r} (the tuned "
                        "dispatch may differ from the exported programs)")
                self._bundle_table = load_bundle_programs(precompiled)
            except (ValueError, OSError) as e:
                warnings.warn(f"ignoring precompiled bundle {precompiled}: "
                              f"{e}")

    @classmethod
    def from_experiment(cls, experiment_dir: str,
                        config_path: Optional[str] = None,
                        autotune: bool = False,
                        precompiled: Optional[str] = None,
                        lowres=(),
                        ) -> "AdaptiveDehazer":
        """Load config + best joint checkpoint from an experiment dir.

        autotune=True replaces the hand-probed per-branch serving dispatch
        with an on-the-spot fair-dtype A/B over every equivalence-tested
        serving path (serving_autotune.py), cached in the experiment dir so
        later loads skip the timing.

        lowres="auto" makes the experiment's TUNED resolution policy
        (tools/autotune_resolution.py) the DEFAULT dispatch for
        route_hard/route_hard_stream — the quality-guarded dial, adopted
        per branch only where its held-out-probe PSNR cleared the floor.
        Per-call `lowres=` still overrides.

        precompiled: path to a serving bundle written by
        `export_precompiled` — serving programs load as already-compiled
        XLA executables (no trace, no compile; cold start in seconds).
        Pass precompiled="auto" to use `<experiment_dir>/precompiled` when
        it exists."""
        cfg_file = config_path or os.path.join(experiment_dir, "config.yaml")
        config = load_config(cfg_file if os.path.exists(cfg_file) else None)
        config = update_checkpoint_paths(config, experiment_dir)
        from adam_dehaze_tpu.evaluation.evaluate import _load_joint
        router, state = _load_joint(config)
        if precompiled == "auto":
            cand = os.path.join(experiment_dir, "precompiled")
            precompiled = cand if os.path.isdir(cand) else None
        return cls(router, state, config, autotune=autotune,
                   autotune_cache=os.path.join(experiment_dir,
                                               "serving_autotune.json"),
                   precompiled=precompiled,
                   resolution_policy=os.path.join(experiment_dir,
                                                  "resolution_policy.json"),
                   lowres=lowres)

    def __call__(self, images) -> np.ndarray:
        """Soft-routed dehazing: (N, H, W, 3) float [0,1] -> same."""
        dehazed, _ = self._soft(jnp.asarray(images))
        return np.asarray(dehazed)

    @staticmethod
    def _lazy(build):
        """Defer a serving-apply construction to its first call: the
        weight folds inside make_serving_apply run eager device ops
        (measured ~68 s at engine build through the remote tunnel), and a
        bundle-backed engine never traces its jit fallbacks unless a
        shape misses — so the folds should only ever run when a program
        actually needs them.

        The first call may arrive inside a jit trace (the engines trace
        these fns into their dispatch programs); under omnistaging the
        fold ops would then be staged onto THAT trace and the cached
        closure would leak its tracers into every later program.
        ensure_compile_time_eval forces the build's ops to execute
        eagerly to concrete arrays wherever it runs."""
        cell = []

        def fn(*args):
            if not cell:
                with jax.ensure_compile_time_eval():
                    cell.append(build())
            return cell[0](*args)

        return fn

    @staticmethod
    def _norm_lowres(lowres, lowres_scale: int = 2,
                     lowres_mode: str = "guided") -> Dict[str, dict]:
        """Normalise the `lowres` argument to {level: {scale, mode, radius}}.

        Accepts a tuple/list of level names (uniform scale/mode, the original
        dial form) or a dict of per-level params (the tuned-policy form,
        resolution_autotune.policy_to_lowres)."""
        if not lowres:
            return {}
        if isinstance(lowres, dict):
            return {lvl: {"scale": int(p.get("scale", 2)),
                          "mode": p.get("mode", "guided"),
                          "radius": int(p.get("radius", 4))}
                    for lvl, p in lowres.items()}
        return {lvl: {"scale": lowres_scale, "mode": lowres_mode, "radius": 4}
                for lvl in lowres}

    def _resolution_policy_lowres(self) -> Dict[str, dict]:
        """lowres='auto': per-level params from the experiment's tuned
        resolution policy (resolution_autotune.py). Loud when absent — a
        silent fallback to full resolution would misreport the serving mode
        the caller asked for."""
        from adam_dehaze_tpu.resolution_autotune import (
            load_policy,
            policy_to_lowres,
        )
        if not self._resolution_policy_path:
            raise ValueError(
                "lowres='auto' needs an experiment-backed dehazer "
                "(from_experiment) with a tuned resolution policy")
        policy = load_policy(self._resolution_policy_path)
        if policy is None:
            raise FileNotFoundError(
                f"no resolution policy at {self._resolution_policy_path}; "
                "run tools/autotune_resolution.py --experiment <dir> first")
        return policy_to_lowres(policy)

    def _branch_applies(self, lowres=(), lowres_scale: int = 2,
                        lowres_mode: str = "guided"):
        """Per-branch serving applies in INTENSITY_ORDER.

        lowres: level names served at 1/lowres_scale resolution with a
        guided-filter lift of the correction back to full res
        (ops/resolution.py) — an opt-in quality/latency dial for the
        expensive branches, NOT an equivalence-preserving path. A dict
        {level: {scale, mode, radius}} gives per-level params (the tuned
        policy form)."""
        from adam_dehaze_tpu.models.routing import INTENSITY_ORDER
        from adam_dehaze_tpu.ops.s2d import make_serving_apply
        quant = self.config.get("tpu", {}).get("serving_quant") or None
        dtype = (jnp.bfloat16 if self.config.get("tpu", {}).get(
            "compute_dtype", "bfloat16") == "bfloat16" else jnp.float32)
        fns = []
        for level in INTENSITY_ORDER:
            sub = {"params": self._variables["params"][f"models_{level}"],
                   "batch_stats": self._variables["batch_stats"][f"models_{level}"]}
            module = self.router.models[level]
            if self._autotune and quant != "int8":
                from adam_dehaze_tpu.serving_autotune import load_or_tune
                img = self.config["dataset"]["img_size"]
                fn, report = load_or_tune(
                    module, sub, dtype=dtype,
                    sample_shape=(16, img, img, 3),
                    cache_path=self._autotune_cache)
                self.autotune_report[level] = report
                fns.append(fn)
                continue
            # Lane-aligned s2d serving path for the small-channel low branch
            # (exact; ops/s2d.py), canonical apply otherwise. Construction
            # (weight folds) is deferred to first call — see _lazy.
            fn = self._lazy(
                lambda m=module, v=sub: make_serving_apply(m, v, dtype=dtype))
            if quant == "int8":
                from adam_dehaze_tpu.ops.quant import quantize_apply
                fn = (lambda x, m=module, v=sub: m.apply(v, x))
                fn = quantize_apply(fn)
            fns.append(fn)
        lowres = self._norm_lowres(lowres, lowres_scale, lowres_mode)
        if lowres:
            from adam_dehaze_tpu.ops.resolution import make_lowres_apply
            fns = [make_lowres_apply(fn, **lowres[level])
                   if level in lowres else fn
                   for level, fn in zip(INTENSITY_ORDER, fns)]
        return fns

    def _binned_engine(self, lowres=(), lowres_scale: int = 2,
                       lowres_mode: str = "guided", buckets=None):
        """buckets: optional bucket-ladder override. Quality consumers
        (evaluation) pass a single bucket — engine OUTPUTS are identical
        under any chunk plan, but every distinct bucket size is a separate
        lazily-compiled program (~minutes each through the axon remote
        compiler), so the full serving ladder would waste an hour of
        compiles on rows whose timing is never read. None = the serving
        default ladder."""
        lowres = self._norm_lowres(lowres, lowres_scale, lowres_mode)
        key = ("binned" if not lowres else "binned_lowres_" + "_".join(
            f"{lvl}-{p['scale']}-{p['mode']}-{p['radius']}"
            for lvl, p in sorted(lowres.items())))
        if buckets is not None:
            key += "_b" + "-".join(str(int(b)) for b in buckets)
        if key not in self._engines:
            from adam_dehaze_tpu.models.routing import (
                BinnedAdaptiveEngine, INTENSITY_ORDER)
            kwargs = {} if buckets is None else {"buckets": tuple(buckets)}
            engine = BinnedAdaptiveEngine(
                self._classifier_apply(),
                self._branch_applies(lowres=lowres, lowres_scale=lowres_scale,
                                     lowres_mode=lowres_mode),
                **kwargs)
            # Feed measured branch costs into the chunk planner when the
            # autotune pass timed them (winner ms per 16-batch): pad rows
            # are then traded against dispatch overhead in REAL row costs
            # per class, not the scalar default. 0.35 ms is the measured
            # steady-state per-program enqueue cost on axon (pipelined
            # dispatch; benchmarks/PROFILE.md timing notes).
            # Autotune rows are measured on the FULL-resolution applies; a
            # lowres engine's branch rows are 3-6x cheaper, so feeding these
            # costs there would overvalue pad rows and split bins into extra
            # programs (extra dispatches + lazy compiles of small buckets).
            # Lowres engines keep the scalar default instead. ms16 also
            # contains one dispatch's worth of the very overhead being
            # traded — subtract it before deriving the per-row cost.
            dispatch_ms = 0.35
            row_ms = []
            for lvl in INTENSITY_ORDER:
                rep = self.autotune_report.get(lvl) or {}
                ms16 = (rep.get("table") or {}).get(rep.get("best"))
                if not ms16:
                    break
                row_ms.append(max(float(ms16) - dispatch_ms, 1e-6) / 16.0)
            if not lowres and len(row_ms) == len(INTENSITY_ORDER):
                engine.set_chunk_costs(dispatch_ms, row_ms)
            # Attach the precompiled bundle ONLY to the plain engine: the
            # lowres variants compute different math behind identical input
            # signatures, so a shape-match there would silently serve the
            # full-resolution program. Binds hand each weightless program
            # its device-resident parameter subtree.
            if self._bundle_table and key == "binned":
                from adam_dehaze_tpu.serving_export import attach_engine
                binds = {"classify": (self._clf_sub(),),
                         "logits": (self._clf_sub(),)}
                for i, sub in enumerate(self._branch_subs()):
                    binds[f"step{i}"] = (sub,)
                    binds[f"branch{i}"] = (sub,)
                attach_engine(engine, self._bundle_table, binds)
            self._engines[key] = engine
        return self._engines[key]

    # --- parameter subtrees + weight-parameterized serving programs ------
    # (serving_export.py bundles: executables take the parameter tree as
    # their first argument so weights are never baked into the binary.)

    def _clf_sub(self):
        return {"params": self._variables["params"]["classifier"],
                "batch_stats": self._variables["batch_stats"]["classifier"]}

    def _branch_subs(self):
        from adam_dehaze_tpu.models.routing import INTENSITY_ORDER
        return [
            {"params": self._variables["params"][f"models_{lvl}"],
             "batch_stats": self._variables["batch_stats"][f"models_{lvl}"]}
            for lvl in INTENSITY_ORDER]

    def _serving_dtype(self):
        return (jnp.bfloat16 if self.config.get("tpu", {}).get(
            "compute_dtype", "bfloat16") == "bfloat16" else jnp.float32)

    def _param_programs(self):
        """Weight-parameterized twins of the binned engine's programs:
        fn(variables, ...) with the SAME serving-path dispatch as
        `_branch_applies`/`_classifier_apply` (make_serving_apply /
        make_classifier_serving_apply), so an exported program computes
        exactly what the engine's jitted program computes — the weight
        folds simply trace into the program instead of running on host."""
        from adam_dehaze_tpu.models.routing import INTENSITY_ORDER
        from adam_dehaze_tpu.ops.s2d import (
            make_classifier_serving_apply,
            make_serving_apply,
        )
        dtype = self._serving_dtype()
        clf_mod = self.router.classifier
        classify = jax.jit(lambda v, x: jnp.argmax(
            make_classifier_serving_apply(clf_mod, v, dtype)(x)[0], axis=1))
        logits = jax.jit(
            lambda v, x: make_classifier_serving_apply(clf_mod, v, dtype)(x)[0])
        steps, branches = [], []
        for lvl in INTENSITY_ORDER:
            mod = self.router.models[lvl]

            def apply_v(v, xx, m=mod):
                return make_serving_apply(m, v, dtype)(xx)

            branches.append(jax.jit(apply_v))
            steps.append(jax.jit(
                lambda v, x, idx, out, a=apply_v:
                    out.at[idx].set(a(v, jnp.take(x, idx, axis=0))),
                donate_argnums=(3,)))
        return classify, logits, steps, branches

    def _device_bind(self):
        from adam_dehaze_tpu.models.routing import INTENSITY_ORDER
        subs = self._branch_subs()
        bind = {"classifier": self._clf_sub()}
        bind.update({lvl: sub for lvl, sub in zip(INTENSITY_ORDER, subs)})
        return bind

    def _device_param_fn(self, chunk: int, spill: bool):
        """Weight-parameterized device-binned program (see _param_programs)."""
        from adam_dehaze_tpu.models.routing import (
            INTENSITY_ORDER,
            make_device_binned_infer,
        )
        from adam_dehaze_tpu.ops.s2d import (
            make_classifier_serving_apply,
            make_serving_apply,
        )
        dtype = self._serving_dtype()
        clf_mod = self.router.classifier
        models = [self.router.models[lvl] for lvl in INTENSITY_ORDER]

        def fn(v, x):
            clf = lambda xx: make_classifier_serving_apply(
                clf_mod, v["classifier"], dtype)(xx)
            applies = [
                (lambda xx, m=m, lvl=lvl: make_serving_apply(m, v[lvl],
                                                             dtype)(xx))
                for m, lvl in zip(models, INTENSITY_ORDER)]
            return make_device_binned_infer(clf, applies, chunk=chunk,
                                            spill=spill)(x)

        return jax.jit(fn)

    def _classifier_apply(self):
        sub = {"params": self._variables["params"]["classifier"],
               "batch_stats": self._variables["batch_stats"]["classifier"]}
        clf = self.router.classifier
        # s2d-stem serving path for resnet backbones (exact; ops/s2d.py —
        # the canonical 7x7/s2 stem measures ~8% of peak), canonical apply
        # for the other backbone families.
        from adam_dehaze_tpu.ops.s2d import make_classifier_serving_apply
        dtype = (jnp.bfloat16 if self.config.get("tpu", {}).get(
            "compute_dtype", "bfloat16") == "bfloat16" else jnp.float32)
        return self._lazy(
            lambda: make_classifier_serving_apply(clf, sub, dtype=dtype))

    def _resolve_lowres(self, lowres):
        """None -> the construction-time default; "auto" -> the tuned
        policy; anything else passes through (() forces full res)."""
        if lowres is None:
            lowres = self._default_lowres
        if isinstance(lowres, str) and lowres == "auto":
            lowres = self._resolution_policy_lowres()
        return lowres

    def route_hard(self, images, spill: bool = False,
                   lowres=None) -> Tuple[np.ndarray, np.ndarray]:
        """Binned hard routing: each image pays only its own branch.
        spill=True serves per-class overflow with a neighboring branch's
        free pad slots (capacity policy, models/routing.py:
        plan_capacity_spill) so skewed traffic never pays an extra padded
        bucket program; spill="up" is the quality-guarded variant (overflow
        only moves to STRONGER branches; residual top-class overflow pays a
        planned small bucket instead of a weaker branch).
        lowres=("high",) serves those branches at half resolution with a
        guided-filter lift of the correction (ops/resolution.py) — a
        quality/latency dial; see round_results/resolution_scheduling.json
        for the measured trade. lowres="auto" consumes the experiment's
        TUNED policy (resolution_autotune.py: per-branch {full, lowres}
        chosen by measured PSNR against a floor on a held-out probe set);
        lowres=None (default) uses the construction-time default
        (from_experiment(..., lowres="auto") makes the tuned policy the
        default dispatch); lowres=() forces full resolution."""
        engine = self._binned_engine(lowres=self._resolve_lowres(lowres))
        out, intensity = engine(jnp.asarray(images), spill=spill)
        return np.asarray(out), np.asarray(intensity)

    def route_hard_stream(self, batches, spill: bool = False, lowres=None):
        """Steady-state pipelined serving over an iterable of batches: the
        classifier of batch k+1 overlaps batch k's host binning round-trip
        (models/routing.py:BinnedAdaptiveEngine.run_stream). Yields
        (dehazed np.ndarray, intensity np.ndarray). lowres: see
        route_hard ("auto" = tuned policy; None = construction default;
        () = full resolution)."""
        engine = self._binned_engine(lowres=self._resolve_lowres(lowres))
        for out, intensity in engine.run_stream(batches, spill=spill):
            yield np.asarray(out), np.asarray(intensity)

    def route_hard_queued(self, batches, queue_bucket: int = 16,
                          flush: bool = True,
                          max_wait_batches: Optional[int] = None):
        """Continuous batching for class-clumped traffic: images queue per
        PREDICTED class across batch boundaries and a branch runs only on
        full same-class buckets — fidelity quality at balanced-traffic
        cost, paying bounded queueing latency (models/routing.py:
        run_queued; see evaluate_hard_routing's ordered-vs-steady rows for
        why neither fidelity nor spill is the right mode for ordered
        traffic). `max_wait_batches` hard-bounds that latency: a queued
        image dispatches (through one padded ladder program) after at most
        that many further batch arrivals even if its class bucket never
        fills. Yields (dehazed, global_indices, cls) per bucket."""
        yield from self._binned_engine().run_queued(
            batches, queue_bucket=queue_bucket, flush=flush,
            max_wait_batches=max_wait_batches)

    def route_device_binned(self, images, chunk: int = 16,
                            spill: bool = False
                            ) -> Tuple[np.ndarray, np.ndarray]:
        """Fully on-device binned hard routing: one jitted program (classify
        + sort-binning + lax.switch chunks), zero host round-trips — the
        high-throughput adaptive path on remote/tunneled runtimes.
        spill=True applies the on-device capacity plan (overflow served by a
        neighboring branch; skewed traffic runs no extra chunks)."""
        out, intensity, _ = self._device_binned_fn(chunk, spill)(
            jnp.asarray(images))
        return np.asarray(out), np.asarray(intensity)

    def _device_binned_fn(self, chunk: int, spill: bool):
        key = f"device_binned_{chunk}_{spill}"
        if key not in self._engines:
            from adam_dehaze_tpu.models.routing import make_device_binned_infer
            fn = jax.jit(make_device_binned_infer(
                self._classifier_apply(), self._branch_applies(), chunk=chunk,
                spill=spill))
            progs = (self._bundle_table or {}).get(
                f"device{chunk}_{int(spill)}")
            if progs:
                from adam_dehaze_tpu.serving_export import PrecompiledDispatch
                fn = PrecompiledDispatch(fn, progs,
                                         bind=(self._device_bind(),))
            self._engines[key] = fn
        return self._engines[key]

    # Batch-size buckets for shape-robust streaming: ragged traffic is padded
    # up to the nearest bucket so every dispatch reuses a precompiled program
    # (route_device_binned_stream retraced per input shape before; round-2
    # verdict item #5). The bucket rule itself lives in
    # models/routing.py:bucket_for (extend=True: whole batches beyond the
    # largest bucket pad to multiples of it rather than chunking).
    STREAM_BUCKETS = (1, 2, 4, 8, 16, 32, 48, 64)

    def _bucket_batch(self, n: int, buckets) -> int:
        from adam_dehaze_tpu.models.routing import bucket_for
        return bucket_for(n, buckets, extend=True)

    def route_device_binned_stream(self, batches, chunk: int = 16,
                                   depth: int = 2, buckets=None,
                                   spill: bool = False):
        """Highest-throughput serving: one on-device binned program per
        batch, enqueued asynchronously `depth` batches deep — no host label
        sync at all, so dispatch overhead and result fetch overlap device
        compute (cf. route_hard_stream, which pays a label round-trip per
        batch). Ragged batches are padded to the nearest size in `buckets`
        (pad rows repeat the last image and are sliced off the results), so
        production traffic never recompiles. Yields
        (dehazed np.ndarray, intensity np.ndarray)."""
        fn = self._device_binned_fn(chunk, spill)
        buckets = tuple(sorted(buckets or self.STREAM_BUCKETS))
        pending = []

        def dispatch(x):
            x = jnp.asarray(x)
            n = x.shape[0]
            b = self._bucket_batch(n, buckets)
            if b != n:
                x = jnp.concatenate(
                    [x, jnp.broadcast_to(x[-1:], (b - n,) + x.shape[1:])])
            return fn(x), n

        def fetch(item):
            (out, intensity, _), n = item
            return np.asarray(out)[:n], np.asarray(intensity)[:n]

        for x in batches:
            pending.append(dispatch(x))  # async
            if len(pending) >= depth:
                yield fetch(pending.pop(0))
        for item in pending:
            yield fetch(item)

    def route_switch(self, images) -> Tuple[np.ndarray, np.ndarray]:
        """Per-image lax.switch serving (lowest single-image latency)."""
        if "switch" not in self._engines:
            from adam_dehaze_tpu.models.routing import make_adaptive_infer
            self._engines["switch"] = jax.jit(make_adaptive_infer(
                self._classifier_apply(), self._branch_applies(), "switch"))
        out, intensity = self._engines["switch"](jnp.asarray(images))
        return np.asarray(out), np.asarray(intensity)

    def route_sharded(self, images, mesh=None, chunk: int = 16,
                      spill: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        """Multi-chip adaptive serving: the device-binned engine under
        shard_map over a data mesh (models/routing.py:
        make_sharded_binned_infer — per-device local binning, ZERO
        collectives added to the serving path; params replicated).

        mesh: a jax.sharding.Mesh with a 'data' axis; defaults to every
        local device on one 'data' axis. Ragged batches are padded up to a
        multiple of the axis size (pad rows repeat the last image and are
        sliced off), so any batch size serves without retracing per shape.
        spill=True applies the per-device capacity plan."""
        if mesh is None:
            from jax.sharding import Mesh
            devs = np.asarray(jax.devices())
            mesh = Mesh(devs.reshape(len(devs)), ("data",))
        n_dev = mesh.shape["data"]
        key = f"sharded_{id(mesh)}_{chunk}_{spill}"
        if key not in self._engines:
            from adam_dehaze_tpu.models.routing import make_sharded_binned_infer
            self._engines[key] = make_sharded_binned_infer(
                self._classifier_apply(), self._branch_applies(), mesh,
                chunk=chunk, spill=spill)
        fn = self._engines[key]
        images = np.asarray(images)
        n = images.shape[0]
        from adam_dehaze_tpu.models.routing import bucket_for
        ladder = (n_dev,) + tuple(b * n_dev for b in self.STREAM_BUCKETS)
        padded = bucket_for(max(n, n_dev), sorted(set(ladder)), extend=True)
        if padded > n:
            images = np.concatenate(
                [images, np.repeat(images[-1:], padded - n, axis=0)])
        out, intensity, _ = fn(jnp.asarray(images))
        return np.asarray(out)[:n], np.asarray(intensity)[:n]

    def export_precompiled(self, bundle_dir: str,
                           batch_sizes=(48,), buckets=None,
                           queue_buckets=(16,), device_buckets=(16, 48),
                           device_chunk: int = 16,
                           device_spill: bool = False,
                           progress=None) -> dict:
        """Write a precompiled serving bundle (serving_export.py).

        AOT-compiles weight-parameterized twins of the binned engine's
        programs (classifier, logits, the fused gather->branch->scatter
        steps over the bucket ladder, the plain branch applies at
        `queue_buckets`) plus the single-program device-binned path at
        `device_buckets`, and serializes every executable under
        `bundle_dir`. Weights are NOT baked in: programs take the
        parameter tree as their first argument and the loader binds the
        experiment's restored weights, so the bundle stays code-only
        (MBs, not GBs) and uploads in seconds. One-time cost ≈ a full
        serving warmup; afterwards `from_experiment(...,
        precompiled=bundle_dir)` reaches first-batch-served without any
        XLA compile. The bundle is pinned to (backend, device_kind, jax
        version) and to the quant/autotune serving mode.
        """
        from adam_dehaze_tpu.serving_export import (
            export_program,
            set_manifest_extra,
        )
        quant = self.config.get("tpu", {}).get("serving_quant") or None
        if quant:
            raise ValueError(
                f"export_precompiled does not support serving_quant="
                f"{quant!r}: exported programs are the default serving "
                "applies")
        img = self.config["dataset"]["img_size"]
        engine = self._binned_engine()  # bucket ladder source
        buckets = tuple(buckets if buckets is not None else engine.buckets)
        classify, logits, steps, branches = self._param_programs()
        clf_sub, subs = self._clf_sub(), self._branch_subs()
        written = {}

        def _note(msg):
            if progress:
                progress(msg)

        for n in batch_sizes:
            x = jnp.zeros((n, img, img, 3), jnp.float32)
            for name, fn in (("classify", classify), ("logits", logits)):
                _note(f"export {name} n={n}")
                written[export_program(fn, (clf_sub, x), name, bundle_dir,
                                       n_bound=1)] = name
            for cls, step in enumerate(steps):
                for b in buckets:
                    if b > max(engine.buckets):
                        continue
                    idx = jnp.zeros((b,), jnp.int32)
                    out = jnp.zeros((n, img, img, 3), jnp.float32)
                    name = f"step{cls}"
                    _note(f"export {name} n={n} b={b}")
                    written[export_program(step, (subs[cls], x, idx, out),
                                           name, bundle_dir,
                                           n_bound=1)] = name
        for cls, fn in enumerate(branches):
            for b in queue_buckets:
                xq = jnp.zeros((b, img, img, 3), jnp.float32)
                name = f"branch{cls}"
                _note(f"export {name} b={b}")
                written[export_program(fn, (subs[cls], xq), name, bundle_dir,
                                       n_bound=1)] = name
        dev_bind = self._device_bind()
        dev_fn = self._device_param_fn(device_chunk, device_spill)
        for b in dict.fromkeys(device_buckets):
            x = jnp.zeros((b, img, img, 3), jnp.float32)
            name = f"device{device_chunk}_{int(device_spill)}"
            _note(f"export {name} b={b}")
            written[export_program(dev_fn, (dev_bind, x), name, bundle_dir,
                                   n_bound=1)] = name
        set_manifest_extra(bundle_dir, quant=quant, autotune=self._autotune)
        return written

    def classify(self, images) -> np.ndarray:
        """Fog-intensity predictions (N,) in {0: low, 1: medium, 2: high}."""
        logits, _ = self._classifier_apply()(jnp.asarray(images))
        return np.asarray(jnp.argmax(logits, axis=1))
