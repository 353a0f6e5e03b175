"""BaseTrainer: the SPMD execution engine.

Reference parity (``/root/reference/antmmf/trainers/base_trainer.py:90-954``):
run_type gating, model/optimizer/extras loading, the epoch/iteration hot loop,
eval-single-batch at log_interval (:805-814), full validation + early stopping at
snapshot_interval (:768-803), loss = sum of per-loss means (:677-681), meter
updates with cross-replica reduction (:692-717), inference/prediction dumping
(:892-954).

TPU-native redesign (SURVEY.md §7):
  * ``_forward_pass``/``_backward``/``_run_scheduler`` collapse into ONE jitted
    ``train_step(state, batch)`` under pjit over the device mesh — forward, loss,
    grad, optimizer update, and metric reduction compile into a single XLA
    program; GSPMD inserts the gradient all-reduce (replacing DDP) and the
    embedding all-gathers for global-negative contrastive losses;
  * AMP/GradScaler is gone: bf16 compute with fp32 params/norms by dtype policy;
  * grad accumulation is optax.MultiSteps; DP/DDP/FSDP are mesh axis sizes;
  * the host loop only feeds sharded batches (double-buffered via dispatch-ahead:
    device_put of batch N+1 overlaps step N) and reads back scalars at
    log_interval — device→host sync happens nowhere else.
"""

from __future__ import annotations

import itertools
import math
import os
import time
from typing import Any, Dict, Iterator, List, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np

from antmmf_tpu.common.checkpoint import Checkpoint
from antmmf_tpu.common.configuration import convert_to_config
from antmmf_tpu.common.meter import Meter
from antmmf_tpu.common.registry import registry
from antmmf_tpu.common.task_loader import TaskLoader
from antmmf_tpu.models.base_model import ModelShell, build_model
from antmmf_tpu.modules.metrics.evaluators import build_evaluator
from antmmf_tpu.optimizer.build import build_optimizer
from antmmf_tpu.parallel import collectives as coll
from antmmf_tpu.parallel.mesh import batch_spec, build_mesh
from antmmf_tpu.parallel.state_sharding import shard_state
from antmmf_tpu.trainers.train_state import TrainState
from antmmf_tpu.utils.early_stopping import EarlyStopping
from antmmf_tpu.utils.logger import Logger
from antmmf_tpu.utils.timer import Timer


def _remat_policy(name: str):
    """Map training_parameters.remat_policy to a jax.checkpoint policy.

    ``none`` disables remat; other names resolve against
    ``jax.checkpoint_policies`` (dots_saveable, everything_saveable,
    nothing_saveable, dots_with_no_batch_dims_saveable, ...) with the
    base.yml alias ``checkpoint_dots_with_no_batch_dims`` accepted.
    """
    name = str(name or "none")
    if name in ("none", "", "null"):
        return None
    aliases = {
        "checkpoint_dots": "dots_saveable",
        "checkpoint_dots_with_no_batch_dims":
            "dots_with_no_batch_dims_saveable",
    }
    name = aliases.get(name, name)
    policy = getattr(jax.checkpoint_policies, name, None)
    if policy is None:
        raise ValueError(
            f"unknown training_parameters.remat_policy: {name!r}")
    return policy


@registry.register_trainer("base_trainer")
class BaseTrainer:
    def __init__(self, config: Mapping):
        self.config = convert_to_config(config)
        self.tp = self.config.get("training_parameters", {})
        self.run_type = self.tp.get("run_type", "train+inference")
        self.profiler: Dict[str, float] = {}

    # ===================================================================== load
    def load(self) -> None:
        self._init_device_and_seed()
        self.writer = Logger(self.config)
        registry.register("writer", self.writer)
        registry.register("config", self.config)
        self.writer.write(f"devices: {jax.devices()}; mesh: {dict(self.mesh.shape)}")

        self.load_task()
        self.load_model()
        self.load_optimizer()
        self.load_extras()
        self.compile_steps()

    def _init_device_and_seed(self) -> None:
        coll.init_distributed()
        device = str(self.tp.get("device", "auto"))
        if device == "cpu" and jax.default_backend() not in ("cpu",):
            jax.config.update("jax_platforms", "cpu")
        # debug / infra knobs (reference's anomaly-detect + deterministic-cudnn
        # analogues, base_trainer.py:500-503 / env.py:29-31)
        if bool(self.tp.get("debug_nans", False)):
            jax.config.update("jax_debug_nans", True)
        cache_dir = self.tp.get("compilation_cache_dir")
        if cache_dir:
            jax.config.update("jax_compilation_cache_dir", str(cache_dir))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        seed = self.tp.get("seed")
        self.seed = int(seed) if seed is not None else int.from_bytes(os.urandom(2), "little")
        self.rng = jax.random.PRNGKey(self.seed)
        self.mesh = build_mesh(self.tp.get("mesh", {"data": -1}))
        # modules with a sequence_parallel knob resolve the active mesh here
        registry.register("mesh", self.mesh)
        self.batch_sharding_ = jax.sharding.NamedSharding(self.mesh, batch_spec())
        # stacked [K, batch, ...] windows: leading scan axis replicated
        self.window_sharding_ = jax.sharding.NamedSharding(
            self.mesh, jax.sharding.PartitionSpec(None, *batch_spec()))

    def load_task(self) -> None:
        self.task_loader = TaskLoader(self.config)
        run_types = set()
        if "train" in self.run_type:
            run_types.update(("train", "val"))
        if "val" in self.run_type:
            run_types.add("val")
        if "inference" in self.run_type or "predict" in self.run_type or "test" in self.run_type:
            run_types.add("test")
        self.task_loader.load_task(sorted(run_types))
        self.task_loader.make_dataloaders()

    def load_model(self) -> None:
        self.model_name = self.tp.get("model", None)
        self.shell: ModelShell = build_model(self.config, self.model_name)
        if self.model_name is None:
            self.model_name = list(self.config.get("model_attributes", {}).keys())[0]
        example = self._example_batch()
        self.rng, init_rng = jax.random.split(self.rng)
        t0 = time.time()
        variables = self.shell.init(init_rng, example)
        self.writer.write(f"model init in {time.time() - t0:.1f}s; "
                          f"params: {_param_count(variables):,}")
        self._init_variables = variables

    def _example_batch(self) -> Dict[str, jnp.ndarray]:
        loaders = (self.task_loader.get_loaders("train")
                   or self.task_loader.get_loaders("val")
                   or self.task_loader.get_loaders("test"))
        if not loaders:
            raise RuntimeError("No datasets configured")
        first = next(iter(loaders[0]))
        self._cached_first_batch = first
        return {k: jnp.asarray(v) for k, v in first.arrays().items()}

    def load_optimizer(self) -> None:
        # model-supplied schedule (reference get_custom_scheduler hook,
        # base_trainer.py:445-465): module.custom_lr_schedule(tp) -> fn
        hook = getattr(self.shell.module, "custom_lr_schedule", None)
        custom = hook(self.tp) if callable(hook) else None
        opt_cfg = dict(self.config.get("optimizer_attributes", {}) or {})
        # model-supplied param grouping (reference get_optimizer_parameters,
        # univl_video_ret.py:482-520 — e.g. pretrained towers at
        # encoder_lr_decay×lr): module.optimizer_lr_multipliers(tp) ->
        # [[path_regex, mult], ...]; config-provided rules take precedence
        # (listed first — first match wins in make_lr_multiplier_mask)
        grouping = getattr(self.shell.module, "optimizer_lr_multipliers", None)
        if callable(grouping):
            model_mults = [list(m) for m in (grouping(self.tp) or [])]
            if model_mults:
                opt_cfg["lr_multipliers"] = (
                    [list(m) for m in (opt_cfg.get("lr_multipliers") or [])]
                    + model_mults)
        self.tx, self.lr_schedule = build_optimizer(
            self._init_variables["params"],
            opt_cfg,
            self.tp,
            custom_schedule=custom,
        )

    def load_extras(self) -> None:
        self.rng, state_rng = jax.random.split(self.rng)
        # full-MoCo momentum towers (reference moco_utils.py:13-56): the EMA
        # copy of the tower params lives as a `momentum` collection in the
        # train state; the jitted step computes key embeddings with it and
        # EMA-updates it
        self._moco_m = 0.0
        if getattr(self.shell.module, "with_momentum", False):
            from antmmf_tpu.modules import moco as moco_mod

            names = getattr(self.shell.module, "momentum_modules", None) or \
                [k for k in ("base",) if k in self._init_variables["params"]]
            src = {k: self._init_variables["params"][k] for k in names} \
                if names else dict(self._init_variables["params"])
            self._init_variables = dict(self._init_variables)
            self._init_variables["momentum"] = \
                moco_mod.init_momentum_params(src)
            self._moco_m = float(getattr(self.shell.module, "momentum", 0.999))
        state = TrainState.create(self._init_variables, self.tx, state_rng)
        rules = self.tp.get("param_sharding_rules", None)
        self.state = shard_state(state, self.mesh, rules)
        del self._init_variables

        self.checkpoint = Checkpoint(self.config, self.writer)
        self.state, resume_info = self.checkpoint.resume(self.state, self.tp)
        self.writer.write(f"checkpoint: {resume_info}")

        self.meter = Meter()
        self.early_stopping = EarlyStopping(
            monitored_metric=self.tp.get("monitored_metric", "total_loss"),
            patience=int(self.tp.get("patience", 30000)),
            minimize=bool(self.tp.get("metric_minimize", True)),
            should_stop=bool(self.tp.get("should_early_stop", False)),
        )
        self.max_iterations = self.tp.get("max_iterations", math.inf)
        if self.max_iterations in (".inf", math.inf, None):
            self.max_iterations = math.inf
        else:
            self.max_iterations = int(self.max_iterations)
        self.max_epochs = self.tp.get("max_epochs")
        if self.max_epochs is not None:
            sized = [l for l in self.task_loader.get_loaders("train")
                     if hasattr(l, "__len__")]
            if len(sized) < len(self.task_loader.get_loaders("train")):
                # streaming loaders have no length; epochs are then bounded by
                # the loop's own epoch counter, not an iteration budget
                self.writer.write(
                    "max_epochs with streaming datasets: epoch length unknown, "
                    "bounding by epoch count only", level="warning")
            else:
                epoch_len = sum(len(l) for l in sized) or 1
                self.max_iterations = min(self.max_iterations,
                                          int(self.max_epochs) * epoch_len)
        self.log_interval = int(self.tp.get("log_interval", 100))
        self.snapshot_interval = int(self.tp.get("snapshot_interval", 1000))
        self.evaluator = build_evaluator(self.tp.get("evaluator", None))

        from antmmf_tpu.common.metrics_reporter import MetricsReporter

        self.metrics_reporter = MetricsReporter(self.config, self.writer)

    # ================================================================== compile
    def compile_steps(self) -> None:
        shell = self.shell
        tx = self.tx
        moco_m = self._moco_m if hasattr(self, "_moco_m") else 0.0
        remat = _remat_policy(self.tp.get("remat_policy", "none"))

        def train_step(state: TrainState, batch: Mapping[str, jnp.ndarray]):
            step_rng = jax.random.fold_in(state.rng, state.step)

            if moco_m > 0.0 and "momentum" in state.variables:
                # key forward with the momentum towers (stop-gradient): splice
                # the EMA subtrees over the online params
                mom = state.variables["momentum"]
                key_params = {**state.variables["params"], **mom}
                key_vars = {k: v for k, v in state.variables.items()
                            if k != "momentum"}
                key_vars["params"] = key_params
                key_out = shell.apply(key_vars, batch, deterministic=True)
                batch = dict(batch)
                if "text_embed" in key_out:
                    batch["_moco_key_text"] = jax.lax.stop_gradient(
                        key_out["text_embed"])
                if "visual_embed" in key_out:
                    batch["_moco_key_video"] = jax.lax.stop_gradient(
                        key_out["visual_embed"])

            def loss_of(p):
                variables = {k: v for k, v in state.variables.items()
                             if k != "momentum"}
                variables["params"] = p
                loss, (output, scalars) = shell.loss_fn(
                    variables, batch,
                    rngs={"dropout": step_rng}, deterministic=False,
                )
                updated = output.get("_updated_collections", {})
                return loss, (scalars, updated)

            if remat is not None:
                # training_parameters.remat_policy: rematerialize the forward
                # under the declared XLA policy (dots_saveable keeps only
                # matmul outputs — the AMP-era activation-memory knob the
                # reference lacks; reference trades memory via fp16 AMP only,
                # base_trainer.py:575-607)
                loss_of = jax.checkpoint(loss_of, policy=remat)

            (loss, (scalars, updated)), grads = jax.value_and_grad(
                loss_of, has_aux=True)(state.params)
            new_state = state.apply_gradients(grads, tx)
            if updated:  # thread MoCo queues / batch stats functionally
                new_vars = dict(new_state.variables)
                new_vars.update(updated)
                new_state = new_state.replace(variables=new_vars)
            if moco_m > 0.0 and "momentum" in state.variables:
                from antmmf_tpu.modules import moco as moco_mod

                mom = state.variables["momentum"]
                new_mom = moco_mod.momentum_update(
                    mom, {k: new_state.params[k] for k in mom}, moco_m)
                new_vars = dict(new_state.variables)
                new_vars["momentum"] = new_mom
                new_state = new_state.replace(variables=new_vars)
            scalars["grad_norm"] = optax_global_norm(grads)
            return new_state, scalars

        def eval_step(state: TrainState, batch: Mapping[str, jnp.ndarray]):
            loss, (output, scalars) = shell.loss_fn(
                state.variables, batch, rngs=None, deterministic=True,
            )
            keep = {k: v for k, v in output.items()
                    if isinstance(v, jnp.ndarray) or hasattr(v, "shape")}
            return scalars, keep

        donate = bool(self.tp.get("donate_state", True))

        def _in_mesh(fn, mesh=self.mesh):
            # trace/dispatch inside the mesh context so bare-PartitionSpec
            # activation annotations bind (shard_batch_dim keeps remat-saved
            # layer boundaries SHARDED; without the context they silently
            # no-op and GSPMD stores them replicated — AOT measured
            # ~50-65 GB/device of temp at 7B scale)
            def wrapped(*a, **k):
                with mesh:
                    return fn(*a, **k)

            return wrapped

        self._train_step = _in_mesh(jax.jit(
            train_step, donate_argnums=(0,) if donate else ()))
        self._eval_step = _in_mesh(jax.jit(eval_step))

        # Multi-step dispatch windows: scan K stacked batches inside ONE jit
        # so the host dispatches once per window (the training analog of the
        # serving engine's decode windows). MEASURED (BASELINE.md round-4
        # windows table): pipelined per-step dispatch already hides relay
        # latency (393 vs 391 clips/s at K=4 — within noise); the ~30%
        # penalty exists only when each step host-syncs (284 clips/s), so
        # windows pay off exactly when per-step readback is forced (per-step
        # logging/metrics). Numerics are exactly K sequential steps:
        # per-step rngs fold state.step, and MoCo queues/batch stats thread
        # functionally.
        self.steps_per_dispatch = max(
            1, int(self.tp.get("steps_per_dispatch", 1)))
        if self.steps_per_dispatch > 1:
            def train_window(state: TrainState, stacked):
                return jax.lax.scan(train_step, state, stacked)

            self._train_window = _in_mesh(jax.jit(
                train_window, donate_argnums=(0,) if donate else ()))

    # ==================================================================== train
    def train(self) -> None:
        if "train" not in self.run_type:
            self.inference()
            return
        tp = self.tp
        old_sigterm = self._install_preemption_handler()
        try:
            self.writer.write(
                f"Starting training: max_iterations={self.max_iterations}")
            self._profile_flops()
            timer = Timer()
            iteration = int(self.state.step)
            # ETA baseline: after resume, per-iter time must divide by the
            # iterations run THIS session, not since step 0
            self._start_iter = iteration
            epoch = 0
            should_stop = False
            val_batch = self._first_val_batch()

            while iteration < self.max_iterations and not should_stop:
                self.task_loader.seed_sampler("train", epoch)
                train_loaders = self.task_loader.get_loaders("train")
                if not train_loaders:
                    raise RuntimeError(
                        "run_type includes train but no train datasets")
                from antmmf_tpu.datasets.loader import prefetch_to_device

                batches = (b for b in itertools.chain(*train_loaders)
                           if b.get_batch_size() > 0)
                if getattr(self, "steps_per_dispatch", 1) > 1:
                    iteration, should_stop, exit_now = \
                        self._train_epoch_windows(
                            batches, iteration, val_batch, timer)
                    if exit_now:
                        return
                    if should_stop:
                        break
                    epoch += 1
                    if (self.max_epochs is not None
                            and epoch >= int(self.max_epochs)):
                        break
                    continue
                profile_at = int(self.tp.get("profile_at_iteration", 0) or 0)
                for sharded in prefetch_to_device(batches, self._shard_batch):
                    iteration += 1
                    if iteration > self.max_iterations:
                        break
                    if profile_at and iteration == profile_at:
                        self._capture_profile(sharded)
                    self.state, scalars = self._train_step(self.state, sharded)

                    if self._preempted:
                        # graceful preemption (TPU-pod SIGTERM): persist
                        # state, exit cleanly; `resume: true` continues here
                        self.checkpoint.save(self.state, iteration)
                        self.checkpoint.finalize_writes()
                        self.writer.write(
                            f"preemption checkpoint saved @ iter {iteration};"
                            " exiting", "warning")
                        return
                    if iteration % self.log_interval == 0:
                        self._logistics_log(iteration, scalars, val_batch,
                                            timer)
                    if iteration % self.snapshot_interval == 0:
                        should_stop = self._try_full_validation(iteration)
                        if should_stop:
                            break
                epoch += 1
                if self.max_epochs is not None and epoch >= int(self.max_epochs):
                    break
        finally:
            self._restore_sigterm(old_sigterm)
        self.finalize(iteration)

    def _install_preemption_handler(self):
        """SIGTERM → checkpoint-and-exit at the next step boundary (the
        graceful half of the reference launcher's terminate-survivors flow,
        utils/launch.py:199-217; maintenance events and preemptible pods
        deliver SIGTERM with a grace window). Main-thread only; disable
        with ``checkpoint_on_preemption: false``."""
        import signal
        import threading

        self._preempted = False
        self._sigterm_installed = False
        if not bool(self.tp.get("checkpoint_on_preemption", True)):
            return None
        if threading.current_thread() is not threading.main_thread():
            return None

        def _on_term(signum, frame):
            self._preempted = True

        try:
            old = signal.signal(signal.SIGTERM, _on_term)
        except (ValueError, OSError):  # non-main interpreter contexts
            return None
        self._sigterm_installed = True
        return old

    def _restore_sigterm(self, old) -> None:
        if getattr(self, "_sigterm_installed", False):
            import signal

            # signal.signal returns None when the previous handler was set
            # outside Python — restore the OS default in that case
            signal.signal(signal.SIGTERM, old if old is not None
                          else signal.SIG_DFL)
            self._sigterm_installed = False

    def _capture_profile(self, sharded_batch) -> None:
        """One-step jax.profiler trace (reference's phase timers + CUDA-sync
        profiling, base_trainer.py:929-935, replaced by a real XLA trace)."""
        trace_dir = os.path.join(
            self.tp.get("save_dir", "./save"), "profile")
        try:
            with jax.profiler.trace(trace_dir):
                state, scalars = self._train_step(self.state, sharded_batch)
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(),
                    scalars)
                self.state = state
            self.writer.write(f"profiler trace written to {trace_dir}")
        except Exception as e:  # profiling must never break training
            self.writer.write(f"profiler unavailable: {e}", level="warning")

    def _profile_flops(self) -> None:
        """FLOPs accounting via XLA cost analysis of the compiled step (the
        reference's MetricsReporter dry-run, metrics_reporter.py:138-151)."""
        try:
            batch = self._shard_batch(self._cached_first_batch)
            compiled = self._train_step.lower(self.state, batch).compile()
            flops = self.metrics_reporter.profile_step(compiled)
            if flops:
                self.writer.write(
                    f"train step cost: {flops / 1e12:.3f} TFLOPs "
                    f"({flops:.3e} flops)")
                self.metrics_reporter.report({
                    "event": "train_step_flops", "flops": flops,
                    "world_size": jax.process_count()})
        except Exception as e:  # profiling must never break training
            self.writer.write(f"FLOPs profile unavailable: {e}", level="warning")

    @staticmethod
    def _find_word_embedding(tree: Mapping):
        """Locate the text word-embedding table in a (grad or param) tree."""
        if isinstance(tree, Mapping):
            if "word_embeddings" in tree and isinstance(
                    tree["word_embeddings"], Mapping):
                return tree["word_embeddings"].get("embedding")
            for v in tree.values():
                found = BaseTrainer._find_word_embedding(v) \
                    if isinstance(v, Mapping) else None
                if found is not None:
                    return found
        return None

    def interpret(self, dataset_type: str = "val", max_batches: int = 4,
                  export_dir: Optional[str] = None):
        """Saliency interpretation loop (reference base_trainer.py:834-850).

        Token saliency = |∂L/∂E[row] ⊙ E[row]| gathered per input token — the
        embedding-table-gradient form of simple-gradient saliency (equivalent
        to the reference's forward-hook-on-embedding trick because each token's
        embedding enters the graph only through its table row).
        """
        results = []
        for batch in itertools.chain(*self.task_loader.get_loaders(dataset_type)):
            arrays = self._shard_batch(batch)
            ids_key = next((k for k in ("caption_input_ids", "input_ids")
                            if k in arrays), None)
            if ids_key is None:
                break
            grads = jax.grad(lambda v: self.shell.loss_fn(
                v, arrays, deterministic=True)[0])(self.state.variables)
            table = self._find_word_embedding(self.state.variables["params"])
            gtable = self._find_word_embedding(grads["params"])
            if table is None or gtable is None:
                raise RuntimeError("Model has no word_embeddings table to "
                                   "interpret")
            ids = np.asarray(arrays[ids_key])
            emb = np.asarray(jax.device_get(table))[ids]
            gemb = np.asarray(jax.device_get(gtable))[ids]
            sal = np.abs((gemb * emb).sum(-1))
            sal = sal / np.maximum(sal.sum(-1, keepdims=True), 1e-9)
            results.append({"saliency": sal, "input_ids": ids})
            if len(results) >= max_batches:
                break
        if export_dir:
            from antmmf_tpu.modules.interpret.saliency import export_saliency

            paths = export_saliency(results, export_dir)
            self.writer.write(f"saliency exported: {paths[-1]}")
        return results

    def _first_val_batch(self):
        loaders = self.task_loader.get_loaders("val")
        if not loaders:
            return None
        try:
            return next(iter(loaders[0]))
        except StopIteration:
            return None

    def _train_epoch_windows(self, batches, iteration, val_batch, timer):
        """One epoch under ``steps_per_dispatch: K``: the host dispatches one
        jitted ``lax.scan`` over K stacked batches and syncs once per window
        instead of once per step. log/snapshot intervals fire at the first
        window edge after a step crossed a boundary (cadence rounds up to K;
        logged scalars are the window's last step). Remainder stacks (< K at
        epoch end, budget exhaustion, or a mid-chain shape change) run
        through the per-step jit. Returns (iteration, should_stop, exit_now).
        """
        from antmmf_tpu.datasets.loader import (
            prefetch_to_device,
            stack_windows,
        )

        budget = self.max_iterations - iteration
        if budget <= 0:
            return iteration, False, False
        stacks = stack_windows((b.arrays() for b in batches),
                               self.steps_per_dispatch, budget=budget)
        should_stop = False
        for stacked, k in prefetch_to_device(stacks, self._shard_window):
            start = iteration
            if k == self.steps_per_dispatch:
                self.state, wscalars = self._train_window(self.state, stacked)
                scalars = jax.tree_util.tree_map(lambda x: x[-1], wscalars)
                iteration += k
            else:
                for i in range(k):
                    one = jax.tree_util.tree_map(
                        lambda x, i=i: x[i], stacked)
                    self.state, scalars = self._train_step(self.state, one)
                    iteration += 1
            if self._preempted:
                self.checkpoint.save(self.state, iteration)
                self.checkpoint.finalize_writes()
                self.writer.write(
                    f"preemption checkpoint saved @ iter {iteration};"
                    " exiting", "warning")
                return iteration, True, True
            crossed = range(start + 1, iteration + 1)
            if any(j % self.log_interval == 0 for j in crossed):
                self._logistics_log(iteration, scalars, val_batch, timer)
            if any(j % self.snapshot_interval == 0 for j in crossed):
                should_stop = self._try_full_validation(iteration)
                if should_stop:
                    break
            if iteration >= self.max_iterations:
                break
        return iteration, should_stop, False

    def _shard_window(self, item):
        stacked, k = item
        if jax.process_count() == 1:
            return jax.device_put(stacked, self.window_sharding_), k
        return {
            f: jax.make_array_from_process_local_data(
                self.window_sharding_, np.asarray(v))
            for f, v in stacked.items()
        }, k

    def _shard_batch(self, batch) -> Dict[str, jnp.ndarray]:
        arrays = batch.arrays()
        if jax.process_count() == 1:
            return jax.device_put(arrays, self.batch_sharding_)
        return {
            k: jax.make_array_from_process_local_data(self.batch_sharding_, np.asarray(v))
            for k, v in arrays.items()
        }

    def _logistics_log(self, iteration, scalars, val_batch, timer) -> None:
        host_scalars = {f"train/{k}": float(v) for k, v in
                        jax.device_get(scalars).items()}
        if val_batch is not None:
            vscal, _ = self._eval_step(self.state, self._shard_batch(val_batch))
            host_scalars.update({f"val/{k}": float(v)
                                 for k, v in jax.device_get(vscal).items()})
        host_scalars["lr"] = float(self.lr_schedule(iteration))
        self.meter.update(host_scalars)
        self.writer.add_scalars(host_scalars, iteration)
        eta = ""
        if self.max_iterations != math.inf:
            per_iter = timer.unix_time_since_start() / max(1, iteration - int(
                getattr(self, "_start_iter", 0)))
            eta = f", eta {int(per_iter * (self.max_iterations - iteration))}s"
        self.writer.write(
            f"iter {iteration}/{self.max_iterations}: {self.meter}{eta}"
        )

    # ================================================================ validation
    def _try_full_validation(self, iteration: int) -> bool:
        metrics = self.evaluate_set("val")
        named = {f"val/{k}": v for k, v in metrics.items()}
        self.writer.write(f"full val @ {iteration}: " + ", ".join(
            f"{k}={v:.4f}" for k, v in named.items()))
        self.writer.add_scalars(named, iteration)
        monitored = dict(named)
        monitored["total_loss"] = self.meter.meters.get(
            "train/total_loss").global_avg if "train/total_loss" in self.meter.meters \
            else metrics.get("total_loss", 0.0)
        stop = self.early_stopping(iteration, monitored)
        if self.early_stopping.is_best:
            self.checkpoint.save_best(self.state)
        self.checkpoint.save(self.state, iteration)
        return stop

    def evaluate_set(self, dataset_type: str = "val") -> Dict[str, float]:
        loaders = self.task_loader.get_loaders(dataset_type)
        if not loaders:
            return {}
        if self.evaluator is not None:
            self.evaluator.reset()
        sums: Dict[str, float] = {}
        count = 0
        for batch in itertools.chain(*loaders):
            if batch.get_batch_size() == 0:
                continue
            scalars, output = self._eval_step(self.state, self._shard_batch(batch))
            host = jax.device_get(scalars)
            for k, v in host.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            count += 1
            if self.evaluator is not None:
                self.evaluator.collect(batch, jax.device_get(output))
        metrics = {k: v / max(count, 1) for k, v in sums.items()}
        if self.evaluator is not None:
            metrics.update(self.evaluator.summarize())
        return metrics

    # ================================================================ inference
    def inference(self) -> Dict[str, float]:
        results = {}
        evalai = bool(self.tp.get("evalai_inference", False))
        for dataset_type in ("val", "test"):
            if dataset_type == "val" and "val" not in self.run_type:
                continue
            if dataset_type == "test" and "inference" not in self.run_type and \
                    "test" not in self.run_type and "predict" not in self.run_type:
                continue
            reporter = None
            if evalai:
                from antmmf_tpu.common.test_reporter import TestReporter

                reporter = TestReporter(self.config)
                for batch in itertools.chain(
                        *self.task_loader.get_loaders(dataset_type)):
                    if batch.get_batch_size() == 0:
                        continue
                    _, output = self._eval_step(self.state,
                                                self._shard_batch(batch))
                    reporter.add_batch(batch, jax.device_get(output))
                paths = reporter.dump(dataset_type)
                self.writer.write(f"evalai predictions dumped: {paths}")
            metrics = self.evaluate_set(dataset_type)
            if metrics:
                self.writer.write(f"{dataset_type} inference: " + ", ".join(
                    f"{k}={v:.4f}" for k, v in metrics.items()))
                results[dataset_type] = metrics
        return results

    # ================================================================= finalize
    def finalize(self, iteration: int) -> None:
        metrics = self.evaluate_set("val")
        if metrics:
            self.writer.write("final val: " + ", ".join(
                f"{k}={v:.4f}" for k, v in metrics.items()))
            monitored = {f"val/{k}": v for k, v in metrics.items()}
            monitored["total_loss"] = metrics.get("total_loss", 0.0)
            self.early_stopping(iteration, monitored)
            if self.early_stopping.is_best:
                self.checkpoint.save_best(self.state)
        self.checkpoint.save(self.state, iteration)
        self.checkpoint.save_final_weights(self.state, self.model_name)
        self.checkpoint.finalize_writes()
        self.writer.write(f"training done @ iter {iteration}; "
                          f"early stopping: {self.early_stopping.summary()}")
        if "inference" in self.run_type or "predict" in self.run_type:
            self.inference()


def optax_global_norm(tree) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))


def _param_count(variables) -> int:
    return sum(int(np.prod(x.shape)) for x in
               jax.tree_util.tree_leaves(variables.get("params", variables)))
