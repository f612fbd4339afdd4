"""Experiment orchestration: config -> data -> train -> eval -> submission.

One entry path replacing the reference's three vertical main_*.py copies
(SURVEY.md section 1): the `pipeline` key in the data config selects the
baseline / ensemble / final ETL + normalization semantics, and the model zoo
is orthogonal. Call stack parity with main_final.py:751-785 (see SURVEY.md
section 3), minus Lightning.
"""

from __future__ import annotations

import functools
import os
import time
from datetime import datetime

import jax
import jax.numpy as jnp
import numpy as np

from ..data import open_zarr, prepare_databundle
from ..data.dataset import DeviceDataset, epoch_permutation
from ..eval import kaggle as kaggle_io
from ..eval.metrics import evaluate_predictions, kaggle_composite_score
from ..models import get_model, is_sequence_model
from ..parallel.mesh import create_mesh, replicated
from ..transforms import normalize as tf
from ..utils.logging import MetricsLogger, get_logger
from ..utils.timer import StepTimer, profile_trace
from .checkpoint import CheckpointManager, restore_from_path
from .state import build_optimizer, create_train_state, make_lr_schedule
from .trainer import StepFunctions, pad_batch, predict_dataset

log = get_logger(__name__)


class Experiment:
    def __init__(self, cfg: dict):
        self.cfg = cfg
        self.seed = int(cfg.get("seed", 42))
        data_cfg = cfg["data"]
        trainer_cfg = cfg.get("trainer", {})

        # --- mesh (accelerator fallback mirrors utils_baseline.py:131-137) ---
        want = trainer_cfg.get("accelerator", "tpu")

        # Persistent compilation cache: repeat runs (parity sweeps, resume,
        # rollout) skip the multi-minute XLA recompiles. TPU only — XLA:CPU
        # AOT cache entries fail to reload on this host (machine-feature
        # mismatch errors observed 2026-08-16).
        cache_dir = os.environ.get(
            "CLIMATE_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/climate_tpu/xla")
        )
        if cache_dir and cache_dir != "0" and jax.devices()[0].platform == "tpu":
            try:
                jax.config.update("jax_compilation_cache_dir", cache_dir)
                jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
            except Exception:
                pass
        platform = jax.devices()[0].platform
        if want == "tpu" and platform != "tpu":
            log.warning(f"TPU requested but default platform is {platform}; continuing on {platform}.")
        devices = trainer_cfg.get("devices", "all")
        n_dev = None if devices in ("all", None, "auto") else int(devices)
        self.mesh = create_mesh(n_dev)
        log.info(f"Mesh: {self.mesh.shape} over {platform}")

        if trainer_cfg.get("debug_nans"):
            # NaN-check mode (SURVEY.md section 5: the reference has none)
            jax.config.update("jax_debug_nans", True)

        # --- data ---
        self.pipeline = data_cfg.get("pipeline", "baseline")
        group = open_zarr(data_cfg["path"])
        bundle = prepare_databundle(
            group,
            pipeline=self.pipeline,
            input_vars=list(data_cfg["input_vars"]),
            output_vars=list(data_cfg["output_vars"]),
            train_ssps=list(data_cfg["train_ssps"]),
            test_ssp=data_cfg["test_ssp"],
            test_months=int(data_cfg.get("test_months", 360)),
            target_member_id=int(data_cfg.get("target_member_id", 0)),
            member_ids=list(data_cfg.get("member_ids", [0])),
            seasonal_embeddings=bool(data_cfg.get("seasonal_embeddings", False)),
            mask_tas_below=data_cfg.get("mask_tas_below"),
            sanitize_threshold=data_cfg.get("sanitize_threshold", 1e10),
            feedback_vars=list(data_cfg.get("feedback_vars", []) or []),
        )
        self.bundle = bundle
        self.lat, self.lon = bundle.lat, bundle.lon
        self.output_vars = bundle.output_vars

        # --- normalization stats (train split only) ---
        if self.pipeline == "final":
            tm = data_cfg.get("transform_map", {}) or {}
            self.input_stats = tf.compute_stats(bundle.train.inputs, bundle.input_vars, tm)
            self.output_stats = tf.compute_stats(bundle.train.outputs, bundle.output_vars, tm)
        else:  # baseline/ensemble: global z-score without epsilon
            self.input_stats = tf.global_zscore_stats(bundle.train.inputs)
            self.output_stats = tf.global_zscore_stats(bundle.train.outputs)

        # Teacher-forced prev_<var> input channels share the output variable's
        # stats, so the normalized input and output spaces coincide and the
        # rollout scan can feed normalized predictions straight back
        # (eval/rollout.py feedback semantics).
        for var in data_cfg.get("feedback_vars", []) or []:
            ci = bundle.input_vars.index(f"prev_{var}")
            co = bundle.output_vars.index(var)
            self.input_stats[ci] = {
                "method": self.output_stats[co]["method"],
                "params": dict(self.output_stats[co]["params"]),
            }

        # --- normalize on host (f8 math like dask), then device-resident NHWC.
        # Sanitized (corrupt -> NaN) input points are zero-filled in z-space
        # after normalization; nan-stats already excluded them.
        repl = replicated(self.mesh)

        def norm_in(x):
            return np.nan_to_num(tf.normalize(x, self.input_stats), nan=0.0)

        # bf16 compute -> store inputs in bf16 too: identical values reach the
        # model (its first conv casts fp32->bf16 anyway) but the per-step
        # window gather moves half the HBM bytes. Exactness is tested
        # (tests/test_train.py bf16-storage equivalence). Opt out with
        # training.data_bf16=false. Outputs stay fp32 (loss/metric targets).
        training_cfg = cfg.get("training", {}) or {}
        in_dtype = np.float32
        if str(training_cfg.get("precision", "32")) == "bf16" and bool(
            training_cfg.get("data_bf16", True)
        ):
            in_dtype = jnp.bfloat16

        self.train_ds = DeviceDataset.from_host(
            norm_in(bundle.train.inputs),
            tf.normalize(bundle.train.outputs, self.output_stats),
            sharding=repl,
            input_dtype=in_dtype,
        )
        self.val_ds = DeviceDataset.from_host(
            norm_in(bundle.val.inputs),
            tf.normalize(bundle.val.outputs, self.output_stats),
            sharding=repl,
            input_dtype=in_dtype,
        )
        self.test_ds = DeviceDataset.from_host(
            norm_in(bundle.test.inputs),
            bundle.test.outputs,  # raw targets (reference parity)
            sharding=repl,
            input_dtype=in_dtype,
        )
        log.info(
            f"Datasets created. Train: {self.train_ds.n}, Val: {self.val_ds.n}, Test: {self.test_ds.n}"
        )

        # --- model + optimizer + compiled steps ---
        self.model = get_model(cfg)
        self.seq_len = int(data_cfg.get("seq_len", 1)) if is_sequence_model(cfg) else None
        n_mesh = self.mesh.size

        def _round_bs(bs: int) -> int:
            r = ((bs + n_mesh - 1) // n_mesh) * n_mesh
            if r != bs:
                log.warning(f"batch_size {bs} rounded up to {r} (multiple of {n_mesh} mesh devices)")
            return r

        self.batch_size = _round_bs(int(data_cfg.get("batch_size", 32)))
        self.eval_batch_size = _round_bs(int(data_cfg.get("eval_batch_size") or self.batch_size))

        training = cfg.get("training", {})
        n_batches_per_epoch = -(-self.train_ds.n // self.batch_size)
        # Schedule horizon: explicit training.total_steps wins; otherwise
        # derived from THIS run's max_epochs. A resumed run re-adopts the
        # horizon recorded in its checkpoint (see below) so changing
        # max_epochs at resume cannot silently reshape the decay curve.
        self._schedule_cfg = {
            "name": training.get("lr_schedule", "constant"),
            "lr": float(training.get("lr", 5e-4)),
            "weight_decay": float(training.get("weight_decay", 0.0)),
            "total_steps": int(training.get("total_steps") or 0)
            or max(n_batches_per_epoch * int(trainer_cfg.get("max_epochs", 1)), 1),
            "warmup_steps": int(training.get("warmup_steps", 0)),
        }
        self._explicit_total_steps = bool(training.get("total_steps"))
        self.tx, self.lr_schedule = self._build_tx()

        # Multi-member vmap training (training.n_members > 1): K ensemble
        # members train in ONE jitted step over a stacked-params axis — the
        # kernel-latency-bound step (PARITY.md roofline) does ~K x the useful
        # work per dispatched kernel. Member k initializes and permutes
        # batches from member_seeds[k] (default seed, seed+1, ...), so
        # members are decorrelated like independent seed runs.
        self.n_members = int(training.get("n_members", 1) or 1)
        if self.n_members < 1:
            raise ValueError(f"training.n_members must be >= 1, got {self.n_members}")
        seeds_cfg = training.get("member_seeds")
        self.member_seeds = (
            [int(s) for s in seeds_cfg] if seeds_cfg
            else [self.seed + k for k in range(self.n_members)]
        )
        if len(self.member_seeds) != self.n_members:
            raise ValueError(
                f"training.member_seeds has {len(self.member_seeds)} entries "
                f"but training.n_members={self.n_members}"
            )

        example = self._example_batch()
        if self.n_members > 1:
            from .state import create_member_states

            self.state = create_member_states(
                self.model, [jax.random.PRNGKey(s) for s in self.member_seeds],
                example, self.tx,
            )
        else:
            self.state = create_train_state(
                self.model, jax.random.PRNGKey(self.seed), example, self.tx
            )
        self.state = jax.device_put(self.state, repl)
        has_bs = bool(self.state.batch_stats)

        # --- run dir + logging (reference: hydra outputs/<date>/<time>) ---
        root = cfg.get("output_dir", "outputs")
        self.run_dir = os.path.join(root, datetime.now().strftime("%Y-%m-%d/%H-%M-%S"))
        os.makedirs(self.run_dir, exist_ok=True)
        self.metrics_logger = MetricsLogger(
            self.run_dir,
            use_wandb=bool(cfg.get("use_wandb")),
            wandb_kwargs={
                "project": cfg.get("wandb_project"),
                "entity": cfg.get("wandb_entity"),
                "name": cfg.get("run_name"),
                "config": cfg,
            },
        )
        ckpt_cfg = trainer_cfg.get("checkpoint", {}) or {}

        def _make_ckpt(root):
            return CheckpointManager(
                root,
                monitor=ckpt_cfg.get("monitor", "val/loss"),
                mode=ckpt_cfg.get("mode", "min"),
                save_last=bool(ckpt_cfg.get("save_last", True)),
                save_top_k=int(ckpt_cfg.get("save_top_k", 1)),
            )

        if self.n_members > 1:
            # one standard checkpoint tree per member: every member restores
            # into serve/rollout/ensemble tooling like an independent run
            self.member_ckpts = [
                _make_ckpt(os.path.join(self.run_dir, f"member{k}"))
                for k in range(self.n_members)
            ]
            self.ckpt = self.member_ckpts[0]
        else:
            self.ckpt = _make_ckpt(self.run_dir)
        if trainer_cfg.get("deterministic"):
            # Lightning's flag forces cudnn-deterministic kernels; JAX runs are
            # deterministic by construction (explicit PRNG threading, no
            # atomics in our ops) — record that the request is honored.
            log.info(
                "trainer.deterministic=true: runs are deterministic by construction "
                "(explicit jax.random key threading; fused-epoch dropout folds from "
                "state.step). Rerunning a config bit-reproduces it."
            )
        # --- jitted whole-split metric programs (one device sync per epoch;
        # the reference syncs per step, SURVEY.md 2.6.7) ---
        repl = replicated(self.mesh)

        def _val_metrics_fn(preds_norm, targets_norm):
            # metric math is always fp32, independent of model compute dtype
            preds_norm = preds_norm.astype(jnp.float32)
            targets_norm = targets_norm.astype(jnp.float32)
            val_loss = jnp.mean((preds_norm - targets_norm) ** 2)
            preds = self._denorm_tchw(preds_norm)
            trues = self._denorm_tchw(targets_norm)  # round-trip, main_baseline.py:346
            m = evaluate_predictions(preds, trues, self.lat, self.output_vars, phase="val")
            m["val/loss"] = val_loss
            m["val/kaggle_score"] = kaggle_composite_score(preds, trues, self.lat, self.output_vars)
            return m

        def _test_metrics_fn(preds_norm, targets_raw):
            preds = self._denorm_tchw(preds_norm.astype(jnp.float32))
            trues = jnp.transpose(targets_raw, (0, 3, 1, 2))
            m = evaluate_predictions(preds, trues, self.lat, self.output_vars, phase="test")
            return preds, m

        self._val_metrics = jax.jit(_val_metrics_fn, in_shardings=(repl, repl), out_shardings=repl)
        self._test_metrics = jax.jit(_test_metrics_fn, in_shardings=(repl, repl), out_shardings=repl)

        if self.n_members > 1:
            # member metrics vmapped + the physical-space member-mean ensemble
            # (how tools/ensemble_eval.py combines independent runs) — all in
            # one jitted program, one host sync per epoch.
            def _val_metrics_multi_fn(preds_norm_k, targets_norm):
                per = jax.vmap(lambda p: _val_metrics_fn(p, targets_norm))(preds_norm_k)
                phys = jax.vmap(
                    lambda p: self._denorm_tchw(p.astype(jnp.float32))
                )(preds_norm_k)
                ens = phys.mean(axis=0)
                trues = self._denorm_tchw(targets_norm.astype(jnp.float32))
                m_ens = evaluate_predictions(ens, trues, self.lat, self.output_vars, phase="val")
                m_ens["val/kaggle_score"] = kaggle_composite_score(
                    ens, trues, self.lat, self.output_vars
                )
                m_ens["val/loss"] = per["val/loss"].mean()  # mean member MSE
                return per, m_ens

            def _test_metrics_multi_fn(preds_norm_k, targets_raw):
                phys = jax.vmap(
                    lambda p: self._denorm_tchw(p.astype(jnp.float32))
                )(preds_norm_k)
                ens = phys.mean(axis=0)
                trues = jnp.transpose(targets_raw, (0, 3, 1, 2))
                m = evaluate_predictions(ens, trues, self.lat, self.output_vars, phase="test")
                return ens, m

            self._val_metrics_multi = jax.jit(
                _val_metrics_multi_fn, in_shardings=(repl, repl), out_shardings=repl
            )
            self._test_metrics_multi = jax.jit(
                _test_metrics_multi_fn, in_shardings=(repl, repl), out_shardings=repl
            )

        self.start_epoch = 0
        self.restored_meta: dict = {}
        if cfg.get("ckpt_path") and self.n_members > 1:
            raise ValueError(
                "ckpt_path resume is not supported with training.n_members > 1; "
                "resume members individually (each member{k}/checkpoints tree is "
                "a standard single-member checkpoint)"
            )
        if cfg.get("ckpt_path"):
            self.state, meta = restore_from_path(cfg["ckpt_path"], self.state)
            self.restored_meta = meta
            self.start_epoch = int(meta.get("epoch", -1)) + 1
            if "input_stats" in meta:  # stats travel with the checkpoint
                self.input_stats = meta["input_stats"]
                self.output_stats = meta["output_stats"]
            self._adopt_checkpoint_schedule(meta.get("schedule"))
            log.info(f"Restored checkpoint from {cfg['ckpt_path']} (epoch {self.start_epoch})")

        # step functions close over the (possibly resume-adjusted) optimizer,
        # so they are built only after any checkpoint restore above.
        # training.self_force_weight > 0 (feedback models only) turns on the
        # chained rollout loss: the model consumes its OWN predictions for
        # the last training.self_force_steps months in the window's prev
        # channels (trainer.py self_force_loss_fn). training.prev_noise > 0
        # perturbs the teacher-forced prev channels (robustness to the
        # imperfect history closed-loop rollouts feed).
        tr_cfg = self.cfg.get("training", {})
        sf_weight = float(tr_cfg.get("self_force_weight", 0.0) or 0.0)
        sf_steps = int(tr_cfg.get("self_force_steps", 1) or 1)
        prev_noise = float(tr_cfg.get("prev_noise", 0.0) or 0.0)
        # training.sched_sampling_epochs > 0: scheduled sampling — every
        # chain prev-channel write keeps the model's own prediction with
        # per-sample probability ramping 0 -> sched_sampling_max linearly
        # over that many epochs (trainer.py sched_sampling_prob; derived
        # from the traced step, so the ramp is one compile).
        ss_epochs = float(tr_cfg.get("sched_sampling_epochs", 0) or 0)
        ss_max = float(tr_cfg.get("sched_sampling_max", 1.0) or 1.0)
        ss_ramp = 0
        sf_slots = None
        if sf_weight > 0.0 or prev_noise > 0.0 or ss_epochs > 0:
            from ..eval.rollout import feedback_slots_from_names

            sf_slots = feedback_slots_from_names(
                list(self.bundle.input_vars), list(self.output_vars)
            )
            if not sf_slots:
                raise ValueError(
                    "training.self_force_weight / training.prev_noise / "
                    "training.sched_sampling_epochs require data.feedback_vars "
                    "(prev_* input channels) — this model has none"
                )
            if sf_weight > 0.0:
                log.info(f"Self-forcing rollout loss on (weight={sf_weight}, "
                         f"steps={sf_steps}, slots={sf_slots})")
            if prev_noise > 0.0:
                log.info(f"Prev-channel noise injection on (std={prev_noise})")
        if ss_epochs > 0:
            steps_per_epoch = -(-self.train_ds.n // self.batch_size)
            ss_ramp = max(1, int(round(ss_epochs * steps_per_epoch)))
            log.info(f"Scheduled sampling on (ramp={ss_ramp} steps "
                     f"[{ss_epochs} epochs], p_max={ss_max})")
            # The ramp is anchored to the GLOBAL optimizer step: resuming a
            # checkpoint whose step already exceeds the ramp starts training
            # at p = p_max immediately, silently skipping the curriculum.
            restored_step = int(self.restored_meta.get("step", 0) or 0)
            if self.start_epoch > 0 and restored_step >= ss_ramp:
                log.warning(
                    f"Scheduled sampling enabled on resume, but the restored "
                    f"optimizer step ({restored_step}) already exceeds the ramp "
                    f"({ss_ramp} steps): training proceeds at p = p_max = "
                    f"{ss_max} with no curriculum ramp."
                )
        mm_weight = float(self.cfg.get("training", {}).get("moment_loss_weight", 0.0) or 0.0)
        if mm_weight > 0.0:
            log.info(f"Distribution-moment loss on (weight={mm_weight})")
        # Window gather strategy (sequence models): "slice" (default) gathers
        # each window as ONE contiguous slice of a once-padded copy of the
        # split (dataset.py::pad_for_windows) — no per-step zero-mask work,
        # DMA-friendly contiguous reads; "mask" is the original B*T row
        # gather. Costs one extra device copy of each input split (~340 MB
        # for the final train split).
        self.window_mode = "mask"
        if self.seq_len is not None:
            self.window_mode = str(cfg.get("trainer", {}).get("window_gather", "mask"))
        self.step_fns = StepFunctions.build(
            self.model, self.tx, self.mesh, seq_len=self.seq_len, has_batch_stats=has_bs,
            self_force_slots=sf_slots, self_force_weight=sf_weight,
            self_force_steps=sf_steps, prev_noise=prev_noise,
            sched_sampling_ramp=ss_ramp, sched_sampling_max=ss_max,
            moment_loss_weight=mm_weight, window_mode=self.window_mode,
            n_members=self.n_members,
        )
        if self.n_members > 1:
            log.info(
                f"Multi-member vmap training: {self.n_members} members in one "
                f"jitted step (seeds {self.member_seeds})"
            )

        if self.seq_len is not None and self.window_mode == "slice":
            from ..data.dataset import pad_for_windows

            pad_fn = jax.jit(
                functools.partial(pad_for_windows, seq_len=self.seq_len),
                out_shardings=replicated(self.mesh),
            )
            self.train_x = pad_fn(self.train_ds.inputs)
            self.val_x = pad_fn(self.val_ds.inputs)
            self.test_x = pad_fn(self.test_ds.inputs)
        else:
            self.train_x = self.train_ds.inputs
            self.val_x = self.val_ds.inputs
            self.test_x = self.test_ds.inputs

        self.timer = StepTimer()

    # ------------------------------------------------------------------
    def _build_tx(self):
        sc = self._schedule_cfg
        tx = build_optimizer(
            sc["lr"], sc["weight_decay"],
            schedule=sc["name"], total_steps=sc["total_steps"], warmup_steps=sc["warmup_steps"],
        )
        sched = make_lr_schedule(sc["lr"], sc["name"], sc["total_steps"], sc["warmup_steps"])
        return tx, sched

    def _adopt_checkpoint_schedule(self, saved: dict | None) -> None:
        """Keep the decay horizon of the run that WROTE the checkpoint.

        `total_steps` for cosine was historically derived from the resuming
        run's max_epochs, so resuming with a different max_epochs silently
        reshaped the decay. Unless the user pins `training.total_steps`
        explicitly or switches schedules, the saved horizon wins."""
        if not saved or self._explicit_total_steps:
            return
        if saved.get("name") != self._schedule_cfg["name"]:
            log.warning(
                f"Resume changes lr_schedule {saved.get('name')!r} -> "
                f"{self._schedule_cfg['name']!r}; using the new schedule as configured."
            )
            return
        saved_steps = int(saved.get("total_steps", 0))
        if saved_steps and saved_steps != self._schedule_cfg["total_steps"]:
            log.info(
                f"Adopting checkpointed schedule horizon total_steps={saved_steps} "
                f"(this run's config would have derived {self._schedule_cfg['total_steps']})"
            )
            self._schedule_cfg["total_steps"] = saved_steps
            self._schedule_cfg["warmup_steps"] = int(
                saved.get("warmup_steps", self._schedule_cfg["warmup_steps"])
            )
            self.tx, self.lr_schedule = self._build_tx()

    # ------------------------------------------------------------------
    def _example_batch(self):
        h, w = len(self.lat), len(self.lon)
        c_in = self.train_ds.inputs.shape[-1]
        if self.seq_len is not None:
            return jnp.zeros((self.batch_size, self.seq_len, h, w, c_in), jnp.float32)
        return jnp.zeros((self.batch_size, h, w, c_in), jnp.float32)

    # ------------------------------------------------------------------
    def fit(self) -> dict:
        cfg_tr = self.cfg.get("trainer", {})
        max_epochs = int(cfg_tr.get("max_epochs", 1))
        log_every = int(cfg_tr.get("log_every_n_steps", 50))
        host_rng = np.random.default_rng(self.seed)
        # member k permutes batches from its own seed -> decorrelated members
        member_rngs = [np.random.default_rng(s) for s in self.member_seeds]
        drop_rng = jax.random.PRNGKey(self.seed + 1)

        def epoch_index_mats():
            """Padded per-step index/mask matrices for one epoch.
            Single member: (n_batches, B). Multi: (n_batches, K, B)."""
            if self.n_members == 1:
                batches = epoch_permutation(host_rng, self.train_ds.n, self.batch_size)
                padded = [pad_batch(b, self.batch_size) for b in batches]
                n_samples = sum(len(b) for b in batches)
            else:
                per_member = []
                for r in member_rngs:
                    bk = epoch_permutation(r, self.train_ds.n, self.batch_size)
                    per_member.append([pad_batch(b, self.batch_size) for b in bk])
                n_steps = len(per_member[0])
                padded = [
                    (
                        np.stack([per_member[k][i][0] for k in range(self.n_members)]),
                        np.stack([per_member[k][i][1] for k in range(self.n_members)]),
                    )
                    for i in range(n_steps)
                ]
                # aggregate useful work: every member trains on the full split
                n_samples = self.n_members * self.train_ds.n
            idx_mat = np.stack([p[0] for p in padded])
            mask_mat = np.stack([p[1] for p in padded])
            return idx_mat, mask_mat, n_samples

        fuse_epoch = bool(cfg_tr.get("fuse_epoch", True))

        # Lightning parity: num_sanity_val_steps runs N val batches before
        # training to fail fast on eval-path bugs (trainer/default.yaml:7;
        # reference ships 0). Predictions are discarded, like Lightning.
        sanity_steps = int(cfg_tr.get("num_sanity_val_steps", 0) or 0)
        if sanity_steps > 0 and self.start_epoch == 0:
            n_sanity = min(sanity_steps * self.eval_batch_size, self.val_ds.n)
            preds = predict_dataset(
                self.step_fns, self.state, self.val_x, n_sanity, self.eval_batch_size
            )
            if not bool(np.isfinite(np.asarray(preds)).all()):
                raise FloatingPointError(
                    f"sanity check: non-finite predictions in the first "
                    f"{sanity_steps} val batches"
                )
            log.info(f"sanity check passed ({sanity_steps} val batches)")

        last_val: dict = {}
        with profile_trace(os.path.join(self.run_dir, "profile"), enabled=bool(cfg_tr.get("profile"))):
            for epoch in range(self.start_epoch, max_epochs):
                epoch_t0 = time.perf_counter()
                idx_all, mask_all, n_samples = epoch_index_mats()
                n_steps = idx_all.shape[0]
                if fuse_epoch:
                    # whole epoch = ONE dispatch (lax.scan over batches);
                    # dropout rngs fold per-step from state.step inside.
                    idx_mat = jnp.asarray(idx_all)
                    mask_mat = jnp.asarray(mask_all)
                    rng = jax.random.fold_in(drop_rng, epoch)
                    self.timer.start()
                    self.state, (loss_seq, gnorm_seq) = self.step_fns.train_epoch(
                        self.state, self.train_x, self.train_ds.outputs,
                        idx_mat, mask_mat, rng,
                    )
                    # host pull = reliable sync (axon's block_until_ready can
                    # ack before completion, inflating throughput numbers)
                    # multi-member: (n_steps, K) -> member mean per step
                    loss_host = np.asarray(loss_seq).reshape(n_steps, -1).mean(axis=1)
                    gnorm_host = np.asarray(gnorm_seq).reshape(n_steps, -1).mean(axis=1)
                    self.timer.stop(n_samples)
                    losses = list(loss_host[::log_every])
                    base_step = self._global_step() - n_steps
                    for bi in range(0, n_steps, log_every):
                        self.metrics_logger.log(
                            {"train/loss": float(loss_host[bi]), "train/grad_norm": float(gnorm_host[bi])},
                            step=base_step + bi + 1,
                        )
                else:
                    losses = []
                    for bi in range(n_steps):
                        idx_p, mask = idx_all[bi], mask_all[bi]
                        rng = jax.random.fold_in(drop_rng, self._global_step())
                        self.timer.start()
                        self.state, loss = self.step_fns.train_step(
                            self.state,
                            self.train_x,
                            self.train_ds.outputs,
                            jnp.asarray(idx_p),
                            jnp.asarray(mask),
                            rng,
                        )
                        if bi % log_every == 0:
                            loss = float(np.asarray(loss).mean())  # sync only when logging
                            losses.append(loss)
                            self.metrics_logger.log({"train/loss": loss}, step=self._global_step())
                        self.timer.stop(int(mask.sum()))

                # per-layer gradient/weight histograms (reference:
                # wandb.watch(model, log="all")): on by default with wandb,
                # opt-in via trainer.watch_every_n_epochs otherwise (fallback
                # stream lands in <run_dir>/histograms.jsonl).
                watch_every = cfg_tr.get("watch_every_n_epochs")
                if watch_every is None:
                    watch_every = 1 if self.metrics_logger.wandb_active else 0
                if (int(watch_every) > 0 and epoch % int(watch_every) == 0
                        and self.step_fns.grad_fn is not None):
                    self._log_watch_histograms(
                        idx_all[-1], mask_all[-1], jax.random.fold_in(drop_rng, epoch)
                    )

                val_metrics = self.validate(epoch)
                last_val = val_metrics
                # Live LR stream (reference: LearningRateMonitor,
                # trainer/default.yaml:21-22): evaluate the actual schedule at
                # the last optimizer step of this epoch, not the config value.
                self.metrics_logger.log(
                    {"lr": float(self.lr_schedule(max(self._global_step() - 1, 0)))},
                    step=self._global_step(),
                )
                extra_meta = {
                    "schedule": dict(self._schedule_cfg),
                    # channel naming makes checkpoints self-describing for
                    # serving/rollout (feedback slot discovery by name)
                    "data": {
                        "input_vars": list(self.bundle.input_vars),
                        "output_vars": list(self.output_vars),
                        "seq_len": self.seq_len,
                        "grid": [len(self.lat), len(self.lon)],
                    },
                }
                if self.n_members > 1:
                    from .state import member_state

                    for k in range(self.n_members):
                        self.member_ckpts[k].save(
                            member_state(self.state, k),
                            self._last_member_metrics[k], epoch,
                            self.input_stats, self.output_stats,
                            extra_meta={**extra_meta, "member_seed": self.member_seeds[k]},
                        )
                else:
                    self.ckpt.save(
                        self.state, val_metrics, epoch, self.input_stats, self.output_stats,
                        extra_meta=extra_meta,
                    )
                log.info(
                    f"epoch {epoch}: train/loss={np.mean(losses) if losses else float('nan'):.4f} "
                    f"val/loss={val_metrics['val/loss']:.4f} "
                    f"composite={val_metrics['val/kaggle_score']:.4f} "
                    f"({time.perf_counter() - epoch_t0:.1f}s, "
                    f"{self.timer.samples_per_sec:.0f} samples/s)"
                )

        if bool(self.cfg.get("training", {}).get("fit_calibration", False)):
            if self.n_members > 1:
                log.warning("fit_calibration skipped: not supported with n_members > 1 "
                            "(calibrate restored members individually)")
            else:
                self._fit_train_calibration()
        if cfg_tr.get("visualize_worst_loss"):
            if self.n_members > 1:
                log.warning("visualize_worst_loss skipped with n_members > 1")
            else:
                self._visualize_worst_train_loss()
        return last_val

    def _fit_train_calibration(self) -> None:
        """Fit per-variable variance re-inflation alphas on the TRAIN split
        (selection-free — no val leakage) with the final params and merge
        them into every written checkpoint meta, so serve.Predictor applies
        them automatically (meta['calibration']). Beyond-parity MOS-style
        calibration: MSE training under-disperses the month-to-month
        variability the composite's time-std term scores (eval/calibrate.py
        for the measured effect). Fitted once, with the final params — the
        alphas are gross dispersion statistics and are stable across the
        late epochs."""
        from ..eval.calibrate import fit_variance_inflation

        preds_norm = predict_dataset(
            self.step_fns, self.state, self.train_x, self.train_ds.n, self.eval_batch_size
        )
        preds = np.asarray(self._denorm_tchw(preds_norm.astype(jnp.float32)), np.float32)
        trues = np.asarray(self._denorm_tchw(self.train_ds.outputs), np.float32)
        alphas = fit_variance_inflation(preds, trues, self.lat, list(self.output_vars))
        updated = self.ckpt.update_meta({"calibration": alphas})
        log.info(f"Train-fitted variance calibration {alphas} -> checkpoint meta {updated}")

    def _log_watch_histograms(self, idx, mask, rng) -> None:
        """One extra grad computation per watched epoch; histograms named
        gradients/<param> and parameters/<param> like wandb.watch's stream."""
        grads = self.step_fns.grad_fn(
            self.state, self.train_x, self.train_ds.outputs,
            jnp.asarray(idx), jnp.asarray(mask), rng,
        )
        step = self._global_step()

        def name_of(path) -> str:
            return ".".join(str(getattr(k, "key", getattr(k, "name", k))) for k in path)

        for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
            self.metrics_logger.log_histogram(f"gradients/{name_of(path)}", np.asarray(leaf), step)
        for path, leaf in jax.tree_util.tree_leaves_with_path(self.state.params):
            self.metrics_logger.log_histogram(f"parameters/{name_of(path)}", np.asarray(leaf), step)

    def _visualize_worst_train_loss(self) -> None:
        """Worst-train-loss panels at train end (main_ensemble.py:488-547)."""
        from ..eval.plots import worst_loss_panels

        preds_norm = predict_dataset(
            self.step_fns, self.state, self.train_x, self.train_ds.n, self.eval_batch_size
        )
        preds = np.asarray(jnp.transpose(preds_norm, (0, 3, 1, 2)), dtype=np.float32)
        trues = np.asarray(jnp.transpose(self.train_ds.outputs, (0, 3, 1, 2)), dtype=np.float32)
        paths = worst_loss_panels(
            self.run_dir, preds, trues, self.output_vars,
            metrics_logger=self.metrics_logger, step=self._global_step(),
        )
        log.info(f"Saved {len(paths)} worst-loss panels under {self.run_dir}/plots/worst_loss")

    # ------------------------------------------------------------------
    def _denorm_tchw(self, preds_nhwc):
        """NHWC normalized preds -> (time, C, y, x) physical units, on device."""
        tchw = jnp.transpose(preds_nhwc, (0, 3, 1, 2))
        return tf.inverse_transform(tchw, self.output_stats)

    def _global_step(self) -> int:
        """Optimizer step as a host int (member 0's for stacked states —
        members share the count)."""
        return int(np.asarray(self.state.step).reshape(-1)[0])

    def validate(self, epoch: int) -> dict:
        preds_norm = predict_dataset(
            self.step_fns, self.state, self.val_x, self.val_ds.n, self.eval_batch_size
        )
        if self.n_members > 1:
            per, metrics = self._val_metrics_multi(preds_norm, self.val_ds.outputs)
            per = {k: np.asarray(v) for k, v in per.items()}
            # per-member dicts (standard names) drive each member's checkpoint
            self._last_member_metrics = [
                {k: float(v[m]) for k, v in per.items()} for m in range(self.n_members)
            ]
            metrics = {k: float(v) for k, v in metrics.items()}
            # observability: members under val/member{k}/..., ensemble under
            # the standard reference names
            for m, mm in enumerate(self._last_member_metrics):
                self.metrics_logger.log(
                    {key.replace("val/", f"val/member{m}/"): v for key, v in mm.items()},
                    step=self._global_step(),
                )
            self.metrics_logger.log(metrics, step=self._global_step())
            scores = ", ".join(
                f"m{m}={mm['val/kaggle_score']:.4f}"
                for m, mm in enumerate(self._last_member_metrics)
            )
            log.info(f"epoch {epoch} members: {scores} | ensemble={metrics['val/kaggle_score']:.4f}")
            return metrics
        metrics = self._val_metrics(preds_norm, self.val_ds.outputs)
        metrics = {k: float(v) for k, v in metrics.items()}
        self.metrics_logger.log(metrics, step=self._global_step())

        # per-epoch val image panels: with wandb active they stream every val
        # epoch under the reference's exact names (main_baseline.py:410-442);
        # otherwise PNG-only, cadence-gated via save_plots_every_n_epochs.
        every = int(self.cfg.get("trainer", {}).get("save_plots_every_n_epochs", 0) or 0)
        if (every > 0 and epoch % every == 0) or self.metrics_logger.wandb_active:
            from ..eval.plots import save_epoch_panels

            preds = np.asarray(self._denorm_tchw(preds_norm.astype(jnp.float32)), dtype=np.float32)
            trues = np.asarray(self._denorm_tchw(self.val_ds.outputs), dtype=np.float32)
            save_epoch_panels(
                self.run_dir, "val", preds, trues, self.output_vars, metrics,
                metrics_logger=self.metrics_logger, step=self._global_step(),
                out_subdir=f"val_epoch{epoch}",
            )
        return metrics

    # ------------------------------------------------------------------
    def test(self, save_submission: bool = True) -> dict:
        """Test phase: metrics vs (corrupted, see main_baseline.py:544-545)
        raw targets + Kaggle submission CSV."""
        preds_norm = predict_dataset(
            self.step_fns, self.state, self.test_x, self.test_ds.n, self.eval_batch_size
        )
        if self.n_members > 1:
            # member-mean ensemble in physical space -> one submission
            preds, metrics = self._test_metrics_multi(preds_norm, self.test_ds.outputs)
        else:
            preds, metrics = self._test_metrics(preds_norm, self.test_ds.outputs)
        metrics = {k: float(v) for k, v in metrics.items()}
        self.metrics_logger.log(metrics, step=self._global_step())

        if self.cfg.get("trainer", {}).get("save_plots"):
            from ..eval.plots import save_epoch_panels

            save_epoch_panels(
                self.run_dir,
                "test",
                np.asarray(preds, dtype=np.float32),
                np.asarray(jnp.transpose(self.test_ds.outputs, (0, 3, 1, 2)), dtype=np.float32),
                self.output_vars,
                metrics,
            )

        if save_submission:
            preds_np = np.asarray(preds)
            ts = datetime.now().strftime("%Y%m%d_%H%M%S")
            sub_dir = os.path.join(self.run_dir, "submissions")
            os.makedirs(sub_dir, exist_ok=True)
            path = os.path.join(sub_dir, f"kaggle_submission_{ts}.csv")
            kaggle_io.save_submission(
                preds_np, np.arange(preds_np.shape[0]), self.lat, self.lon, self.output_vars, path
            )
            log.info(f"Kaggle submission saved to {path}")
            metrics["submission_path"] = path
        return metrics
