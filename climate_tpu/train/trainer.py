"""The training engine: jitted steps over a device mesh, on-device eval.

Replaces the reference's Lightning stack (ClimateEmulationModule +
pl.Trainer, main_baseline.py:313-555) with a single-controller JAX design:

- one jitted train step (gather batch by index from the device-resident
  dataset -> forward -> masked MSE -> grads -> Adam update), batch dim
  sharded over the `data` mesh axis, params replicated; XLA inserts the
  gradient all-reduce over ICI (SURVEY.md 2.7);
- fixed batch shape (final short batch is padded + masked, not recompiled);
- whole-validation-set prediction, denormalization, and lat-weighted metrics
  run on device in one call per epoch — the reference syncs device->host on
  every step instead (main_baseline.py:345-347, SURVEY.md 2.6.7);
- BatchNorm batch statistics are computed over the *global* (cross-replica)
  batch automatically under GSPMD — the reference is single-GPU so this
  matches its semantics at devices=1 and strengthens them beyond.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data.dataset import gather_frames, gather_windows, gather_windows_slice
from ..parallel.mesh import DATA_AXIS


def masked_mse(pred, target, mask):
    """MSE over valid rows only (mask: (B,) 0/1). fp32 accumulation."""
    err = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    per_row = err.mean(axis=tuple(range(1, err.ndim)))
    m = mask.astype(jnp.float32)
    return jnp.sum(per_row * m) / jnp.maximum(jnp.sum(m), 1.0)


def sched_sampling_prob(step, ramp: int, p_max: float):
    """Scheduled-sampling probability at optimizer step `step`: linear ramp
    0 -> p_max over `ramp` steps, then flat at p_max (Bengio et al. 2015,
    inverted to the 'probability of using the model's own output' form).
    Computed in-graph from the traced TrainState.step so the ramp costs no
    extra compiled signature and works inside the fused-epoch lax.scan."""
    return p_max * jnp.minimum(step.astype(jnp.float32) / float(max(ramp, 1)), 1.0)


@dataclass
class StepFunctions:
    """Compiled train/eval callables bound to a model + mesh + dataset layout."""

    train_step: callable
    predict: callable
    predict_split_for: callable = None  # (n, batch_size) -> jitted whole-split fn
    train_epoch: callable = None  # whole epoch as one lax.scan dispatch
    grad_fn: callable = None  # gradients only, for watch-style histograms

    @staticmethod
    def build(model, tx: optax.GradientTransformation, mesh, *, seq_len: int | None,
              has_batch_stats: bool,
              self_force_slots: dict[int, int] | None = None,
              self_force_weight: float = 0.5,
              self_force_steps: int = 1,
              prev_noise: float = 0.0,
              sched_sampling_ramp: int = 0,
              sched_sampling_max: float = 1.0,
              moment_loss_weight: float = 0.0,
              window_mode: str = "mask",
              n_members: int = 1):
        """seq_len=None -> single-frame models; else sliding-window gather.

        n_members > 1 enables MULTI-MEMBER vmap training: K independent
        ensemble members (stacked-leading-axis TrainState, see
        state.create_member_states) train in ONE jitted step/epoch. The
        measured flagship step is kernel-count latency-bound, not FLOPs- or
        HBM-bound (PARITY.md "Step roofline": 611 fused kernels x ~17 us at
        batch 64 = 10.2 ms vs a 0.72 ms FLOPs roof), so K members riding the
        same kernel chain multiply useful work per dispatched kernel at
        near-constant wall clock — the ensemble factory the quality headline
        feeds on. Signature changes in member mode: train_step/train_epoch
        take idx/mask with a leading member axis ((K,B) / (n_batches,K,B))
        so each member sees its own batch permutation (decorrelation), and
        predict/predict_split return (K, ...) stacked predictions. The
        reference trains one model per process (main_final.py:751-785).

        self_force_slots ({output_channel: prev input_channel}, feedback
        models only): with self_force_weight > 0, enables the chained
        rollout loss — the model first predicts months t-k..t-1
        (k = self_force_steps) sequentially, each prediction overwriting
        the prev_<var> channels of the NEXT window's trailing frames, and
        the main loss is taken on month t whose last k frames all carry
        model (not teacher) history. Gradients flow through the whole
        chain (truncated BPTT through the rollout). This trains the model
        to consume its own outputs, attacking the teacher-forced vs
        closed-loop gap (VERDICT r2 weak #3); the reference has no
        analogue (its val loop is fully teacher-forced).

        prev_noise > 0 (feedback models only) additionally perturbs the
        teacher-forced prev_<var> channels with N(0, prev_noise^2) noise in
        normalized space during training — cheap input-robustness against
        the imperfect self-generated history a closed-loop rollout feeds.

        sched_sampling_ramp > 0 (feedback models only) turns the chain's
        prev-channel writes into SCHEDULED SAMPLING: each write keeps the
        model's own prediction with per-sample Bernoulli probability
        p(step) = sched_sampling_max * min(1, step / ramp) and the teacher
        value otherwise. Early training is (mostly) teacher-forced, late
        training consumes its own history — a curriculum toward the
        closed-loop regime. p is derived from the traced state.step, so no
        train_step/train_epoch signature changes and one compile covers the
        whole ramp."""

        if window_mode not in ("mask", "slice"):
            raise ValueError(f"window_mode must be 'mask' or 'slice', got {window_mode!r}")

        def gather(x_all, idx):
            if seq_len is None:
                return gather_frames(x_all, idx)
            if window_mode == "slice":
                # x_all must be pad_for_windows(inputs, seq_len): the window
                # is the contiguous slice padded[idx : idx+T] (dataset.py).
                return gather_windows_slice(x_all, idx, seq_len)
            return gather_windows(x_all, idx, seq_len)

        def forward(params, batch_stats, x, rng, train: bool):
            variables = {"params": params}
            if has_batch_stats:
                variables["batch_stats"] = batch_stats
            kwargs = dict(train=train)
            mutable = ["batch_stats"] if (train and has_batch_stats) else False
            # The rng is threaded whenever one is available in train mode; the
            # *module* decides whether dropout consumes it (flax ignores
            # unused rngs), so a new model with dropout can never silently
            # train without it (a hardcoded model-name list could go stale).
            rngs = {"dropout": rng} if (train and rng is not None) else None
            out = model.apply(variables, x, rngs=rngs, mutable=mutable, **kwargs)
            if mutable:
                pred, mutated = out
                return pred, mutated.get("batch_stats", batch_stats)
            return out, batch_stats

        def batch_loss(pred, y, mask):
            """MSE + optional distribution-moment matching. The composite
            metric is dominated by time-MEAN RMSE (weight 1.0 vs 0.1 for
            monthly) and time-STD MAE; plain MSE only attacks the monthly
            term. The moment term penalizes the batch-mean map and
            batch-std map errors (a stochastic proxy for the time-mean /
            time-std maps over the mixed scenario/member batch), pushing
            the climatology calibration the metric actually scores.
            Beyond-parity: the reference trains on plain MSE only
            (main_final.py:556-561)."""
            loss = masked_mse(pred, y, mask)
            if moment_loss_weight > 0.0:
                m = mask.astype(jnp.float32).reshape((-1,) + (1,) * (pred.ndim - 1))
                denom = jnp.maximum(m.sum(), 1.0)
                p32 = pred.astype(jnp.float32) * m
                y32 = y.astype(jnp.float32) * m
                p_mean = p32.sum(0) / denom
                y_mean = y32.sum(0) / denom
                p_var = (m * (pred.astype(jnp.float32) - p_mean) ** 2).sum(0) / denom
                y_var = (m * (y.astype(jnp.float32) - y_mean) ** 2).sum(0) / denom
                moment = jnp.mean((p_mean - y_mean) ** 2) + jnp.mean(
                    (jnp.sqrt(p_var + 1e-8) - jnp.sqrt(y_var + 1e-8)) ** 2
                )
                loss = loss + moment_loss_weight * moment
            return loss

        def loss_fn(params, batch_stats, x, y, mask, rng):
            pred, new_bs = forward(params, batch_stats, x, rng, train=True)
            return batch_loss(pred, y, mask), new_bs

        sf_slots = tuple(sorted((self_force_slots or {}).items()))
        if sf_slots and seq_len is None:
            raise ValueError("self_force_slots requires a sequence model (seq_len)")
        if self_force_steps < 1:
            raise ValueError(f"self_force_steps must be >= 1, got {self_force_steps}")
        if sched_sampling_ramp < 0:
            raise ValueError(f"sched_sampling_ramp must be >= 0, got {sched_sampling_ramp}")
        if sched_sampling_ramp > 0 and not sf_slots:
            raise ValueError("sched_sampling_ramp requires self_force_slots (feedback model)")
        if not 0.0 <= sched_sampling_max <= 1.0:
            # jax.random.bernoulli silently accepts p outside [0,1] (all-True /
            # all-False), so a config typo would train with a broken curriculum.
            raise ValueError(
                f"sched_sampling_max must be in [0, 1], got {sched_sampling_max}"
            )

        def _set_prev(x, frame, pred, keep=None):
            """Write pred's feedback channels into window frame's prev slots.
            keep (B,) float, scheduled sampling only: 1 -> model prediction,
            0 -> keep the teacher value already in x."""
            for out_c, in_c in sf_slots:
                p = pred[..., out_c].astype(x.dtype)
                if keep is not None:
                    k = keep.astype(x.dtype)[:, None, None]
                    p = k * p + (1.0 - k) * x[:, frame, :, :, in_c]
                x = x.at[:, frame, :, :, in_c].set(p)
            return x

        def _noise_prev(x, rng):
            """Gaussian perturbation of the (normalized) prev channels."""
            for i, (_, in_c) in enumerate(sf_slots):
                n = jax.random.normal(jax.random.fold_in(rng, i), x.shape[:-1], x.dtype)
                x = x.at[..., in_c].add(jnp.asarray(prev_noise, x.dtype) * n)
            return x

        def self_force_loss_fn(params, batch_stats, x_all, y_all, idx, mask, rng, step):
            # Chain: predict months idx-k .. idx-1 sequentially (k =
            # self_force_steps); window j's trailing frames carry the
            # chain's own predictions so far; frames beyond the chain keep
            # teacher forcing. k=1 is the 2-step hybrid of round 3 exactly.
            # With sched_sampling_ramp > 0 every prev-channel write keeps
            # the model prediction with per-sample probability p(step) and
            # the teacher value otherwise (scheduled-sampling curriculum).
            k = self_force_steps
            bs_cur = batch_stats
            preds: list = []  # own predictions for months idx-k .. idx-1
            aux = 0.0
            ss_p = (
                sched_sampling_prob(step, sched_sampling_ramp, sched_sampling_max)
                if sched_sampling_ramp > 0 else None
            )
            n_writes = 0

            def _keep(r):
                nonlocal n_writes
                n_writes += 1
                if ss_p is None:
                    return None
                return jax.random.bernoulli(
                    jax.random.fold_in(r, 200 + n_writes), ss_p, idx.shape
                )

            for j in range(k):
                off = k - j  # this iteration predicts month idx-off
                idx_j = jnp.maximum(idx - off, 0)
                x_j = gather(x_all, idx_j)
                if prev_noise > 0.0:
                    x_j = _noise_prev(x_j, jax.random.fold_in(rng, 100 + j))
                for i, p in enumerate(reversed(preds[-(seq_len or 1):])):
                    x_j = _set_prev(x_j, -(i + 1), p, _keep(rng))
                pred_j, bs_cur = forward(
                    params, bs_cur, x_j, jax.random.fold_in(rng, 1 + j), train=True
                )
                y_j = gather_frames(y_all, idx_j)
                # months with no real idx-off history contribute no aux loss
                aux = aux + masked_mse(
                    pred_j, y_j, mask * (idx >= off).astype(mask.dtype)
                )
                preds.append(pred_j)
            x = gather(x_all, idx)
            if prev_noise > 0.0:
                x = _noise_prev(x, jax.random.fold_in(rng, 99))
            for i, p in enumerate(reversed(preds[-(seq_len or 1):])):
                x = _set_prev(x, -(i + 1), p, _keep(rng))
            pred, new_bs = forward(params, bs_cur, x, rng, train=True)
            y = gather_frames(y_all, idx)
            loss = batch_loss(pred, y, mask) + self_force_weight * (aux / k)
            return loss, new_bs

        use_self_force = bool(sf_slots) and (
            self_force_weight > 0.0 or sched_sampling_ramp > 0
        )

        def _step_body(state, x_all, y_all, idx, mask, rng):
            if use_self_force:
                (loss, new_bs), grads = jax.value_and_grad(
                    self_force_loss_fn, has_aux=True
                )(state.params, state.batch_stats, x_all, y_all, idx, mask, rng,
                  state.step)
            else:
                x = gather(x_all, idx)
                if sf_slots and prev_noise > 0.0:  # noise-only robustness mode
                    x = _noise_prev(x, jax.random.fold_in(rng, 99))
                y = gather_frames(y_all, idx)
                (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    state.params, state.batch_stats, x, y, mask, rng
                )
            return _finish_step(state, loss, new_bs, grads)

        def _finish_step(state, loss, new_bs, grads):
            # gradient observability (the reference's wandb.watch gradient
            # stream, utils_baseline.py:122 — here a cheap on-device norm)
            gnorm = optax.global_norm(grads)
            updates, new_opt = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = state.replace(
                step=state.step + 1, params=new_params, batch_stats=new_bs, opt_state=new_opt
            )
            return new_state, loss, gnorm

        def _train_step(state, x_all, y_all, idx, mask, rng):
            new_state, loss, _ = _step_body(state, x_all, y_all, idx, mask, rng)
            return new_state, loss

        def _train_epoch(state, x_all, y_all, idx_mat, mask_mat, rng0):
            """A whole epoch as one lax.scan: one host dispatch instead of
            n_batches (dispatch latency dominates small-step training,
            especially through the axon tunnel)."""

            def body(carry, inp):
                idx, mask = inp
                rng = jax.random.fold_in(rng0, carry.step)
                new_state, loss, gnorm = _step_body(carry, x_all, y_all, idx, mask, rng)
                return new_state, (loss, gnorm)

            return jax.lax.scan(body, state, (idx_mat, mask_mat))

        def _grads(state, x_all, y_all, idx, mask, rng):
            """Gradient tree for one batch, no update — feeds the per-layer
            histogram stream (reference: wandb.watch(model, log="all"),
            utils_baseline.py:122)."""
            x = gather(x_all, idx)
            y = gather_frames(y_all, idx)
            (_, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params, state.batch_stats, x, y, mask, rng
            )
            return grads

        def _predict(state, x_all, idx):
            """Eval forward for a (padded) index batch -> normalized preds."""
            x = gather(x_all, idx)
            pred, _ = forward(state.params, state.batch_stats, x, None, train=False)
            return pred

        repl = NamedSharding(mesh, P())

        # Whole-split inference as ONE jitted program: lax.map over fixed-size
        # batches, batch axis sharded per step via constraint, result
        # replicated. Keeps eval to a single compiled collective schedule
        # (eager per-op collectives on sharded arrays deadlock oversubscribed
        # CPU meshes and waste launches on TPU). Shared by the single- and
        # multi-member paths (the latter vmaps it over the member axis).
        def _predict_split_run(n: int, batch_size: int):
            n_batches = -(-n // batch_size)

            def _run(state, x_all):
                starts = jnp.arange(n_batches, dtype=jnp.int32) * batch_size

                def step(start):
                    idx = jnp.minimum(start + jnp.arange(batch_size, dtype=jnp.int32), n - 1)
                    x = gather(x_all, idx)
                    x = jax.lax.with_sharding_constraint(
                        x, NamedSharding(mesh, P(DATA_AXIS))
                    )
                    pred, _ = forward(state.params, state.batch_stats, x, None, train=False)
                    return pred

                preds = jax.lax.map(step, starts)  # (nb, bs, H, W, C)
                return preds.reshape(n_batches * batch_size, *preds.shape[2:])[:n]

            return _run

        if n_members > 1:
            K = n_members

            def _member_rngs(rng):
                return jax.vmap(jax.random.fold_in, (None, 0))(
                    rng, jnp.arange(K, dtype=jnp.uint32)
                )

            def _train_step_m(states, x_all, y_all, idx, mask, rng):
                # idx/mask (K, B); per-member rng = fold_in(rng, k)
                def one(s, i, m, r):
                    ns, loss, _ = _step_body(s, x_all, y_all, i, m, r)
                    return ns, loss

                return jax.vmap(one)(states, idx, mask, _member_rngs(rng))

            def _train_epoch_m(states, x_all, y_all, idx_mat, mask_mat, rng0):
                # idx_mat (n_batches, K, B); members share the step counter
                # (same batch count), so the per-step fold uses member 0's.
                def body(carry, inp):
                    idx, mask = inp
                    rng = jax.random.fold_in(rng0, carry.step.reshape(-1)[0])

                    def one(s, i, m, r):
                        return _step_body(s, x_all, y_all, i, m, r)

                    new_states, loss, gnorm = jax.vmap(one)(
                        carry, idx, mask, _member_rngs(rng)
                    )
                    return new_states, (loss, gnorm)

                return jax.lax.scan(body, states, (idx_mat, mask_mat))

            def _predict_m(states, x_all, idx):
                return jax.vmap(lambda s: _predict(s, x_all, idx))(states)

            shard_kb = NamedSharding(mesh, P(None, DATA_AXIS))  # (K, B)
            shard_skb = NamedSharding(mesh, P(None, None, DATA_AXIS))  # (nb, K, B)
            train_step = jax.jit(
                _train_step_m,
                in_shardings=(repl, repl, repl, shard_kb, shard_kb, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
            train_epoch = jax.jit(
                _train_epoch_m,
                in_shardings=(repl, repl, repl, shard_skb, shard_skb, repl),
                out_shardings=(repl, repl),
                donate_argnums=(0,),
            )
            predict = jax.jit(
                _predict_m,
                in_shardings=(repl, repl, NamedSharding(mesh, P(DATA_AXIS))),
                out_shardings=shard_kb,
            )
            grad_fn = None  # per-member histograms: restore a member and use K=1

            @functools.lru_cache(maxsize=None)
            def predict_split_for(n: int, batch_size: int):
                single = _predict_split_run(n, batch_size)
                return jax.jit(
                    lambda states, x_all: jax.vmap(lambda s: single(s, x_all))(states),
                    in_shardings=(repl, repl),
                    out_shardings=repl,
                )

            return StepFunctions(
                train_step=train_step,
                predict=predict,
                predict_split_for=predict_split_for,
                train_epoch=train_epoch,
                grad_fn=grad_fn,
            )

        shard_b = NamedSharding(mesh, P(DATA_AXIS))
        train_step = jax.jit(
            _train_step,
            in_shardings=(repl, repl, repl, shard_b, shard_b, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        shard_steps = NamedSharding(mesh, P(None, DATA_AXIS))  # (n_batches, B)
        train_epoch = jax.jit(
            _train_epoch,
            in_shardings=(repl, repl, repl, shard_steps, shard_steps, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )
        predict = jax.jit(
            _predict,
            in_shardings=(repl, repl, shard_b),
            out_shardings=shard_b,
        )
        grad_fn = jax.jit(
            _grads,
            in_shardings=(repl, repl, repl, shard_b, shard_b, repl),
            out_shardings=repl,
        )

        @functools.lru_cache(maxsize=None)
        def predict_split_for(n: int, batch_size: int):
            return jax.jit(
                _predict_split_run(n, batch_size),
                in_shardings=(repl, repl), out_shardings=repl,
            )

        return StepFunctions(
            train_step=train_step,
            predict=predict,
            predict_split_for=predict_split_for,
            train_epoch=train_epoch,
            grad_fn=grad_fn,
        )


def pad_batch(idx: np.ndarray, batch_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad an index batch to fixed size; mask marks real rows. Keeps one
    compiled shape for the torch drop_last=False semantics."""
    n = len(idx)
    if n == batch_size:
        return idx.astype(np.int32), np.ones(batch_size, np.float32)
    out = np.zeros(batch_size, np.int32)
    out[:n] = idx
    mask = np.zeros(batch_size, np.float32)
    mask[:n] = 1.0
    return out, mask


def predict_dataset(step_fns: StepFunctions, state, x_all, n: int, batch_size: int):
    """Normalized predictions for a whole split — one jitted program."""
    return step_fns.predict_split_for(n, batch_size)(state, x_all)
