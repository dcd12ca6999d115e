"""Checkpoint/resume via Orbax.

The reference saves bare ``state_dict`` .pth files every 5 epochs with no
optimizer state (``train_ours_d.py:186-187``) and resumes by path string
parsing (``train_context_app_v2.py:71-104``); its layout2im-side saver keeps
the last 5 files (``utils_layout2img/model_saver.py:85-103``). Here the FULL
train state (both nets' params, BN/spectral collections, both Adam states,
step counter) round-trips atomically, with keep-last-N retention.
"""

from __future__ import annotations

import os
import orbax.checkpoint as ocp

from layout2img_tpu.train.state import GANTrainState


def _as_pytree(state: GANTrainState) -> dict:
    tree = {
        "step": state.step,
        "g_params": state.g_params,
        "g_state": state.g_state,
        "d_params": state.d_params,
        "d_state": state.d_state,
        "g_opt_state": state.g_opt_state,
        "d_opt_state": state.d_opt_state,
    }
    if state.ema_params is not None:
        tree["ema_params"] = state.ema_params
    return tree


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 5, async_save: bool = False):
        """``async_save=True``: ``save()`` returns once the state has been
        serialized off-device (donation-safe — the next jitted step may reuse
        the buffers) and Orbax finalizes the write in its own background
        thread; call :meth:`wait` to drain. Multi-host-safe: the background
        finalization barrier is routed over the ``jax.distributed``
        coordination service (``client.wait_at_barrier``, documented safe
        from independent threads) instead of Orbax's default
        ``sync_global_devices`` XLA collective, so it cannot interleave with
        the training collectives the main thread keeps dispatching — the
        deadlock that forced the r3 single-process restriction.
        """
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._async_save = async_save
        async_options = None
        if async_save:
            from orbax.checkpoint import multihost

            if multihost.is_jax_distributed_client_initialized():
                async_options = ocp.options.AsyncOptions(
                    barrier_sync_fn=multihost.get_barrier_sync_fn())
        self._mgr = ocp.CheckpointManager(
            self.directory,
            # the handler hint lets a FRESH manager read item_metadata() of
            # existing checkpoints (otherwise it returns None before the
            # first save/restore) — restore() relies on it for EMA detection
            item_handlers=ocp.StandardCheckpointHandler(),
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True, async_options=async_options),
        )

    def save(self, state: GANTrainState, step: int | None = None) -> None:
        step = int(state.step) if step is None else step
        # Orbax's save() blocks until any PREVIOUS save finished, so at most
        # one write is in flight.
        self._mgr.save(step, args=ocp.args.StandardSave(_as_pytree(state)))
        if not self._async_save:
            self._mgr.wait_until_finished()

    def wait(self) -> None:
        """Block until any in-flight async save has been finalized."""
        self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: GANTrainState, step: int | None = None) -> GANTrainState:
        """Restore into the structure of an (initialized) state template.

        EMA weights are restored whenever the checkpoint carries them (so a
        sampler built without --ema_decay still gets them); a template asking
        for EMA that the checkpoint lacks starts the average from a COPY of
        g_params (aliasing would make the donated jitted step donate the same
        buffer twice). EMA presence is read from the checkpoint metadata, so
        unrelated restore failures (corrupt file, wrong --ch) surface as-is.
        """
        step = self.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")

        has_ema = "ema_params" in set(self._mgr.item_metadata(step).keys())
        wants_ema = state.ema_params is not None

        def attempt(template: GANTrainState):
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(_as_pytree(template))
            )
            return template.replace(**restored)

        if has_ema and not wants_ema:
            # template slot to restore the checkpoint's EMA into
            return attempt(state.replace(ema_params=state.g_params))
        if wants_ema and not has_ema:
            from layout2img_tpu.train.ema import ema_init

            restored = attempt(state.replace(ema_params=None))
            return restored.replace(ema_params=ema_init(restored.g_params))
        return attempt(state)

    def close(self):
        self._mgr.close()


class AsyncSaver:
    """Non-blocking checkpointing around a :class:`CheckpointManager`.

    The training loop donates the state buffers to the next jitted step, so a
    checkpoint must capture the state before training continues. The cheap
    part of that is an ON-DEVICE copy (one fused jit dispatch — critical over
    the remote-TPU transport, where per-leaf eager copies would cost ~1 s
    each); the expensive parts — device-to-host transfer of the full state
    and the Orbax write — then run in a background thread against the
    snapshot while training proceeds. Single-process only (``device_get`` of
    a multi-host global array is undefined); multi-host async saves use
    ``CheckpointManager(async_save=True)`` instead, which keeps the D2H
    serialization on the main thread in step-lockstep and backgrounds only
    the write + coordination-service barrier.
    """

    def __init__(self, mgr: CheckpointManager):
        self._mgr = mgr
        self._thread = None
        self._err: BaseException | None = None
        self._snapshot = None  # jitted on-device tree copy

    def save(self, state: GANTrainState, step: int | None = None) -> None:
        import logging
        import threading

        import jax
        import jax.numpy as jnp

        # one save in flight at a time. A PREVIOUS save's failure must not
        # abort this one (e.g. a transient epoch-save failure would otherwise
        # poison the final SIGTERM preemption save) — log it and proceed;
        # explicit wait() still raises.
        self._join()
        if self._err is not None:
            logging.getLogger(__name__).warning(
                "previous async checkpoint save failed; attempting the next "
                "save anyway: %r", self._err)
            self._err = None
        if self._snapshot is None:
            self._snapshot = jax.jit(
                lambda t: jax.tree_util.tree_map(jnp.copy, t))
        snap = self._snapshot(state)
        step = int(state.step) if step is None else step

        def work():
            try:
                self._mgr.save(jax.device_get(snap), step)
            except BaseException as e:  # surfaced on the next wait()/save()
                self._err = e

        self._thread = threading.Thread(target=work, name="ckpt-save", daemon=True)
        self._thread.start()

    def _join(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None

    def wait(self) -> None:
        self._join()
        if self._err is not None:
            err, self._err = self._err, None
            raise RuntimeError("async checkpoint save failed") from err

    # pass-throughs so the trainer can treat either manager uniformly
    def latest_step(self):
        return self._mgr.latest_step()

    def restore(self, state: GANTrainState, step: int | None = None) -> GANTrainState:
        self.wait()
        return self._mgr.restore(state, step)

    def close(self):
        self.wait()
        self._mgr.close()
