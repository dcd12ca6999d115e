"""Periodic in-training evaluation.

The reference evaluates only offline — dump JPEGs with a test_* script, then
run ``IS.py`` / external FID (``README.md:58-63``); there is no metric signal
during training. Production training wants the trajectory live: this hook
holds a fixed pool of real layouts, and every ``--eval_every`` steps samples
the generator on those SAME layouts (fixed PRNG) and reports

  - ``rel_fid``: Frechet distance between the fake pool and the real pool's
    cached statistics. With real ``--inception_weights`` this is a true
    small-n FID; without, it uses the fixed-seed He-scaled random-filter
    Inception (``eval/inception.py:random_inception_variables``) and is
    meaningful as a RELATIVE trajectory only (falling = distributions
    converging), the same signal ``scripts/train_conditioning_check.py --fid``
    validates end-to-end.
  - ``is_mean``/``is_std``: Inception Score of the fakes — only when real
    weights are given (softmax of random-filter logits is meaningless).

Fixed layouts + fixed z make consecutive evaluations differ only through the
generator weights, so the trajectory is low-variance even at small eval_n.
"""

from __future__ import annotations

import numpy as np

import jax


class PeriodicEval:
    """Callable hook: ``metrics = hook(host_state)``.

    Args:
      sample_fn: jitted ``(g_params, g_state, boxes, labels, rng) -> images``
        (from ``train.step.make_sample_fn``); reused from the train CLI so
        the generator compiles once. With ``batch_mode=True`` the signature
        is ``(g_params, g_state, batch_dict, rng) -> images`` instead — the
        shape the special-family samplers take (``step_bgfg.
        make_bgfg_sample_fn`` needs the fg/bg-split label/box fields, the
        layout2im sampler builds masks from the batch's boxes).
      eval_batches: list of host batches (dicts with ``images``/``labels``/
        ``boxes``) — the frozen real pool.
      inception_weights: optional torchvision inception_v3 .pth path.
      seed: PRNG seed for the frozen per-batch z draws.
      batch_mode: pass each frozen pool batch (minus ``images``) to
        sample_fn whole, instead of unpacking (boxes, labels).
    """

    def __init__(self, sample_fn, eval_batches, *, inception_weights: str = "",
                 batch_size: int = 64, seed: int = 0, batch_mode: bool = False):
        from layout2img_tpu.eval.inception import (
            InceptionV3,
            load_torch_inception_v3,
            random_inception_variables,
        )
        from layout2img_tpu.eval.metrics import feature_stats, run_inception_batches

        if not eval_batches:
            raise ValueError("PeriodicEval needs at least one eval batch")
        net = InceptionV3()
        self.real_weights = bool(inception_weights)
        self._variables = (load_torch_inception_v3(inception_weights)
                           if inception_weights else random_inception_variables(0))

        # a stable function object: run_inception_batches caches its jit
        # wrapper per callable identity (eval/metrics.py:101-112)
        def _apply(variables, x):
            return net.apply(variables, x)

        self._apply = _apply
        self._sample_fn = sample_fn
        self._batch_size = batch_size
        self._seed = seed
        self._batch_mode = batch_mode
        if batch_mode:
            # keep every conditioning field (fg/bg splits etc.); drop the
            # real images — the fakes are drawn from layout + frozen z only
            self._layouts = [{k: np.asarray(v) for k, v in b.items()
                              if k != "images"} for b in eval_batches]
        else:
            self._layouts = [(np.asarray(b["boxes"]), np.asarray(b["labels"]))
                             for b in eval_batches]
        real_feats, _ = run_inception_batches(
            _apply, self._variables,
            (np.asarray(b["images"]) for b in eval_batches), batch_size)
        self._real_mu, self._real_sigma = feature_stats(real_feats)
        self.n_images = len(real_feats)

    def _fakes(self, g_params, g_state):
        for i, layout in enumerate(self._layouts):
            key = jax.random.PRNGKey(self._seed * 100003 + i)
            if self._batch_mode:
                yield np.asarray(self._sample_fn(g_params, g_state, layout, key))
            else:
                boxes, labels = layout
                yield np.asarray(self._sample_fn(g_params, g_state, boxes,
                                                 labels, key))

    def __call__(self, host_state) -> dict:
        from layout2img_tpu.eval.metrics import (
            feature_stats,
            frechet_distance,
            inception_score,
            run_inception_batches,
        )

        params = (host_state.ema_params if getattr(host_state, "ema_params", None)
                  is not None else host_state.g_params)
        feats, probs = run_inception_batches(
            self._apply, self._variables,
            self._fakes(params, host_state.g_state), self._batch_size)
        mu, sigma = feature_stats(feats)
        out = {"rel_fid": frechet_distance(mu, sigma, self._real_mu, self._real_sigma)}
        if self.real_weights:
            is_mean, is_std = inception_score(probs)
            out["is_mean"], out["is_std"] = is_mean, is_std
        return out
