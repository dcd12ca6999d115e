"""Generative metrics: Inception Score and FID.

IS matches the reference protocol (``IS.py:111-148``): split the probs,
IS_split = exp(mean_i KL(p(y|x_i) || mean_i p(y|x_i))), report mean/std over
``splits`` (reference uses 3, not the usual 10 — ``IS.py:34``).

FID is the standard Frechet distance on pool3 features (the reference leaves
FID external; README numbers only).
"""

from __future__ import annotations

import weakref

import numpy as np

import jax
import jax.numpy as jnp

# one jitted wrapper per apply function: a fresh jax.jit wrapper has its own
# trace cache, so re-wrapping per call would recompile InceptionV3 once per
# --dir_list/--superdir source (minutes each on the tunneled TPU)
_JIT_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _jitted(fn):
    def feats_and_probs(variables, x):
        f, logits = fn(variables, x)
        # softmax INSIDE the jit: an eager per-batch softmax would cost
        # several tunnel dispatches per chunk (CLAUDE.md environment rule)
        return f, jax.nn.softmax(logits, axis=-1)

    try:
        return _JIT_CACHE.setdefault(fn, jax.jit(feats_and_probs))
    except TypeError:  # unhashable/unweakrefable callable
        return jax.jit(feats_and_probs)


def inception_score(probs: np.ndarray, splits: int = 3) -> tuple[float, float]:
    """probs: (n, num_classes) softmax outputs."""
    probs = np.asarray(probs, np.float64)
    n = probs.shape[0]
    scores = []
    for i in range(splits):
        part = probs[i * n // splits : (i + 1) * n // splits]
        if len(part) == 0:
            continue
        marginal = part.mean(axis=0, keepdims=True)
        kl = part * (np.log(part + 1e-16) - np.log(marginal + 1e-16))
        scores.append(np.exp(kl.sum(axis=1).mean()))
    return float(np.mean(scores)), float(np.std(scores))


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """||mu1-mu2||^2 + Tr(s1 + s2 - 2 sqrt(s1 s2)).

    Rank-deficient covariances (fewer samples than feature dims, the usual
    case below ~2049 images) make sqrtm(s1 s2) numerically unstable; retry
    with eps-regularized diagonals like pytorch-fid when that happens."""
    import scipy.linalg

    diff = mu1 - mu2
    covmean = scipy.linalg.sqrtm(sigma1 @ sigma2)
    if np.iscomplexobj(covmean):
        covmean = covmean.real
    if not np.isfinite(covmean).all():
        print(f"WARNING: singular product of covariances; adding eps={eps} "
              "to the diagonals (sample count likely < feature dim)")
        off = np.eye(sigma1.shape[0]) * eps
        covmean = scipy.linalg.sqrtm((sigma1 + off) @ (sigma2 + off))
        if np.iscomplexobj(covmean):
            covmean = covmean.real
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


def fid_from_features(feats1: np.ndarray, feats2: np.ndarray) -> float:
    f1 = np.asarray(feats1, np.float64)
    f2 = np.asarray(feats2, np.float64)
    mu1, mu2 = f1.mean(0), f2.mean(0)
    s1 = np.cov(f1, rowvar=False)
    s2 = np.cov(f2, rowvar=False)
    return frechet_distance(mu1, s1, mu2, s2)


def kid_from_features(
    feats1: np.ndarray,
    feats2: np.ndarray,
    subset_size: int = 1000,
    num_subsets: int = 100,
    seed: int = 0,
) -> tuple[float, float]:
    """Kernel Inception Distance (Binkowski et al., "Demystifying MMD GANs",
    2018): squared MMD between pool3 feature sets under the polynomial
    kernel k(x, y) = (x.y / d + 1)^3, using the UNBIASED estimator averaged
    over ``num_subsets`` random subsets of ``subset_size`` (the standard
    kid50k protocol). Unlike FID it has no Gaussian assumption and no bias
    at small n — the right metric for the modest sample counts the
    reference's eval scripts produce. Returns (mean, std-across-subsets).

    Beyond-reference capability (the reference evaluates IS/LPIPS in-repo
    and FID externally, ``README.md:58-63``)."""
    f1 = np.asarray(feats1, np.float64)
    f2 = np.asarray(feats2, np.float64)
    if f1.ndim != 2 or f2.ndim != 2 or f1.shape[1] != f2.shape[1]:
        raise ValueError(f"feature shapes mismatch: {f1.shape} vs {f2.shape}")
    m = min(subset_size, len(f1), len(f2))
    if m < 2:
        raise ValueError("KID needs at least 2 samples per set")
    d = f1.shape[1]

    def poly3(x: np.ndarray, y: np.ndarray) -> np.ndarray:
        return (x @ y.T / d + 1.0) ** 3

    rng = np.random.default_rng(seed)
    vals = []
    for _ in range(num_subsets):
        x = f1[rng.choice(len(f1), m, replace=False)]
        y = f2[rng.choice(len(f2), m, replace=False)]
        kxx, kyy, kxy = poly3(x, x), poly3(y, y), poly3(x, y)
        mmd2 = (
            (kxx.sum() - np.trace(kxx)) / (m * (m - 1))
            + (kyy.sum() - np.trace(kyy)) / (m * (m - 1))
            - 2.0 * kxy.mean()
        )
        vals.append(mmd2)
    return float(np.mean(vals)), float(np.std(vals))


def feature_stats(feats: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(n, d) features -> (mu (d,), sigma (d, d)) Frechet statistics."""
    f = np.asarray(feats, np.float64)
    return f.mean(0), np.cov(f, rowvar=False)


def save_feature_stats(path: str, mu: np.ndarray, sigma: np.ndarray, n: int) -> None:
    """Write precomputed FID statistics (pytorch-fid .npz convention:
    arrays ``mu`` and ``sigma``; plus ``n`` so loads can sanity-report the
    sample count the stats came from)."""
    np.savez(path, mu=np.asarray(mu, np.float64),
             sigma=np.asarray(sigma, np.float64), n=np.int64(n))


def load_feature_stats(path: str) -> tuple[np.ndarray, np.ndarray, int]:
    """Read stats written by :func:`save_feature_stats` (or any pytorch-fid
    style .npz with ``mu``/``sigma``). Returns (mu, sigma, n) with n = -1 when
    the file does not record a sample count."""
    with np.load(path) as z:
        if "mu" not in z or "sigma" not in z:
            raise ValueError(
                f"{path} is not a FID stats file (needs arrays 'mu' and 'sigma')")
        mu = np.asarray(z["mu"], np.float64)
        sigma = np.asarray(z["sigma"], np.float64)
        n = int(z["n"]) if "n" in z else -1
    if mu.ndim != 1 or sigma.shape != (mu.shape[0], mu.shape[0]):
        raise ValueError(
            f"{path}: bad stats shapes mu{mu.shape} sigma{sigma.shape}")
    return mu, sigma, n


def run_inception(
    inception_apply, variables, images: np.ndarray, batch_size: int = 64
) -> tuple[np.ndarray, np.ndarray]:
    """Batched on-device feature/probability extraction.

    images: (n, h, w, 3) in [-1, 1]. Returns (features (n, 2048),
    probs (n, 1000)). The tail batch is padded to keep shapes static.
    """
    n = images.shape[0]
    chunks = (images[i : i + batch_size] for i in range(0, n, batch_size))
    return run_inception_batches(inception_apply, variables, chunks, batch_size)


def run_inception_batches(
    inception_apply, variables, batches, batch_size: int = 64, mesh=None
) -> tuple[np.ndarray, np.ndarray]:
    """Streaming variant of ``run_inception``: consumes an iterable of
    (<=batch_size, h, w, 3) chunks so an arbitrarily large sample directory
    never has to fit in host RAM. Tail chunks are padded to keep the
    compiled shape static.

    ``inception_apply`` must be a STABLE callable (the same function object
    across calls): the jit wrapper is cached per function identity, so a
    per-call lambda or freshly-bound method defeats the cache and recompiles
    InceptionV3 on every source (minutes each on the tunneled TPU).

    ``mesh``: optional 1-D device mesh — image chunks are sharded over its
    first axis (variables replicated) so feature extraction data-parallels
    across chips; per-image features make the numbers placement-invariant.
    A ``batch_size`` that does not divide the mesh size is padded UP to the
    next multiple (the pad rows are sliced back off), so sharding never
    silently falls back to one device."""
    feats, probs = [], []
    jit_apply = _jitted(inception_apply)
    data_sh = None
    compiled_bs = batch_size
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        size = mesh.devices.size
        compiled_bs = -(-batch_size // size) * size  # ceil to a multiple
        data_sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        variables = jax.device_put(variables, NamedSharding(mesh, P()))
    for chunk in batches:
        chunk = np.asarray(chunk)
        pad = compiled_bs - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.zeros((pad, *chunk.shape[1:]), chunk.dtype)])
        chunk = jax.device_put(chunk, data_sh) if data_sh is not None else jnp.asarray(chunk)
        f, p = jit_apply(variables, chunk)
        feats.append(np.asarray(f)[: compiled_bs - pad])
        probs.append(np.asarray(p)[: compiled_bs - pad])
    if not feats:
        raise ValueError("no image batches to run inception on")
    return np.concatenate(feats), np.concatenate(probs)
