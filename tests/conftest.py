"""Test config: force an 8-device virtual CPU mesh before jax initializes.

Multi-chip sharding is validated on virtual CPU devices (the driver dry-runs
the same path via __graft_entry__.dryrun_multichip); real-TPU perf is
measured separately by bench.py.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Persistent XLA compilation cache (opt out with JAX_TEST_COMPILE_CACHE=0):
# the slow tier spends much of its 2.5h+ single-core wall-clock recompiling
# the same tiny-config train steps run after run; with the cache, repeat
# runs deserialize instead (only compiles >1s are cached — jax's default
# min_compile_time — which is exactly the expensive ones). Keyed on the HLO
# hash, so code changes invalidate automatically. Set via env BEFORE jax
# imports so the multihost/preemption subprocess tests inherit it too.
# Benign noise: XLA:CPU's AOT loader logs a feature-string mismatch warning
# per cached load (a known string-compare quirk; compile host == run host).
if os.environ.get("JAX_TEST_COMPILE_CACHE", "1") != "0":
    _cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          ".cache", "jax")
    os.makedirs(_cache, exist_ok=True)
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", _cache)

import jax

# The sandbox's axon TPU plugin ignores JAX_PLATFORMS; force cpu explicitly
# before any backend initialization.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


def pytest_addoption(parser):
    parser.addoption(
        "--runslow", action="store_true", default=False,
        help="also run tests marked slow (full parity/trainer/multihost matrix, "
             "~60-120 min); default run finishes in minutes",
    )


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavyweight test (torch-reference parity, full-size trainers, "
        "multihost); skipped unless --runslow",
    )
    config.addinivalue_line(
        "markers",
        "xdist_group(name): serialize marked tests onto one pytest-xdist "
        "worker under `-n N --dist loadgroup` (subprocess-spawning tests "
        "with wall-clock deadlines)",
    )


def pytest_collection_modifyitems(config, items):
    if config.getoption("--runslow"):
        return
    skip = pytest.mark.skip(reason="slow test: pass --runslow to include")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_modules():
    """torch + the reference v2 generator module, CPU-neutralized. Shared by
    the generator parity tests and the reverse-export parity tests."""
    import sys

    import torch

    ref = "/root/reference"
    if not os.path.isdir(os.path.join(ref, "model")):
        pytest.skip("reference repo not available")

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-neutralize
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import importlib

    mod = importlib.import_module("model.resnet_generator_app_v2")
    return torch, mod


@pytest.fixture(scope="session")
def reference_disc_module():
    """The reference discriminator module with a TRUE torchvision-semantics
    RoIAlign polyfill injected (torchvision is absent in the sandbox;
    the polyfill implements the adaptive ``sampling_ratio=0`` grid the
    reference actually constructs). Shared by the D parity and
    torch-fine-tune tests; the polyfill itself lives in
    ``layout2img_tpu.utils.torchvision_polyfill``.
    """
    import sys

    import torch

    from layout2img_tpu.utils.torchvision_polyfill import install

    ref = "/root/reference"
    if not os.path.isdir(os.path.join(ref, "model")):
        pytest.skip("reference repo not available")

    install()
    if ref not in sys.path:
        sys.path.insert(0, ref)
    import importlib

    mod = importlib.import_module("model.rcnn_discriminator_app")
    return torch, mod
