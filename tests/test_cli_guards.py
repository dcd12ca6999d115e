"""Fast CLI guard checks: flags that would otherwise be silently ignored or
silently change semantics must raise readable errors before any heavy work
(ADVICE r4: budget flags on the special families; data-driven budget guard).
"""

import pytest


def test_train_rejects_budget_flags_for_special_models():
    """--g_obj_budget/--d_obj_budget have no path through the special
    trainers (step_bgfg / step_layout2im) — main() must refuse before
    dispatch instead of silently training unbudgeted (ADVICE r4)."""
    from layout2img_tpu.cli.train import main

    base = ["--dataset", "synthetic", "--total_epoch", "1",
            "--steps_per_epoch", "1", "--batch_size", "2", "--ch", "4",
            "--no_vgg"]
    with pytest.raises(SystemExit, match="no object-budget path"):
        main(["--model", "ours_ed", "--g_obj_budget", "2"] + base)
    with pytest.raises(SystemExit, match="no object-budget path"):
        main(["--model", "layout2im", "--d_obj_budget", "2"] + base)


def test_check_obj_budgets_data_guard():
    """Data-driven budget guard (VERDICT r4 #2): a --g_obj_budget below the
    dataset's max valid object count is refused (overflow objects would
    vanish from generated images) unless --obj_budget_force; a low
    --d_obj_budget only warns (D's view only)."""
    import argparse
    import logging

    import numpy as np

    from layout2img_tpu.cli.train import check_obj_budgets

    class _DS:
        def valid_object_counts(self):
            return np.array([3, 5, 10], np.int32)

    class _Loader:
        dataset = _DS()

    logger = logging.getLogger("test_budget_guard")
    ns = lambda g, d, force=False: argparse.Namespace(
        g_obj_budget=g, d_obj_budget=d, obj_budget_force=force)

    with pytest.raises(SystemExit, match="below the dataset's max"):
        check_obj_budgets(_Loader(), ns(5, 0), logger)
    check_obj_budgets(_Loader(), ns(5, 0, force=True), logger)  # accepted
    check_obj_budgets(_Loader(), ns(0, 5), logger)  # D budget: warn only
    check_obj_budgets(_Loader(), ns(10, 10), logger)  # covers the max: exact
    check_obj_budgets(_Loader(), ns(0, 0), logger)  # no budgets: no-op


def test_train_refuses_g_budget_below_data_max(tmp_path):
    """End-to-end wiring: cli.train on the synthetic dataset (valid counts
    3..8) refuses --g_obj_budget 4 before any compilation."""
    from layout2img_tpu.cli.train import main

    with pytest.raises(SystemExit, match="below the dataset's max"):
        main(["--model", "context_app_v2", "--dataset", "synthetic",
              "--g_obj_budget", "4", "--total_epoch", "1",
              "--steps_per_epoch", "1", "--batch_size", "2", "--ch", "4",
              "--no_vgg", "--out_path", str(tmp_path)])


def test_warn_known_compile_crash(monkeypatch):
    """Pre-flight guard for the documented o>=31/b>=128 un-budgeted TPU
    compile-helper crash (VERDICT r4 #5): fires only on TPU, only in the
    fatal region, and not when a budget is set."""
    import logging

    import jax

    from layout2img_tpu.cli.train import warn_known_compile_crash as warn

    logger = logging.getLogger("test_crash_guard")
    assert not warn(31, 128, 0, 0, logger)  # cpu backend: silent
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert warn(31, 128, 0, 0, logger)
    assert warn(31, 256, 0, 0, logger)
    assert not warn(31, 64, 0, 0, logger)   # below the fatal batch
    assert not warn(8, 128, 0, 0, logger)   # COCO shape: fine
    assert not warn(31, 128, 12, 0, logger)  # budget set: compiles
    assert not warn(31, 128, 0, 12, logger)


def test_sample_rejects_obj_budget_for_special_models():
    """cli.sample --obj_budget is only wired into the LostGAN-family
    samplers; the ours_ed/layout2im branches must refuse it (ADVICE r4)."""
    from layout2img_tpu.cli.sample import main

    for model in ("ours_ed", "layout2im"):
        with pytest.raises(SystemExit, match="no object-budget serving path"):
            main(["--model", model, "--obj_budget", "2",
                  "--dataset", "synthetic", "--batch_size", "2"])
