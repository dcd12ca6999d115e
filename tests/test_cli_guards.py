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


def test_sample_rejects_obj_budget_for_special_models():
    """cli.sample --obj_budget is only wired into the LostGAN-family
    samplers; the ours_ed/layout2im branches must refuse it (ADVICE r4)."""
    from layout2img_tpu.cli.sample import main

    for model in ("ours_ed", "layout2im"):
        with pytest.raises(SystemExit, match="no object-budget serving path"):
            main(["--model", model, "--obj_budget", "2",
                  "--dataset", "synthetic", "--batch_size", "2"])
