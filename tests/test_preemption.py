"""Preemption safety: a SIGTERM'd training run saves a checkpoint and exits 0.

The reference has no failure handling (SURVEY.md section 5.3) — a preempted
run loses everything since the last 5-epoch save. Here cli.train catches
SIGTERM, finishes the in-flight step, writes a full-state checkpoint, and
exits cleanly, so cluster preemption costs at most one step.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# JAX_PLATFORM_NAME/JAX_PLATFORMS env vars are IGNORED by the axon TPU
# plugin (CLAUDE.md); force CPU the way scripts/launch_multihost.py does —
# jax.config.update before the trainer import — so the child never trains
# over the ~1 s/dispatch TPU tunnel (ADVICE r3).
_CPU_SHIM = (
    "import sys, jax; jax.config.update('jax_platforms', 'cpu'); "
    "from layout2img_tpu.cli.train import main; main(sys.argv[1:])"
)


@pytest.mark.slow
def test_sigterm_saves_checkpoint_and_exits_zero(tmp_path):
    out = str(tmp_path)
    proc = subprocess.Popen(
        [sys.executable, "-c", _CPU_SHIM,
         "--model", "ours_d", "--dataset", "synthetic",
         "--total_epoch", "1000", "--steps_per_epoch", "50",
         "--batch_size", "2", "--img_size", "64", "--ch", "4", "--no_vgg",
         "--log_every", "1", "--save_every_epochs", "100000",
         "--out_path", out],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    run_dir = os.path.join(out, "synthetic", "64", "ours_d")
    metrics = os.path.join(run_dir, "metrics.jsonl")

    # wait until training is demonstrably under way (>= 2 logged steps)
    deadline = time.time() + 900
    while time.time() < deadline:
        if proc.poll() is not None:
            break
        try:
            with open(metrics) as f:
                if sum(1 for _ in f) >= 2:
                    break
        except FileNotFoundError:
            pass
        time.sleep(2)
    assert proc.poll() is None, "train exited early:\n" + proc.stdout.read()

    proc.send_signal(signal.SIGTERM)
    out_text, _ = proc.communicate(timeout=900)
    assert proc.returncode == 0, out_text
    assert "SIGTERM: saving checkpoint" in out_text, out_text

    ckpt_dir = os.path.join(run_dir, "ckpt")
    saved = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    assert saved, out_text
    # the saved step matches a step training actually reached
    with open(metrics) as f:
        logged = [json.loads(ln)["step"] for ln in f]
    assert max(int(s) for s in saved) <= max(logged) + 1


@pytest.mark.slow
def test_nan_guard_preserves_last_good_checkpoint(tmp_path):
    """Divergence guard (--nan_guard, default on): when the step metrics go
    non-finite, the trainer must NOT overwrite its checkpoint rotation with
    the diverged state — it keeps the last good save and exits 3. Driven
    end-to-end via --fault_inject_nan_at (metrics poisoned from step 5; the
    epoch-1 save at step 3 is the last good checkpoint). The reference has
    no failure detection at all (SURVEY.md section 5.3)."""
    out = str(tmp_path)
    proc = subprocess.Popen(
        [sys.executable, "-c", _CPU_SHIM,
         "--model", "ours_d", "--dataset", "synthetic",
         "--total_epoch", "10", "--steps_per_epoch", "3",
         "--batch_size", "2", "--img_size", "64", "--ch", "4", "--no_vgg",
         "--log_every", "1", "--save_every_epochs", "1",
         "--fault_inject_nan_at", "5",
         "--out_path", out],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    out_text, _ = proc.communicate(timeout=900)
    assert proc.returncode == 3, out_text
    assert "non-finite metrics at step 5" in out_text, out_text

    ckpt_dir = os.path.join(out, "synthetic", "64", "ours_d", "ckpt")
    saved = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    # the epoch-1 save (step 3) survives; nothing at or after the fault step
    assert saved == [3], out_text


@pytest.mark.slow
def test_nan_guard_pre_save_check_catches_log_window(tmp_path):
    """ADVICE r4: a divergence between two --log_every polls must not reach
    an epoch-boundary save. Here --log_every 100 never fires within the run,
    so only the pre-save check stands between the NaN state (poisoned from
    step 5) and the epoch-2 checkpoint at step 6: the epoch-1 save (step 3)
    must survive alone and the trainer exit 3."""
    out = str(tmp_path)
    proc = subprocess.Popen(
        [sys.executable, "-c", _CPU_SHIM,
         "--model", "ours_d", "--dataset", "synthetic",
         "--total_epoch", "2", "--steps_per_epoch", "3",
         "--batch_size", "2", "--img_size", "64", "--ch", "4", "--no_vgg",
         "--log_every", "100", "--save_every_epochs", "1",
         "--fault_inject_nan_at", "5",
         "--out_path", out],
        cwd=REPO, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    out_text, _ = proc.communicate(timeout=900)
    assert proc.returncode == 3, out_text
    assert "pre-save check" in out_text, out_text

    ckpt_dir = os.path.join(out, "synthetic", "64", "ours_d", "ckpt")
    saved = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert saved == [3], out_text
