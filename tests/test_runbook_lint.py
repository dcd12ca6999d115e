"""Lint docs/realdata.md against the actual CLI surface (VERDICT r4 #8).

The runbook is the load-bearing path to the one remaining unverifiable
BASELINE.md claim (absolute FID needs real data + egress). Until someone can
execute it, this keeps it from drifting: every ``python -m layout2img_tpu...``
command inside a fenced block must reference only flags that still exist in
that module's argparse surface, model presets that still exist, and script
paths that still exist.
"""

import os
import re

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RUNBOOK = os.path.join(REPO, "docs", "realdata.md")


def _fenced_commands():
    """Yield (module, tokens) for each `python -m <mod> ...` command in the
    runbook's fenced code blocks, with backslash continuations joined."""
    text = open(RUNBOOK).read()
    blocks = re.findall(r"```(?:bash|sh)?\n(.*?)```", text, re.S)
    cmds = []
    for block in blocks:
        joined = block.replace("\\\n", " ")
        for line in joined.splitlines():
            line = line.split("#")[0].strip()
            m = re.match(r"python -m (layout2img_tpu\.[\w.]+)\s+(.*)", line)
            if m:
                cmds.append((m.group(1), m.group(2).split()))
    return cmds, blocks


def test_runbook_has_commands():
    cmds, _ = _fenced_commands()
    mods = {m for m, _ in cmds}
    # the end-to-end loop: preprocess -> train -> sample -> eval -> export
    for expected in ("layout2img_tpu.cli.preprocess_vg", "layout2img_tpu.cli.train",
                     "layout2img_tpu.cli.sample", "layout2img_tpu.cli.evaluate",
                     "layout2img_tpu.cli.export_torch"):
        assert expected in mods, f"runbook lost its {expected} step"


def test_runbook_flags_exist():
    import importlib

    cmds, _ = _fenced_commands()
    assert cmds
    for mod_name, tokens in cmds:
        mod = importlib.import_module(mod_name)
        src = open(mod.__file__).read()
        for tok in tokens:
            if not tok.startswith("--"):
                continue
            flag = tok.split("=")[0]
            assert (f'"{flag}"' in src or f"'{flag}'" in src), (
                f"runbook uses {flag} but {mod_name} no longer defines it")


def test_runbook_model_presets_exist():
    from layout2img_tpu.cli.presets import EXPERIMENTS

    cmds, _ = _fenced_commands()
    for mod_name, tokens in cmds:
        for i, tok in enumerate(tokens):
            if tok == "--model":
                assert tokens[i + 1] in EXPERIMENTS, (
                    f"runbook references unknown preset {tokens[i + 1]}")


def test_runbook_scripts_exist():
    _, blocks = _fenced_commands()
    for block in blocks:
        for m in re.finditer(r"(?:bash|python) (scripts/[\w./]+)", block):
            assert os.path.exists(os.path.join(REPO, m.group(1))), m.group(1)


def test_runbook_prose_flags_exist_somewhere():
    """Flags recommended in prose (budget advice, remat, multi-host, eval
    modes) must still exist on SOME CLI/script argparse surface."""
    import glob

    sources = "".join(
        open(p).read()
        for p in glob.glob(os.path.join(REPO, "layout2img_tpu", "cli", "*.py"))
        + glob.glob(os.path.join(REPO, "scripts", "*.py")))
    text = open(RUNBOOK).read()
    # prose mentions like `--g_obj_budget 12` or `--resume`
    for flag in set(re.findall(r"`(--[a-z_0-9]+)", text)):
        assert (f'"{flag}"' in sources or f"'{flag}'" in sources), (
            f"runbook prose uses {flag} but no CLI/script defines it")
