"""Lint the shipped shell recipes against the real CLI flag surfaces.

The reference ships its known-good configs as shell scripts
(/root/reference/training_scripts/*.sh) with nothing guarding them —
a renamed trainer flag silently rots every recipe. Here each
recipes/*.sh is parsed (env-var defaults + the `python -m
lora_tpu.cli.X` continuation block) and every `--flag=value` is
validated against the CLI shim's explicit parameters plus its config
dataclass, with the value coerced through the same `_fire._coerce`
path the CLI uses, and the dataclass actually constructed from the
coerced kwargs. Pure host-side: no pipeline or device work.
"""

from __future__ import annotations

import dataclasses
import inspect
import re
import shlex
from pathlib import Path

import pytest

from lora_tpu.cli._fire import _coerce

REPO = Path(__file__).resolve().parent.parent
RECIPES = sorted((REPO / "recipes").glob("*.sh"))

# cli module name -> (shim train fn import, config dataclass import)
_CLI_BINDINGS = {
    "lora_tpu.cli.lora_db": ("lora_tpu.cli.lora_db",
                             "lora_tpu.training.dreambooth.DreamBoothConfig"),
    "lora_tpu.cli.lora_pti": ("lora_tpu.cli.lora_pti",
                              "lora_tpu.training.pti.PTIConfig"),
    "lora_tpu.cli.lora_ti": ("lora_tpu.cli.lora_ti",
                             "lora_tpu.training.ti_legacy.LegacyTiConfig"),
}


def _import_attr(dotted: str):
    mod, _, attr = dotted.rpartition(".")
    import importlib

    return getattr(importlib.import_module(mod), attr)


def _parse_recipe(path: Path):
    """Return (cli_module, argv) with env-var defaults substituted."""
    env = {}
    lines = path.read_text().splitlines()
    for ln in lines:
        m = re.match(r'\s*export\s+(\w+)=(.*)', ln)
        if not m:
            continue
        name, rhs = m.group(1), m.group(2).strip()
        dm = re.match(r'\$\{' + name + r':-(.*)\}$', rhs)
        if dm:
            rhs = dm.group(1)
        env[name] = rhs.strip('"').strip("'")

    # join the backslash-continued python command into one logical line
    cmd = None
    i = 0
    while i < len(lines):
        ln = lines[i]
        if re.match(r'\s*python\s+-m\s+lora_tpu\.cli\.', ln):
            buf = ln.rstrip()
            while buf.endswith("\\") and i + 1 < len(lines):
                i += 1
                buf = buf[:-1].rstrip() + " " + lines[i].strip()
            cmd = buf
            break
        i += 1
    assert cmd is not None, f"{path.name}: no `python -m lora_tpu.cli.*` line"

    def sub(tok: str) -> str:
        tok = re.sub(r'\$\{(\w+)\}', lambda m: env.get(m.group(1), ""), tok)
        return re.sub(r'\$(\w+)', lambda m: env.get(m.group(1), ""), tok)

    toks = [sub(t) for t in shlex.split(cmd)]
    assert toks[:2] == ["python", "-m"], f"{path.name}: unexpected launcher"
    return toks[2], toks[3:]


def _flags_from_argv(argv):
    """Yield (key, raw_value) for --key=value and --key value forms."""
    i = 0
    while i < len(argv):
        a = argv[i]
        assert a.startswith("--"), f"positional arg {a!r} in a recipe"
        if "=" in a:
            key, raw = a[2:].split("=", 1)
            i += 1
        else:
            key = a[2:]
            if i + 1 < len(argv) and not argv[i + 1].startswith("--"):
                raw = argv[i + 1]
                i += 2
            else:
                raw = "true"
                i += 1
        yield key.replace("-", "_"), raw


@pytest.mark.parametrize("recipe", RECIPES, ids=lambda p: p.name)
def test_recipe_flags_parse_against_cli(recipe):
    cli_mod, argv = _parse_recipe(recipe)
    assert cli_mod in _CLI_BINDINGS, (
        f"{recipe.name}: unknown CLI module {cli_mod}")
    shim_mod, dc_path = _CLI_BINDINGS[cli_mod]
    train = _import_attr(shim_mod + ".train")
    dc_type = _import_attr(dc_path)

    shim_params = {
        k for k, p in inspect.signature(train).parameters.items()
        if p.kind not in (inspect.Parameter.VAR_KEYWORD,
                          inspect.Parameter.VAR_POSITIONAL)
    }
    fields = {f.name: f for f in dataclasses.fields(dc_type)}

    dc_kwargs = {}
    seen = set()
    for key, raw in _flags_from_argv(argv):
        assert key not in seen, f"{recipe.name}: duplicate flag --{key}"
        seen.add(key)
        if key in shim_params:
            continue
        assert key in fields, (
            f"{recipe.name}: --{key} is neither a {cli_mod}.train parameter "
            f"nor a {dc_type.__name__} field")
        f = fields[key]
        dc_kwargs[key] = _coerce(raw, f.type, f.default)

    # constructing proves the coerced kwargs satisfy the config dataclass
    cfg = dc_type(**dc_kwargs)
    for key, val in dc_kwargs.items():
        assert getattr(cfg, key) == val


def test_every_reference_recipe_has_a_counterpart():
    """The six reference recipes (SURVEY.md §2.1 'Shell recipes') must all
    exist under recipes/ by the same name."""
    ref_names = {
        "run_lora_db_unet_only.sh", "run_lora_db_w_text.sh", "run_lorpt.sh",
        "multivector_example.sh", "use_face_conditioning_example.sh",
        "inpainting_example.sh",
    }
    have = {p.name for p in RECIPES}
    assert ref_names <= have, f"missing recipes: {sorted(ref_names - have)}"
