"""Shell entry-point contract lint: every .sh at the repo root and under
scripts/ must invoke an existing CLI module with flags its argparse accepts
(catches script <-> CLI drift; the scripts define the public contracts
BASELINE.json pins, SURVEY 2.4)."""

import glob
import os
import re
import shlex

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(
    glob.glob(os.path.join(REPO, "*.sh"))
    + glob.glob(os.path.join(REPO, "scripts", "*.sh"))
)

# model names referenced by scripts must exist in the registry; checked
# separately below so a parse failure points at the right problem
_ENVSUB = [
    # ${VAR:-default} -> default, or a dummy path when the default is empty
    (re.compile(r"\$\{[A-Za-z_][A-Za-z_0-9]*:-([^}]*)\}"),
     lambda m: m.group(1) or "/tmp/dummy"),
    (re.compile(r"\$\{[A-Za-z_][A-Za-z_0-9]*:\?[^}]*\}"), "/tmp/dummy"),
    (re.compile(r"\$\{[A-Za-z_][A-Za-z_0-9]*\}"), "/tmp/dummy"),
    (re.compile(r'"\$@"'), ""),
    (re.compile(r"\$[A-Za-z_][A-Za-z_0-9]*"), "/tmp/dummy"),
]


def _extract(path):
    """Return (module, argv) for the `python -m module args...` command, or
    (None, script_path_tokens) for a `python some/script.py args...` form."""
    text = open(path).read()
    text = text.replace("\\\n", " ")
    cmd = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("python "):
            cmd = line
            break
    assert cmd, f"no `python` invocation found in {path}"
    for pat, rep in _ENVSUB:
        cmd = pat.sub(rep, cmd)
    toks = shlex.split(cmd)
    if "-m" in toks:
        mi = toks.index("-m")
        return toks[mi + 1], [t for t in toks[mi + 2:] if t]
    return None, [t for t in toks[1:] if t]


@pytest.mark.parametrize("path", SCRIPTS, ids=[os.path.basename(s)
                                               for s in SCRIPTS])
def test_script_flags_parse(path):
    from xtagclip_tpu.train.params import parse_args

    module, argv = _extract(path)
    if module is None:
        # `python some/script.py ...` form: the referenced file must exist
        assert os.path.exists(os.path.join(REPO, argv[0])), argv[0]
        return
    if module in ("xtagclip_tpu.cli.main_other",
                  "xtagclip_tpu.cli.main_other_simple"):
        args = parse_args(argv, include_xtag=True)
    elif module == "xtagclip_tpu.cli.main":
        args = parse_args(argv, include_xtag=False)
    else:
        pytest.fail(f"{path} invokes unknown module {module}")
    assert args.model, path


@pytest.mark.parametrize("path", SCRIPTS, ids=[os.path.basename(s)
                                               for s in SCRIPTS])
def test_script_model_exists(path):
    from xtagclip_tpu.factory import list_models
    from xtagclip_tpu.train.params import parse_args

    module, argv = _extract(path)
    if module is None:
        pytest.skip("not a CLI-module script")
    args = parse_args(argv, include_xtag="main_other" in module)
    if args.model.startswith("hf-hub:"):
        return
    assert args.model in list_models(), (
        f"{os.path.basename(path)} pins unknown model {args.model!r}")
