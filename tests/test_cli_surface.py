"""Every CLI entry point imports and parses --help (fast tier).

The scripts are not imported by any other test, so a syntax error or a
broken argparse surface in scripts/ would otherwise ship unseen. One
in-process loop (a subprocess per script would pay a ~30 s jax import
each on the 1-core host). Scripts WITHOUT an argparse surface (the
bench/microbench/decompose tools run their workload unconditionally)
are byte-compiled only — running them with --help would launch a real
TPU benchmark.
"""

import glob
import os
import py_compile
import runpy
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ALL_SCRIPTS = sorted(
    os.path.basename(p) for p in glob.glob(os.path.join(REPO, "scripts", "*.py"))
)


def _has_argparse(script):
    src = open(os.path.join(REPO, "scripts", script)).read()
    return "argparse" in src or "MonodepthOptions" in src


HELP_SCRIPTS = [s for s in ALL_SCRIPTS if _has_argparse(s)]
COMPILE_ONLY = [s for s in ALL_SCRIPTS if not _has_argparse(s)]


def test_expected_surfaces_present():
    # the reference's user-facing entry points must be help-parseable
    for s in ("train_gru.py", "train_fusion.py", "train_fusion_v3.py",
              "train_dpt.py", "evaluate_depth.py", "evaluate_pose.py",
              "evaluate_depth_gru_fusion.py", "test_simple.py",
              "export_gt_depth.py"):
        assert s in HELP_SCRIPTS, s


@pytest.mark.parametrize("script", HELP_SCRIPTS)
def test_script_help(script, monkeypatch, capsys):
    path = os.path.join(REPO, "scripts", script)
    monkeypatch.setattr(sys, "argv", [path, "--help"])
    monkeypatch.syspath_prepend(os.path.join(REPO, "scripts"))
    monkeypatch.syspath_prepend(REPO)
    with pytest.raises(SystemExit) as e:
        runpy.run_path(path, run_name="__main__")
    assert e.value.code in (0, None), f"{script} --help exited {e.value.code}"
    out = capsys.readouterr().out
    assert "usage" in out.lower(), script


@pytest.mark.parametrize("script", COMPILE_ONLY)
def test_script_compiles(script):
    py_compile.compile(os.path.join(REPO, "scripts", script), doraise=True)


def test_bench_and_entry_compile():
    for f in ("bench.py", "__graft_entry__.py"):
        py_compile.compile(os.path.join(REPO, f), doraise=True)
