"""Smoke the 7 experiment launcher scripts (ref exps/…/BEVFusion/*.py):
each must parse --help through the shared CLI without touching data/devices.
Covers the L7 CLI wiring the reference exercises via `python <exp>.py`."""
import pathlib
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # heavy e2e: excluded from the default fast suite

EXPS = sorted(
    p
    for p in (
        pathlib.Path(__file__).resolve().parents[1]
        / "unidistill_tpu" / "exps" / "nuscenes"
    ).glob("BEVFusion_*.py")
)


def test_all_seven_launchers_exist():
    assert len(EXPS) == 7, [p.name for p in EXPS]


@pytest.mark.parametrize("script", EXPS, ids=lambda p: p.stem)
def test_launcher_help(script):
    r = subprocess.run(
        [sys.executable, str(script), "--help"],
        capture_output=True, text=True, timeout=180,
        cwd=str(script.parents[3]),
    )
    assert r.returncode == 0, r.stderr[-800:]
    out = r.stdout
    # the reference CLI surface (base_cli.py:12-59)
    for flag in ("-b", "-e", "-p", "--ckpt_path", "--max_epochs", "--exp_options"):
        assert flag in out, f"{script.name} missing {flag}\n{out}"
    if "distill" in script.name:
        assert "--teacher_ckpt" in out
