"""Tests for the autoreload supervisor (cli/auto_reload.py).

Reference behavior anchor: cli/auto_reload.py:11-90 (restart sim.run on
script edit). These tests drive the rebuilt ScriptSupervisor directly.
"""
import os
import textwrap
import time
from pathlib import Path

import pytest

from lambdapic_tpu.cli.auto_reload import (ScriptSupervisor, changed_paths,
                                           take_snapshot)


def _touch_edit(p: Path, body: str):
    """Rewrite + force a new mtime (coarse-mtime filesystems)."""
    p.write_text(body)
    st = p.stat()
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns + 2_000_000))


SCRIPT = textwrap.dedent("""
    from lambdapic_tpu import Simulation

    sim = Simulation(nx=16, ny=16, dx=1e-6, dy=1e-6,
                     npatch_x=1, npatch_y=1, nsteps=2, random_seed=7)
    callbacks = []
""")


def test_snapshot_diff(tmp_path):
    a = tmp_path / "a.py"
    b = tmp_path / "b.py"
    a.write_text("x = 1\n")
    b.write_text("y = 2\n")
    before = take_snapshot([a, b])
    assert changed_paths(before, take_snapshot([a, b])) == []
    _touch_edit(a, "x = 3\n")
    assert changed_paths(before, take_snapshot([a, b])) == [a]
    # deletion counts as a change too
    b.unlink()
    assert b in changed_paths(before, take_snapshot([a, b]))


def test_stop_hook_fires_on_edit(tmp_path):
    script = tmp_path / "job_stophook.py"
    script.write_text(SCRIPT)
    sup = ScriptSupervisor(script)
    assert sup._load()
    assert sup.stop_requested() is False
    _touch_edit(script, SCRIPT + "\n# edited\n")
    assert sup.stop_requested() is True


def test_missing_script_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ScriptSupervisor(tmp_path / "nope.py")


def test_run_forever_exit_on_finish(tmp_path):
    script = tmp_path / "job_finish.py"
    script.write_text(SCRIPT)
    sup = ScriptSupervisor(script, exit_on_finish=True)
    t0 = time.time()
    assert sup.run_forever() == 0
    assert time.time() - t0 < 300
    # the sim actually ran to completion
    sim = sup._find_sim()
    assert sim.itime == 2


def test_exit_on_error(tmp_path):
    script = tmp_path / "job_broken.py"
    script.write_text("raise RuntimeError('boom')\n")
    sup = ScriptSupervisor(script, exit_on_error=True)
    assert sup.run_forever() == 1


def test_sibling_imports_are_watched(tmp_path):
    helper = tmp_path / "helper_mod.py"
    helper.write_text("VALUE = 1\n")
    script = tmp_path / "job_sibling.py"
    script.write_text("import helper_mod\n" + SCRIPT)
    sup = ScriptSupervisor(script)
    assert sup._load()
    assert helper in sup._watch_set()
    assert sup.stop_requested() is False
    _touch_edit(helper, "VALUE = 2\n")
    assert sup.stop_requested() is True
