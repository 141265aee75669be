# coding: utf-8
"""scripts/watchdog_run.py — output-stall failure detection (the relay
wedge recovery loop; see CLAUDE.md on the lease semantics)."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from scripts.watchdog_run import run_once  # noqa: E402


def test_completed_command_reports_ok(tmp_path):
    log = tmp_path / "ok.log"
    status, rc = run_once([sys.executable, "-c", "print('hi')"],
                          str(log), stall_limit=30, total_limit=60)
    assert status == "ok" and rc == 0
    assert b"hi" in log.read_bytes()


def test_failing_command_propagates_rc(tmp_path):
    log = tmp_path / "fail.log"
    status, rc = run_once([sys.executable, "-c", "raise SystemExit(7)"],
                          str(log), stall_limit=30, total_limit=60)
    assert status == "ok" and rc == 7


def test_silent_hang_is_killed_as_stall(tmp_path):
    log = tmp_path / "hang.log"
    t0 = time.time()
    status, rc = run_once(
        [sys.executable, "-c",
         "print('start', flush=True); import time; time.sleep(600)"],
        str(log), stall_limit=20, total_limit=300)
    assert status == "stalled" and rc is None
    assert time.time() - t0 < 120  # killed well before the sleep ends


def test_chatty_command_is_not_stalled(tmp_path):
    log = tmp_path / "chat.log"
    code = ("import time\n"
            "for i in range(4):\n"
            "    print(i, flush=True)\n"
            "    time.sleep(6)\n")
    status, rc = run_once([sys.executable, "-c", code], str(log),
                          stall_limit=18, total_limit=120)
    assert status == "ok" and rc == 0
