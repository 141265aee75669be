# coding: utf-8
"""Failure-detecting runner for TPU jobs behind the axon relay.

The relay serializes device access across processes and can wedge a job
on its first device op (every thread in futex_wait, ~0 CPU, no output —
see CLAUDE.md).  A wedged job never recovers; the only cure is: kill by
exact PID, wait out the relay's lease (minutes), probe with a fresh tiny
process, and relaunch.  This runner automates that loop so multi-hour
regime runs (enron/facebook/math windows) survive relay flaps unattended:

  python scripts/watchdog_run.py --log /tmp/x.log --stall 900 \
      --retries 3 -- python -u -m ctgcn_tpu.main --config=... --task=...

Stall detection is OUTPUT-based (log file growth), not CPU-based: a
remote XLA compile legitimately produces no output and burns no local
CPU for minutes, so the stall limit must exceed the largest expected
compile+first-epoch-chunk gap.  Each retry kills the whole process group,
waits ``--cooldown`` seconds, then probes the relay with a tiny matmul
until it answers before relaunching.
"""
import argparse
import os
import signal
import subprocess
import sys
import time


def wait_healthy(cooldown):
    """Wait out the relay lease, WITHOUT probing.

    Measured (r4): after ANY client disconnect — clean exit or kill — the
    relay holds the dead client's lease for ~10-13 minutes, and the next
    process to connect within that window wedges PERMANENTLY on its first
    device op.  A "health probe" therefore poisons the very job it was
    protecting: probe succeeds, exits, holds the lease, real job wedges
    (observed three consecutive times; a staged probe wedged on a tiny
    matmul 20 s after a successful probe).  The only safe recovery is to
    wait past the lease window and let the REAL job be the next client."""
    time.sleep(cooldown)
    return True


def run_once(cmd, log_path, stall_limit, total_limit):
    """Run cmd (own process group), kill on output stall. Returns
    ('ok', rc) | ('stalled', None) | ('timeout', None)."""
    with open(log_path, "ab") as log:
        log.write(f"\n=== watchdog launch {time.ctime()} ===\n".encode())
        log.flush()
        proc = subprocess.Popen(cmd, stdout=log, stderr=log,
                                start_new_session=True)
    t0 = time.time()
    last_size = os.path.getsize(log_path)
    last_growth = t0
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                return "ok", rc
            now = time.time()
            size = os.path.getsize(log_path)
            if size != last_size:
                last_size = size
                last_growth = now
            if now - last_growth > stall_limit:
                print(f"[watchdog] no output for {stall_limit}s — killing "
                      f"pgid {proc.pid}", flush=True)
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                return "stalled", None
            if now - t0 > total_limit:
                print(f"[watchdog] total limit {total_limit}s — killing",
                      flush=True)
                os.killpg(proc.pid, signal.SIGKILL)
                proc.wait()
                return "timeout", None
            time.sleep(15)
    finally:
        if proc.poll() is None:
            os.killpg(proc.pid, signal.SIGKILL)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--log", required=True)
    ap.add_argument("--stall", type=int, default=900,
                    help="seconds without log growth before declaring a "
                         "wedge (must exceed the largest legit compile gap)")
    ap.add_argument("--total", type=int, default=4 * 3600)
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--cooldown", type=int, default=900,
                    help="post-kill relay lease wait (the lease outlives "
                         "its client by ~10-13 min; see wait_healthy)")
    ap.add_argument("--retry-on-fail", type=int, default=0,
                    help="also retry (after the lease cooldown) when the "
                         "command EXITS nonzero, up to this many times — "
                         "for transient remote-worker crashes ('TPU worker "
                         "process crashed or restarted', observed mid-run "
                         "at enron scale).  Deterministic failures burn "
                         "retries, so keep it small.")
    ap.add_argument("cmd", nargs=argparse.REMAINDER)
    args = ap.parse_args()
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    assert cmd, "no command given"

    # Independent budgets: stalls/timeouts draw on --retries, nonzero
    # exits draw on --retry-on-fail.  A fail-retry therefore never eats a
    # stall-retry (and vice versa), and when the fail budget runs out the
    # watchdog exits with the command's real rc, not 2.
    stall_left = args.retries
    fail_left = args.retry_on_fail
    launched = False
    while True:
        if launched:
            print(f"[watchdog] waiting {args.cooldown}s for the relay "
                  f"lease to clear before relaunching", flush=True)
            wait_healthy(args.cooldown)
        launched = True
        status, rc = run_once(cmd, args.log, args.stall, args.total)
        if status == "ok":
            if rc == 0 or fail_left <= 0:
                print(f"[watchdog] command exited rc={rc}", flush=True)
                sys.exit(rc)
            fail_left -= 1
            print(f"[watchdog] command exited rc={rc} — retrying "
                  f"({fail_left} fail-retries left)", flush=True)
        else:
            if stall_left <= 0:
                print(f"[watchdog] {status}; stall-retry budget exhausted",
                      flush=True)
                sys.exit(2)
            stall_left -= 1
            print(f"[watchdog] {status} — retrying "
                  f"({stall_left} stall-retries left)", flush=True)


if __name__ == "__main__":
    main()
