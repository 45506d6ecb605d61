"""Automated run supervision: launch a trainer, watch progress + RSS, restart
with --resume on wedge/leak/crash (VERDICT r4 item 7).

The 24k-step round-4 run needed two MANUAL rescues: a host memory leak (the
axon PJRT plugin retains every host->device transfer payload — see
scripts/repro_transfer_leak.py) took the process to 117 GB RSS, and a tunnel
session wedge froze one process mid-step (CPU active, no progress). Both have
the same remedy — kill + relaunch with --resume (checkpoint-resume is exact,
tests/test_resume.py) — so this wrapper automates it:

  * STALL:  newest `step` in metrics.jsonl stops advancing for --stall-sec
  * LEAK:   trainer RSS exceeds --rss-limit-gb
  * CRASH:  trainer exits nonzero

Any trigger -> SIGTERM (then SIGKILL) the trainer's process group, relaunch
the same command with --resume appended. Exit 0 from the trainer ends
supervision. Never kills by name/pattern — only the exact child pgid.

Usage:
  python scripts/supervise.py --watch FILE.jsonl [--stall-sec 900]
      [--rss-limit-gb 100] [--max-restarts 20] -- CMD ...
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time


def newest_step(metrics_path: str) -> int:
    """Last `step` value in a metrics.jsonl, -1 if unreadable/empty."""
    try:
        with open(metrics_path, "rb") as f:
            f.seek(0, os.SEEK_END)
            size = f.tell()
            f.seek(max(0, size - 8192))
            lines = f.read().decode(errors="replace").strip().splitlines()
        for line in reversed(lines):
            try:
                return int(json.loads(line).get("step", -1))
            except (json.JSONDecodeError, TypeError, ValueError):
                continue
    except OSError:
        pass
    return -1


def rss_gb(pid: int) -> float:
    """RSS of pid + all its descendants (the trainer may fork workers)."""
    total_kb = 0
    pids = [pid]
    try:
        children = subprocess.run(
            ["ps", "-o", "pid=", "--ppid", str(pid)],
            capture_output=True, text=True, timeout=10).stdout.split()
        pids += [int(c) for c in children]
    except (subprocess.SubprocessError, ValueError):
        pass
    for p in pids:
        try:
            with open(f"/proc/{p}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        total_kb += int(line.split()[1])
                        break
        except OSError:
            continue
    return total_kb / 1e6


def terminate_group(proc: subprocess.Popen, log) -> None:
    """SIGTERM the child's process group, escalate to SIGKILL after 60 s."""
    try:
        pgid = os.getpgid(proc.pid)
    except ProcessLookupError:
        return
    log(f"terminating pgid {pgid}")
    try:
        os.killpg(pgid, signal.SIGTERM)
    except ProcessLookupError:
        return
    deadline = time.time() + 60
    while time.time() < deadline:
        if proc.poll() is not None:
            return
        time.sleep(2)
    log("SIGTERM timed out; sending SIGKILL")
    try:
        os.killpg(pgid, signal.SIGKILL)
    except ProcessLookupError:
        pass
    proc.wait(timeout=30)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--watch", required=True,
                    help="metrics.jsonl whose `step` field must keep advancing")
    ap.add_argument("--stall-sec", type=float, default=900)
    ap.add_argument("--rss-limit-gb", type=float, default=100)
    ap.add_argument("--poll-sec", type=float, default=30)
    ap.add_argument("--max-restarts", type=int, default=20)
    ap.add_argument("--log", default=None, help="supervisor log file")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- trainer command (first arg may be the -- itself)")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    if not cmd:
        ap.error("no trainer command given after --")

    logf = open(args.log, "a", buffering=1) if args.log else None

    def log(msg: str) -> None:
        line = f"[supervise {time.strftime('%H:%M:%S')}] {msg}"
        print(line, flush=True)
        if logf:
            logf.write(line + "\n")

    restarts = 0
    while True:
        run_cmd = list(cmd)
        if restarts > 0 and "--resume" not in run_cmd:
            run_cmd.append("--resume")
        log(f"launching (attempt {restarts + 1}): {' '.join(run_cmd)}")
        proc = subprocess.Popen(run_cmd, start_new_session=True)
        last_step = newest_step(args.watch)
        last_advance = time.time()
        reason = None
        while True:
            time.sleep(args.poll_sec)
            rc = proc.poll()
            if rc is not None:
                if rc == 0:
                    log("trainer exited cleanly — done")
                    return 0
                reason = f"crash (exit {rc})"
                break
            step = newest_step(args.watch)
            if step > last_step:
                last_step, last_advance = step, time.time()
            stalled_for = time.time() - last_advance
            mem = rss_gb(proc.pid)
            if stalled_for > args.stall_sec:
                reason = f"stall (step {last_step} for {stalled_for:.0f}s)"
                break
            if mem > args.rss_limit_gb:
                reason = f"rss {mem:.1f} GB > limit {args.rss_limit_gb}"
                break
        log(f"restart trigger: {reason} @ step {last_step}")
        if proc.poll() is None:
            terminate_group(proc, log)
        restarts += 1
        if restarts > args.max_restarts:
            log("max restarts exceeded — giving up")
            return 1
        time.sleep(10)  # let the chip/tunnel settle before relaunch


if __name__ == "__main__":
    sys.exit(main())
