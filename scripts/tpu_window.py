#!/usr/bin/env python
"""TPU-window orchestrator: run every queued on-chip validation in one go.

The tunneled TPU pool on this host comes and goes; this script makes a
window productive unattended. It (optionally) waits for the backend to
come up, then runs each queued step sequentially in its own subprocess
with a hard timeout, logging to ``.tpu_window/<step>.log`` and summarizing
rc/duration/tail to ``.tpu_window/window_summary.json``. A step failure
(or the pool dying mid-window) never blocks later steps.

Steps (VERDICT r3 items in parens):
  kernel_checks  — scripts/tpu_kernel_checks.py: Mosaic lowering + parity +
                   PRNG determinism of the fused train-head kernels at the
                   production shape (item 1)
  bench          — python bench.py: the full driver artifact with
                   value/mfu/fused/train/disk fields (items 1, 3)
  auroc          — scripts/auroc_scale_check.py: exact vs histogram AUROC
                   at ~1e8 pixels on chip (item 8)
  profile_eval   — scripts/profile_eval.py: component breakdown feeding the
                   MFU work (item 3)
  soak           — scripts/train_soak.py: multi-epoch disk-to-metrics CLI
                   train + mid-run resume + evaluate (item 7)

Usage: python scripts/tpu_window.py [--steps a,b,...] [--wait SECS]
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / '.tpu_window'

STEPS = [
    # (name, argv, timeout_s). Budgets must exceed the child's own
    # internal degradation deadlines (bench: compile+sweeps plus one
    # 1800s measurement deadline before it fast-fails the rest and emits
    # the stale artifact; soak: three CLI runs at --step-timeout 2400s) —
    # a SIGKILL here forfeits the child's own partial-result artifact.
    ('kernel_checks', ['scripts/tpu_kernel_checks.py'], 1200),
    ('bench', ['bench.py'], 4500),
    ('auroc', ['scripts/auroc_scale_check.py'], 1500),
    ('profile_eval', ['scripts/profile_eval.py'], 1200),
    ('profile_deeplab', ['scripts/profile_deeplab.py'], 1200),
    ('profile_segformer', ['scripts/profile_segformer.py'], 1200),
    ('soak', ['scripts/train_soak.py'], 8400),
]


def backend_up(probe_timeout: float = 120.0) -> bool:
    """True if the TPU backend answers within the deadline (subprocess —
    a downed tunnel blocks backend init indefinitely in-process)."""
    code = ("import jax; d = jax.devices(); "
            "assert d[0].platform != 'cpu', d; print(d[0])")
    try:
        proc = subprocess.run([sys.executable, '-c', code],
                              capture_output=True, timeout=probe_timeout)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument('--steps', default=','.join(n for n, _, _ in STEPS))
    ap.add_argument('--wait', type=float, default=0.0,
                    help='max seconds to wait for the backend to come up')
    ap.add_argument('--force', action='store_true',
                    help='run the steps even if the backend never came up')
    args = ap.parse_args()
    want = [s.strip() for s in args.steps.split(',') if s.strip()]
    unknown = set(want) - {n for n, _, _ in STEPS}
    if unknown:
        sys.exit(f'unknown steps: {sorted(unknown)}')

    OUT.mkdir(exist_ok=True)
    t_start = time.time()
    deadline = t_start + args.wait
    up = backend_up()
    while not up and time.time() < deadline:
        print(f'backend down; retrying ({deadline - time.time():.0f}s left)',
              flush=True)
        time.sleep(60)
        up = backend_up()
    print(f'backend up: {up}', flush=True)
    if not up and not args.force:
        # Don't burn hours of per-step timeouts against a dead tunnel —
        # exit loudly so a supervisor can relaunch with a fresh wait.
        OUT.mkdir(exist_ok=True)
        json.dump({'started': time.strftime('%Y-%m-%dT%H:%M:%S'),
                   'backend_up_at_start': False, 'steps': {},
                   'aborted': 'backend never came up within --wait'},
                  open(OUT / 'window_summary.json', 'w'), indent=2)
        sys.exit(2)

    summary = {'started': time.strftime('%Y-%m-%dT%H:%M:%S'),
               'backend_up_at_start': up, 'steps': {}}
    for name, argv, timeout in STEPS:
        if name not in want:
            continue
        log_path = OUT / f'{name}.log'
        print(f'== {name}: {" ".join(argv)} (timeout {timeout}s)', flush=True)
        t0 = time.time()
        with open(log_path, 'w') as log:
            # own session ⇒ a timeout kill reaps the whole process GROUP:
            # soak/bench spawn grandchildren (train CLI subprocesses) that
            # a plain proc.kill() would orphan, leaving them holding the
            # chip for the rest of the window
            proc = subprocess.Popen([sys.executable, *argv], stdout=log,
                                    stderr=subprocess.STDOUT,
                                    cwd=str(REPO), start_new_session=True)
            try:
                rc = proc.wait(timeout=timeout)
            except subprocess.TimeoutExpired:
                rc = 'timeout'
                import os
                import signal
                try:
                    os.killpg(proc.pid, signal.SIGKILL)
                except ProcessLookupError:
                    pass
                proc.wait()
        dur = time.time() - t0
        tail = ''
        if log_path.exists():
            lines = log_path.read_text(errors='replace').splitlines()
            tail = '\n'.join(lines[-15:])
        summary['steps'][name] = {'rc': rc, 'seconds': round(dur, 1),
                                  'log': str(log_path), 'tail': tail}
        print(f'   rc={rc} in {dur:.0f}s', flush=True)
        # keep the summary fresh after every step — a mid-window pool death
        # still leaves a complete record of what ran
        json.dump(summary, open(OUT / 'window_summary.json', 'w'), indent=2)

    ok = [n for n, s in summary['steps'].items() if s['rc'] == 0]
    bad = [n for n, s in summary['steps'].items() if s['rc'] != 0]
    print(f'window done in {time.time() - t_start:.0f}s; '
          f'ok={ok} failed={bad}')


if __name__ == '__main__':
    main()
