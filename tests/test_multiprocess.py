"""Multi-host (2-process) data-sharding test (VERDICT r3 #6).

Launches tests/helpers/two_process_train.py twice with
jax.distributed.initialize over localhost: 2 processes × 4 virtual CPU
devices = an 8-device global mesh. Each process loads only its row-slice
of every global batch (pipeline.BatchIterator process sharding) and the
trainer assembles global arrays via jax.make_array_from_process_local_data.
Both processes must agree on every epoch metric (grads/metrics are psum'd
across the full mesh).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

HELPER = Path(__file__).parent / 'helpers' / 'two_process_train.py'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_training_shards_data_per_host():
    port = _free_port()
    env = dict(os.environ)
    env.pop('JAX_PLATFORMS', None)
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_NUM_CPU_DEVICES', None)  # helper sets device count itself
    env['PYTHONPATH'] = str(HELPER.parent.parent.parent)

    procs = [subprocess.Popen(
        [sys.executable, str(HELPER), str(port), str(pid)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        cwd=str(HELPER.parent.parent.parent), env=env)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f'process failed:\n{err[-3000:]}'
        line = [ln for ln in out.splitlines() if ln.startswith('{')][-1]
        outs.append(json.loads(line))

    a, b = sorted(outs, key=lambda d: d['process'])
    # identical global computation on both processes
    assert a['train_samples'] == b['train_samples'] == 8
    assert np.isfinite(a['train_loss'])
    assert abs(a['train_loss'] - b['train_loss']) < 1e-6
    assert abs(a['val_loss'] - b['val_loss']) < 1e-6
    assert abs(a['val_miou'] - b['val_miou']) < 1e-6
