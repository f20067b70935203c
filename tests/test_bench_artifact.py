"""The benchmark must emit a parseable JSON artifact even when the TPU
backend is down or dies mid-run (round-3 verdict item 2: BENCH_r03.json
ended rc=1/parsed:null after a 900s pool outage).

These tests drive ``bench.main()`` with the measurement layer stubbed to
fail in the ways a tunnel outage actually fails — init deadline expiry,
mid-run hang, partial completion — and assert the printed line is valid
JSON carrying the last-good numbers flagged ``"stale": true``.
"""

import importlib.util
import json
import sys
import time
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]


@pytest.fixture()
def bench(tmp_path, monkeypatch):
    """A fresh bench module instance whose last-good cache lives in a
    tempdir (so tests never clobber the committed seed)."""
    spec = importlib.util.spec_from_file_location(
        'bench_under_test', REPO / 'bench.py')
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.LASTGOOD = tmp_path / 'lastgood.json'
    # keep the reference-baseline lookup out of these tests entirely
    monkeypatch.setattr(mod, 'reference_baseline',
                        lambda: {'ref_e2e_images_per_sec': 0.05})
    return mod


def _run_main(bench, capsys):
    with pytest.raises(SystemExit) as exc:
        bench.main()
    assert exc.value.code == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(line)


def test_outage_at_init_emits_stale_lastgood(bench, capsys, monkeypatch):
    bench.LASTGOOD.write_text(json.dumps(
        {'metric': 'ensemble_4weather_eval_throughput', 'value': 168.4,
         'train_value': 20.1}))

    def boom(mode):
        raise RuntimeError('TPU backend init did not complete within 900s')

    monkeypatch.setattr(bench, 'measure_tpu_eval', boom)
    out = _run_main(bench, capsys)
    assert out['stale'] is True
    assert out['value'] == 168.4          # last-good survives the outage
    assert out['train_value'] == 20.1
    assert '900s' in out['error']


def test_midrun_abort_keeps_fresh_partials(bench, capsys, monkeypatch):
    bench.LASTGOOD.write_text(json.dumps(
        {'metric': 'ensemble_4weather_eval_throughput', 'value': 100.0,
         'fused_value': 150.0}))
    calls = []

    def eval_then_die(mode):
        calls.append(mode)
        if mode == 'faithful':
            return 200.0, 0.25, 32       # fresh faithful number lands
        raise RuntimeError('Socket closed')  # tunnel dies before fused

    monkeypatch.setattr(bench, 'measure_tpu_eval', eval_then_die)
    monkeypatch.setattr(bench, '_measure_with_retry', lambda fn, **kw: fn())
    out = _run_main(bench, capsys)
    assert out['stale'] is True
    assert out['value'] == 200.0          # fresh partial overrides cache
    assert out['mfu'] == 0.25
    assert out['fused_value'] == 150.0    # unreached metric stays cached
    assert 'value' in out['stale_note'] and 'fused' not in sorted(
        k for k in ('value', 'mfu') if k in out['stale_note'])


def test_no_lastgood_still_parseable(bench, capsys, monkeypatch):
    def boom(mode):
        raise RuntimeError('UNAVAILABLE: tunnel down')

    monkeypatch.setattr(bench, 'measure_tpu_eval', boom)
    monkeypatch.setattr(bench, '_measure_with_retry', lambda fn, **kw: fn())
    out = _run_main(bench, capsys)
    assert out['stale'] is True
    assert out['value'] is None
    assert out['metric'] == 'ensemble_4weather_eval_throughput'


def test_deadline_abandons_hung_measurement(bench):
    def hang():
        time.sleep(60)

    with pytest.raises(RuntimeError, match='did not complete within'):
        bench._run_with_deadline(hang, 'hung-probe', timeout_s=1)
    assert bench._ABANDONED and bench._ABANDONED[-1].is_alive()
    bench._ABANDONED.clear()


def test_success_writes_lastgood(bench, capsys, monkeypatch):
    monkeypatch.setattr(bench, 'measure_tpu_eval',
                        lambda mode: (300.0, 0.3, 32) if mode == 'faithful'
                        else (400.0, 0.4, 64))
    monkeypatch.setattr(bench, 'measure_tpu_train', lambda: (50.0, 0.12))
    monkeypatch.setattr(bench, 'measure_disk_eval', lambda raw: 250.0)
    monkeypatch.setattr(bench, 'measure_disk_train', lambda: 45.0)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out['stale'] is False
    assert out['value'] == 300.0 and out['train_value'] == 50.0
    assert out['disk_train_value'] == 45.0
    cached = json.loads(bench.LASTGOOD.read_text())
    assert cached['value'] == 300.0      # next outage will serve these


def test_partial_success_backfills_lastgood_not_clobbers(bench, capsys,
                                                         monkeypatch):
    """Train/disk failures are swallowed inside _gather; the success path
    must inherit the cached values for those fields (flagged in
    carried_note) rather than overwrite real last-good numbers with
    nulls."""
    bench.LASTGOOD.write_text(json.dumps(
        {'metric': 'ensemble_4weather_eval_throughput', 'value': 111.0,
         'train_value': 20.1, 'train_mfu': 0.11, 'disk_raw_value': 150.0,
         'stale': False}))
    # main()'s train fallback sets AWSEG_DISABLE_TRAIN_HEADS=1; pin the
    # var so teardown restores it (empty parses as unset) instead of
    # leaking the disable into later tests in this process
    monkeypatch.setenv('AWSEG_DISABLE_TRAIN_HEADS', '')
    monkeypatch.setattr(bench, 'measure_tpu_eval',
                        lambda mode: (300.0, 0.3, 32) if mode == 'faithful'
                        else (400.0, 0.4, 64))

    def boom():
        raise RuntimeError('deterministic train failure')

    monkeypatch.setattr(bench, 'measure_tpu_train', boom)
    monkeypatch.setattr(bench, 'measure_disk_eval', boom)
    monkeypatch.setattr(bench, 'measure_disk_train', boom)
    bench.main()
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out['stale'] is False and out['value'] == 300.0
    assert out['train_value'] == 20.1        # carried, not nulled
    assert out['disk_raw_value'] == 150.0
    assert 'train_value' in out['carried_note']
    cached = json.loads(bench.LASTGOOD.read_text())
    assert cached['train_value'] == 20.1 and cached['value'] == 300.0


def test_hung_measurement_fast_fails_the_rest(bench):
    """After one wall-deadline expiry the backend is wedged: later
    measurements must fail immediately instead of burning a full deadline
    each (the orchestrator's step budget assumes this)."""
    def hang():
        time.sleep(60)

    with pytest.raises(RuntimeError, match='did not complete within'):
        bench._run_with_deadline(hang, 'first-hang', timeout_s=1)
    t0 = time.time()
    with pytest.raises(RuntimeError, match='skipped: backend already'):
        bench._run_with_deadline(lambda: 1, 'second', timeout_s=30)
    assert time.time() - t0 < 5
    bench._ABANDONED.clear()


def test_committed_lastgood_seed_is_valid():
    seed = json.loads((REPO / '.bench_lastgood.json').read_text())
    assert seed['metric'] == 'ensemble_4weather_eval_throughput'
    assert seed['value'] and seed['vs_baseline'] > 1


# --- round-5 hardening (VERDICT r4 item 3) ---------------------------------

# the BENCH_r04 failure shape: a deterministic compile-time HBM OOM dressed
# by the tunnel as a transient-looking INTERNAL / HTTP 500 status
_OOM_MSG = ('INTERNAL: XLA:TPU compile permanent error. Ran out of memory '
            'in memory space hbm. Used 18.01G of 15.75G hbm. '
            '(via HTTP 500)' + 'X' * 15000)


def test_oom_classified_permanent_no_retry(bench, monkeypatch):
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    calls = []

    def oom():
        calls.append(1)
        raise RuntimeError(_OOM_MSG)

    with pytest.raises(RuntimeError):
        bench._measure_with_retry(oom)
    assert len(calls) == 1               # no retry burned on a permanent OOM


def test_transient_still_retries(bench, monkeypatch):
    monkeypatch.setattr(bench.time, 'sleep', lambda s: None)
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) == 1:
            raise RuntimeError('UNAVAILABLE: tunnel hiccup')
        return 7

    assert bench._measure_with_retry(flaky) == 7
    assert len(calls) == 2


def test_stale_error_is_truncated(bench, capsys, monkeypatch):
    """A 15KB XLA allocation dump in the error must not push the JSON
    line's head past the driver's 2000-char tail (BENCH_r04 parsed:null)."""
    def boom(mode):
        raise RuntimeError(_OOM_MSG)

    monkeypatch.setattr(bench, 'measure_tpu_eval', boom)
    monkeypatch.setattr(bench, '_measure_with_retry', lambda fn, **kw: fn())
    out = _run_main(bench, capsys)
    assert out['stale'] is True
    assert len(out['error']) < 500
    assert len(json.dumps(out)) < 2000   # whole artifact fits the tail


class _FakeCompiled:
    def __init__(self, need):
        self._need = need

    def memory_analysis(self):
        class MA:
            temp_size_in_bytes = self._need
            argument_size_in_bytes = 0
            output_size_in_bytes = 0
            alias_size_in_bytes = 0
        return MA()


def test_fit_batch_backs_off_on_memory_analysis(bench):
    """AOT pre-flight: B32 program over the limit steps down to B16."""
    need = {32: 18.01e9, 16: 9.2e9, 8: 5.0e9}
    compiled_batches = []

    def compile_at(b):
        compiled_batches.append(b)
        return _FakeCompiled(need[b])

    batch, compiled, hbm = bench._fit_batch([32, 16, 8], compile_at,
                                            limit=15.2e9)
    assert batch == 16 and hbm == 9.2e9
    assert compiled_batches == [32, 16]


def test_fit_batch_steps_down_on_compile_oom(bench):
    def compile_at(b):
        if b == 32:
            raise RuntimeError(_OOM_MSG)
        return _FakeCompiled(5.0e9)

    batch, _, _ = bench._fit_batch([32, 16], compile_at, limit=15.2e9)
    assert batch == 16


def test_fit_batch_raises_when_nothing_fits(bench):
    with pytest.raises(RuntimeError, match='pre-flight'):
        bench._fit_batch([8], lambda b: _FakeCompiled(20e9), limit=15.2e9)
