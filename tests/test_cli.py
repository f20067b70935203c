"""End-to-end CLI tests: train → checkpoint → evaluate, on synthetic data.

Covers the reference's full user journey (scripts/train.py + evaluate.py)
with a tiny config. Marked slow (compile-heavy on CPU).
"""

import json

import pytest
import yaml


def _write_tiny_config(path, tmp_path):
    cfg = {
        'model': {'type': 'segformer', 'num_classes': 5,
                  'include_depth': True},
        'data': {'dataset_type': 'synthetic',
                 'data_root': str(tmp_path / 'no_data'),
                 'image_size': [32, 64],
                 'weather_conditions': ['clean', 'fog', 'rain'],
                 'apply_augmentation': True, 'include_depth': True},
        'training': {'batch_size': 4, 'epochs': 1, 'num_workers': 0,
                     'grad_clip': 1.0},
        'optimizer': {'type': 'adamw', 'learning_rate': 0.001,
                      'weight_decay': 0.01},
        'scheduler': {'enabled': False},
        'loss': {'type': 'cross_entropy'},
        'early_stopping': {'patience': 5, 'min_delta': 0.001},
        'mlflow': {'enabled': False},
        'evaluation': {'num_bins': 5},
        'logging': {'level': 'WARNING'},
        'paths': {'checkpoints': 'ckpt', 'logs': 'logs',
                  'results': 'results'},
        'device': 'cpu',
        'seed': 42,
        'tpu': {'precision': 'fp32'},
    }
    with open(path, 'w') as f:
        yaml.safe_dump(cfg, f)


@pytest.mark.slow
def test_train_then_evaluate_cli(tmp_path, monkeypatch):
    """train CLI writes checkpoints + results; evaluate CLI consumes them."""
    import awsegbench.cli.train as train_cli
    import awsegbench.cli.evaluate as eval_cli

    # shrink the synthetic dataset so the run is fast
    from awsegbench.data.dataset import CityscapesKITTIDataset
    orig = CityscapesKITTIDataset._generate_synthetic_samples

    def tiny(self):
        samples = orig(self)
        return samples[:8]

    monkeypatch.setattr(CityscapesKITTIDataset,
                        '_generate_synthetic_samples', tiny)

    cfg_path = tmp_path / 'cfg.yaml'
    _write_tiny_config(cfg_path, tmp_path)
    out_dir = tmp_path / 'run'

    train_cli.main(['--config', str(cfg_path),
                    '--output-dir', str(out_dir)])

    ckpt = out_dir / 'ckpt' / 'latest'
    assert ckpt.exists()
    results_file = out_dir / 'results' / 'training_results.json'
    assert results_file.exists()
    tr = json.loads(results_file.read_text())
    assert tr['total_epochs'] == 1

    eval_out = tmp_path / 'eval_out'
    eval_cli.main([str(ckpt), '--config', str(cfg_path),
                   '--output-dir', str(eval_out)])
    assert (eval_out / 'evaluation_results.json').exists()
    assert (eval_out / 'evaluation_report.md').exists()
    res = json.loads((eval_out / 'evaluation_results.json').read_text())
    assert 'overall_miou' in res
