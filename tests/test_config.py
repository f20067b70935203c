"""Config system tests — contract parity with reference utils/config.py."""


import pytest
import yaml

from awsegbench.utils.config import (Config, create_default_config,
                                     load_config, save_config,
                                     validate_config)


class TestConfig:
    def test_get_set_dot_notation(self):
        c = Config({'a': {'b': {'c': 1}}})
        assert c.get('a.b.c') == 1
        assert c.get('a.b.missing', 'dflt') == 'dflt'
        c.set('a.b.d', 2)
        assert c.get('a.b.d') == 2
        c.set('x.y', 3)
        assert c.get('x.y') == 3

    def test_bracket_and_contains(self):
        c = Config({'m': {'n': 5}})
        assert c['m.n'] == 5
        assert 'm.n' in c
        assert 'm.q' not in c
        c['m.q'] = 7
        assert c['m.q'] == 7

    def test_deep_merge_update(self):
        c = Config({'a': {'x': 1, 'y': 2}, 'b': 3})
        c.update({'a': {'y': 20, 'z': 30}})
        assert c.get('a.x') == 1
        assert c.get('a.y') == 20
        assert c.get('a.z') == 30
        assert c.get('b') == 3

    def test_update_with_config(self):
        c = Config({'a': 1})
        c.update(Config({'b': 2}))
        assert c.get('b') == 2


class TestYamlRoundTrip:
    def test_save_load(self, tmp_path):
        c = Config({'model': {'num_classes': 7}, 'seed': 9})
        path = tmp_path / 'cfg.yaml'
        save_config(c, path)
        loaded = load_config(path)
        assert loaded.get('model.num_classes') == 7
        assert loaded.get('seed') == 9

    def test_missing_file_raises(self):
        with pytest.raises(FileNotFoundError):
            load_config('/nonexistent/config.yaml')


class TestEnvOverrides:
    def test_env_override_types(self, tmp_path, monkeypatch):
        path = tmp_path / 'cfg.yaml'
        with open(path, 'w') as f:
            yaml.safe_dump({'training': {'batch_size': 2, 'epochs': 5},
                            'mlflow': {'enabled': True}}, f)
        monkeypatch.setenv('CONFIG_TRAINING__BATCH_SIZE', '16')
        monkeypatch.setenv('CONFIG_TRAINING__LR', '0.01')
        monkeypatch.setenv('CONFIG_MLFLOW__ENABLED', 'false')
        monkeypatch.setenv('CONFIG_MODEL__NAME', 'segformer')
        loaded = load_config(path)
        assert loaded.get('training.batch_size') == 16        # int
        assert loaded.get('training.lr') == 0.01              # float
        assert loaded.get('mlflow.enabled') is False           # bool
        assert loaded.get('model.name') == 'segformer'         # str


class TestDefaultsAndValidation:
    def test_default_config_complete(self):
        c = create_default_config()
        validate_config(c)  # should not raise
        assert c.get('model.num_classes') == 19
        assert c.get('data.image_size') == [512, 1024]
        assert c.get('training.batch_size') == 2
        assert c.get('loss.type') == 'fog_density_aware'
        assert c.get('tpu.precision') == 'bf16'

    @pytest.mark.parametrize('key,bad', [
        ('model.num_classes', 0),
        ('training.batch_size', -1),
        ('training.epochs', 0),
        ('optimizer.learning_rate', 0),
    ])
    def test_validation_rejects(self, key, bad):
        c = create_default_config()
        c.set(key, bad)
        with pytest.raises(ValueError):
            validate_config(c)

    def test_validation_image_size(self):
        c = create_default_config()
        c.set('data.image_size', 512)
        with pytest.raises(ValueError):
            validate_config(c)


class TestCompilationCacheGate:
    """AWSEG_DISABLE_COMPILE_CACHE must follow the repo-wide env-flag
    convention: '', '0', 'false' mean unset (core/cache.py hermetic mode
    for driver dry runs)."""

    @pytest.mark.parametrize('val,disabled', [
        ('1', True), ('true', True), ('0', False), ('false', False),
        ('', False),
    ])
    def test_disable_flag_parsing(self, monkeypatch, val, disabled):
        import jax

        from awsegbench.core import cache

        monkeypatch.setenv('AWSEG_DISABLE_COMPILE_CACHE', val)
        seen = []
        monkeypatch.setattr(
            jax.config, 'update',
            lambda name, v: seen.append((name, v)))
        cache.setup_compilation_cache('/tmp/cache_gate_test')
        touched = any(n == 'jax_compilation_cache_dir' for n, _ in seen)
        assert touched == (not disabled)
