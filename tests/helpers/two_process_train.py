"""Subprocess helper for the 2-process multi-host data-sharding test.

Launched twice (process_id 0 and 1) by tests/test_multiprocess.py. Each
process gets 4 virtual CPU devices (8 global), initializes
jax.distributed over localhost, builds a process-sharded loader and runs
one train + validate epoch on the global 8-device mesh. Prints one JSON
line with the epoch metrics for the parent test to compare.
"""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import jax

PORT = sys.argv[1]
PID = int(sys.argv[2])

jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_num_cpu_devices', 4)
jax.distributed.initialize(coordinator_address=f'localhost:{PORT}',
                           num_processes=2, process_id=PID)

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

from awsegbench.data import CityscapesKITTIDataset  # noqa: E402
from awsegbench.data.pipeline import create_dataloader  # noqa: E402
from awsegbench.models import SegFormerModel  # noqa: E402
from awsegbench.train import AdverseWeatherTrainer  # noqa: E402

train_ds = CityscapesKITTIDataset('/nonexistent-mp-test', 'train',
                                  image_size=(32, 48), seed=0)
train_ds.samples = train_ds.samples[:8]
val_ds = CityscapesKITTIDataset('/nonexistent-mp-test', 'val',
                                image_size=(32, 48), seed=1)
val_ds.samples = val_ds.samples[:4]

train_loader = create_dataloader(train_ds, batch_size=4, shuffle=True,
                                 num_workers=1)
val_loader = create_dataloader(val_ds, batch_size=4, shuffle=False,
                               num_workers=1)
assert train_loader.process_count == 2  # auto-detected

cfg = {
    'epochs': 1, 'batch_size': 4, 'num_classes': 5, 'seed': 0,
    'model': {'num_classes': 5, 'include_depth': True,
              'pretrained': False},
    'optimizer': {'type': 'adamw', 'learning_rate': 1e-3},
    'scheduler': {'type': 'none'},
    'loss': {'type': 'fog_density_aware'},
    'mlflow': {'enabled': False},
    'tpu': {'precision': 'fp32', 'mesh_shape': 'auto'},
}
model = SegFormerModel(num_classes=5, include_depth=True,
                       hidden_sizes=(8, 16, 20, 32), depths=(1, 1, 1, 1))
tr = AdverseWeatherTrainer(model, train_loader, val_loader, cfg,
                           checkpoint_dir=f'/tmp/mp_test_ckpt_{PID}',
                           log_dir=f'/tmp/mp_test_log_{PID}')

tm = tr.train_epoch()
vm = tr.validate_epoch()
print(json.dumps({
    'process': PID,
    'train_loss': tm['train_loss'],
    'train_samples': tm['train_samples'],
    'val_loss': vm['val_loss'],
    'val_miou': vm['val_miou'],
}), flush=True)
