#!/usr/bin/env python
"""Export a trained checkpoint as a self-contained AOT serving artifact.

    python scripts/export_serving.py <checkpoint> --config cfg.yaml \
        --out serving/ [--batch-size 1] [--platforms tpu,cpu] [--no-depth]

Produces ``<out>/model.stablehlo`` (StableHLO, weights inlined) +
``<out>/meta.json``. Load with ``awsegbench.serving.ServingModel.load`` —
only jax is needed at serving time. See awsegbench/serving.py.
"""

import argparse
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('checkpoint', help='checkpoint dir (latest/best/epoch_N)')
    ap.add_argument('--config', default=None)
    ap.add_argument('--out', default='serving_artifact')
    ap.add_argument('--batch-size', default='1',
                    help="int, or 'poly' for a batch-polymorphic artifact")
    ap.add_argument('--height', type=int, default=None,
                    help='input height (default: config data.image_size)')
    ap.add_argument('--width', type=int, default=None)
    ap.add_argument('--platforms', default=None,
                    help="comma list, e.g. 'tpu,cpu' (default: current "
                         'backend only)')
    ap.add_argument('--precision', default=None,
                    help='override tpu.precision (bf16|fp32)')
    ap.add_argument('--no-depth', action='store_true')
    ap.add_argument('--device', default='auto',
                    help="'cpu' forces the CPU backend for the export host "
                         '(lowering for --platforms tpu still works)')
    args = ap.parse_args()

    if args.device == 'cpu':
        # must precede any backend init (env vars are overridden by
        # device plugins; the config update is not)
        import jax
        jax.config.update('jax_platforms', 'cpu')

    from awsegbench.cli.evaluate import load_model
    from awsegbench.serving import export_serving, save_serving_artifact
    from awsegbench.utils.config import (create_default_config, load_config,
                                         setup_logging)

    config = (load_config(args.config) if args.config
              else create_default_config())
    setup_logging(config)

    model, variables = load_model(args.checkpoint, config)
    h, w = config.get('data.image_size', [512, 1024])
    h = args.height or h
    w = args.width or w
    precision = args.precision or config.get('tpu.precision', 'bf16')
    platforms = ([p.strip() for p in args.platforms.split(',') if p.strip()]
                 if args.platforms else None)
    include_depth = (not args.no_depth
                     and config.get('model.include_depth', True))

    batch = (args.batch_size if args.batch_size == 'poly'
             else int(args.batch_size))
    blob = export_serving(model, variables, (h, w),
                          batch_size=batch, precision=precision,
                          include_depth=include_depth, platforms=platforms)
    meta = {
        'input_shape': [batch, h, w, 3],
        'input_dtype': 'uint8',
        'num_classes': config.get('model.num_classes', 19),
        'precision': precision,
        'include_depth': include_depth,
        'platforms': platforms or ['<export-host default>'],
        'model_type': config.get('model.type',
                                 config.get('model.model_type', 'ensemble')),
        'segformer_variant': config.get('model.segformer_variant', 'b0'),
        'checkpoint': str(args.checkpoint),
    }
    out = save_serving_artifact(args.out, blob, meta)
    print(f'serving artifact: {out} ({len(blob) / 1e6:.1f} MB)')
    return 0


if __name__ == '__main__':
    sys.exit(main())
