#!/usr/bin/env python
"""Fetch + convert pretrained encoder weights into ``$AWSEG_WEIGHTS_DIR``.

The reference actually ACQUIRES weights at runtime (HF hub download,
reference model.py:91-110; smp ``encoder_weights='imagenet'``,
model.py:259-268). This repo's runtime stays network-free — models resolve
weights from the local cache only (``awsegbench/models/pretrained.py``) and
degrade gracefully to random init — so acquisition is this one explicit,
checksummed, resumable script instead:

    python scripts/fetch_weights.py                  # both encoders
    python scripts/fetch_weights.py segformer_b0     # one encoder
    python scripts/fetch_weights.py resnet50 --from-file /path/resnet50.pth

Weights land as ``<AWSEG_WEIGHTS_DIR>/{segformer_b0,resnet50}.npz`` (plain
numpy — loading them later needs neither torch nor transformers), after
which ``model.pretrained: true`` initializes from them (parity asserted by
``tests/test_pretrained.py``). Without network access, ``--from-file``
converts a pre-downloaded state dict; with nothing available the script
exits nonzero and the framework keeps its warn-and-random-init fallback.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys
import tempfile
import urllib.request
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from awsegbench.models.pretrained import resolve_weights_dir  # noqa: E402

# torchvision publishes the first 8 sha256 hex chars in the filename; we
# verify the full prefix after download.
_RESNET50_URL = 'https://download.pytorch.org/models/resnet50-0676ba61.pth'
_RESNET50_SHA8 = '0676ba61'
_SEGFORMER_HF_ID = 'nvidia/mit-b0'


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, 'rb') as f:
        for blk in iter(lambda: f.read(1 << 20), b''):
            h.update(blk)
    return h.hexdigest()


def _save_npz(sd: dict, out: Path) -> None:
    import numpy as np
    arrays = {}
    for k, v in sd.items():
        v = v.detach().cpu().numpy() if hasattr(v, 'detach') else np.asarray(v)
        if v.dtype == object:
            raise ValueError(f'non-tensor entry {k!r}')
        arrays[k] = v
    out.parent.mkdir(parents=True, exist_ok=True)
    tmp = out.with_suffix('.tmp.npz')
    np.savez(tmp, **arrays)
    tmp.replace(out)
    print(f'wrote {out} ({len(arrays)} tensors, '
          f'{out.stat().st_size / 1e6:.1f} MB)')


def _load_any(path: Path) -> dict:
    """State dict from .pt/.pth/.bin (torch), .safetensors, or .npz."""
    import numpy as np
    suffix = path.suffix.lower()
    if suffix == '.npz':
        with np.load(path) as z:
            return {k: z[k] for k in z.files}
    if suffix == '.safetensors':
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    obj = torch.load(path, map_location='cpu', weights_only=True)
    return obj.get('state_dict', obj) if isinstance(obj, dict) else obj


def fetch_segformer_b0(out: Path, from_file: Path | None) -> None:
    if from_file is not None:
        _save_npz(_load_any(from_file), out)
        return
    # the HF model card ships a SegformerModel (encoder-only) checkpoint;
    # transformers handles the hub download + cache
    from transformers import SegformerModel
    model = SegformerModel.from_pretrained(_SEGFORMER_HF_ID)
    _save_npz(model.state_dict(), out)


def fetch_resnet50(out: Path, from_file: Path | None) -> None:
    if from_file is not None:
        _save_npz(_load_any(from_file), out)
        return
    with tempfile.NamedTemporaryFile(suffix='.pth', delete=False) as tmp:
        tmp_path = Path(tmp.name)
    try:
        print(f'downloading {_RESNET50_URL} ...')
        urllib.request.urlretrieve(_RESNET50_URL, tmp_path)
        digest = _sha256(tmp_path)
        if not digest.startswith(_RESNET50_SHA8):
            raise RuntimeError(
                f'resnet50 checksum mismatch: sha256 {digest[:8]} != '
                f'{_RESNET50_SHA8} (truncated/corrupted download)')
        _save_npz(_load_any(tmp_path), out)
    finally:
        tmp_path.unlink(missing_ok=True)


_FETCHERS = {'segformer_b0': fetch_segformer_b0, 'resnet50': fetch_resnet50}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('stems', nargs='*', choices=[[], *_FETCHERS],
                    default=list(_FETCHERS),
                    help='which encoders to fetch (default: both)')
    ap.add_argument('--from-file', type=Path, default=None,
                    help='convert a pre-downloaded state dict instead of '
                         'hitting the network (single stem only)')
    ap.add_argument('--weights-dir', type=Path, default=None,
                    help='override $AWSEG_WEIGHTS_DIR')
    ap.add_argument('--force', action='store_true',
                    help='refetch even if the .npz already exists')
    args = ap.parse_args()

    stems = args.stems or list(_FETCHERS)
    if args.from_file is not None and len(stems) != 1:
        ap.error('--from-file needs exactly one stem')
    wdir = args.weights_dir or resolve_weights_dir()
    if args.weights_dir is not None:
        os.environ['AWSEG_WEIGHTS_DIR'] = str(args.weights_dir)

    failures = 0
    for stem in stems:
        out = Path(wdir) / f'{stem}.npz'
        if out.is_file() and not args.force:
            print(f'{out} already cached (use --force to refetch)')
            continue
        try:
            _FETCHERS[stem](out, args.from_file)
        except Exception as e:  # noqa: BLE001 — report and keep going
            failures += 1
            print(f'FAILED {stem}: {type(e).__name__}: {e}\n'
                  f'  (no network? download manually and rerun with '
                  f'--from-file; the framework falls back to random init '
                  f'meanwhile)', file=sys.stderr)
    return 1 if failures else 0


if __name__ == '__main__':
    sys.exit(main())
