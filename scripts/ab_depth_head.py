#!/usr/bin/env python
"""A/B the depth head on the real chip: XLA upconv path vs the Pallas
fused kernel (roll-based conv2), at the production shape [8,16,32]->[8,512,1024].

Timing per verify-skill methodology: K reps inside lax.scan in ONE jit,
(t is amortized by construction), scalar fetch as the barrier.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
jax.config.update('jax_compilation_cache_dir', '/root/.jax_compile_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 5.0)
import jax.numpy as jnp
import numpy as np

from awsegbench.models.heads import DepthEstimationHead

B, hc, wc, C = 8, 16, 32, 256
SCALE = 32
K = 8


def bench(apply_fn, variables, x, label):
    def body(c, _):
        out = apply_fn(variables, c, train=False, upsample_scale=SCALE)
        # feed a scalar of the output back into the carry so nothing DCEs
        return c + out.mean().astype(c.dtype) * 1e-12, ()

    @jax.jit
    def run(x):
        y, _ = jax.lax.scan(body, x, None, length=K)
        return y.mean()

    run(x).block_until_ready()
    float(run(x))  # warm
    t0 = time.perf_counter()
    v = float(run(x))
    dt = (time.perf_counter() - t0) / K * 1000
    print(f'{label}: {dt:.2f} ms/B{B} (scan-amortized, {v:.4f})')
    return dt


def main():
    head = DepthEstimationHead(hidden_channels=C)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (B, hc, wc, C)),
                    jnp.bfloat16)
    variables = head.init(jax.random.PRNGKey(0), x, train=False,
                          upsample_scale=SCALE)

    import os
    os.environ.pop('AWSEG_PALLAS_DEPTH_HEAD', None)
    xla = bench(head.apply, variables, x, 'depth head XLA upconv')
    os.environ['AWSEG_PALLAS_DEPTH_HEAD'] = '1'
    pal = bench(head.apply, variables, x, 'depth head Pallas fused')

    # parity at production shape on the real chip
    os.environ.pop('AWSEG_PALLAS_DEPTH_HEAD', None)
    y0 = head.apply(variables, x, train=False, upsample_scale=SCALE)
    os.environ['AWSEG_PALLAS_DEPTH_HEAD'] = '1'
    y1 = head.apply(variables, x, train=False, upsample_scale=SCALE)
    err = float(jnp.max(jnp.abs(y0.astype(jnp.float32)
                                - y1.astype(jnp.float32))))
    print(f'max |XLA - Pallas| on-chip: {err:.3e}')
    print(f'winner: {"pallas" if pal < xla else "xla"} '
          f'({xla:.2f} vs {pal:.2f} ms)')


if __name__ == '__main__':
    main()
