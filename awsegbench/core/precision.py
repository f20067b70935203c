"""Mixed-precision policy.

The reference trains fp32 throughout (trainer.py:280-375, no autocast). On
TPU the MXU natively consumes bfloat16, so the default policy here is
bf16 compute / fp32 params / fp32 loss+metric accumulation. ``fp32`` policy
reproduces reference numerics for parity testing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype
    compute_dtype: jnp.dtype
    output_dtype: jnp.dtype

    def cast_to_compute(self, tree):
        import jax
        return jax.tree_util.tree_map(
            lambda x: x.astype(self.compute_dtype)
            if hasattr(x, 'dtype') and jnp.issubdtype(x.dtype, jnp.floating) else x,
            tree,
        )


def get_policy(name: str = 'bf16') -> Policy:
    if name in ('bf16', 'bfloat16', 'mixed'):
        return Policy(jnp.float32, jnp.bfloat16, jnp.float32)
    if name in ('fp32', 'float32', 'full'):
        return Policy(jnp.float32, jnp.float32, jnp.float32)
    raise ValueError(f"Unknown precision policy: {name}")
