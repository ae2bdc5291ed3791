"""Pallas EM kernel vs the f32-ified host recurrence (interpret mode on
CPU; the real-TPU run happens in bench/entry paths)."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from strawberry_tpu.quant.pallas_em import em_bucket_pallas
from strawberry_tpu.quant.device import _em_bucket
import jax.numpy as jnp


def test_pallas_em_interpret_close_to_f64():
    rng = np.random.default_rng(4)
    B, R, C = 16, 32, 8
    F = rng.random((B, R, C))
    F[rng.random((B, R, C)) < 0.5] = 0
    u = rng.integers(0, 200, (B, R)).astype(np.float64)
    t0 = np.full((B, C), 50.0)
    valid = (F > 1e-5).any(axis=2)
    active = np.ones(B, bool)
    active[-2:] = False
    th32 = np.asarray(em_bucket_pallas(F, u, t0, valid, active,
                                       interpret=True))
    th64 = np.asarray(_em_bucket(jnp.asarray(F), jnp.asarray(u),
                                 jnp.asarray(t0), jnp.asarray(valid),
                                 jnp.asarray(active))[0])
    rel = np.abs(th32 - th64) / np.maximum(1.0, np.abs(th64))
    # f32 vs f64 convergence-boundary wobble allowed; bulk must agree
    assert np.median(rel) < 1e-4
    assert (rel < 0.1).mean() > 0.95
    # inactive rows return theta0
    np.testing.assert_allclose(th32[-2:], t0[-2:].astype(np.float32))
