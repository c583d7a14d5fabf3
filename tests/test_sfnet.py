"""SFconv frequency-fusion gate tests (reference SFNet_modulator.py:4-40)."""

import jax
import numpy as np

from frequency_wised_all_in_one_image_restoration_model_tpu.models.sfnet import SFconv


def test_sfconv_shapes_and_gate(rng):
    m = SFconv(features=8)
    low = jax.numpy.asarray(rng.uniform(0, 1, (2, 8, 8, 8)).astype(np.float32))
    high = jax.numpy.asarray(rng.uniform(0, 1, (2, 8, 8, 8)).astype(np.float32))
    variables = m.init(jax.random.PRNGKey(0), low, high)
    out = m.apply(variables, low, high)
    assert out.shape == (2, 8, 8, 8)
    assert np.isfinite(np.asarray(out)).all()
    # gate responds to inputs: swapping low/high changes the output
    out2 = m.apply(variables, high, low)
    assert not np.allclose(np.asarray(out), np.asarray(out2))
