"""Validate the vectorized large-scale oracle against the loopy
bit-parity oracle (reference_vec vs reference_impl): same shader
semantics, only FP summation order differs."""

import numpy as np
import pytest

import reference_impl as ref
import reference_vec as vec
from test_color import make_scene


@pytest.mark.parametrize("algorithm", ["point", "sphere", "ray", "beam"])
def test_vec_oracle_matches_loopy(algorithm):
    g, params, config = make_scene()
    events, count = ref.generate_lights(
        g, params, 1, num_photons=16, max_events_per_photon=8
    )
    assert count > 0
    want = ref.render_gather(g, params, events, count, algorithm,
                             config.width, config.height)
    got = vec.render_gather(g, params, events, count, algorithm,
                            config.width, config.height)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-6)
