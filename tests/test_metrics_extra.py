"""Round-3 ops review regression tests (ssim bounds, dec1 contract)."""

import numpy as np
import pytest


def test_ssim_rejects_window_exceeding_extent():
    """H or W in [win_size-1, ...): the VALID window map would be empty and
    jnp.mean would return a silent NaN that poisons averaged metrics."""
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.ops.metrics import ssim

    ok = ssim(jnp.zeros((7, 7)), jnp.zeros((7, 7)))  # exactly win_size: fine
    assert np.isfinite(float(ok))
    with pytest.raises(ValueError, match="win_size"):
        ssim(jnp.zeros((6, 6)), jnp.zeros((6, 6)))
    with pytest.raises(ValueError, match="win_size"):
        ssim(jnp.zeros((32, 6)), jnp.zeros((32, 6)))


def test_fused_dec1_rejects_grouped_gn():
    """C != num_groups must raise (a stripped assert under python -O would
    silently compute per-channel statistics instead of grouped ones)."""
    import jax.numpy as jnp

    from image_enhancement_deglaring_tpu.ops.pallas_dec1 import (
        fused_dec1_output,
    )

    c = 8
    args = dict(
        wa=jnp.zeros((3, 3, c, c)), wb=jnp.zeros((3, 3, c, c)),
        w2=jnp.zeros((3, 3, c, c)),
        g1_scale=jnp.ones(c), g1_bias=jnp.zeros(c),
        g2_scale=jnp.ones(c), g2_bias=jnp.zeros(c),
        w_out=jnp.zeros((1, 1, c, 1)), b_out=jnp.zeros(1),
    )
    with pytest.raises(ValueError, match="num_groups"):
        fused_dec1_output(jnp.zeros((1, c, 16, 16)),
                          jnp.zeros((1, c, 16, 16)), num_groups=4, **args)
