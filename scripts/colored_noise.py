"""NumPy ground truth for the colored-noise sampler — parity with the
reference ``scripts/colored_noise.py`` (an older felixpatzelt/colorednoise
snapshot). NOTE: like the reference's script AND its CUDA kernel
(configureFrequencyNoise, colored_noise.cu:12-37), this omits the newer
felixpatzelt sqrt(2) magnitude correction on the DC/Nyquist real components
— the reference is the parity target, so the omission is reproduced
deliberately (it under-disperses ~5-7% at high beta / short horizons
relative to the updated upstream algorithm). The statistical tests validate
``mppi_generic_tpu.sampling.colored`` against this implementation.
"""

import numpy as np


def powerlaw_psd_gaussian(exponent, size, fmin=0.0, rng=None):
    """Gaussian (1/f)**beta noise. ``size``: (..., samples) — the last axis
    is time. Matches the reference script's normalization (sigma = sqrt of
    the summed spectral weights)."""
    rng = np.random.default_rng(rng)
    size = list(np.atleast_1d(size))
    samples = size[-1]

    f = np.fft.rfftfreq(samples)
    s_scale = f.copy()
    fmin = max(fmin, 1.0 / samples)
    ix = np.sum(s_scale < fmin)
    if ix and ix < len(s_scale):
        s_scale[:ix] = s_scale[ix]
    s_scale = s_scale ** (-exponent / 2.0)

    w = s_scale[1:].copy()
    w[-1] *= (1 + (samples % 2)) / 2.0  # correct f = +-0.5
    sigma = 2 * np.sqrt(np.sum(w**2)) / samples

    size[-1] = len(f)
    sr = rng.normal(scale=s_scale, size=size)
    si = rng.normal(scale=s_scale, size=size)
    if not (samples % 2):
        si[..., -1] = 0
    si[..., 0] = 0

    s = sr + 1j * si
    y = np.fft.irfft(s, n=samples, axis=-1) / sigma
    return y


if __name__ == "__main__":
    y = powerlaw_psd_gaussian(1.0, (4, 1024), rng=0)
    print("shape:", y.shape, "std:", y.std(axis=-1))
